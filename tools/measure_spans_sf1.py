#!/usr/bin/env python
"""sf1.0 parity for the staged q_winnow_span_removal pair.

Unlike winnow_overlap, span removal has NO pair-quadratic join — the
ownership probe is linear in fingerprint rows — so the UNCAPPED driver
semantics run at scale engine-side. The DuckDB oracle's per-char
relation (~110M rows at sf1.0) is the heavy side; parity is the
multiset reduction (count + exact sums of n_spans / chars_removed +
sum of per-row md5-60bit keys over all four columns) so neither side
ships 50k cleaned documents through a driver collect.

Usage: python tools/measure_spans_sf1.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaled/sf1.0"


def main() -> None:
    import __spark_entry__ as ent
    from pyspark.sql import functions as F
    from reflexiv_spark.session import get_spark

    spark = get_spark(app_name="spans-sf1", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    df = ent.q_winnow_span_removal(spark, SF_DIR)
    key = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "\x01",
                    F.col("id").cast("string"),
                    F.col("n_spans").cast("string"),
                    F.col("chars_removed").cast("string"),
                    F.coalesce(F.col("clean_text"), F.lit("\x00NULL")),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    t0 = time.time()
    sm = tuple(
        str(x)
        for x in df.agg(
            F.count(F.lit(1)),
            F.sum(F.col("n_spans").cast("decimal(38,0)")),
            F.sum(F.col("chars_removed").cast("decimal(38,0)")),
            F.sum(key),
        ).collect()[0]
    )
    t1 = time.time()

    con = duckdb.connect()
    con.execute("SET memory_limit = '24GB'")
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF_DIR}/documents.parquet')"
    )
    q = (
        "SELECT count(*), sum(CAST(n_spans AS HUGEINT)),"
        " sum(CAST(chars_removed AS HUGEINT)),"
        " sum(CAST(CAST(('0x' || substr(md5(CAST(id AS VARCHAR)"
        " || chr(1) || CAST(n_spans AS VARCHAR) || chr(1) ||"
        " CAST(chars_removed AS VARCHAR) || chr(1) ||"
        " coalesce(clean_text, chr(0) || 'NULL')), 1, 15)) AS BIGINT)"
        " AS HUGEINT)) FROM (" + ent._SQL_WINNOW_SPAN_REMOVAL + ")"
    )
    dm = tuple(str(x) for x in con.execute(q).fetchone())
    t2 = time.time()
    print(
        f"winnow_span_removal sf1.0: spark {t1-t0:.1f}s duck {t2-t1:.1f}s"
        f" match={sm == dm} n={sm[0]}"
    )
    if sm != dm:
        print("  spark:", sm)
        print("  duck :", dm)


if __name__ == "__main__":
    main()
