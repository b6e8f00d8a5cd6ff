#!/usr/bin/env python
"""sf1.0 parity for the three LATE-round-11 staged pairs
(winnow_ref_removal, fineweb_rules, corpus_divergence).

- corpus_divergence: full row compare (512 bucket rows).
- fineweb_rules: full row compare (50k small-int rows).
- winnow_ref_removal: the measure_spans_sf1 multiset device (count +
  exact sums + per-row md5-60bit key including clean_text) — the
  cleaned-text relation is too wide to ship through a driver collect
  comfortably at this scale.

Usage: python tools/measure_staged_r12_sf1.py [sf_dir]
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

    con = duckdb.connect()
    con.execute("SET memory_limit = '24GB'")
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF_DIR}/documents.parquet')"
    )
    spark = get_spark(app_name="staged-sf1", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    for name in ("corpus_divergence", "fineweb_rules"):
        fn = getattr(ent, f"q_{name}")
        sql = getattr(ent, f"_SQL_{name.upper()}")
        t0 = time.time()
        got = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
        t1 = time.time()
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        t2 = time.time()
        print(
            f"{name}: spark {t1-t0:.1f}s duck {t2-t1:.1f}s"
            f" rows={len(got)} match={got == want}"
        )

    df = ent.q_winnow_ref_removal(spark, SF_DIR)
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
    q = (
        "SELECT count(*), sum(CAST(n_spans AS HUGEINT)),"
        " sum(CAST(chars_removed AS HUGEINT)),"
        " sum(CAST(CAST(('0x' || substr(md5(CAST(id AS VARCHAR)"
        " || chr(1) || CAST(n_spans AS VARCHAR) || chr(1) ||"
        " CAST(chars_removed AS VARCHAR) || chr(1) ||"
        " coalesce(clean_text, chr(0) || 'NULL')), 1, 15)) AS BIGINT)"
        " AS HUGEINT)) FROM (" + ent._SQL_WINNOW_REF_REMOVAL + ")"
    )
    dm = tuple(str(x) for x in con.execute(q).fetchone())
    t2 = time.time()
    print(
        f"winnow_ref_removal: spark {t1-t0:.1f}s duck {t2-t1:.1f}s"
        f" n={sm[0]} match={sm == dm}"
    )
    if sm != dm:
        print("  spark:", sm)
        print("  duck :", dm)


if __name__ == "__main__":
    main()
