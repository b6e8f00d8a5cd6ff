#!/usr/bin/env python
"""sf1.0 parity + wall for the round-12 changed/new pairs:

- ccnet_buckets (now the λ=0.5 unigram+bigram interpolated model with
  scored-population tertiles): full row compare (45,000 rows, narrow).
- winnow_store_probe (staged r12, registers r13): full row compare
  (45,000 rows, 4 narrow columns).

Usage: python tools/measure_r12_sf1.py [sf_dir]
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
    from reflexiv_spark.session import get_spark

    con = duckdb.connect()
    con.execute("SET memory_limit = '24GB'")
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF_DIR}/documents.parquet')"
    )
    spark = get_spark(app_name="r12-sf1", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    for name in ("ccnet_buckets", "winnow_store_probe"):
        fn = getattr(ent, f"q_{name}")
        sql = getattr(ent, f"_SQL_{name.upper()}")
        t0 = time.time()
        got = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
        t1 = time.time()
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        t2 = time.time()
        print(
            f"{name}: spark {t1 - t0:.1f}s duck {t2 - t1:.1f}s"
            f" rows={len(got)} match={got == want}"
        )


if __name__ == "__main__":
    main()
