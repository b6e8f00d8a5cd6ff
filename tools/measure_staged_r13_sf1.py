#!/usr/bin/env python
"""sf1.0 parity + walls for the FIVE round-13 staged pairs
(pipeline_curate, shard_manifest, temperature_mix, domain_stats_psl,
web_curate).

All five outputs are driver-collectable at this scale (manifest ~1.4k
rows, mix ~25k thin rows, psl stats 21 rows, web_curate 5 rows,
pipeline_curate ~27k FULL-TEXT rows — the heaviest collect here), so
every row is fully value-compared against the DuckDB twin.

Usage: python tools/measure_staged_r13_sf1.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaled/sf1.0"

PAIRS = [
    "pipeline_curate",
    "shard_manifest",
    "temperature_mix",
    "domain_stats_psl",
    "web_curate",
]


def main() -> None:
    import __spark_entry__ as ent
    from reflexiv_spark.session import get_spark

    con = duckdb.connect()
    con.execute("SET memory_limit = '24GB'")
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    spark = get_spark(app_name="staged-r13-sf1", shuffle_partitions=32)
    for name in PAIRS:
        q = getattr(ent, f"q_{name}")
        sql = getattr(ent, f"_SQL_{name.upper()}")
        t0 = time.time()
        srows = sorted(tuple(map(str, r)) for r in q(spark, SF_DIR).collect())
        t1 = time.time()
        orows = sorted(
            tuple(map(str, r)) for r in con.execute(sql).fetchall()
        )
        t2 = time.time()
        ok = srows == orows
        print(
            f"{name}: {'PARITY' if ok else 'MISMATCH'} "
            f"rows={len(srows)}/{len(orows)} "
            f"spark={t1 - t0:.2f}s duckdb={t2 - t1:.2f}s"
        )
        if not ok:
            sa, sb = set(srows), set(orows)
            print("  only-spark", sorted(sa - sb)[:3])
            print("  only-oracle", sorted(sb - sa)[:3])
    spark.stop()


if __name__ == "__main__":
    main()
