#!/usr/bin/env python
"""sf1.0 parity + walls for the late-round-13 staged pairs
(badwords, corpus_shuffle, training_layout, embedding_store_probe).
All outputs are thin (id/shard rows + ints/bools), so every row is
fully value-compared against the DuckDB twin.

Usage: python tools/measure_badwords_shuffle_sf1.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaled/sf1.0"

PAIRS = [
    "badwords",
    "corpus_shuffle",
    "training_layout",
    "embedding_store_probe",
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
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    spark = get_spark(app_name="staged-bw-sh-sf1", shuffle_partitions=32)
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
            for a, b in zip(srows[:3], orows[:3]):
                print("  spark", a, "\n  duck ", b)
            sys.exit(1)


if __name__ == "__main__":
    main()
