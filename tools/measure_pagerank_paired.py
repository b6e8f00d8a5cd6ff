#!/usr/bin/env python
"""Paired Spark-vs-DuckDB graph_pagerank measurement (VERDICT r8 #3).

One invocation = one measurement WINDOW: alternating Spark/DuckDB runs
on identical sf1.0 parquet (A-B-A-B, best-of-2 each) so box drift hits
both engines alike — the round-8 ratio volatility (1.74× paired vs
3.4× across windows, with DuckDB's own wall swinging 1.9→3.7→2.1 s on
identical SQL) was a measurement artifact of comparing runs from
different windows. Run it in 3 separate idle windows and read the
median paired ratio; the contract letter reads ≤2× as CLOSED.

Appends one JSON line per window to tools/pagerank_paired.jsonl.

Usage: python tools/measure_pagerank_paired.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaled/sf1.0"
OUT = Path(__file__).parent / "pagerank_paired.jsonl"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def main() -> None:
    import duckdb

    import __spark_entry__ as ent
    from reflexiv_spark.session import get_spark

    spark = get_spark(app_name="pagerank-paired")
    spark.sparkContext.setLogLevel("ERROR")
    q = ent.queries()["graph_pagerank"]
    sql = ent.oracle_sql()["graph_pagerank"]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    def spark_once() -> float:
        t0 = time.time()
        q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def duck_once() -> float:
        t0 = time.time()
        con.execute(sql).fetchall()
        return time.time() - t0

    # shared warmup (JVM codegen / duckdb IO cache), then A-B-A-B
    spark_once()
    duck_once()
    s1, d1 = spark_once(), duck_once()
    s2, d2 = spark_once(), duck_once()
    s, d = min(s1, s2), min(d1, d2)
    row = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "sf_dir": SF_DIR,
        "spark_runs": [round(s1, 2), round(s2, 2)],
        "duck_runs": [round(d1, 2), round(d2, 2)],
        "spark_best": round(s, 2),
        "duck_best": round(d, 2),
        "ratio": round(s / d, 2),
    }
    with OUT.open("a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
