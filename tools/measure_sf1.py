#!/usr/bin/env python
"""Refresh BASELINE.md's data-dominated (sf1.0) Spark-vs-DuckDB table.

Runs every headline query that has a SQL oracle twin on the scaled
sf1.0 directory: Spark side end-to-end to a noop sink (best of 2 after
a shared warmup), DuckDB side the oracle SQL. Brute-force-oracle
heavyweights are excluded like before (documented in BASELINE.md).

Usage: python tools/measure_sf1.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaled/sf1.0"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)
# quadratic-by-design verification oracles — intractable at sf1.0;
# the two clustering rows' recursive min-label closure oracles spill
# >70 GB of DuckDB temp before erroring at this scale (measured twice).
# read_mapping left the list in round 13 (its oracle was rewritten as
# an exhaustive gram-equality join — full sf1.0 row in BASELINE.md);
# contig_dedup / contained_dedup / ngram_jaccard now also carry
# SAMPLED sf1.0 value rows via tools/sample_oracle_sf1.py.
EXCLUDE_DUCK = {
    "contig_dedup",
    "contained_dedup",
    "dup_clusters",
    "cluster_keep_best",
}
# round-5 oracled additions not in the bench HEADLINE under these names
# (the bench times their xxhash64 twins) — measured here on the md5
# family both sides, apples to apples
EXTRA = [
    "dup_clusters",
    "cluster_keep_best",
    "decontaminate",
    "token_quantiles",
    "kmv_distinct",
    "kmeans_assign",
    "pack_sequences",
    # round-6: md5-family dup_spans twin (bench times the xxh64 family)
    "dup_spans",
    # round-8: SemDeDup (oracle shape, C=16 — feasible at sf1.0 embedding
    # counts), DSIR weights, classifier train->predict composition
    "semantic_dedup",
    "dsir_weights",
    "classifier_predict",
]


def main() -> None:
    import duckdb

    import __spark_entry__ as ent
    from bench import HEADLINE
    from reflexiv_spark.session import get_spark

    spark = get_spark(app_name="measure-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()
    oracles = ent.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{SF_DIR}/{t}.parquet')"
        )

    names = [n for n in HEADLINE + EXTRA if n in qs and n in oracles]
    out = {}
    for n in names:
        try:
            qs[n](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()  # warmup
            ts = []
            for _ in range(2):
                t0 = time.time()
                qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
                ts.append(time.time() - t0)
            spark_s = round(min(ts), 2)
        except Exception as e:  # noqa: BLE001
            spark_s = f"error: {e}"[:60]
        if n in EXCLUDE_DUCK:
            duck_s = None
        else:
            try:
                t0 = time.time()
                con.execute(oracles[n]).fetchall()
                duck_s = round(time.time() - t0, 2)
            except Exception as e:  # noqa: BLE001
                duck_s = f"error: {e}"[:60]
        out[n] = {"spark": spark_s, "duck": duck_s}
        print(json.dumps({n: out[n]}), flush=True)
    sp = sum(v["spark"] for v in out.values() if isinstance(v["spark"], float))
    du = sum(v["duck"] for v in out.values() if isinstance(v["duck"], float))
    print(json.dumps({"_total_spark": round(sp, 1), "_total_duck_comparable": round(du, 1)}))


if __name__ == "__main__":
    main()
