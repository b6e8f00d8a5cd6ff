#!/usr/bin/env python
"""Spark-side scaling curve: run representative queries at several
scale factors and report wall time and the time-vs-data growth ratio.

The correctness gate runs at sf0.01 and the data-dominated comparison
at sf1.0; this tool answers the 100× question directly — does each
operator's wall time grow ~linearly with input size once past the job
floor? A super-linear row (ratio much above the data ratio) flags a
plan that will not survive a large cluster scale-up.

Usage: python tools/scaling_curve.py [sf_dir ...]
       (default: /root/testdata/sf0.1 .scaled/sf1.0 .scaled/sf3.0)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
DEFAULT_DIRS = [
    "/root/testdata/sf0.1",
    str(REPO / ".scaled/sf1.0"),
    str(REPO / ".scaled/sf3.0"),
]

# flagship coverage: count-agg, iterative walk, banded near-dup,
# composed pipeline, CC clustering, temporal join, retrieval
SELECTED = [
    "kmer_count",
    "assemble_paths",
    "meta_assemble",
    "minhash_near_dup_xxh64",
    "decontaminate_xxh64",
    "dup_clusters_xxh64",
    "events_asof",
    "bm25_rank",
    "token_quantiles",
    # round-6 additions: substring dedup, iterative graph, vocab probe
    "dup_spans_xxh64",
    "graph_pagerank",
    "vocab_coverage",
    # round-7: the two rows graded weak on the sf1.0 2x contract — their
    # scale claim must be measured, not argued (VERDICT r6 #2)
    "stitch_bridges",
    "end_extend",
]


def main() -> None:
    import __spark_entry__ as ent
    from bench import _bench_only_queries
    from reflexiv_spark.session import get_spark

    import os

    dirs = sys.argv[1:] or DEFAULT_DIRS
    only = os.environ.get("SPARK_GRAFT_CURVE_QUERIES")
    selected = only.split(",") if only else SELECTED
    spark = get_spark(app_name="scaling-curve")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**ent.queries(), **_bench_only_queries()}
    table: dict[str, dict[str, float]] = {}
    for sf_dir in dirs:
        for name in selected:
            fn = qs.get(name)
            if fn is None:
                continue
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            table.setdefault(name, {})[sf_dir] = round(best, 2)
            print(json.dumps({name: {sf_dir: round(best, 2)}}), flush=True)
    print()
    hdr = ["query"] + [Path(d).name for d in dirs]
    print("| " + " | ".join(hdr) + " | growth |")
    print("|" + "---|" * (len(hdr) + 1))
    for name, row in table.items():
        vals = [row.get(d) for d in dirs]
        growth = (
            f"{vals[-1] / vals[0]:.1f}x" if vals[0] and vals[-1] else "-"
        )
        print(
            "| " + name + " | "
            + " | ".join(f"{v:.2f}" if v is not None else "-" for v in vals)
            + f" | {growth} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
