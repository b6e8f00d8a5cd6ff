#!/usr/bin/env python
"""Benchmark harness: times headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is forced end-to-end with a noop sink (full computation, no
driver collect). A warmup pass on sf0.001 triggers JVM/codegen warmup so
timings reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "kmer_count",
    "prune_forks",
    "union_counts",
    "best_connection",
    "multi_join_agg",
    "events_window",
    "fork_argmax",
    "top_orders",
    "fasta_wrap",
    "reduction",
    "mercy",
    "contig_dedup",
    "junction_support",
    # the RDK contraction loop itself (W3/J1/I1/I2) and the composed
    # patch/stitch stages — the engine's core, timed end-to-end
    "assemble_paths",
    "patch_contigs",
    "stitch_bridges",
    # datapipe headliners (present when implemented; skipped otherwise)
    "exact_dedup",
    "minhash_near_dup",
    "text_stats",
    # ann_lsh, not embedding_topk: the brute-force cosine is the O(n²)
    # correctness baseline; the LSH-bucketed path is the scale design.
    # Likewise ngram_jaccard (exact inverted-index join, hot-shingle
    # quadratic) stays a correctness entry; minhash_near_dup is its
    # scale-path headline.
    "ann_lsh",
    "contained_dedup",
    # X2 mapping stage: seed-join mapper + consensus end extension
    "read_mapping",
    "end_extend",
    # embedding near-dup dedup (LSH candidates + exact cosine verify —
    # the 100 TB path; the all-pairs GEMM baseline stays pytest-only)
    "embedding_dedup",
]


def main() -> None:
    import __spark_entry__ as ent
    from reflexiv_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="reflexiv-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()

    def run(name: str, d: str) -> float:
        t0 = time.time()
        qs[name](spark, d).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    names = [n for n in HEADLINE if n in qs]
    for n in names:  # warmup: codegen + JIT on the tiny SF
        try:
            run(n, "/root/testdata/sf0.001")
        except Exception:  # noqa: BLE001
            pass

    timings: dict[str, float] = {}
    for n in names:
        try:
            timings[n] = round(run(n, sf_dir), 3)
        except Exception as e:  # noqa: BLE001
            print(f"bench: {n} failed: {e}", file=sys.stderr)
            timings[n] = -1.0
    total = round(sum(v for v in timings.values() if v >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
