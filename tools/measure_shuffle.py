#!/usr/bin/env python
"""Measure total shuffle read/write bytes of the rank_paths contraction
loop, packed (2-bit int64 pointers) vs string (ASCII k-mer pointers), at a
given SF dir. Sums per-stage shuffle metrics from the live Spark UI REST
API between two marks, so only the measured section counts.

Usage: python tools/measure_shuffle.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def _stages(ui: str):
    with urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10) as r:
        app = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=30
    ) as r:
        return json.load(r)


def _totals(ui: str):
    w = r = 0
    ids = set()
    for s in _stages(ui):
        w += s.get("shuffleWriteBytes", 0)
        r += s.get("shuffleReadBytes", 0)
        ids.add((s["stageId"], s["attemptId"]))
    return w, r, ids


def main():
    from pyspark.sql import SparkSession

    from reflexiv_spark.operators.counter import count_kmers
    from reflexiv_spark.operators.extension import rank_paths
    from reflexiv_spark.pipelines.assemble import expand_orientations, prune_forks
    from __spark_entry__ import _dna

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "5000")
        .getOrCreate()
    )
    ui = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"
    k = 15
    counts = count_kmers(_dna(spark, SF_DIR), k, min_coverage=2)
    pruned = (
        prune_forks(expand_orientations(counts), k)
        .select("kmer", "count")
        .localCheckpoint(eager=True)
    )
    n = pruned.count()
    out = {}
    # alternate order, keep the best-of-2 wall clock (JIT/warmup fairness)
    for label, packed in (("string", False), ("packed", True),
                          ("packed", True), ("string", False)):
        w0, r0, _ = _totals(ui)
        t0 = time.time()
        rows = rank_paths(pruned, k, packed=packed).count()
        dt = time.time() - t0
        time.sleep(2)  # let the UI ingest the final stage metrics
        w1, r1, _ = _totals(ui)
        cur = {
            "rows": rows,
            "sec": round(dt, 2),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 2),
            "shuffle_read_mb": round((r1 - r0) / 1e6, 2),
        }
        if label not in out or cur["sec"] < out[label]["sec"]:
            out[label] = cur
    out["input_kmers"] = n
    out["write_ratio"] = round(
        out["string"]["shuffle_write_mb"] / max(out["packed"]["shuffle_write_mb"], 0.01), 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
