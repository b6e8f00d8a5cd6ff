#!/usr/bin/env python
"""Shuffle bytes of the MinHash LSH candidate exchange: id-only (current)
vs legacy sig-payload plan, on the clone-heavy sf1.0 documents table
(every sf0.1 doc has ~10 near-copies there, so hot bands emit the same
pair from many bands). Best-of-2 alternating runs via the UI REST API.

Usage: python tools/measure_minhash_shuffle.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaled/sf1.0"


def _totals(ui: str):
    with urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10) as r:
        app = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=30
    ) as r:
        stages = json.load(r)
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleReadBytes", 0) for s in stages),
    )


def legacy_pairs(sigs, bands, rows_per_band, num_hashes, threshold):
    """The pre-round-5 plan: both 64-long signatures ride the band join
    and the pair dedup. Kept here only as the measurement baseline."""
    from pyspark.sql import functions as F

    def band_key(b):
        key = F.concat_ws(
            ",",
            F.transform(
                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                lambda x: x.cast("string"),
            ),
        )
        return F.xxhash64(key)

    banded = sigs.select(
        "id",
        "sig",
        F.posexplode(F.array(*[band_key(b) for b in range(bands)])).alias(
            "band_idx", "band_key"
        ),
    )
    a = banded.select(
        F.col("id").alias("id1"), F.col("sig").alias("sig1"), "band_idx", "band_key"
    )
    b = banded.select(
        F.col("id").alias("id2"), F.col("sig").alias("sig2"), "band_idx", "band_key"
    )
    cands = (
        a.join(b, ["band_idx", "band_key"])
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "sig1", "sig2")
        .dropDuplicates(["id1", "id2"])
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig1"), F.col("sig2"), lambda x, y: x == y),
            lambda v: v,
        )
    )
    return cands.select(
        "id1", "id2", F.round(agree / F.lit(float(num_hashes)), 6).alias("est_jaccard")
    ).where(F.col("est_jaccard") >= threshold)


def main():
    from pyspark.sql import SparkSession, functions as F

    from reflexiv_spark.datapipe.dedup import minhash_lsh_pairs, minhash_signatures

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "5000")
        .getOrCreate()
    )
    ui = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").localCheckpoint(
        eager=True
    )
    num_hashes, bands, threshold = 64, 16, 0.6
    sigs = minhash_signatures(docs, "text", "doc_id", 8, num_hashes).localCheckpoint(
        eager=True
    )
    out = {"docs": docs.count()}
    for label in ("legacy", "idonly", "idonly", "legacy"):
        w0, r0 = _totals(ui)
        t0 = time.time()
        if label == "idonly":
            # same candidate plan as minhash_lsh_pairs, over the shared
            # pre-built sigs so both variants bill only the exchange
            def band_key(b):
                key = F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(F.col("sig"), b * (num_hashes // bands) + 1,
                                num_hashes // bands),
                        lambda x: x.cast("string"),
                    ),
                )
                return F.xxhash64(key)

            banded = sigs.select(
                "id",
                F.posexplode(
                    F.array(*[band_key(b) for b in range(bands)])
                ).alias("band_idx", "band_key"),
            )
            aa = banded.select(F.col("id").alias("id1"), "band_idx", "band_key")
            bb = banded.select(F.col("id").alias("id2"), "band_idx", "band_key")
            cands = (
                aa.join(bb, ["band_idx", "band_key"])
                .where(F.col("id1") < F.col("id2"))
                .select("id1", "id2")
                .dropDuplicates(["id1", "id2"])
            )
            s1 = sigs.select(F.col("id").alias("id1"), F.col("sig").alias("sig1"))
            s2 = sigs.select(F.col("id").alias("id2"), F.col("sig").alias("sig2"))
            agree = F.size(
                F.filter(
                    F.zip_with(F.col("sig1"), F.col("sig2"), lambda x, y: x == y),
                    lambda v: v,
                )
            )
            n = (
                cands.join(s1, "id1")
                .join(s2, "id2")
                .select(
                    "id1",
                    "id2",
                    F.round(agree / F.lit(float(num_hashes)), 6).alias("est_jaccard"),
                )
                .where(F.col("est_jaccard") >= threshold)
                .count()
            )
        else:
            n = legacy_pairs(
                sigs, bands, num_hashes // bands, num_hashes, threshold
            ).count()
        dt = time.time() - t0
        time.sleep(2)
        w1, r1 = _totals(ui)
        cur = {
            "pairs": n,
            "sec": round(dt, 2),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 2),
        }
        if label not in out or cur["sec"] < out[label]["sec"]:
            out[label] = cur
    out["write_ratio"] = round(
        out["legacy"]["shuffle_write_mb"]
        / max(out["idonly"]["shuffle_write_mb"], 0.01),
        2,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
