"""Embedding (semantic) fingerprint STORE — the fourth incremental-store
member.

The incremental family persists per-granularity fingerprints so nightly
batches never re-process the corpus: exact text fps
(:mod:`~reflexiv_spark.datapipe.incremental` ``fingerprints``), LSH
band keys (``band_fingerprints``), winnowed span fps
(:mod:`~reflexiv_spark.datapipe.winnow_store`). This module adds the
SEMANTIC member — mirroring the four dedup granularities (exact, near,
span, semantic): persist each vector's k-means cell + quantized
embedding, and probe a new batch for cosine near-duplicates against
the store WITHIN cells only (the SemDeDup/IVF candidate confinement —
never batch × store).

The quantizer model (a :func:`~reflexiv_spark.datapipe.similarity.kmeans_lite`
int64 centroid matrix) is part of the store's identity: store and
probe MUST use the same centroids, exactly like the winnow store pins
(k, window) and the band store pins (num_hashes, bands). Train once
(e.g. on a hash-sample), persist the matrix next to the store.

Determinism: vectors live in kmeans_lite's floor(x·1000) int64 fixed
point; every dot is an exact integer sum; cosines divide by sqrts of
exact integer norms — correctly-rounded IEEE ops on identical
operands, so an ANSI-SQL oracle replays every row (cos compares,
argmax, tie rules) bit-for-bit.

Scale shape: the store is a thin (id, cell, int64[dim], n2) relation;
the probe joins batch to store on CELL (hash join on a bounded key),
and the per-cell pairwise term runs as row-blocked int64 GEMMs (the
semdedup memory device) — task memory is O(block × |store-cell|)
doubles, never |batch-cell| × |store-cell| resident at once. The
centroid model is driver-sized (the semdedup scale-ceiling note
applies verbatim).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.datapipe.similarity import kmeans_lite

# per-task float64 slots for one (batch-block × store-cell) cosine slab
_GEMM_BLOCK_DOUBLES = 1 << 24


def _quantized(
    df: DataFrame, centroids: np.ndarray, dim: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, cell, qv, n2) under the FIXED pre-trained centroids — a
    pure assignment pass (kmeans_lite with n_iter=1 + init).

    NOTE: the floor(x·1000) quantize + int64 dot construction is the
    third copy of the fixed-point device (similarity.kmeans_lite,
    semdedup) — consolidating onto one helper requires a semantic
    similarity.py edit, deferred until the similarity family rotates
    back into the oracle window (its r12 rows stand in slots 51+
    this round). The extra qv projection here duplicates one
    scan-side transform; the GEMM passes dominate.
    """
    assign, _ = kmeans_lite(
        df, dim=dim, n_centroids=len(centroids), n_iter=1,
        id_col=id_col, vec_col=vec_col, init_centroids=centroids,
    )
    q = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * 1000).cast("long"),
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    qv = df.select(F.col(id_col), q.alias("qv")).withColumn(
        "n2", dot(F.col("qv"), F.col("qv"))
    )
    return assign.join(qv, id_col).select(id_col, "cell", "qv", "n2")


def embedding_store(
    df: DataFrame,
    centroids: np.ndarray,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Build the persisted store → DataFrame[<id_col>, cell, qv, n2].

    Zero-norm and NULL vectors are EXCLUDED (cosine undefined — they
    can never be a near-duplicate candidate; the same rule as
    ``semantic_dedup`` membership). Persist as parquet next to the
    centroid matrix; append new batches with
    :func:`update_embedding_store`.
    """
    return _quantized(
        df.where(F.col(vec_col).isNotNull()), centroids, dim, id_col, vec_col
    ).where(F.col("n2") > 0)


def update_embedding_store(
    store: DataFrame, additions: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Append-only store update: union + keep one row per id (rows for
    the same id under the same centroids are identical, so which one
    survives is immaterial). Same-centroids is the caller's contract —
    exactly like the winnow store's (k, window) pinning."""
    return store.unionByName(additions).dropDuplicates([id_col])


def probe_embedding_store(
    batch: DataFrame,
    store: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    gemm_block_doubles: int = _GEMM_BLOCK_DOUBLES,
) -> DataFrame:
    """Probe a raw batch against the store →
    DataFrame[<id_col>, n_candidates, best_store_id, flagged]:
    per batch vector, the number of store vectors in its cell with
    cosine ≥ ``threshold``, the best match (max cosine, ties → lowest
    store id), and ``flagged = n_candidates > 0``. EVERY batch row
    appears in the output (the data-card rule): zero-norm vectors and
    empty-cell probes report (0, NULL, false).

    The per-cell batch × store cosine block runs as row-blocked numpy
    int64 GEMMs (exact integer dots; the cosine doubles are the same
    correctly-rounded values the SQL oracle computes), with the batch
    side blocked at ``gemm_block_doubles // |store-cell|`` rows per
    slab.
    """
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StructField,
        StructType,
    )

    # NULL embeddings would crash kmeans_lite's assignment GEMM; the
    # left join back to all_ids below accounts for them as
    # (0, NULL, false) — the same rows the oracle's n2 IS NULL filter
    # excludes from pairs
    bq = _quantized(
        batch.where(F.col(vec_col).isNotNull()),
        centroids, dim, id_col, vec_col,
    ).where(F.col("n2") > 0)
    sm = store.select(F.col(id_col), F.col("cell"), "qv", "n2")
    thr = float(threshold)
    block_doubles = max(1, int(gemm_block_doubles))

    out_schema = StructType(
        [
            StructField("__bid", LongType(), False),
            StructField("n_candidates", LongType(), False),
            StructField("best_store_id", LongType(), True),
            StructField("flagged", BooleanType(), False),
        ]
    )

    # COGROUPED batch/store frames (not a NULL-tagged union): a union
    # with NULL id columns reaches pandas as float64 (Arrow
    # int64-with-nulls), silently rounding ids >= 2^53 — this engine's
    # own WARC doc ids are 62-bit. Cogroup keeps both id columns
    # non-null int64 end to end.
    def probe_cell(b: pd.DataFrame, s: pd.DataFrame):
        if not len(b):
            return pd.DataFrame(
                {
                    "__bid": pd.Series([], dtype="int64"),
                    "n_candidates": pd.Series([], dtype="int64"),
                    "best_store_id": pd.array([], dtype="Int64"),
                    "flagged": pd.Series([], dtype="bool"),
                }
            )
        bids = b[id_col].to_numpy(dtype=np.int64)
        if not len(s):
            return pd.DataFrame(
                {
                    "__bid": bids,
                    "n_candidates": np.zeros(len(b), dtype=np.int64),
                    "best_store_id": pd.array(
                        [None] * len(b), dtype="Int64"
                    ),
                    "flagged": np.zeros(len(b), dtype=bool),
                }
            )
        sq = np.array(list(s["qv"]), dtype=np.int64)
        snorm = np.sqrt(s["n2"].to_numpy(dtype=np.float64))
        # ties → LOWEST store id: pre-sort columns by id so the first
        # argmax among equal cosines is the smallest id
        order = np.argsort(s[id_col].to_numpy(dtype=np.int64), kind="stable")
        sq, snorm = sq[order], snorm[order]
        sids = s[id_col].to_numpy(dtype=np.int64)[order]
        bqm = np.array(list(b["qv"]), dtype=np.int64)
        bnorm = np.sqrt(b["n2"].to_numpy(dtype=np.float64))
        n_out = np.zeros(len(b), dtype=np.int64)
        best = np.zeros(len(b), dtype=np.int64)   # int64 end to end
        blk = max(1, block_doubles // len(sids))
        for i in range(0, len(b), blk):
            j = min(i + blk, len(b))
            cos = (bqm[i:j] @ sq.T).astype(np.float64) / np.outer(
                bnorm[i:j], snorm
            )
            cand = cos >= thr
            n_out[i:j] = cand.sum(axis=1)
            hit = n_out[i:j] > 0
            if hit.any():
                masked = np.where(cand, cos, -np.inf)
                am = np.argmax(masked, axis=1)  # first max = lowest id
                best[i:j][hit] = sids[am[hit]]
        best_col = pd.array(best, dtype="Int64")
        best_col[n_out == 0] = pd.NA
        return pd.DataFrame(
            {
                "__bid": bids,
                "n_candidates": n_out,
                "best_store_id": best_col,
                "flagged": n_out > 0,
            }
        )

    probed = (
        bq.groupBy("cell")
        .cogroup(sm.groupBy("cell"))
        .applyInPandas(probe_cell, out_schema)
    )
    # every batch row in the output: zero-norm / empty-cell → (0, NULL,
    # false)
    all_ids = batch.select(F.col(id_col))
    return (
        all_ids.join(
            probed.withColumnRenamed("__bid", id_col), id_col, "left"
        )
        .select(
            id_col,
            F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias(
                "n_candidates"
            ),
            F.col("best_store_id").cast("bigint").alias("best_store_id"),
            F.coalesce("flagged", F.lit(False)).alias("flagged"),
        )
    )
