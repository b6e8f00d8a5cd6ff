"""Embedding similarity search: brute-force cosine top-k and LSH-bucketed
approximate nearest neighbors.

The brute-force path is the exactness baseline (O(n²) pair join — fine for
verification scale, and the within-bucket kernel of the ANN path). The
scale path is random-hyperplane LSH: a vectorized Arrow-batched projection
assigns each vector to a bucket; candidate pairs come from a bucket
equi-join, so the quadratic blowup is bounded by bucket size. Multi-probe
(signing with several independent plane sets) trades compute for recall.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "norm"
) -> DataFrame:
    """Attach the L2 norm (vectors cast to double for stable arithmetic)."""
    v = F.col(vec_col).cast("array<double>")
    return df.withColumn(vec_col, v).withColumn(out_col, F.sqrt(_dot(v, v)))


def cosine_topk(
    df: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors per vector (brute force).

    DataFrame[vec_id, neighbor_id, score]. Ranking uses the ROUNDED score
    with an id tiebreak so results are stable across engines/arithmetic
    orders. O(n²/p) — the correctness baseline; use :func:`ann_topk` at
    scale.
    """
    v = with_norm(df.select(id_col, vec_col), vec_col)
    a = v.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("va"),
        F.col("norm").alias("na"),
    )
    b = v.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vb"),
        F.col("norm").alias("nb"),
    )
    pairs = a.join(b, F.col("vec_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "vec_id",
        "neighbor_id",
        F.round(
            _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
            round_digits,
        ).alias("score"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector.

    The projection is a numpy matmul inside an Arrow-batched pandas UDF —
    the sanctioned Python path for embedding math (one matrix multiply per
    record batch, no per-row Python).
    """
    from pyspark.sql.functions import pandas_udf

    planes = np.random.RandomState(seed).randn(n_planes, dim)

    @pandas_udf(LongType())
    def bucket_of(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes.T) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(bits.astype(np.int64) @ weights)

    return df.select(
        F.col(id_col), F.col(vec_col), bucket_of(F.col(vec_col)).alias("bucket")
    )


def ann_topk(
    df: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 12,
    n_probes: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine neighbors via multi-probe hyperplane LSH.

    Each vector is bucketed under ``n_probes`` independent plane sets;
    candidates are pairs sharing any (probe, bucket) — a bucketed
    equi-join, never all-pairs. Exact cosine re-ranks the candidates.
    Recall grows with probes; cost stays ~O(n · bucket_size).
    """
    probed = None
    for p in range(n_probes):
        bp = lsh_buckets(df, dim, n_planes, seed + 1000 * p, id_col, vec_col)
        bp = bp.select(id_col, vec_col, F.lit(p).alias("probe"), "bucket")
        probed = bp if probed is None else probed.unionByName(bp)

    v = with_norm(probed, vec_col)
    a = v.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("va"),
        F.col("norm").alias("na"),
        "probe",
        "bucket",
    )
    b = v.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vb"),
        F.col("norm").alias("nb"),
        "probe",
        "bucket",
    )
    cands = (
        a.join(b, ["probe", "bucket"])
        .where(F.col("vec_id") != F.col("neighbor_id"))
        .dropDuplicates(["vec_id", "neighbor_id"])
    )
    scored = cands.select(
        "vec_id",
        "neighbor_id",
        F.round(
            _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4
        ).alias("score"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
