"""SemDeDup — semantic deduplication by cluster-then-pairwise cosine.

The cluster-bounded alternative to the LSH-bucketed
``similarity.embedding_dedup``: k-means cells confine the pairwise
term, and the cell count is the scale knob (Abbas et al.,
arXiv:2303.09540 run k ≈ n/50k at web scale). Separate module so its
evolution does not mark the whole similarity family window-affected in
``tools/check_window.py``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.datapipe.similarity import kmeans_lite

def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_centroids: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", arXiv:2303.09540):
    k-means-cluster the embeddings, then within each cluster drop every
    vector that is a near-duplicate (cosine ≥ ``threshold``) of a
    vector ordered before it. Returns the SURVIVING rows of ``df``.

    Ordering follows the paper: members sort by cosine similarity to
    their cluster centroid ASCENDING (ties → lower id), and x is
    dropped when ANY earlier-ordered y in the same cluster has
    cos(x, y) ≥ threshold — the paper's upper-triangular similarity-
    matrix rule, so the kept example of each duplicate group is the one
    LEAST similar to the centroid (the most informative, per §4.1).

    Scale shape: this is the cluster-bounded alternative to the
    LSH-bucketed :func:`embedding_dedup` — candidate pairs are confined
    to k-means cells, so the pairwise term is Σ|cell|² and ``n_centroids``
    is the knob that bounds it (the paper runs k ≈ n/50k at web scale;
    pass a larger ``n_centroids`` as the corpus grows). Only the INIT of
    ``kmeans_lite`` is the smallest-id vectors; every Lloyd update
    aggregates the full ``df``. Assignment is one Arrow GEMM pass, the
    self-join key is the cell id, and only (id, quantized-vector)
    columns enter the exchange.

    Scale CEILING — the driver-resident model: the centroid matrix is
    C×dim int64s held on the driver and closure-shipped into the GEMM
    assignment UDF. At the paper's web-scale k ≈ n/50k (k ~ 2M cells
    for a 100B-row corpus at dim 768) that matrix is ~12 GB — no longer
    "driver-sized", and argmax-over-all-C per row stops being one GEMM.
    This implementation is therefore bounded to models that fit the
    driver and the task broadcast (roughly C·dim ≤ 10^8); beyond that,
    train centroids in a prior distributed job, shard the assignment
    (coarse-quantize to a centroid GROUP first, then argmax within the
    group), and feed the resulting model here via ``centroids``.

    ``centroids``: optional pre-trained int64 fixed-point C×dim matrix
    (e.g. a prior :func:`kmeans_lite` run on a hash-sample, or an
    external trainer quantized with floor(x·1000)). When given, no
    training happens — one assignment pass replaces the Lloyd loop.

    Determinism: vectors and centroids live in kmeans_lite's
    floor(x·1000) int64 fixed point, so every dot product is an exact
    integer sum (order-free); cosines divide by sqrt of exact integer
    norms — correctly-rounded IEEE ops on identical operands, bit-equal
    in any engine. Zero-norm vectors are kept unconditionally (cosine
    undefined).
    """
    assign, cmat = kmeans_lite(
        df, dim=dim, n_centroids=n_centroids,
        n_iter=1 if centroids is not None else n_iter,
        id_col=id_col, vec_col=vec_col, init_centroids=centroids,
    )
    spark = df.sparkSession
    cent = spark.createDataFrame(
        [(i, [int(x) for x in row]) for i, row in enumerate(cmat)],
        "cell int, cvec array<bigint>",
    )
    q = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * 1000).cast("long"),
    )
    qv = df.select(F.col(id_col).alias("__vid"), q.alias("__qv"))
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    norm2 = lambda a: dot(a, a)  # noqa: E731
    members = (
        assign.select(F.col(id_col).alias("__vid"), "cell")
        .join(qv, "__vid")
        .join(F.broadcast(cent), "cell")
        .select(
            "cell",
            "__vid",
            "__qv",
            norm2(F.col("__qv")).alias("__n2"),
            (
                dot(F.col("__qv"), F.col("cvec"))
                / (
                    F.sqrt(norm2(F.col("__qv")).cast("double"))
                    * F.sqrt(norm2(F.col("cvec")).cast("double"))
                )
            ).alias("__ccos"),
        )
        .where(F.col("__n2") > 0)
        # consumed by both sides of the within-cell pair join
        .localCheckpoint(eager=False)
    )
    a, b = members.alias("a"), members.alias("b")
    cos_ab = dot(F.col("a.__qv"), F.col("b.__qv")) / (
        F.sqrt(F.col("a.__n2").cast("double"))
        * F.sqrt(F.col("b.__n2").cast("double"))
    )
    dropped = (
        a.join(b, "cell")
        # y (=b) ordered strictly before x (=a): lower centroid-cosine,
        # ties to lower id — the paper's triu ordering
        .where(
            (F.col("b.__ccos") < F.col("a.__ccos"))
            | (
                (F.col("b.__ccos") == F.col("a.__ccos"))
                & (F.col("b.__vid") < F.col("a.__vid"))
            )
        )
        .where(cos_ab >= threshold)
        .select(F.col("a.__vid").alias("__dropped"))
        .distinct()
    )
    return df.join(
        dropped, F.col(id_col) == F.col("__dropped"), "left_anti"
    )
