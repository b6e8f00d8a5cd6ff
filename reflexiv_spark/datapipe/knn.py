"""Cell-bounded k-nearest-neighbor graph over an embedding column.

The embedding-curation workhorse the similarity family lacked: every
vector's top-k cosine neighbors as an EDGE LIST — the input SemDeDup-
style pipelines, duplicate-cluster discovery (`cluster.dup_clusters`
consumes edges), and graph-based quality propagation
(`graph.pagerank`) all start from. `embedding_topk` answers one probe
set against a corpus; this materializes the whole graph.

Candidate generation is k-means-cell-bounded (the SemDeDup/IVF shape,
shared `kmeans_lite` model): pairs are confined to cells, so the
pairwise term is Σ|cell|² and ``n_centroids`` is the recall/cost knob
— identical scale ceiling and escape hatch (pre-trained ``centroids``)
as :func:`reflexiv_spark.datapipe.semdedup.semantic_dedup`, whose
docstring carries the full driver-model discussion. Within each cell
the similarity pass is the same row-blocked exact-int64 Arrow GEMM
(task memory O(block·|cell|), never |cell|²).

Determinism (oracle-replayable): vectors quantize to floor(x·1000)
int64, dots are exact integer sums, cosines divide by sqrt of exact
norms (correctly-rounded IEEE on identical operands — bit-equal in any
engine), neighbors rank by (cosine DESC, dst ASC), and zero-norm
vectors are excluded (cosine undefined). The emitted cosine rounds to
6 places for display; RANKING uses the unrounded double.

Built round 9; enters the driver-oracle window round 10 per the
registry protocol (SURVEY §8) — the staged driver pair
(`__spark_entry__.q_knn_graph` / `_SQL_KNN_GRAPH`) is gated locally by
``tests/test_knn.py::test_staged_driver_pair_parity`` this round.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.datapipe.semdedup import _GEMM_BLOCK_DOUBLES
from reflexiv_spark.datapipe.similarity import kmeans_lite


def knn_graph(
    df: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_centroids: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    gemm_block_doubles: int = _GEMM_BLOCK_DOUBLES,
    max_cell_rows: int | None = None,
) -> DataFrame:
    """k-nearest-neighbor edges → DataFrame[src, dst, cos].

    For every non-zero-norm vector: its ``k`` most-cosine-similar
    OTHER vectors within the same k-means cell (ties → lower dst id).
    Vectors alone in their cell emit no edges. ``centroids`` skips
    training (assign-only against a pre-trained int64 fixed-point
    model — the web-scale path). Ids must be integral (they ride an
    int64 edge list).

    TASK-MEMORY CEILING — the per-cell base matrix: the blocked GEMM
    bounds the cosine SLAB to ``gemm_block_doubles`` float64s, but each
    ``applyInPandas`` task still materializes its whole cell's
    quantized int64 matrix (|cell| × dim × 8 bytes — 512 MB at a
    1M-row cell with dim 64) plus the Arrow batch it arrived in. Size
    ``n_centroids ≳ n / max_cell_rows`` so cells stay task-sized, or
    set ``max_cell_rows`` to enforce it:

    ``max_cell_rows``: when set, any cell with more members is
    deterministically split into ⌈|cell|/cap⌉ sub-cells by
    ``vec_id mod n_sub`` BEFORE candidate generation, so no task ever
    holds more than ~2·cap rows (mod splits are balanced only in
    expectation). RECALL NOTE: neighbors are then found within the
    (cell, sub-cell) shard only — an exactness trade the caller opts
    into, same contract as lowering LSH bands. Default ``None``
    preserves the exact within-cell semantics (what the driver oracle
    replays).
    """
    assign, _ = kmeans_lite(
        df, dim=dim, n_centroids=n_centroids,
        n_iter=1 if centroids is not None else n_iter,
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
    qv = df.select(F.col(id_col).cast("long").alias("__vid"), q.alias("__qv"))
    members = (
        assign.select(F.col(id_col).cast("long").alias("__vid"), "cell")
        .join(qv, "__vid")
        .withColumn("__n2", dot(F.col("__qv"), F.col("__qv")))
        .where(F.col("__n2") > 0)
    )
    if max_cell_rows is not None:
        cap = max(1, int(max_cell_rows))
        # cell sizes are an n_centroids-row aggregate → broadcast back;
        # n_sub = ⌈|cell|/cap⌉ in exact integer arithmetic, sub-cell by
        # id mod (deterministic, layout-free)
        sizes = members.groupBy("cell").agg(
            F.count(F.lit(1)).alias("__cn")
        )
        members = members.join(F.broadcast(sizes), "cell").withColumn(
            "__sub",
            F.pmod(
                F.col("__vid"),
                F.expr(f"(__cn + {cap - 1}) div {cap}"),
            ),
        )
    else:
        members = members.withColumn("__sub", F.lit(0))

    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    topk = max(1, int(k))
    block_doubles = max(1, int(gemm_block_doubles))

    def edges_in_cell(pdf: pd.DataFrame):
        n = len(pdf)
        if n <= 1:
            return pd.DataFrame(
                {
                    "src": pd.Series([], dtype="int64"),
                    "dst": pd.Series([], dtype="int64"),
                    "cos": pd.Series([], dtype="float64"),
                }
            )
        pdf = pdf.sort_values("__vid", kind="mergesort")
        qm = np.array(list(pdf["__qv"]), dtype=np.int64)
        vids = pdf["__vid"].to_numpy()
        norms = np.sqrt(pdf["__n2"].to_numpy(dtype=np.float64))
        blk = max(1, block_doubles // n)
        srcs, dsts, coss = [], [], []
        kk = min(topk, n - 1)
        for i in range(0, n, blk):
            j = min(i + blk, n)
            cos = (qm[i:j] @ qm.T).astype(np.float64) / np.outer(
                norms[i:j], norms
            )
            # self never a neighbor
            rows = np.arange(i, j)
            cos[np.arange(j - i), rows] = -np.inf
            # exact top-k with (cos DESC, vid ASC): lexsort on
            # (vid asc) then stable argsort on -cos keeps the lower
            # vid first among equal cosines (vids are pre-sorted)
            idx = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
            for r in range(j - i):
                srcs.extend([vids[i + r]] * kk)
                dsts.extend(vids[idx[r]])
                coss.extend(cos[r, idx[r]])
        return pd.DataFrame(
            {
                "src": np.asarray(srcs, dtype="int64"),
                "dst": np.asarray(dsts, dtype="int64"),
                "cos": np.asarray(coss, dtype="float64"),
            }
        )

    schema = StructType(
        [
            StructField("src", LongType(), False),
            StructField("dst", LongType(), False),
            StructField("cos", DoubleType(), False),
        ]
    )
    # rounding happens JVM-side (F.round = BigDecimal HALF_UP) — the
    # same display-rounding device every other oracled double column in
    # the repo uses; ranking inside the kernel used the unrounded cos
    return (
        members.select("cell", "__sub", "__vid", "__qv", "__n2")
        .groupBy("cell", "__sub")
        .applyInPandas(edges_in_cell, schema)
        .select("src", "dst", F.round("cos", 6).alias("cos"))
    )
