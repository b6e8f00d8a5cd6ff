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


def cosine_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    n_blocks: int | None = None,
    target_block_rows: int = 50_000,
) -> DataFrame:
    """Exact embedding near-duplicate pairs: DataFrame[id1, id2, score]
    with id1 < id2 and rounded cosine ≥ threshold.

    All pairs are scored — the oracle-checkable correctness baseline (the
    scale path is :func:`embedding_dedup` with ``exact=False``) — but
    through a blocked GEMM, not a per-pair expression: vectors hash into
    ``n_blocks`` blocks, the upper triangle of block pairs fans out as a
    join, and each block pair is one numpy matmul inside an Arrow batch.
    Per-pair work is a vectorized BLAS op instead of an interpreted
    zip_with/aggregate, ~10× faster and the standard shape for distributed
    brute-force similarity.

    ``n_blocks=None`` (default) derives the block count from a count of
    the input so each ``collect_list`` block row holds at most
    ``target_block_rows`` vectors (~25 MB at dim=64) no matter how large
    the corpus — a fixed block count would grow block rows linearly with
    n toward the 2 GB row limit. The floor of 16 preserves grid
    parallelism at small n. Total GEMM work is unchanged (the
    block-pair grid covers every pair exactly once at any block count).
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    v = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    if n_blocks is None:
        import math

        n_blocks = max(16, math.ceil(v.count() / max(target_block_rows, 1)))
    tagged = v.withColumn("bid", F.pmod(F.xxhash64("id"), F.lit(n_blocks)))
    blocks = tagged.groupBy("bid").agg(
        F.collect_list(F.struct("id", "vec")).alias("items")
    ).localCheckpoint(eager=False)
    a = blocks.select(F.col("bid").alias("bid_a"), F.col("items").alias("items_a"))
    b = blocks.select(F.col("bid").alias("bid_b"), F.col("items").alias("items_b"))
    grid = a.join(b, F.col("bid_a") <= F.col("bid_b"))

    out_schema = StructType(
        [
            StructField("id1", LongType(), False),
            StructField("id2", LongType(), False),
            StructField("score", DoubleType(), False),
        ]
    )
    thr, digits = float(threshold), int(round_digits)

    def gemm(batches):
        import pandas as pd

        for pdf in batches:
            frames = []
            for _, row in pdf.iterrows():
                ia = np.array([it["id"] for it in row["items_a"]], dtype=np.int64)
                ib = np.array([it["id"] for it in row["items_b"]], dtype=np.int64)
                ma = np.stack([np.asarray(it["vec"]) for it in row["items_a"]])
                mb = np.stack([np.asarray(it["vec"]) for it in row["items_b"]])
                ma = ma / np.linalg.norm(ma, axis=1, keepdims=True)
                mb = mb / np.linalg.norm(mb, axis=1, keepdims=True)
                s = np.round(ma @ mb.T, digits)
                if row["bid_a"] == row["bid_b"]:
                    # diagonal cell: both sides are the same block — take
                    # the strict upper triangle by id
                    mask = (s >= thr) & (ia[:, None] < ib[None, :])
                else:
                    # off-diagonal cell: blocks are disjoint and each
                    # unordered pair occurs exactly once — normalize ids
                    mask = s >= thr
                ii, jj = np.nonzero(mask)
                if len(ii):
                    x, y = ia[ii], ib[jj]
                    frames.append(
                        pd.DataFrame(
                            {
                                "id1": np.minimum(x, y),
                                "id2": np.maximum(x, y),
                                "score": s[ii, jj],
                            }
                        )
                    )
            yield (
                pd.concat(frames)
                if frames
                else pd.DataFrame({"id1": [], "id2": [], "score": []}).astype(
                    {"id1": "int64", "id2": "int64", "score": "float64"}
                )
            )

    return grid.mapInPandas(gemm, out_schema)


def embedding_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    dim: int | None = None,
    n_planes: int = 12,
    n_probes: int = 4,
    plane_family: str = "gaussian",
) -> DataFrame:
    """Drop every row whose embedding has a near-duplicate (cosine ≥
    threshold) with a smaller id — the embedding flavor of the dedup
    family (exact / MinHash / SimHash / containment siblings live in
    :mod:`reflexiv_spark.datapipe.dedup`).

    ``exact=True`` verifies against all pairs (oracle baseline);
    ``exact=False`` generates candidates from multi-probe hyperplane LSH
    buckets (requires ``dim``) and verifies candidates with exact cosine —
    the 100 TB path: cost ~O(n · bucket_size), recall grows with probes.
    """
    if exact:
        pairs = cosine_dup_pairs(df, threshold, id_col, vec_col)
    else:
        if dim is None:
            raise ValueError("dim is required for the LSH (exact=False) path")
        probed = lsh_buckets_multi(
            df, dim, n_planes, n_probes, 42, id_col, vec_col, plane_family
        ).select(id_col, "probe", "bucket")
        # id-only candidate exchange; vectors rejoin by id for the verify
        # (same shuffle-byte fix as ann_topk)
        a = probed.select(F.col(id_col).alias("id1"), "probe", "bucket")
        b = probed.select(F.col(id_col).alias("id2"), "probe", "bucket")
        cand = (
            a.join(b, ["probe", "bucket"])
            .where(F.col("id1") < F.col("id2"))
            .select("id1", "id2")
            .dropDuplicates()
        )
        vexpr = (
            F.col(vec_col).cast("array<double>")
            if plane_family == "md5"
            else F.col(vec_col)
        )
        v = with_norm(df.select(F.col(id_col), vexpr.alias(vec_col)), vec_col)
        va = v.select(
            F.col(id_col).alias("id1"), F.col(vec_col).alias("va"),
            F.col("norm").alias("na"),
        )
        vb = v.select(
            F.col(id_col).alias("id2"), F.col(vec_col).alias("vb"),
            F.col("norm").alias("nb"),
        )
        pairs = (
            cand.join(va, "id1")
            .join(vb, "id2")
            .select(
                "id1",
                "id2",
                F.round(
                    _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4
                ).alias("score"),
            )
            .where(F.col("score") >= threshold)
        )
    dropped = pairs.select(F.col("id2").alias("__drop")).distinct()
    return df.join(dropped, F.col(id_col) == F.col("__drop"), "left_anti")


def ivf_topk(
    df: DataFrame,
    dim: int,
    k: int = 3,
    n_centroids: int | None = None,
    n_probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_cap: int = 4096,
    refine_iters: int = 0,
) -> DataFrame:
    """Approximate top-k cosine neighbors via an IVF (inverted-file)
    coarse quantizer — the cell-probing sibling of :func:`ann_topk`'s
    hyperplane LSH.

    Coarse quantizer: the ``n_centroids`` vectors with the smallest ids
    (a deterministic sample — production systems would k-means-refine;
    sampling the corpus is the standard zero-training fallback and keeps
    the operator fully reproducible). The quantizer matrix is collected to
    the driver ONCE (bounded: ≤ centroid_cap × dim int64s, the same
    footprint as a broadcast dim table — this is how every IVF system
    trains/ships its coarse quantizer) and shipped to executors inside an
    Arrow-batched ``mapInPandas``: cell assignment is one int64 GEMM per
    record batch instead of an n × n_centroids interpreted expression
    join. Fixed-point floor(v·1000) int64 dots divided by the centroid's
    exact int norm are identical in any engine (int sums are order-free;
    IEEE divide/sqrt of identical ints are correctly rounded), so an
    ANSI-SQL oracle replays cells AND ranking bit for bit. Zero-norm
    centroids (all components quantizing to 0) are excluded up front —
    they would otherwise divide by zero and rank NULL/NaN engine-
    dependently.

    Each vector is ASSIGNED to its nearest centroid's inverted list; each
    query PROBES its ``n_probes`` nearest lists. Scoring groups each
    cell's members and probers into blocks and re-ranks with one float64
    GEMM per (prober-block, member-chunk) — the
    :func:`cosine_dup_pairs` blocked-GEMM shape; a vector's assigned cell
    is unique, so (query, member) candidates are already distinct and no
    pair-dedup shuffle exists. Per-cell top-k then a global window over
    ≤ n_probes·k survivors per query gives exact top-k over the probed
    cells.

    ``n_centroids=None`` (default) sizes the quantizer as
    min(√n, centroid_cap): √n balances assignment (n·C dots) against
    probing (n·probes·n/C verifies) at moderate n, and the cap bounds
    quantizer memory. Cost model: GEMM assignment is n·C·dim flops in
    BLAS (trivial up to C=4096); verify work is n·probes·(n/C)·dim flops
    — the inherent IVF-flat probe cost, also BLAS. Member chunks are
    capped (~1024 rows) so no single collect_list row grows with cell
    size.
    """
    import math

    if n_centroids is None:
        n_total = df.count()
        n_centroids = max(16, min(math.isqrt(max(n_total, 1)), centroid_cap))
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    q = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * 1000).cast("long"),
    )
    qv = df.select(F.col(id_col).alias("vid"), q.alias("qv"))
    # orderBy+limit compiles to TakeOrdered (per-partition top-K + driver
    # merge) — the quantizer collect is the one sanctioned driver
    # materialization: ≤ centroid_cap rows, the IVF coarse-quantizer
    # "model" every implementation holds centrally.
    if refine_iters > 0:
        # Lloyd-refined quantizer (kmeans_lite): better-balanced cells
        # than min-id sampling at the cost of refine_iters extra passes.
        # Cell ids become synthetic indices — fine, cid is only a
        # grouping key downstream.
        _, cmat = kmeans_lite(
            df, dim, n_centroids, n_iter=refine_iters + 1,
            id_col=id_col, vec_col=vec_col,
        )
        cids = np.arange(len(cmat), dtype=np.int64)
        cnorm = np.sqrt((cmat * cmat).sum(axis=1).astype(np.float64))
        keep = cnorm > 0.0  # same zero-norm guard as the sampled branch
        cmat, cids, cnorm = cmat[keep], cids[keep], cnorm[keep]
    else:
        cent_rows = qv.orderBy("vid").limit(n_centroids).collect()
        cmat = np.array([r["qv"] for r in cent_rows], dtype=np.int64)
        cids = np.array([r["vid"] for r in cent_rows], dtype=np.int64)
        cnorm = np.sqrt((cmat * cmat).sum(axis=1).astype(np.float64))
        keep = cnorm > 0.0  # zero-norm guard: never divide by a null cell
        cmat, cids, cnorm = cmat[keep], cids[keep], cnorm[keep]
    n_probes_eff = min(n_probes, len(cids))

    rank_schema = StructType(
        [
            StructField("vid", LongType(), False),
            StructField("cid", LongType(), False),
            StructField("crank", IntegerType(), False),
        ]
    )

    def assign_cells(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["qv"].to_numpy()).astype(np.int64)  # (B, dim)
            s = (m @ cmat.T).astype(np.float64) / cnorm  # (B, C)
            # stable argsort on -score tie-breaks by column index, and
            # columns are in ascending-cid order (TakeOrdered output) —
            # identical to ORDER BY cscore DESC, cid
            order = np.argsort(-s, axis=1, kind="stable")[:, :n_probes_eff]
            b = len(m)
            yield pd.DataFrame(
                {
                    "vid": np.repeat(pdf["vid"].to_numpy(), n_probes_eff),
                    "cid": cids[order].reshape(-1),
                    "crank": np.tile(
                        np.arange(1, n_probes_eff + 1, dtype=np.int32), b
                    ),
                }
            )

    ranked = qv.mapInPandas(assign_cells, rank_schema)
    assign = ranked.where(F.col("crank") == 1).select(
        F.col("vid").alias("neighbor_id"), "cid"
    )
    probes = ranked.where(F.col("crank") <= n_probes_eff).select(
        F.col("vid").alias("vec_id"), "cid"
    )

    # Blocked-GEMM verify: members group per (cell, chunk) — chunk count
    # derives from the average cell size so no single block row grows
    # with n — probers group per cell, and each (prober-block,
    # member-chunk) pair scores in one float64 matmul. A member belongs
    # to exactly one cell ⇒ (query, member) pairs are already unique.
    v = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    mem = assign.join(v, assign["neighbor_id"] == v["id"]).select(
        "cid", F.struct(v["id"].alias("mid"), "vec").alias("m")
    )
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil(F.count(F.lit(1)).over(Window.partitionBy("cid")) / F.lit(1024)),
    )
    mem = mem.withColumn(
        "chunk", F.pmod(F.xxhash64(F.col("m.mid")), n_chunks)
    )
    mem_blocks = mem.groupBy("cid", "chunk").agg(
        F.collect_list("m").alias("members")
    )
    prob = probes.join(v, probes["vec_id"] == v["id"]).select(
        "cid", F.struct(v["id"].alias("pid"), "vec").alias("p")
    )
    prob_blocks = prob.groupBy("cid").agg(F.collect_list("p").alias("probers"))
    grid = prob_blocks.join(mem_blocks, "cid")

    out_schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("neighbor_id", LongType(), False),
            StructField("score", DoubleType(), False),
        ]
    )
    kk = int(k)

    def cell_gemm(batches):
        for pdf in batches:
            frames = []
            for _, row in pdf.iterrows():
                pidv = np.array(
                    [p["pid"] for p in row["probers"]], dtype=np.int64
                )
                midv = np.array(
                    [m["mid"] for m in row["members"]], dtype=np.int64
                )
                pm = np.stack([np.asarray(p["vec"]) for p in row["probers"]])
                mm = np.stack([np.asarray(m["vec"]) for m in row["members"]])
                pn = np.linalg.norm(pm, axis=1)
                mn = np.linalg.norm(mm, axis=1)
                s = np.round((pm @ mm.T) / (pn[:, None] * mn[None, :]), 4)
                # per-prober top-k inside the chunk: (-score, neighbor_id)
                # lexsort matches ORDER BY score DESC, neighbor_id
                for i in range(len(pidv)):
                    mask = midv != pidv[i]
                    nb, sc = midv[mask], s[i, mask]
                    if not len(nb):
                        continue
                    top = np.lexsort((nb, -sc))[:kk]
                    frames.append(
                        pd.DataFrame(
                            {
                                "vec_id": np.full(len(top), pidv[i]),
                                "neighbor_id": nb[top],
                                "score": sc[top],
                            }
                        )
                    )
            yield (
                pd.concat(frames)
                if frames
                else pd.DataFrame(
                    {"vec_id": [], "neighbor_id": [], "score": []}
                ).astype(
                    {
                        "vec_id": "int64",
                        "neighbor_id": "int64",
                        "score": "float64",
                    }
                )
            )

    scored = grid.mapInPandas(cell_gemm, out_schema)
    w = Window.partitionBy("vec_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def md5_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic integer hyperplanes derived from md5 — the
    cross-engine-reproducible plane family.

    ``planes[p, d] = (int(md5(f"{seed}_{p}_{d}")[:15hex], 16) % 2001) - 1000``
    matches the DuckDB expression
    ``(('0x' || substr(md5(seed || '_' || p || '_' || d), 1, 15))::BIGINT
    % 2001) - 1000`` exactly, so an ANSI-SQL oracle can replay the
    bucketing bit for bit.
    """
    import hashlib

    out = np.empty((n_planes, dim), dtype=np.int64)
    for p in range(n_planes):
        for d in range(dim):
            h = int(
                hashlib.md5(f"{seed}_{p}_{d}".encode()).hexdigest()[:15], 16
            )
            out[p, d] = (h % 2001) - 1000
    return out


def lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    plane_family: str = "gaussian",
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector.

    The projection is a numpy matmul inside an Arrow-batched pandas UDF —
    the sanctioned Python path for embedding math (one matrix multiply per
    record batch, no per-row Python).

    ``plane_family="md5"`` uses :func:`md5_planes` and quantizes vector
    components to ``floor(v * 1000)`` so the sign decision is exact int64
    arithmetic — identical in numpy and in the SQL oracle, immune to
    float summation order. Gaussian planes remain the production default.
    """
    from pyspark.sql.functions import pandas_udf

    if plane_family == "md5":
        planes = md5_planes(dim, n_planes, seed)
    else:
        planes = np.random.RandomState(seed).randn(n_planes, dim)
    quantize = plane_family == "md5"

    @pandas_udf(LongType())
    def bucket_of(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        if quantize:
            m = np.floor(m.astype(np.float64) * 1000.0).astype(np.int64)
        bits = (m @ planes.T) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(bits.astype(np.int64) @ weights)

    v = F.col(vec_col).cast("array<double>") if quantize else F.col(vec_col)
    return df.select(
        F.col(id_col), v.alias(vec_col), bucket_of(v).alias("bucket")
    )


def lsh_buckets_multi(
    df: DataFrame,
    dim: int,
    n_planes: int,
    n_probes: int,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    plane_family: str = "gaussian",
) -> DataFrame:
    """All probes' buckets in ONE Arrow crossing:
    DataFrame[id, vec, probe, bucket].

    Plane sets for every probe stack into one (n_probes·n_planes, dim)
    matrix, so the whole multi-probe projection is a single matmul per
    record batch instead of ``n_probes`` separate pandas_udf evaluations
    each re-shipping the vectors over Arrow. Bucket values are identical
    to per-probe :func:`lsh_buckets` calls with seed ``seed + 1000·p``
    (same planes, same arithmetic) — the md5-family oracle replays them
    unchanged.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType

    if plane_family == "md5":
        planes = np.vstack(
            [md5_planes(dim, n_planes, seed + 1000 * p) for p in range(n_probes)]
        )
    else:
        planes = np.vstack(
            [
                np.random.RandomState(seed + 1000 * p).randn(n_planes, dim)
                for p in range(n_probes)
            ]
        )
    quantize = plane_family == "md5"
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def buckets_of(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        if quantize:
            m = np.floor(m.astype(np.float64) * 1000.0).astype(np.int64)
        bits = (m @ planes.T) > 0  # (batch, n_probes*n_planes)
        b3 = bits.reshape(len(m), n_probes, n_planes).astype(np.int64)
        return pd.Series(list(b3 @ weights))  # (batch, n_probes)

    v = F.col(vec_col).cast("array<double>") if quantize else F.col(vec_col)
    return df.select(
        F.col(id_col), v.alias(vec_col),
        F.posexplode(buckets_of(v)).alias("probe", "bucket"),
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
    plane_family: str = "gaussian",
) -> DataFrame:
    """Approximate top-k cosine neighbors via multi-probe hyperplane LSH.

    Each vector is bucketed under ``n_probes`` independent plane sets;
    candidates are pairs sharing any (probe, bucket) — a bucketed
    equi-join, never all-pairs. Exact cosine re-ranks the candidates.
    Recall grows with probes; cost stays ~O(n · bucket_size).
    """
    probed = lsh_buckets_multi(
        df, dim, n_planes, n_probes, seed, id_col, vec_col, plane_family
    )

    # Candidate generation exchanges ONLY (probe, bucket, id) rows and the
    # dedup only (id, id) pairs — vectors (dim doubles each) rejoin by id
    # for the scoring step. Shipping both vectors through the bucket join
    # and the pair dedup multiplied shuffle bytes by ~2·dim·8 per pair and
    # dominated wall clock on near-dup-heavy data (measured 87 s → 8 s at
    # sf1.0 with 10-clone clusters).
    a = probed.select(F.col(id_col).alias("vec_id"), "probe", "bucket")
    b = probed.select(F.col(id_col).alias("neighbor_id"), "probe", "bucket")
    cands = (
        a.join(b, ["probe", "bucket"])
        .where(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id")
        .dropDuplicates()
    )
    # md5 family scores the same array<double> cast the oracle replays
    vexpr = (
        F.col(vec_col).cast("array<double>")
        if plane_family == "md5"
        else F.col(vec_col)
    )
    v = with_norm(df.select(F.col(id_col), vexpr.alias(vec_col)), vec_col)
    va = v.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("va"),
        F.col("norm").alias("na"),
    )
    vb = v.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vb"),
        F.col("norm").alias("nb"),
    )
    scored = cands.join(va, "vec_id").join(vb, "neighbor_id").select(
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


def kmeans_lite(
    df: DataFrame,
    dim: int,
    n_centroids: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_centroids: np.ndarray | None = None,
) -> tuple[DataFrame, np.ndarray]:
    """Fixed-point Lloyd refinement of an IVF-style coarse quantizer →
    (assignments DataFrame[vec_id, cell], refined int64 centroid
    matrix).

    Everything is integer/fixed-point so the algorithm is bit-identical
    in any engine: vectors quantize to floor(x·1000) int64; assignment
    is argmax of int64-dot / float64 centroid norm (int sums are
    order-free, IEEE divide of identical operands is correctly rounded;
    ties → lowest cell index); the centroid update is the per-component
    FLOOR of sum/count (exact — no float accumulation across rows).
    INIT is the ``n_centroids`` smallest-id vectors (the same
    deterministic seed :func:`ivf_topk` uses); every Lloyd update then
    aggregates the FULL ``df``, not a sample. Pass ``init_centroids``
    (an int64 fixed-point C×dim matrix, e.g. a prior ``kmeans_lite``
    run's output) to skip the smallest-id init — with ``n_iter=1`` that
    is a pure assignment pass against a pre-trained model.

    Scale notes: the centroid state lives on the driver (≤ C × dim
    int64s — the "model" every k-means ships); each iteration is one
    Arrow GEMM assignment pass plus a (cell, component) aggregation
    whose shuffle is n·dim (long, long) rows. Production would train on
    a hash-sample (``hash_sample``) and assign the full corpus once —
    the operator takes whatever ``df`` you hand it.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    q = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * 1000).cast("long"),
    )
    qv = df.select(F.col(id_col).alias("vid"), q.alias("qv"))
    qv = qv.localCheckpoint(eager=False)

    if init_centroids is not None:
        cmat = np.asarray(init_centroids, dtype=np.int64).reshape(-1, dim)
    else:
        cent_rows = qv.orderBy("vid").limit(n_centroids).collect()
        cmat = np.array([r["qv"] for r in cent_rows], dtype=np.int64).reshape(
            len(cent_rows), dim
        )
    # zero-norm init vectors are excluded (cosine undefined); cell ids
    # are positions in the SURVIVING list, matching the oracle's
    # row_number over the id-ordered survivors
    cmat = cmat[(cmat * cmat).sum(axis=1) > 0]

    assign_schema = StructType(
        [
            StructField("vid", LongType(), False),
            StructField("cell", LongType(), False),
        ]
    )

    if not len(cmat):
        # every init vector was zero-norm: no valid quantizer exists —
        # degrade to an empty assignment like ivf_topk's sampled branch
        empty = df.sparkSession.createDataFrame([], assign_schema)
        return empty.select(F.col("vid").alias(id_col), "cell"), cmat

    assign = None
    for it in range(n_iter):
        cnorm = np.sqrt((cmat * cmat).sum(axis=1).astype(np.float64))
        c_t = cmat.T.copy()
        local_cnorm = cnorm

        def assign_cells(batches, _ct=c_t, _cn=local_cnorm):
            for pdf in batches:
                if not len(pdf):
                    continue
                v = np.array(list(pdf["qv"]), dtype=np.int64)
                scores = (v @ _ct).astype(np.float64) / _cn
                cell = np.argmax(scores, axis=1)  # first max = lowest idx
                yield pd.DataFrame(
                    {"vid": pdf["vid"].to_numpy(), "cell": cell.astype(np.int64)}
                )

        assign = qv.mapInPandas(assign_cells, assign_schema)
        if it == n_iter - 1:
            break
        # centroid update: per-(cell, component) int sums — exact, then
        # floor-divide on the driver. C*dim rows collected (bounded).
        upd = (
            assign.join(qv, "vid")
            .select("cell", F.posexplode("qv").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()
        )
        new = np.zeros_like(cmat)
        counts = np.zeros(len(cmat), dtype=np.int64)
        for r in upd:
            new[r["cell"], r["pos"]] = r["s"]
            counts[r["cell"]] = r["c"]
        occupied = counts > 0
        upd_mat = np.zeros_like(cmat)
        upd_mat[occupied] = np.floor_divide(
            new[occupied], counts[occupied, None]
        )
        # empty cells keep their old centroid; zero-norm updates would
        # break the cosine — keep old centroid for those too
        nz = (upd_mat * upd_mat).sum(axis=1) > 0
        take = occupied & nz
        cmat = np.where(take[:, None], upd_mat, cmat)

    return assign.select(F.col("vid").alias(id_col), "cell"), cmat


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Per-vector symmetric int8 quantization report →
    DataFrame[id, scale, mean_abs_err].

    scale = max|x|; q_i = floor(x_i/scale·127) ∈ [-127, 127];
    reconstruction x̂_i = q_i·scale/127. At 100 TB this is the 4×
    shuffle/storage lever for vector pipelines (int8 + one float scale
    per vector instead of float32s); the operator reports the scale and
    the mean absolute reconstruction error so a pipeline can gate on
    quality before switching its ANN stages to the quantized column.

    Every step is floor/abs/multiply in IEEE doubles over the SAME
    element order in both engines (list folds are sequential), so the
    SQL oracle matches bit for bit — no round-half-to-even hazards.
    Zero vectors (scale 0) report zero error.
    """
    # scale is staged as a COLUMN before the per-element lambdas use it:
    # inlining the array_max subexpression into a transform lambda makes
    # Spark's interpreted higher-order functions re-evaluate it per
    # element — O(dim²) work per row (measured 7 s vs 0.4 s at sf1.0)
    staged = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__e")
    ).withColumn(
        "__scale",
        F.array_max(F.transform(F.col("__e"), lambda x: F.abs(x))),
    )
    sc = F.col("__scale")
    deq = F.transform(
        F.col("__e"),
        lambda x: F.floor(x / sc * 127).cast("long").cast("double") * sc / 127,
    )
    err_sum = F.aggregate(
        F.zip_with(F.col("__e"), deq, lambda a, b: F.abs(a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    mean_err = F.when(
        sc > 0, F.round(err_sum / F.size(F.col("__e")), round_digits)
    ).otherwise(F.lit(0.0))
    return staged.select(
        F.col(id_col),
        F.round(sc, round_digits).alias("scale"),
        mean_err.alias("mean_abs_err"),
    )


def pq_codebooks(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> np.ndarray:
    """Deterministic product-quantization codebooks → int64 array of
    shape (m, ksub, dim/m).

    Vectors fix to floor(x·scale) int64 and split into ``m`` subspaces;
    each subspace's codebook is the subvectors of the ``ksub``
    smallest-id vectors (cell = id rank) — the same deterministic seed
    device as :func:`kmeans_lite`/:func:`ivf_topk`, chosen over Lloyd
    refinement here so the WHOLE PQ pipeline stays replayable by a
    non-iterative SQL oracle. The codebook is the model: m·ksub·dsub
    int64s on the driver (KBs), broadcast into the encode pass.
    """
    rows = (
        df.select(id_col, F.col(vec_col).cast("array<double>").alias("e"))
        .where(F.col(vec_col).isNotNull())
        .orderBy(id_col)
        .limit(ksub)
        .collect()
    )
    if not rows:
        raise ValueError("pq_codebooks: empty input")
    dim = len(rows[0]["e"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    mat = np.floor(np.array([r["e"] for r in rows], dtype=np.float64) * scale).astype(
        np.int64
    )
    return np.stack([mat[:, s * (dim // m) : (s + 1) * (dim // m)] for s in range(m)])


def pq_encode(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """Product-quantization encode → DataFrame[id, codes, total_sqdist].

    Each vector compresses to ``m`` cell indices (argmin int64 L2 per
    subspace, ties → lowest cell) — 64 float32s become m bytes, the
    memory lever that makes billion-scale ANN fit in RAM (Jégou et al.,
    TPAMI'11 structure; arithmetic all-integer here so the SQL oracle
    replays it exactly). ``codes`` is the dash-joined cell string;
    ``total_sqdist`` the exact int64 quantization error.

    Scale: codebooks ride the closure (KBs); ONE Arrow pass computes
    all m argmins batch-GEMM-style; no shuffle at all.
    """
    cb = pq_codebooks(df, m, ksub, id_col, vec_col, scale) if codebooks is None else codebooks
    dsub = cb.shape[2]

    def _enc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            arr = np.floor(
                np.stack(pdf["e"].to_numpy()).astype(np.float64) * scale
            ).astype(np.int64)
            total = np.zeros(len(pdf), dtype=np.int64)
            codes = np.empty((len(pdf), cb.shape[0]), dtype=np.int64)
            for s in range(cb.shape[0]):
                sub = arr[:, s * dsub : (s + 1) * dsub]
                d2 = ((sub[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = np.argmin(d2, axis=1)
                total += d2[np.arange(len(pdf)), codes[:, s]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "codes": ["-".join(map(str, c)) for c in codes],
                    "total_sqdist": total,
                }
            )

    src = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("e"),
    ).where(F.col("e").isNotNull())
    # the id keeps its real type (string doc keys etc.) — hardcoding
    # long here would fail the Arrow conversion for non-bigint ids
    id_type = df.schema[id_col].dataType.simpleString()
    out = src.mapInPandas(_enc, f"id {id_type}, codes string, total_sqdist long")
    return out.select(
        F.col("id").alias(id_col), "codes", "total_sqdist"
    )


def pq_topk(
    df: DataFrame,
    k: int = 20,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k against the min-id query vector
    → DataFrame[id, adc_sqdist] (k rows, ascending distance, ties by
    id).

    The search half of PQ-ANN: the query stays EXACT while every
    database vector is represented by its m codes, so per-row distance
    is m table lookups into the precomputed (m × ksub) query-to-cell
    distance table — no vector arithmetic in the scan. At 100 TB the
    scan reads m-byte codes instead of 256-byte vectors; here the
    lookup happens in the same Arrow pass that encodes, keeping the
    whole operator one shuffle-free scan + a global top-k.
    """
    cb = pq_codebooks(df, m, ksub, id_col, vec_col, scale)
    dsub = cb.shape[2]
    qrow = (
        df.select(F.col(vec_col).cast("array<double>").alias("e"))
        .where(F.col(vec_col).isNotNull())
        .orderBy(F.col(id_col))
        .limit(1)
        .collect()
    )
    q = np.floor(np.array(qrow[0]["e"], dtype=np.float64) * scale).astype(np.int64)
    # dtable[s, j] = ||q_s - c_{s,j}||^2, exact int64
    dtable = np.stack(
        [((cb[s] - q[s * dsub : (s + 1) * dsub][None, :]) ** 2).sum(axis=1) for s in range(cb.shape[0])]
    )

    def _score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            arr = np.floor(
                np.stack(pdf["e"].to_numpy()).astype(np.float64) * scale
            ).astype(np.int64)
            score = np.zeros(len(pdf), dtype=np.int64)
            for s in range(cb.shape[0]):
                sub = arr[:, s * dsub : (s + 1) * dsub]
                d2 = ((sub[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
                score += dtable[s][np.argmin(d2, axis=1)]
            yield pd.DataFrame({"id": pdf["id"].to_numpy(), "adc_sqdist": score})

    src = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("e"),
    ).where(F.col("e").isNotNull())
    id_type = df.schema[id_col].dataType.simpleString()
    scored = src.mapInPandas(_score, f"id {id_type}, adc_sqdist long")
    return (
        scored.orderBy(F.col("adc_sqdist"), F.col("id"))
        .limit(k)
        .select(F.col("id").alias(id_col), "adc_sqdist")
    )


def pq_codebooks_trained(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> np.ndarray:
    """K-means-refined PQ codebooks → int64 array (m, ksub, dim/m).

    The trained sibling of :func:`pq_codebooks`: per subspace, Lloyd
    iterations via :func:`kmeans_lite` (same fixed-point arithmetic and
    min-id seeding, so the refinement is deterministic) instead of raw
    min-id seeds — lower quantization error at the cost of m × n_iter
    extra assignment passes. Production trains on a
    :func:`reflexiv_spark.datapipe.sampling.hash_sample` of the corpus
    and encodes everything with the resulting codebooks (pass them to
    ``pq_encode(..., codebooks=...)``).
    """
    head = (
        df.select(F.size(F.col(vec_col)).alias("d"))
        .where(F.col(vec_col).isNotNull())
        .limit(1)
        .collect()
    )
    if not head:
        raise ValueError("pq_codebooks_trained: empty input")
    dim = head[0]["d"]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    mats = []
    for s in range(m):
        sub = df.where(F.col(vec_col).isNotNull()).select(
            id_col,
            F.slice(
                F.col(vec_col).cast("array<double>"), s * dsub + 1, dsub
            ).alias("embedding"),
        )
        _, cmat = kmeans_lite(
            sub, dim=dsub, n_centroids=ksub, n_iter=n_iter, id_col=id_col
        )
        if cmat.shape[0] < ksub:  # zero-norm seeds excluded — pad stable
            pad = np.repeat(cmat[:1], ksub - cmat.shape[0], axis=0)
            cmat = np.concatenate([cmat, pad])
        mats.append(cmat.astype(np.int64))
    return np.stack(mats)


def ann_ivfpq(
    df: DataFrame,
    k: int = 20,
    m: int = 8,
    ksub: int = 16,
    n_probes: int = 4,
    dim: int = 64,
    n_centroids: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    centroids: np.ndarray | None = None,
    query: "np.ndarray | list | None" = None,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """IVF-PQ with asymmetric-distance search → the ``k`` best rows as
    DataFrame[id, cell, adc_sqdist] (ascending ADC distance, ties by
    id) against ``query`` (a raw float vector, quantized with the same
    floor(x·scale) device) — default: the min-id corpus vector, the
    deterministic choice the SQL oracle replays.

    ``codebooks``: optional pre-trained residual codebooks, an int64
    array (m, ksub', dim/m) in the SAME fixed-point units — e.g. from
    :func:`pq_residual_codebooks_trained`, or an external trainer.
    Default: the residual subvectors of the ``ksub`` smallest-id
    vectors (non-iterative, oracle-replayable).

    The production ANN index shape (Jégou et al., TPAMI'11; what FAISS
    ships as ``IVFx,PQy``), composed from parts this family already
    proves out one by one: a :func:`kmeans_lite` coarse quantizer
    prunes the scan to ``n_probes`` inverted lists (``ann_ivf``'s
    device), and within each list vectors are stored as ``m``-code
    product quantizations of their RESIDUAL to the list's centroid —
    residual PQ carries far more precision per byte than flat PQ
    (``pq_encode``'s device) because the coarse step has already
    removed the centroid's share of the variance. Search never touches
    a full vector: per probed cell, the query's residual yields an
    (m × ksub) exact-int64 distance table, and each member's ADC score
    is ``m`` table lookups on its codes.

    At 100 TB neither flat PQ (no pruning — every query scans all
    codes) nor IVF-flat (full vectors resident in the cells) is what
    ships; IVF-PQ reads ``n_probes/C`` of the corpus at ``m`` bytes
    per vector. Here the coarse model and codebooks are driver-sized
    (C×dim + m×ksub×dim/m int64s), the encode+score pass is ONE Arrow
    ``mapInPandas`` over the probed cells' members (cell filter pushed
    below the Python crossing), and the global top-k compiles to
    TakeOrdered — no shuffle anywhere but the kmeans assignment's.

    Determinism (oracle-replayable): vectors fix to floor(x·scale)
    int64; the coarse quantizer is the fixed-point :func:`kmeans_lite`
    (or a pre-trained ``centroids`` matrix); residuals are exact int64
    differences; codebook ``s`` is the residual subvectors of the
    ``ksub`` smallest-id vectors (the same min-id seed device as
    :func:`pq_codebooks` — non-iterative, so the whole index build
    replays in ANSI SQL); encode argmin and ADC sums are exact int64
    with ties to the lowest code. Probed cells rank by the assignment
    metric (int dot / exact centroid norm, DESC, ties to the lower
    cell id).
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    assign, cmat = kmeans_lite(
        df, dim=dim, n_centroids=n_centroids,
        n_iter=1 if centroids is not None else n_iter,
        id_col=id_col, vec_col=vec_col, init_centroids=centroids,
    )
    if not len(cmat):
        raise ValueError("ann_ivfpq: no non-zero-norm quantizer seeds")
    q = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * scale).cast("long"),
    )
    qv = df.select(F.col(id_col).cast("long").alias("__vid"), q.alias("__qv"))
    members = assign.select(
        F.col(id_col).cast("long").alias("__vid"), "cell"
    ).join(qv, "__vid")

    # --- driver-side model: codebooks, probe list, distance tables ---
    # (each collect is model- or ksub-sized; the corpus never lands on
    # the driver)
    seed_rows = members.orderBy("__vid").limit(int(ksub)).collect()
    if not seed_rows:
        spark = df.sparkSession
        return spark.createDataFrame(
            [], "vec_id long, cell long, adc_sqdist long"
        ).select(
            F.col("vec_id").alias(id_col), "cell", "adc_sqdist"
        )
    if codebooks is not None:
        cb = np.asarray(codebooks, dtype=np.int64)
        if cb.ndim != 3 or cb.shape[0] != m or cb.shape[2] != dsub:
            raise ValueError(
                f"codebooks shape {cb.shape} != ({m}, ksub, {dsub})"
            )
    else:
        seeds = np.array([r["__qv"] for r in seed_rows], dtype=np.int64)
        seed_cells = np.array(
            [r["cell"] for r in seed_rows], dtype=np.int64
        )
        seed_res = seeds - cmat[seed_cells]
        # cb[s]: (ksub_eff, dsub) — residual subvectors, code order =
        # id rank
        cb = np.stack(
            [seed_res[:, s * dsub : (s + 1) * dsub] for s in range(m)]
        )

    if query is not None:
        qvec = np.floor(
            np.asarray(query, dtype=np.float64) * scale
        ).astype(np.int64)
        if qvec.shape != (dim,):
            raise ValueError(f"query shape {qvec.shape} != ({dim},)")
    else:
        # min-id vector is the query (pq_topk's device — deterministic,
        # oracle-replayable)
        qvec = np.array(seed_rows[0]["__qv"], dtype=np.int64)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1).astype(np.float64))
    scores = (qvec @ cmat.T).astype(np.float64) / cnorm
    # (score DESC, cell ASC): lexsort's last key is primary
    order = np.lexsort((np.arange(len(cmat)), -scores))
    probe_cells = np.sort(order[: min(int(n_probes), len(cmat))])
    # dt[c, s, j] = ||(q - centroid_c)_s - cb[s, j]||², exact int64 —
    # built for probed cells only (others never scored)
    dt = np.zeros((len(cmat), m, cb.shape[1]), dtype=np.int64)
    for c in probe_cells:
        qres = qvec - cmat[c]
        for s in range(m):
            diff = qres[s * dsub : (s + 1) * dsub][None, :] - cb[s]
            dt[c, s] = (diff * diff).sum(axis=1)

    probe_set = [int(c) for c in probe_cells]
    local_cmat, local_dt, local_cb = cmat, dt, cb

    def _score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array(list(pdf["__qv"]), dtype=np.int64)
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            res = v - local_cmat[cells]
            adc = np.zeros(len(pdf), dtype=np.int64)
            for s in range(m):
                sub = res[:, s * dsub : (s + 1) * dsub]
                d2 = ((sub[:, None, :] - local_cb[s][None, :, :]) ** 2).sum(
                    axis=2
                )
                codes = np.argmin(d2, axis=1)  # first min = lowest code
                adc += local_dt[cells, s, codes]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["__vid"].to_numpy(),
                    "cell": cells,
                    "adc_sqdist": adc,
                }
            )

    scored = (
        members.where(F.col("cell").isin(probe_set))
        .mapInPandas(_score, "vec_id long, cell long, adc_sqdist long")
    )
    return (
        scored.orderBy("adc_sqdist", "vec_id")
        .limit(int(k))
        .select(F.col("vec_id").alias(id_col), "cell", "adc_sqdist")
    )


def ivfpq_residuals(
    df: DataFrame,
    dim: int = 64,
    n_centroids: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Exact coarse-quantizer residuals → DataFrame[id, cell,
    residual: array<bigint>] (residual = floor(x·scale) − centroid,
    component-wise int64).

    The training feed for production residual codebooks: run this on a
    :func:`reflexiv_spark.datapipe.sampling.hash_sample` of the corpus,
    train per-subspace codebooks on ``residual/scale`` (e.g. with
    :func:`pq_codebooks_trained`), and hand the result to
    ``ann_ivfpq(codebooks=..., centroids=...)`` — the same
    train-on-sample / encode-everything split every billion-scale PQ
    deployment runs. Also the diagnostics surface (residual-norm
    distributions per cell tell you when the coarse model is stale).
    The centroid table broadcast-joins; nothing data-sized reaches the
    driver.
    """
    assign, cmat = kmeans_lite(
        df, dim=dim, n_centroids=n_centroids,
        n_iter=1 if centroids is not None else n_iter,
        id_col=id_col, vec_col=vec_col, init_centroids=centroids,
    )
    if not len(cmat):
        raise ValueError("ivfpq_residuals: no non-zero-norm quantizer seeds")
    spark = df.sparkSession
    cent = spark.createDataFrame(
        [(i, [int(v) for v in row]) for i, row in enumerate(cmat)],
        "cell bigint, __cq array<bigint>",
    )
    q = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * scale).cast("long"),
    )
    qv = df.select(F.col(id_col).alias("__id"), q.alias("__qv"))
    members = assign.select(
        F.col(id_col).alias("__id"), "cell"
    ).join(qv, "__id")
    return members.join(F.broadcast(cent), "cell").select(
        F.col("__id").alias(id_col),
        "cell",
        F.zip_with(
            "__qv", "__cq", lambda x, c: x - c
        ).alias("residual"),
    )
