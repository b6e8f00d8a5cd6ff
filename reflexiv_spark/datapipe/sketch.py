"""Frequency sketches: count-min sketch build / point estimates, and the
two-pass heavy-hitters operator built on them.

At 100 TB an exact ``groupBy(key).count()`` over a heavy-tailed key
column (tokens, shingles, URLs) shuffles every distinct key; a count-min
sketch is a fixed ``depth × width`` grid of counters that aggregates
with ONE map-side-combinable shuffle of at most depth×width rows and
answers point queries with the min over ``depth`` cells. Estimates
never under-count (each cell only adds colliding keys), so a CMS
threshold scan yields a candidate superset of the true heavy hitters —
:func:`heavy_hitters` then verifies candidates exactly, touching only
rows whose key survived the prune. The construction is deterministic
per hash family, so with ``hash_family="md5"`` a SQL oracle rebuilds
the sketch bit for bit (the same md5-long device as the MinHash/SimHash
oracles in :mod:`reflexiv_spark.datapipe.dedup`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from reflexiv_spark.datapipe.dedup import md5_long


def _row_hash(col, d: int, hash_family: str):
    c = F.col(col) if isinstance(col, str) else col
    if hash_family == "md5":
        return md5_long(F.concat(c.cast("string"), F.lit(f"#{d}")))
    return F.xxhash64(c, F.lit(d))


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Build a CMS over ``key_col`` → DataFrame[d, w, cnt] (≤ depth×width
    rows). One shuffle: the per-key fan-out to ``depth`` (d, bucket)
    cells happens map-side inside the partial aggregation."""
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(_row_hash(key_col, d, hash_family), F.lit(width)).alias("w"),
            )
            for d in range(depth)
        ]
    )
    wt = F.lit(1).cast("long") if weight_col is None else F.col(weight_col).cast("long")
    return (
        df.select(F.explode(cells).alias("c"), wt.alias("__wt"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.w").alias("w"))
        .agg(F.sum("__wt").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    hash_family: str = "xxhash64",
    out_col: str = "est",
) -> DataFrame:
    """Point estimates for every probe key: min over the key's ``depth``
    cells. The sketch side is ≤ depth×width rows — always broadcast."""
    keyed = probes.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(
                            _row_hash(key_col, d, hash_family), F.lit(width)
                        ).alias("w"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.d").alias("d"), F.col("c.w").alias("w"))
    return (
        keyed.join(F.broadcast(cms), ["d", "w"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias(out_col))
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_count: int,
    depth: int = 4,
    width: int = 1024,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Exact keys with frequency ≥ ``min_count`` — DataFrame[key, cnt] —
    via CMS prune + exact verify.

    CMS never under-estimates, so pruning on the estimate keeps every
    true heavy hitter (no false negatives); the exact count over the
    surviving rows removes collision-inflated false positives. The
    expensive exact aggregation runs only on rows whose key passed the
    broadcast sketch filter — on a Zipf corpus that is a tiny fraction
    of the distinct-key mass.
    """
    cms = count_min_sketch(df, key_col, depth, width, hash_family=hash_family)
    # per-row estimate: min over the row's depth cells, via broadcast join
    keyed = df.select(key_col).select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(
                            _row_hash(key_col, d, hash_family), F.lit(width)
                        ).alias("w"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.d").alias("d"), F.col("c.w").alias("w"))
    est = (
        keyed.join(F.broadcast(cms), ["d", "w"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("__est"))
        .where(F.col("__est") >= min_count)
        .select(key_col)
    )
    # candidate set size depends on min_count vs the key distribution —
    # leave the join strategy to Catalyst/AQE (it broadcasts when small)
    return (
        df.join(est, key_col)
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )


def kmv_minima(
    df: DataFrame,
    key_col,
    k: int = 256,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """The k smallest DISTINCT hash values of ``key_col`` →
    DataFrame[h: long] (≤ k rows, sorted ascending).

    The result is a pure function of the key SET — plan- and
    partitioning-invariant — which is what makes the estimator
    oracle-able. The plan is one pass: an Arrow-batched per-partition
    distinct-minima fold (each partition emits ≤ k longs, numpy
    ``unique`` per batch with a carried merge), then a trivial global
    merge of ≤ k × n_partitions rows. Nothing shuffles O(n) or O(NDV)
    rows — the whole point vs ``count_distinct`` at 100 TB, and the
    sketch is mergeable across corpora by construction (union the
    minima, re-take the k smallest).
    """
    import numpy as np
    import pandas as pd

    c = F.col(key_col) if isinstance(key_col, str) else key_col
    if hash_family == "md5":
        h = md5_long(c.cast("string"))
    else:
        h = F.xxhash64(c)
    hs = df.select(h.alias("h")).where(F.col("h").isNotNull())

    def _part_minima(batches):
        carry = None
        for pdf in batches:
            u = np.unique(pdf["h"].to_numpy())
            carry = u if carry is None else np.unique(np.concatenate([carry, u]))
            carry = carry[:k]
        if carry is not None and len(carry):
            yield pd.DataFrame({"h": carry})

    part = hs.mapInPandas(_part_minima, "h long")
    return part.distinct().orderBy("h").limit(k)


def kmv_distinct(
    df: DataFrame,
    key_col,
    k: int = 256,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count estimate → one row
    [k, n_mins, kth_hash, est_ndv].

    Estimator: with hashes uniform on [0, 1), the kth smallest value
    u_k among n distinct keys concentrates around k/n, so
    ``est = (k-1) / u_k`` (the classic unbiased KMV form). If fewer
    than k distinct hashes exist the sketch has seen every key and the
    count is exact. Deterministic per hash family: md5 runs bit-equal
    in the SQL oracle; production keeps xxhash64 (same arithmetic on
    the sign-shifted 64-bit range).
    """
    mins = kmv_minima(df, key_col, k, hash_family)
    if hash_family == "md5":
        # md5_long is 60 bits: u = (h + 1) / 2^60
        est = (F.lit(float(k - 1)) * F.lit(float(1 << 60))) / (
            F.col("kth_hash").cast("double") + F.lit(1.0)
        )
    else:
        # xxhash64 is signed 64-bit: u = (h + 2^63 + 1) / 2^64
        est = (F.lit(float(k - 1)) * F.lit(float(1 << 64))) / (
            F.col("kth_hash").cast("double") + F.lit(float(1 << 63)) + F.lit(1.0)
        )
    return (
        mins.agg(
            F.max("h").alias("kth_hash"), F.count(F.lit(1)).alias("n_mins")
        )
        .select(
            F.lit(k).cast("bigint").alias("k"),
            F.col("n_mins").cast("bigint").alias("n_mins"),
            "kth_hash",
            F.when(F.col("n_mins") < k, F.col("n_mins").cast("double"))
            .otherwise(F.floor(est).cast("double"))
            .cast("bigint")
            .alias("est_ndv"),
        )
    )


def kmv_distinct_by(
    df: DataFrame,
    key_col,
    group_col: str,
    k: int = 256,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Per-group KMV distinct-count estimates →
    DataFrame[group, k, n_mins, kth_hash, est_ndv].

    Same estimator as :func:`kmv_distinct`, sharded by ``group_col``.
    Scale shape: one Arrow pass folds each PARTITION to ≤ k minima per
    group it contains (state: groups-in-partition × k longs), then a
    per-group merge over ≤ k × n_partitions rows — grouped NDV without
    an O(NDV) shuffle and without ever collecting a group's full hash
    set anywhere. The per-group minima set is plan-invariant, so the
    SQL oracle replays it with a ranked DISTINCT per group.
    """
    import numpy as np
    import pandas as pd

    c = F.col(key_col) if isinstance(key_col, str) else key_col
    if hash_family == "md5":
        h = md5_long(c.cast("string"))
    else:
        h = F.xxhash64(c)
    hs = df.select(
        F.col(group_col).alias("g"), h.alias("h")
    ).where(F.col("h").isNotNull() & F.col("g").isNotNull())
    # the group column keeps its real type (bigint user ids etc.) —
    # hardcoding string here would coerce it at the Arrow boundary
    g_type = df.schema[group_col].dataType.simpleString()

    def _part_minima(batches):
        carry: dict = {}
        for pdf in batches:
            for g, sub in pdf.groupby("g", sort=False):
                u = np.unique(sub["h"].to_numpy())
                prev = carry.get(g)
                merged = u if prev is None else np.unique(np.concatenate([prev, u]))
                carry[g] = merged[:k]
        if carry:
            yield pd.DataFrame(
                {
                    "g": np.repeat(
                        np.array(list(carry.keys()), dtype=object),
                        [len(v) for v in carry.values()],
                    ),
                    "h": np.concatenate(list(carry.values())),
                }
            )

    part = hs.mapInPandas(_part_minima, f"g {g_type}, h long")
    merged = (
        part.dropDuplicates(["g", "h"])
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("g").orderBy("h")
            ),
        )
        .where(F.col("__rk") <= k)
    )
    if hash_family == "md5":
        est = (F.lit(float(k - 1)) * F.lit(float(1 << 60))) / (
            F.col("kth_hash").cast("double") + F.lit(1.0)
        )
    else:
        est = (F.lit(float(k - 1)) * F.lit(float(1 << 64))) / (
            F.col("kth_hash").cast("double") + F.lit(float(1 << 63)) + F.lit(1.0)
        )
    return (
        merged.groupBy(F.col("g").alias(group_col))
        .agg(F.max("h").alias("kth_hash"), F.count(F.lit(1)).alias("n_mins"))
        .select(
            group_col,
            F.lit(k).cast("bigint").alias("k"),
            F.col("n_mins").cast("bigint").alias("n_mins"),
            "kth_hash",
            F.when(F.col("n_mins") < k, F.col("n_mins").cast("double"))
            .otherwise(F.floor(est).cast("double"))
            .cast("bigint")
            .alias("est_ndv"),
        )
    )


def hll_registers(
    df: DataFrame,
    key_col,
    p: int = 8,
    hash_family: str = "xxhash64",
    group_col: str | None = None,
) -> DataFrame:
    """HyperLogLog register table over ``key_col`` →
    DataFrame[(group,) bucket, rho] with ≤ 2**p rows per group.

    The 60-bit row hash splits into ``bucket = h mod m`` and a 30-bit
    witness ``w``; ``rho`` is the position of w's highest set bit from
    the top (w = 0 → 31). Everything is integer arithmetic (the msb
    comes from the length of ``bin(w)`` with leading zeros stripped),
    so the md5 family replays bit-for-bit in an ANSI-SQL oracle — the
    same determinism device as the KMV/CMS sketches above.

    Scale: ONE map-side-combinable shuffle of ≤ m rows per group
    (``groupBy(bucket).max(rho)`` partial-aggregates in the scan
    stage); registers merge across corpora with another max — the
    textbook mergeable-sketch shape for 100 TB NDV.
    """
    m = 1 << p
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    if hash_family == "md5":
        h = md5_long(c.cast("string"))
    else:
        h = F.pmod(F.xxhash64(c), F.lit(1 << 60))
    # witness = h >> p, a bit shift, NOT `(h - h%m)/m`: Spark's `/` on
    # bigints divides in doubles, and for p <= 6 the 60-bit numerator
    # exceeds 2^53 and rounds BEFORE the divide — ~25% wrong witnesses
    # at p=6 (caught by test_hll_witness_matches_integer_replay). The
    # shift is exact at every p and equals the oracle's integer `//`.
    w = F.pmod(F.shiftright(F.col("__h"), p), F.lit(1 << 30))
    keys = [group_col] if group_col else []
    base = df.where(c.isNotNull()).select(*keys, h.alias("__h"))
    if group_col:
        base = base.where(F.col(group_col).isNotNull())
    return (
        base.withColumn("__w", w.cast("bigint"))
        .select(
            *keys,
            F.pmod("__h", F.lit(m)).alias("bucket"),
            (
                F.lit(31)
                - F.length(F.regexp_replace(F.bin("__w"), "^0+", ""))
            ).alias("rho"),
        )
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_distinct_by(
    df: DataFrame,
    key_col,
    group_col: str,
    p: int = 8,
    hash_family: str = "xxhash64",
    correction: bool = False,
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate →
    DataFrame[group, n_buckets, est_ndv].

    Uses the raw HLL estimator ``alpha_m * m^2 / sum(2^-rho)`` (absent
    buckets contribute 2^0): deliberately NO small-range ln()
    correction, so every arithmetic step is either exact (the harmonic
    sum is a sum of dyadic rationals — exact in a double) or a single
    IEEE multiply/divide that any engine reproduces bit-for-bit; the
    estimate is rounded to 3 decimals. Known +bias below ~2.5m distinct
    keys — use :func:`kmv_distinct_by` when small groups need accuracy;
    HLL's win is the fixed 2**p-register footprint and lossless merges.
    """
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    regs = hll_registers(df, key_col, p, hash_family, group_col=group_col)
    denom = F.sum(F.pow(F.lit(0.5), F.col("rho"))) + (
        F.lit(m) - F.count(F.lit(1))
    ).cast("double")
    raw = F.lit(alpha * m * m) / denom
    if correction:
        # Flajolet et al.'s linear-counting branch: below 2.5m the raw
        # estimator over-counts; when empty buckets V exist, m·ln(m/V)
        # is the better estimate. Off by default because ln() is
        # libm-dependent — the bit-exact oracle replays the raw form.
        v = (F.lit(m) - F.count(F.lit(1))).cast("double")
        est = F.when(
            (raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
        ).otherwise(raw)
    else:
        est = raw
    return (
        regs.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.round(est, 3).alias("est_ndv"),
        )
    )
