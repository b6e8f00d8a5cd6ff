"""Deterministic sampling and corpus mixing for training-data curation.

Random sampling at 100 TB must be REPRODUCIBLE: re-running the pipeline
(or re-executing a failed partition) has to keep exactly the same rows,
independent of partitioning, task order, or cluster size. RNG-based
``df.sample`` cannot promise that across re-layouts; hash-gating can —
a row is kept iff ``hash(id) mod D < rate·D``, a pure function of the
row itself. The md5 family makes every operator here bit-replayable by
an ANSI-SQL oracle (same device as the dedup/sketch oracles).

``mix_corpora`` composes hash-gates into the standard
training-mixture shape: per-source sampling rates (relative weights),
one union, provenance column kept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.datapipe.dedup import md5_long

_DENOM = 1_000_000  # rate granularity: 1e-6


def _gate(id_col: str, rate: float, salt: str, hash_family: str):
    """Deterministic keep-predicate: hash(id, salt) lands in the first
    ``rate`` fraction of the 1e6-bucket ring."""
    c = F.col(id_col).cast("string")
    if hash_family == "md5":
        h = md5_long(F.concat(c, F.lit(f"|{salt}")))
    else:
        h = F.xxhash64(c, F.lit(salt))
    return F.pmod(h, F.lit(_DENOM)) < int(round(rate * _DENOM))


def hash_sample(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    salt: str = "s0",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows, keyed by id.

    Shuffle-free (a filter), stable under any re-partitioning, and
    different ``salt`` values draw independent samples — the standard
    train/validation split device (salt "train"/"val" with
    complementary gates never overlaps when rates sum ≤ 1 on the same
    salt).
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return df.where(_gate(id_col, rate, salt, hash_family))


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    salt: str = "s0",
    default_rate: float = 0.0,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downweight one language,
    keep all of another). ``rates`` maps stratum value → keep rate;
    unlisted strata get ``default_rate``."""
    for value, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {value!r} must be in [0, 1]")
    expr = F.lit(int(round(default_rate * _DENOM)))
    for value, rate in rates.items():
        expr = F.when(
            F.col(strata_col) == value, F.lit(int(round(rate * _DENOM)))
        ).otherwise(expr)
    c = F.col(id_col).cast("string")
    if hash_family == "md5":
        h = md5_long(F.concat(c, F.lit(f"|{salt}")))
    else:
        h = F.xxhash64(c, F.lit(salt))
    return df.where(F.pmod(h, F.lit(_DENOM)) < expr)


def mix_corpora(
    sources: list[tuple[DataFrame, float]],
    id_col: str = "doc_id",
    salt: str = "mix",
    source_col: str = "source",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Deterministic training mixture: each (df, rate) source is
    hash-sampled at its rate and unioned with a provenance column.

    Rates are absolute keep-fractions per source (compute them from
    target token budgets upstream). Columns are aligned by name
    (``unionByName``); every source must share the schema.
    """
    if not sources:
        raise ValueError("mix_corpora needs at least one (df, rate) source")
    parts = []
    for idx, (df, rate) in enumerate(sources):
        parts.append(
            hash_sample(df, rate, id_col, f"{salt}#{idx}", hash_family)
            .withColumn(source_col, F.lit(idx))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def stratified_split(
    df: DataFrame,
    fractions: tuple[tuple[str, float], ...] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "split",
    hash_family: str = "xxhash64",
    n_bins: int = 65536,
) -> DataFrame:
    """EXACT-proportion train/val/test assignment per stratum
    (``floor(cum_fraction · n)`` rows each), deterministic and
    re-layout-stable: rows are ranked inside their stratum by
    ``(hash(id, salt), id)`` and cut at the exact thresholds.

    Unlike :func:`hash_sample` (approximate proportions, zero
    coordination) this guarantees the split SIZES — what a training run
    wants for a fixed-budget eval set.

    Scale design: the global per-stratum rank is NEVER computed with one
    stratum-wide window (a 100 TB stratum would serialize into one sort
    partition). Instead the hash space is histogrammed into ``n_bins``
    prefix bins: per-(stratum, bin) counts cumulate in a tiny
    O(strata × bins) window, and each row's rank is
    ``cum_before_bin + rank_within_bin`` — the within-bin window
    partitions on (stratum, bin), bounding any sort partition to
    ~n/n_bins rows (tune ``n_bins`` up for bigger corpora). Ordering by
    (bin, h, id) equals ordering by (h, id) because the bin is the
    hash's top bits — the SQL-oracle twin can use the plain
    window-rank formulation and match bit for bit.

    Returns ``(id, stratum, split)``.
    """
    if not fractions:
        raise ValueError("fractions must be a non-empty sequence")
    for name, frac in fractions:
        if frac < 0:
            raise ValueError(f"fraction for {name!r} must be >= 0, got {frac}")
    total = sum(frac for _, frac in fractions)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"fractions must sum to 1 (got {total!r}); otherwise the last "
            "split silently absorbs the unassigned remainder"
        )
    c = F.col(id_col).cast("string")
    if hash_family == "md5":
        raw = md5_long(F.concat(c, F.lit(f"|{salt}")))
    else:
        raw = F.xxhash64(c, F.lit(salt))
    h = F.pmod(raw, F.lit(1 << 60))
    if n_bins & (n_bins - 1):
        raise ValueError("n_bins must be a power of two")
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(stratum_col).alias("stratum"),
        h.alias("h"),
    ).withColumn(
        # bit shift, not `/`: Column `/` divides in doubles and a 60-bit
        # hash exceeds the 53-bit mantissa, so hashes within ~128 of a
        # bin boundary would round into the WRONG bin and break the
        # "(bin, h, id) orders like (h, id)" invariant the ranking needs
        "bin",
        F.shiftright(F.col("h"), 60 - (n_bins.bit_length() - 1)),
    )

    from pyspark.sql import Window

    bins = base.groupBy("stratum", "bin").agg(F.count("*").alias("c"))
    wb = Window.partitionBy("stratum").orderBy("bin")
    bins = bins.withColumn(
        "cum_before",
        F.coalesce(
            F.sum("c").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).withColumn(
        "n", F.sum("c").over(wb.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    )
    wr = Window.partitionBy("stratum", "bin").orderBy("h", "id")
    ranked = (
        base.join(bins.select("stratum", "bin", "cum_before", "n"), ["stratum", "bin"])
        .withColumn("rn", F.col("cum_before") + F.row_number().over(wr))
    )
    cum = 0.0
    expr = None
    for name, frac in fractions[:-1]:
        # round the running sum so the cumulative literal is the same
        # double an oracle writes directly (0.8 + 0.1 in floats is
        # 0.9000000000000001, not the double nearest 0.9)
        cum = round(cum + frac, 9)
        cond = F.col("rn") <= F.floor(F.lit(cum) * F.col("n"))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = expr.otherwise(fractions[-1][0])
    return ranked.select(
        F.col("id").alias(id_col),
        F.col("stratum").alias(stratum_col),
        expr.alias("split"),
    )


def token_budget_select(
    df: DataFrame,
    budget: int,
    group_col: str = "lang",
    order_col: str = "n_chars",
    token_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bins: int = 4096,
) -> DataFrame:
    """Greedy per-group corpus selection under a token budget →
    ``(group, doc_id, n_tokens, cum_tokens)``.

    The "fill each language's token quota with the best documents
    first" step of training-mixture construction: rank docs inside each
    group by ``order_col`` (descending; ties broken by id so the pick
    is total-order deterministic), take docs while the running token
    total is below ``budget`` — the first doc to cross the line is
    KEPT (budgets are soft caps), everything after it is dropped.

    Scale design: the running token sum is NEVER one window over a whole
    group (a 100 TB English stratum would serialize into one sort
    partition). As in :func:`stratified_split`, the ``order_col`` value
    range is histogrammed into ``n_bins`` bins: per-(group, bin) token
    sums cumulate in a tiny O(groups × bins) window, and each row's
    running total is ``cum_before_bin + within_bin_running_sum`` — the
    within-bin window partitions on (group, bin), bounding any sort
    partition to ~group/n_bins rows for a spread-out ``order_col``.
    Binning is a monotone map of ``order_col`` alone, so bin order
    refines (order desc, id) order and the integer token sums associate
    to exactly the single-window value — an oracle can use the plain
    one-window formulation and match bit for bit. (Heavily tied
    ``order_col`` values concentrate in one bin; pass a
    higher-resolution ordering column for that shape.)
    """
    from pyspark.sql import Window

    if token_col is None:
        # Column API (not an F.expr string): column names needing
        # backticks/quotes parse fine, same formulation as
        # shards._with_tokens
        tokens = F.size(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                F.lit(r"\w+"),
                0,
            )
        ).cast("bigint")
    else:
        # NULL-proof like shards._with_tokens: a NULL count would
        # understate the source's budget mass while the hash gate
        # still emits the row with n_tokens NULL
        tokens = F.coalesce(F.col(token_col), F.lit(0)).cast("bigint")
    base = df.select(
        group_col, id_col, F.col(order_col), tokens.alias("n_tokens")
    )
    # Global order_col range as a single-row broadcast (scalar
    # attachment, not a data-sized cross join). floor((x-lo)·k/(hi-lo))
    # in doubles is monotone non-decreasing (IEEE division/multiply are
    # monotone), which is all correctness needs — bin boundaries may
    # land "off" by an ulp, but equal values share a bin and larger
    # values never get a smaller bin.
    stats = base.agg(
        F.min(F.col(order_col)).cast("double").alias("__lo"),
        F.max(F.col(order_col)).cast("double").alias("__hi"),
    )
    binned = base.crossJoin(F.broadcast(stats)).withColumn(
        # descending bin index: bin 0 holds the LARGEST order values so
        # cum_before accumulates over bins already taken
        "__bin",
        F.when(F.col("__hi") <= F.col("__lo"), F.lit(0)).otherwise(
            F.lit(n_bins - 1)
            - F.least(
                F.lit(n_bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col(order_col).cast("double") - F.col("__lo"))
                        * F.lit(float(n_bins))
                        / (F.col("__hi") - F.col("__lo"))
                    ).cast("int"),
                ),
            )
        ),
    # consumed by the per-bin aggregate AND the per-row probe join: the
    # partial agg under the groupBy defeats ReusedExchange, so without a
    # checkpoint the full scan + regexp tokenization would run twice
    ).localCheckpoint(eager=False)
    bins = binned.groupBy(group_col, "__bin").agg(
        F.sum("n_tokens").alias("__bin_tok")
    )
    wb = Window.partitionBy(group_col).orderBy("__bin")
    bins = bins.withColumn(
        "__cum_before",
        F.coalesce(
            F.sum("__bin_tok").over(
                wb.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    wr = Window.partitionBy(group_col, "__bin").orderBy(
        F.col(order_col).desc(), F.col(id_col)
    )
    return (
        binned.join(
            bins.select(group_col, "__bin", "__cum_before"),
            [group_col, "__bin"],
        )
        .withColumn(
            "cum_tokens", F.col("__cum_before") + F.sum("n_tokens").over(wr)
        )
        .where(F.col("cum_tokens") - F.col("n_tokens") < budget)
        .select(group_col, id_col, "n_tokens", "cum_tokens")
    )


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    salt: str = "temp",
    hash_family: str = "md5",
) -> DataFrame:
    """Temperature-scaled multi-source sampling → the kept documents
    with their source's computed ``rate_ppm``.

    The multilingual/multi-source rebalancing rule of XLM (Conneau &
    Lample, NeurIPS 2019 §3.1) and mT5/GPT-3 data mixtures: source
    ``i`` with token mass ``t_i`` is drawn with probability
    ``q_i ∝ t_i^alpha`` (``alpha < 1`` up-weights small sources;
    ``alpha = 1`` is proportional = no rebalancing), under a total
    token budget ``budget_frac · Σt``. The per-source keep-rate is
    ``min(1, budget · q_i / t_i)``, quantized to ppm, and applied as
    the same deterministic 1e6-ring hash gate as :func:`hash_sample`
    — so the sample is reproducible under any partitioning and, with
    the md5 family, bit-replayable by an ANSI-SQL oracle.

    Scale shape: one map-side-combined aggregate to the O(sources)
    mass table, one broadcast join back, a filter. The corpus never
    shuffles. Cross-engine determinism: the powered masses are
    QUANTIZED to integer millis (``p = floor(pow(t, alpha)·1000)``)
    before normalization, so ``Σp`` is an exact integer sum — never an
    order-dependent float sum — and the rate is a fixed left-assoc
    chain of correctly-rounded IEEE mul/div over exact-integer
    operands, hence bit-identical in any engine and under any
    partitioning. With ``alpha = 0.5`` the power is ``sqrt``
    (correctly rounded per IEEE 754 everywhere) and the whole pipeline
    is exactly replayable by an ANSI-SQL oracle; other alphas ride
    libm ``pow`` — fine in production, avoided in the oracle pair.
    """
    if not 0.0 < budget_frac <= 1.0:
        raise ValueError("budget_frac must be in (0, 1]")
    if alpha < 0:
        raise ValueError("alpha must be non-negative")
    if token_col is None:
        # Column API (not an F.expr string): column names needing
        # backticks/quotes parse fine, same formulation as
        # shards._with_tokens
        tokens = F.size(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                F.lit(r"\w+"),
                0,
            )
        ).cast("bigint")
    else:
        # NULL-proof like shards._with_tokens: a NULL count would
        # understate the source's budget mass while the hash gate
        # still emits the row with n_tokens NULL
        tokens = F.coalesce(F.col(token_col), F.lit(0)).cast("bigint")
    base = df.select(
        F.col(id_col), F.col(source_col).alias("__src"), tokens.alias("__w")
    )
    mass = base.groupBy("__src").agg(F.sum("__w").alias("__t"))
    pw = (
        F.sqrt(F.col("__t").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("__t").cast("double"), F.lit(float(alpha)))
    )
    mass = mass.withColumn("__p", F.floor(pw * F.lit(1000.0)).cast("bigint"))
    # Σt / Σp as a single-partition window over the SOURCES-sized mass
    # table (free at dim size) rather than a separate agg branch — a
    # second branch would re-derive `mass` and re-scan the corpus; this
    # keeps the pipeline at exactly two corpus scans (model + gate),
    # the ccnet_buckets shape. Integer sums, so window order is moot.
    from pyspark.sql import Window

    wall = Window.partitionBy()
    tot = mass.withColumn("__tt", F.sum("__t").over(wall)).withColumn(
        "__pp", F.sum("__p").over(wall)
    )
    # rate = budget · (p_i/Σp) / t_i, as a FIXED left-assoc chain of
    # IEEE-exact ops over exact-integer operands, mirrored verbatim by
    # the SQL twin: floor(1e6 * (frac*tt) * p / pp / t)
    rates = (
        tot
        .withColumn(
            "rate_ppm",
            F.when(F.col("__t") <= 0, F.lit(0).cast("bigint")).otherwise(
                F.least(
                    F.lit(1_000_000).cast("bigint"),
                    F.floor(
                        F.lit(1e6)
                        * (
                            F.lit(float(budget_frac))
                            * F.col("__tt").cast("double")
                        )
                        * F.col("__p").cast("double")
                        / F.col("__pp").cast("double")
                        / F.col("__t").cast("double")
                    ).cast("bigint"),
                )
            ),
        )
        .select("__src", "rate_ppm")
    )
    # eqNullSafe (the report.py data-card rule): a NULL-source group
    # has a real mass row feeding __tt/__pp — an inner equi-join would
    # silently drop its documents from the output
    rates = rates.withColumnRenamed("__src", "__src_r")
    gated = base.join(
        F.broadcast(rates),
        F.col("__src").eqNullSafe(F.col("__src_r")),
    ).drop("__src_r")
    c = F.col(id_col).cast("string")
    if hash_family == "md5":
        h = md5_long(F.concat(c, F.lit(f"|{salt}")))
    else:
        h = F.xxhash64(c, F.lit(salt))
    return (
        gated.where(F.pmod(h, F.lit(_DENOM)) < F.col("rate_ppm"))
        .select(
            id_col,
            F.col("__src").alias(source_col),
            F.col("__w").alias("n_tokens"),
            "rate_ppm",
        )
    )


def corpus_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuffle",
    hash_family: str = "md5",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Deterministic pseudo-random GLOBAL order for training export →
    DataFrame[<id_col>, *keep_cols, shuffle_key, position].

    Pretraining wants the document stream globally shuffled (a corpus
    laid out source-by-source trains on megabatches of one domain at a
    time); at 100 TB that shuffle must also be REPRODUCIBLE. The order
    here is a pure function of the row: ``shuffle_key = hash(id, salt)``
    and ``position`` = 0-based rank in (shuffle_key, id) order — the id
    tiebreak makes the permutation total even on hash collisions, so
    re-running (or re-executing a failed partition) yields bit-identical
    layout, and a different ``salt`` draws an independent permutation
    per epoch. ``id_col`` must be unique (the
    :func:`~reflexiv_spark.datapipe.packing.global_prefix_sum`
    contract): duplicate ids share a (key, id) pair, making their
    relative rank layout-dependent.

    Execution is the :func:`~reflexiv_spark.datapipe.packing.global_prefix_sum`
    two-phase scan, NOT a single-task global window: range-shuffle on
    the (key, id) pair, per-partition ``row_number``, driver prefix of
    the per-partition COUNTS (one long each) joined back as a broadcast.
    Where the range boundaries fall cannot affect the rank, so the
    result is partitioning-invariant and an ANSI ``row_number()`` oracle
    replays it exactly. Compose downstream: feed ``position`` to
    :func:`~reflexiv_spark.datapipe.shards.plan_shards` as the order
    column to get shuffled training shards; pass the payload columns
    the next stage needs through ``keep_cols`` so no corpus-sized
    re-attach join is ever required.
    """
    from pyspark.sql import Window

    # NOTE: this is packing.global_prefix_sum's two-phase scan with a
    # COMPOSITE (key, id) order and row_number instead of sum (i.e. a
    # prefix sum of ones). Folding both onto one generalized helper is
    # pre-committed for round 14, when pack_sequences rotates into the
    # oracle window anyway (SURVEY §8 r14 arithmetic) — a packing.py
    # edit now would force it in while the r13 window is full.
    c = F.col(id_col).cast("string")
    if hash_family == "md5":
        key = md5_long(F.concat(c, F.lit(f"|{salt}")))
    else:
        key = F.xxhash64(c, F.lit(salt))
    keyed = df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols],
        key.alias("shuffle_key"),
    )
    ranged = keyed.repartitionByRange(
        F.col("shuffle_key"), F.col(id_col)
    ).withColumn("__pid", F.spark_partition_id())
    # pin the layout: the window, the totals agg, and the join below
    # must all see the SAME partition ids (the packing.py idiom)
    ranged = ranged.localCheckpoint(eager=False)
    w = Window.partitionBy("__pid").orderBy("shuffle_key", id_col)
    local = ranged.withColumn("__rn", F.row_number().over(w))
    totals = ranged.groupBy("__pid").count().collect()
    prefix, acc = {}, 0
    for r in sorted(totals, key=lambda r: r["__pid"]):
        prefix[r["__pid"]] = acc
        acc += r["count"]
    pre = df.sparkSession.createDataFrame(
        [(int(p), int(v)) for p, v in prefix.items()], "__pid int, __pre long"
    )
    return (
        local.join(F.broadcast(pre), "__pid")
        .select(
            id_col,
            *keep_cols,
            "shuffle_key",
            (F.col("__rn") + F.col("__pre") - 1).cast("bigint").alias(
                "position"
            ),
        )
    )
