"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003)
— the dedup family's POSITIONAL member.

MinHash summarizes a whole document's shingle SET (order-free); SimHash
its token distribution; the rank-grid its value multiset. Winnowing is
the overlap-LOCATING sketch: select a guaranteed-dense subset of k-gram
hashes such that ANY shared substring of length >= window + k - 1
between two documents yields a shared selected hash. That is the
plagiarism / boilerplate / quote-detection contract MinHash cannot give
(a 200-char shared passage inside two otherwise-different 100 KB pages
moves Jaccard by ~0 but always survives winnowing).

Selection rule: over every window of ``window`` consecutive k-gram
hashes, keep the MINIMUM, ties broken by RIGHTMOST position. The tie
rule is positional-shift-invariant (among equal hashes the rightmost is
rightmost under any absolute offset), so the selected hash of a shared
window is identical in both documents — the detection guarantee of the
paper's Theorem 1 holds.

Execution shape (the Spark-first part): the whole per-document pipeline
— k-gram hashing, window minima, tie-breaking, dedup — is ONE Catalyst
projection over array expressions (``sequence`` / ``transform`` /
``slice`` / ``array_min`` / ``array_distinct``). ZERO shuffles, zero
Python, no per-doc window function: a 100 TB corpus fingerprints at
scan speed, embarrassingly parallel. (The DuckDB oracle replays the
same semantics with an ANSI window function — same answer, different
plan.)

Encoding: hash and tie-break live in one bigint so ``array_min`` is the
whole comparator — ``key = h * 2^20 + (2^20 - 1 - pos)`` with
``h = hash(k-gram) mod 2^40``. Minimizing ``key`` minimizes ``h`` then
maximizes ``pos`` (rightmost). Ceilings, documented: positions above
``2^20 - 1`` (~1M k-grams per document) are not fingerprinted — split
larger documents upstream (``doc_chunk``); 40-bit hashes make
cross-document false sharing ~n^2/2^41 — fingerprint MATCHES are
candidates for an exact verify, like every sketch in the family.

Reference scope note: the reference engine has no fingerprinting
sketch; this module is part of the engine-additions surface (SURVEY
§8), sharing the salted ``md5_long``/xxhash64 device convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.datapipe.dedup import md5_long, normalize_text
from reflexiv_spark.plans.layout import spread


def _spread_batch(df: DataFrame) -> DataFrame:
    """spread() for batch inputs, pass-through for streaming ones —
    the kernel is stateless, so it composes with readStream, but
    micro-batch partitioning belongs to the source (and ``df.rdd``
    inside spread() is illegal on a streaming plan). A layout.py
    change is window-blocked this round; fold this guard into
    ``plans.layout.spread`` when its consumers next rotate in."""
    return df if df.isStreaming else spread(df)


_POS_BITS = 20
_POS_CAP = (1 << _POS_BITS) - 1
_HASH_MOD = 1 << 40


def _gram_hash(gram: Column, hash_family: str) -> Column:
    salted = F.concat(F.lit("w|"), gram)
    h = md5_long(salted) if hash_family == "md5" else F.xxhash64(salted)
    return F.pmod(h, F.lit(_HASH_MOD))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """The winnowed fingerprint set per document →
    DataFrame[id, pos, fp]: ``pos`` the 1-based k-gram position in the
    normalized text, ``fp`` its 40-bit hash. NULL texts and texts
    shorter than ``k`` produce no rows. Documents shorter than
    ``window + k - 1`` still fingerprint (one window over what exists),
    so every non-trivial document is represented."""
    if window < 1 or k < 1:
        raise ValueError("k and window must be >= 1")
    t = normalize_text(F.col(text_col))
    p = F.least(F.length(t) - F.lit(k - 1), F.lit(_POS_CAP))

    # LET-BINDING, load-bearing, TWICE: higher-order-function lambdas
    # re-evaluate their body per element, so every expensive expression
    # consumed inside a per-element lambda must enter as a LAMBDA
    # VARIABLE (bound once per row via a 1-element outer transform),
    # never inline. Both levels were measured: an inlined key array
    # recomputes all P gram hashes per window (O(P^2) digests — 19 min
    # vs 4 s on the sf0.01 gate), and an inlined normalize_text
    # re-runs the regexp per GRAM (~9.5 us/gram vs ~0.5 us with the
    # binding). `tt` = the normalized text, `ks` = the key array.
    def _keys_of(tt: Column) -> Column:
        pp = F.least(F.length(tt) - F.lit(k - 1), F.lit(_POS_CAP))
        return F.transform(
            F.sequence(F.lit(1), pp),
            lambda i: _gram_hash(F.substring(tt, i, k), hash_family)
            * F.lit(1 << _POS_BITS)
            + (F.lit(_POS_CAP) - i),
        )

    def _window_mins(ks: Column) -> Column:
        # full windows only exist when P >= window; short docs get one
        # window over everything. least() over `window` element_at's
        # beats array_min(slice(...)): no per-window array allocation.
        if window == 1:
            return ks
        full = F.transform(
            F.sequence(F.lit(1), F.size(ks) - F.lit(window - 1)),
            lambda i: F.least(
                *[F.element_at(ks, i + F.lit(j)) for j in range(window)]
            ),
        )
        return F.when(F.size(ks) >= window, full).otherwise(
            F.array(F.array_min(ks))
        )

    sel = F.array_distinct(
        F.flatten(
            F.transform(
                F.array(t),
                lambda tt: F.flatten(
                    F.transform(
                        F.array(_keys_of(tt)), _window_mins
                    )
                ),
            )
        )
    )
    key = F.explode(sel).alias("__key")
    # spread(): the kernel is CPU-bound (one digest per gram), so a
    # few-file local input must fan out to the session's cores before
    # it; a many-file 100 TB scan passes through untouched and the
    # plan stays exchange-free (the plan-guard test pins that shape)
    return (
        _spread_batch(df.where(F.col(text_col).isNotNull() & (p >= 1)))
        .select(F.col(id_col).alias("id"), key)
        .select(
            "id",
            (F.lit(_POS_CAP) - F.pmod("__key", F.lit(1 << _POS_BITS)))
            .cast("bigint")
            .alias("pos"),
            # shiftright, NOT `/`: float division of a 60-bit key is
            # inexact past the 53-bit mantissa (the module contract is
            # all-integer arithmetic, like quantile.py's `div`)
            F.shiftright("__key", _POS_BITS).cast("bigint").alias("fp"),
        )
    )


def winnow_overlap(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    hash_family: str = "xxhash64",
    max_df: int | None = None,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` distinct fingerprint
    VALUES → DataFrame[id_a, id_b, n_shared], ``id_a < id_b``. The MOSS
    overlap measure: an equi-join on fingerprint value (positions
    dropped — a moved passage still matches), then a pair count.

    ``max_df`` is the scale backstop: drop fingerprints present in more
    than ``max_df`` documents before pairing (the paper's own stop-gram
    note). A fingerprint in n docs contributes C(n, 2) join rows, so
    without the cap one boilerplate gram shared by 10^5 documents emits
    5×10^9 pairs — the hot-shingle quadratic that sinks every
    value-join dedup (``ngram_jaccard``'s documented failure shape).
    With the cap the join is bounded by ``max_df``·|fps| rows, and only
    CORPUS-ubiquitous grams (which carry no overlap signal — they would
    pair everything with everything) are lost; a passage shared by up
    to ``max_df`` documents still matches exactly. The document-
    frequency filter rides the same fp-hash partitioning as the join
    (co-partitioned agg + join, no extra exchange of the fp rows). At
    100 TB, set it (boilerplate is universal); ``None`` keeps the exact
    paper semantics the DuckDB oracle replays."""
    fps = winnow_fingerprints(
        df, id_col, text_col, k, window, hash_family
    ).select("id", "fp").distinct()
    if max_df is not None:
        # lazy barrier (the quantile.py pattern): the document-frequency
        # agg AND the join probe both consume fps — without it the whole
        # fingerprint kernel + distinct re-executes for each consumer
        # (measured 10 exchanges vs 5)
        fps = fps.localCheckpoint(eager=False)
        keep = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_df)
            .select("fp")
        )
        fps = fps.join(keep, "fp")
    a = fps.select(F.col("id").alias("id_a"), "fp")
    b = fps.select(F.col("id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
