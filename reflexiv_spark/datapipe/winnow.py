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

from reflexiv_spark.datapipe._layout import spread_batch as _spread_batch
from reflexiv_spark.datapipe.dedup import md5_long, normalize_text


_POS_BITS = 20
_POS_CAP = (1 << _POS_BITS) - 1
_HASH_MOD = 1 << 40


def _gram_hash(gram: Column, hash_family: str) -> Column:
    salted = F.concat(F.lit("w|"), gram)
    h = md5_long(salted) if hash_family == "md5" else F.xxhash64(salted)
    return F.pmod(h, F.lit(_HASH_MOD))


def _selected_keys(
    t: Column, k: int, window: int, hash_family: str
) -> Column:
    """The per-row winnow KERNEL: distinct selected keys
    (``h * 2^20 + (2^20 - 1 - pos)``) of a NORMALIZED text column, as
    one Catalyst array expression — shared by the exploding
    :func:`winnow_fingerprints` and the in-row
    :func:`fingerprint_array` (the streaming probe's form).

    LET-BINDING, load-bearing, TWICE: higher-order-function lambdas
    re-evaluate their body per element, so every expensive expression
    consumed inside a per-element lambda must enter as a LAMBDA
    VARIABLE (bound once per row via a 1-element outer transform),
    never inline. Both levels were measured: an inlined key array
    recomputes all P gram hashes per window (O(P^2) digests — 19 min
    vs 4 s on the sf0.01 gate), and an inlined normalize_text
    re-runs the regexp per GRAM (~9.5 us/gram vs ~0.5 us with the
    binding). ``tt`` = the normalized text, ``ks`` = the key array."""

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

    return F.array_distinct(
        F.flatten(
            F.transform(
                F.array(t),
                lambda tt: F.flatten(
                    F.transform(F.array(_keys_of(tt)), _window_mins)
                ),
            )
        )
    )


def fingerprint_array(
    text: Column,
    k: int = 8,
    window: int = 4,
    hash_family: str = "xxhash64",
) -> Column:
    """Per-ROW distinct winnowed fingerprint VALUES as
    ``array<bigint>`` — the in-row form of the kernel, for stateless
    stream probes (``probe_winnow_stream``) and any caller that wants
    fingerprints without exploding. NULL and sub-``k`` texts yield an
    EMPTY array (they produce no rows under :func:`winnow_fingerprints`
    — same documents, same fingerprint VALUES, different shape).
    Zero shuffles, zero Python — legal in a streaming projection."""
    if window < 1 or k < 1:
        raise ValueError("k and window must be >= 1")
    t = normalize_text(text)
    fps = F.array_distinct(
        F.transform(
            _selected_keys(t, k, window, hash_family),
            lambda kk: F.shiftright(kk, _POS_BITS).cast("bigint"),
        )
    )
    return F.when(
        text.isNotNull() & (F.length(t) >= k), fps
    ).otherwise(F.array().cast("array<bigint>"))


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

    sel = _selected_keys(t, k, window, hash_family)
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


def remove_shared_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    hash_family: str = "xxhash64",
    max_df: int | None = None,
) -> DataFrame:
    """Character-level duplicate-span REMOVAL — the operator that
    COMPLETES the winnow story (``winnow_overlap`` locates shared
    passages; this excises them): for every fingerprint value, the
    smallest doc id OWNS it; every other document removes the union of
    its matched k-gram character intervals from the normalized text →
    DataFrame[id, n_spans, chars_removed, clean_text].

    This is the winnow-granular form of Lee et al. 2022's ExactSubstr
    removal (``dedup.dup_spans`` approximates the DETECTION side at
    word-50-gram granularity; production ExactSubstr removes at
    character level — the boilerplate/quote-removal shape). Guarantee,
    the excision mirror of Schleimer Theorem 1: a shared substring of
    length >= window + k - 1 selects at least one shared fingerprint in
    EVERY window of ``window`` consecutive grams, so after the matched
    k-grams are excised from the non-owner, no surviving contiguous
    piece of that substring is longer than ~window + k - 2 — below the
    detectability threshold, so re-running detection on the cleaned
    corpus converges. Residual slivers between selected grams are the
    documented approximation vs full ExactSubstr (which removes the
    entire match, at the cost of a suffix-array build no equality-join
    engine replays).

    Execution shape: the fingerprint kernel is the zero-exchange scan
    above; ownership is one fp-keyed agg (min id, doc frequency);
    matched positions flow back as ONE id-keyed sorted array per doc
    (``collect_set`` bounded by the doc's own fingerprint count); the
    interval merge AND the substring surgery are single Catalyst
    ``aggregate`` folds over that array — no Python, no per-char rows.
    NULL-text docs pass through with NULL clean_text; docs with no
    matched fp (including every owner-only doc) pass through with the
    normalized text and n_spans = 0. ``max_df`` drops corpus-ubiquitous
    fingerprints before ownership (same knob and rationale as
    :func:`winnow_overlap` — at 100 TB, set it)."""
    fps = winnow_fingerprints(df, id_col, text_col, k, window, hash_family)
    # lazy barrier: the ownership agg and the matched-position join both
    # consume fps — one digest-kernel execution, not two (the
    # winnow_overlap lesson, same round)
    fps = fps.localCheckpoint(eager=False)
    own = fps.groupBy("fp").agg(
        F.min("id").alias("__owner"),
        F.count_distinct("id").alias("__df"),
    )
    if max_df is not None:
        own = own.where(F.col("__df") <= max_df)
    starts = (
        fps.join(own.select("fp", "__owner"), "fp")
        .where(F.col("id") != F.col("__owner"))
        .groupBy("id")
        .agg(F.sort_array(F.collect_set("pos")).alias("__starts"))
    )
    return _excise(df, starts, id_col, text_col, k)


def remove_reference_spans(
    df: DataFrame,
    ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_id_col: str = "doc_id",
    ref_text_col: str = "text",
    k: int = 8,
    window: int = 4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Cross-corpus span EXCISION — remove from every ``df`` document
    the k-gram intervals whose winnow fingerprints appear anywhere in
    the REFERENCE corpus → DataFrame[id, n_spans, chars_removed,
    clean_text].

    The decontamination counterpart of :func:`remove_shared_spans`:
    ``bloom_decontam`` / ``decontaminate`` FLAG training documents that
    overlap an eval benchmark; this SURGICALLY removes the overlapping
    passages and keeps the document — the remediation production
    pipelines actually want when a long document contains one quoted
    benchmark item. Same excision guarantee as remove_shared_spans:
    any train/eval shared substring of length >= window + k - 1 loses
    at least one k-gram from every window, so no detectable shared
    passage survives in the cleaned text.

    Execution shape: the reference fingerprint VALUES are a distinct
    fp-keyed relation (eval benchmarks are model-sized, so the join is
    broadcast-able; a big reference degrades to one fp-keyed hash
    join); the train corpus fingerprints, the matched-position
    collect, and the two Catalyst `aggregate` folds are identical to
    remove_shared_spans. No quadratic anywhere — the probe is linear
    in train fingerprint rows."""
    fps = winnow_fingerprints(df, id_col, text_col, k, window, hash_family)
    ref_fps = (
        winnow_fingerprints(
            ref, ref_id_col, ref_text_col, k, window, hash_family
        )
        .select("fp")
        .distinct()
    )
    starts = (
        fps.join(ref_fps, "fp")
        .groupBy("id")
        .agg(F.sort_array(F.collect_set("pos")).alias("__starts"))
    )
    return _excise(df, starts, id_col, text_col, k)


def _excise(
    df: DataFrame,
    starts: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
) -> DataFrame:
    """Shared surgery tail: merge each doc's sorted matched k-gram
    start positions into disjoint [s, e] spans and excise them from the
    normalized text — all as LINEAR per-row Catalyst array expressions,
    no per-char relation, no Python.

    r13 rewrite (guide §1.2 per-task work): the original interval-merge
    ``aggregate`` fold re-built the accumulator array per element
    (``concat(slice(acc, ...), ...)`` — O(n²) struct copies per doc) and
    the surgery fold re-concatenated the accumulator string per span
    (O(spans × len) byte copies). Both are now index computations:
    positions are sorted+distinct and every interval has length k, so
    the fold's "extend when p <= last.e + 1" rule is exactly "the gap to
    the previous position is <= k" — span starts/ends fall out of two
    linear filters over the index range, and the kept text is one
    ``transform`` of substrings + ``array_join``. Measured on the
    r13 bench shapes: winnow_ref_removal 2.32 → 1.55 s (arrays avg 111
    positions/doc), span_removal neutral (small arrays); outputs
    verified identical at sf0.01 and sf0.1 for both operators."""
    base = df.select(
        F.col(id_col).alias("id"),
        normalize_text(F.col(text_col)).alias("__t"),
        F.col(text_col).isNull().alias("__isnull"),
    ).join(starts, "id", "left")

    empty_spans = F.array().cast("array<struct<s:bigint,e:bigint>>")
    ps = F.coalesce(F.col("__starts"), F.array().cast("array<bigint>"))
    n = F.size(ps)
    sidx = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: (i == 1)
        | (F.element_at(ps, i) > F.element_at(ps, i - 1) + F.lit(k)),
    )
    eidx = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: (i == n)
        | (F.element_at(ps, i + 1) > F.element_at(ps, i) + F.lit(k)),
    )
    merged = F.when(n == 0, empty_spans).otherwise(
        F.zip_with(
            sidx,
            eidx,
            lambda si, ei: F.struct(
                F.element_at(ps, si).cast("bigint").alias("s"),
                (F.element_at(ps, ei) + F.lit(k - 1)).cast("bigint").alias("e"),
            ),
        )
    )
    staged = base.select("id", "__t", "__isnull", merged.alias("__spans"))
    sp, t = F.col("__spans"), F.col("__t")
    m = F.size(sp)
    # kept piece BEFORE span i runs from the previous span's end + 1 to
    # the span's start - 1 (spans are disjoint and non-adjacent by
    # construction, so the length is >= 0); the tail after the last span
    # closes the row
    prev_e = lambda i: F.when(  # noqa: E731
        i == 1, F.lit(0).cast("bigint")
    ).otherwise(F.element_at(sp, i - 1)["e"])
    pieces = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.substring(
            t,
            (prev_e(i) + 1).cast("int"),
            (F.element_at(sp, i)["s"] - prev_e(i) - 1).cast("int"),
        ),
    )
    tail = F.substring(
        t, (F.element_at(sp, -1)["e"] + 1).cast("int"), F.length(t)
    )
    surgery = F.when(m == 0, t).otherwise(
        F.concat(F.array_join(pieces, ""), tail)
    )
    chars_removed = F.aggregate(
        sp,
        F.lit(0).cast("bigint"),
        lambda a, s: a
        + (F.least(s["e"], F.length(t).cast("bigint")) - s["s"] + 1),
    )
    return staged.select(
        "id",
        F.size(sp).cast("bigint").alias("n_spans"),
        chars_removed.alias("chars_removed"),
        F.when(F.col("__isnull"), F.lit(None).cast("string"))
        .otherwise(surgery)
        .alias("clean_text"),
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
    # lazy barrier (the quantile.py pattern) UNCONDITIONALLY: the two
    # self-join sides — and, under max_df, the document-frequency agg —
    # all consume fps, and without the barrier the whole digest kernel
    # + distinct re-executes once per consumer. Round 10 measured the
    # capped case (10 exchanges vs 5); round 11 caught the uncapped
    # driver query paying the same double-execution (22.7 s vs 8.1 s
    # at sf0.1 — the barrier was previously applied only under max_df).
    fps = fps.localCheckpoint(eager=False)
    if max_df is not None:
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
