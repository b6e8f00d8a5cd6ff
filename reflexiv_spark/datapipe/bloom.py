"""Bloom filter — the sketch family's membership member (CMS answers
"how many", KMV/HLL "how many distinct", the rank grid "which value at
rank r"; Bloom answers "have I seen this key", with one-sided error).

The 100 TB use it exists for: a corpus-scale membership PRE-FILTER.
Eval-set decontamination, URL/blocklist hits, and seen-before joins all
reduce to "probe a few billion keys against a set of a few million" —
an equi-join whose build side is data-sized. A Bloom filter collapses
the build side to ``m_bits/63`` packed bigints (KBs-to-MBs, broadcast
to every executor), so the probe is a map-side bit test with NO shuffle
of the probe corpus: false positives at the documented rate, zero false
negatives. The exact join survives as the verification pass over the
(tiny) surviving candidate set — the standard two-stage shape.

Determinism (oracle-replayable): bit positions derive from the repo's
salted hash devices (``md5_long`` for the oracle family, xxhash64 for
production) — position i of key k is ``hash('b{i}|' || k) mod m_bits``.
Words pack 63 bits each (bit index = pos mod 63, word = pos div 63) so
no engine ever shifts into a bigint's sign bit — all values stay
non-negative and DuckDB's ``<<``/``bit_or``/``&`` replay them exactly.
The filter is a DataFrame[word, bits]; merging filters of disjoint (or
overlapping — Bloom union is idempotent) corpora is a groupBy(word)
bit_or — the same mergeable-sketch contract as CMS/KMV/HLL/rank-grid.

Reference scope note: the reference engine has no membership sketch;
this module is part of the engine-additions surface (SURVEY §8), like
the rest of ``datapipe/``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.datapipe.dedup import md5_long

WORD_BITS = 63  # bits packed per bigint word; 63 keeps the sign bit clear


def _positions(key: Column, k_hashes: int, m_bits: int, hash_family: str):
    """The ``k_hashes`` bit positions of a (string) key — salted
    independent hashes, each reduced mod ``m_bits``."""
    out = []
    for i in range(k_hashes):
        salted = F.concat(F.lit(f"b{i}|"), key)
        if hash_family == "md5":
            h = md5_long(salted)
        else:
            h = F.pmod(F.xxhash64(salted), F.lit(1 << 60))
        out.append(F.pmod(h, F.lit(int(m_bits))))
    return out


def bloom_build(
    df: DataFrame,
    key_col: str = "key",
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Build a Bloom filter over the distinct non-null keys →
    DataFrame[word: bigint, bits: bigint] (≤ ⌈m_bits/63⌉ rows — only
    words with at least one set bit are materialized; an absent word
    is all-zeros).

    Scale shape: ONE exchange total — the ⌈m/63⌉-group bit_or, map-side
    combined, so each map task ships at most ⌈m_bits/63⌉ packed words no
    matter how many keys it saw. The earlier form paid a corpus-vocab-
    sized distinct on the keys plus a distinct on positions before the
    same bit_or; both distincts were provably no-ops for the result
    (bitwise OR is idempotent — a duplicate key or position sets bits
    already set) and each cost a full exchange of data-sized rows, while
    the partial bit_or aggregation achieves the same collapse inside the
    map task (guide §2.3 "aggregate before you shuffle" / §2.4).
    Standard sizing: m_bits ≈ 1.44 · e_bits · n_keys for a 2^-e_bits
    false-positive rate with k_hashes = e_bits · ln 2 (e.g. m = 16·n,
    k = 8 → ~0.2% FPR); the defaults here favor a compact oracle.
    """
    key = F.col(key_col).cast("string")
    keys = df.where(key.isNotNull()).select(key.alias("__k"))
    pos = keys.select(
        F.explode(
            F.array(*_positions(F.col("__k"), k_hashes, m_bits, hash_family))
        ).alias("__pos")
    )
    return (
        pos.select(
            F.expr(f"__pos div {WORD_BITS}").cast("bigint").alias("word"),
            # SQL shiftleft: the python wrapper only takes a literal count
            F.expr(
                f"shiftleft(cast(1 as bigint),"
                f" cast(pmod(__pos, {WORD_BITS}) as int))"
            ).alias("__mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(__mask)").cast("bigint").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of two filters built with the SAME (m_bits, k_hashes,
    hash_family) → the filter of the union corpus, exactly (Bloom
    union is the bitwise OR; no approximation stacks)."""
    return (
        a.unionByName(b)
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").cast("bigint").alias("bits"))
    )


def bloom_probe_terms(
    docs: DataFrame,
    bloom: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Probe every document's distinct word set against the filter →
    DataFrame[id, n_terms, n_hits] (a term hits iff ALL ``k_hashes``
    of its bits are set — Bloom membership; ≥1 unset bit proves
    absence).

    Scale shape: the probe corpus is NEVER shuffled against the build
    corpus — the filter broadcast-joins (one aliased broadcast per
    hash, same tiny table) onto the per-document distinct terms, the
    bit tests run map-side, and the only data-sized exchanges are the
    per-document term distinct and the final per-document count.
    Documents with no terms report (0, 0).
    """
    word_of = lambda p: F.expr(f"__p{p} div {WORD_BITS}")  # noqa: E731
    # the repo's proven cross-engine word device (regexp_extract_all
    # '\w+' — same extraction the dsir/classifier oracles replay)
    terms = (
        docs.select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                    F.lit(r"\w+"),
                    0,
                )
            ).alias("__t"),
        )
        .distinct()
    )
    pos = _positions(F.col("__t"), k_hashes, m_bits, hash_family)
    probed = terms.select(
        "__id", "__t", *[p.alias(f"__p{i}") for i, p in enumerate(pos)]
    )
    hit = F.lit(True)
    for i in range(k_hashes):
        bl = F.broadcast(
            bloom.select(
                F.col("word").alias(f"__w{i}"), F.col("bits").alias(f"__b{i}")
            )
        )
        probed = probed.join(
            bl, word_of(i).cast("bigint") == F.col(f"__w{i}"), "left"
        )
        mask = F.expr(
            f"shiftleft(cast(1 as bigint),"
            f" cast(pmod(__p{i}, {WORD_BITS}) as int))"
        )
        hit = hit & (
            F.coalesce(F.col(f"__b{i}"), F.lit(0)).bitwiseAND(mask) != 0
        )
    scored = probed.select("__id", hit.alias("__hit"))
    base = docs.select(F.col(id_col).alias("__id")).distinct()
    agg = scored.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.count_if(F.col("__hit")).alias("n_hits"),
    )
    return base.join(agg, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.coalesce("n_terms", F.lit(0)).cast("bigint").alias("n_terms"),
        F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
    )


def bloom_decontaminate(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """The composed two-stage shape: build the filter over the TARGET
    corpus's distinct words, probe every RAW document →
    DataFrame[id, n_terms, n_hits]. Downstream keeps/flags documents by
    hit ratio, then (at 100 TB) runs the exact n-gram `decontaminate`
    join ONLY over the flagged survivors — the Bloom pass costs no
    corpus shuffle and removes the non-overlapping bulk.
    """
    vocab = target.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                F.lit(r"\w+"),
                0,
            )
        ).alias("key")
    )
    bloom = bloom_build(
        vocab, "key", m_bits=m_bits, k_hashes=k_hashes,
        hash_family=hash_family,
    )
    return bloom_probe_terms(
        raw, bloom, text_col=text_col, id_col=id_col,
        m_bits=m_bits, k_hashes=k_hashes, hash_family=hash_family,
    )
