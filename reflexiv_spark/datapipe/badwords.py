"""Blocklist-word page filtering — the C4 "bad words" rule.

C4 (Raffel et al. 2020, §2.2) removes any page containing a word from a
public blocklist (the "List of Dirty, Naughty, Obscene or Otherwise Bad
Words"); most production web pipelines run the same shape with their
own lists. :mod:`reflexiv_spark.datapipe.filters` deliberately scoped
this out of ``c4_rules`` (it is a list lookup, not a heuristic) — this
module is that lookup as a first-class operator.

Semantics: a document is flagged when ANY blocklist *word* appears
among its ``\\w+`` tokens (lowercased — the text family's token rule),
or ANY blocklist *phrase* appears as a substring of the lowercased
text. Word matching is exact-token (no substring false positives:
"class" never matches a 3-letter entry); phrase matching is plain
substring, the C4 rule for multi-word entries.

Execution shape: the blocklist is model-sized (public lists are a few
hundred entries), so it ships as a LITERAL array inside one Catalyst
projection — a zero-shuffle, zero-Python corpus scan. Counts are exact
integers; no floats anywhere (the module-family determinism contract),
so a DuckDB oracle replays every column bit-for-bit.

Reference scope note: the reference engine has no document filters;
this module is part of the engine-additions surface (SURVEY §8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.datapipe._layout import spread_batch as _spread_batch

# practical ceiling for the literal-array formulation; real blocklists
# (LDNOOBW ~400 entries/language) sit far below it
_MAX_LIST = 10_000
# phrases compile to one contains() predicate EACH (a linear expression
# chain, not an array), so they get a much tighter bound — beyond this,
# Catalyst codegen method limits force interpreted evaluation
_MAX_PHRASES = 200


def badwords_filter(
    df: DataFrame,
    words: tuple[str, ...] | list[str] = (),
    phrases: tuple[str, ...] | list[str] = (),
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_only: bool = False,
) -> DataFrame:
    """Flag documents containing blocklisted words or phrases.

    Returns DataFrame[id, n_bad_words, n_bad_phrases, keep] where
    ``n_bad_words`` counts DISTINCT blocklist words present among the
    document's lowercased ``\\w+`` tokens, ``n_bad_phrases`` counts
    blocklist phrases present as substrings of the lowercased text,
    and ``keep`` is true iff both are zero. NULL text behaves as the
    empty string (keep = true). With ``keep_only=True`` the original
    rows that pass are returned instead (all input columns).

    ``words`` entries are single tokens (matching is exact-token);
    entries containing whitespace belong in ``phrases``. Both lists
    are compared lowercased.
    """
    import re as _re

    words = tuple(dict.fromkeys(w.lower() for w in words))
    phrases = tuple(dict.fromkeys(p.lower() for p in phrases))
    for w in words:
        if not w:
            raise ValueError("blocklist words must be non-empty")
        # tokens come from the ASCII-\w tokenizer (Java and RE2 regex
        # \w), so an entry with any other character — whitespace,
        # punctuation, accented letters — can NEVER match a token;
        # rejecting it loudly beats a silent no-op blocklist entry
        if not _re.fullmatch(r"\w+", w, _re.ASCII):
            raise ValueError(
                f"blocklist word {w!r} contains non-word characters — "
                "exact-token matching can never hit it; pass it via "
                "phrases= (substring match handles arbitrary text)"
            )
    if not all(phrases):
        raise ValueError("blocklist phrases must be non-empty")
    if len(words) + len(phrases) > _MAX_LIST:
        raise ValueError(
            f"blocklist has {len(words) + len(phrases)} entries; the "
            f"literal-array formulation is bounded at {_MAX_LIST} — "
            "ship a larger list as a broadcast-join table instead"
        )
    if len(phrases) > _MAX_PHRASES:
        raise ValueError(
            f"{len(phrases)} phrases; each phrase is one contains() "
            f"predicate (a linear expression chain), bounded at "
            f"{_MAX_PHRASES} — fold a larger phrase list into a "
            "regexp or a broadcast-join table instead"
        )

    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    if keep_only:
        # the flag is a pure per-row predicate — apply it directly to
        # the input (zero shuffle; no id round-trip join needed)
        pred = F.lit(True)
        if words:
            bad = F.array(*[F.lit(w) for w in words])
            pred = pred & ~F.exists(
                F.regexp_extract_all(t, F.lit(r"\w+"), 0),
                lambda x: F.array_contains(bad, x),
            )
        for p in phrases:
            pred = pred & ~F.contains(t, F.lit(p))
        return df.where(pred)
    if words:
        bad = F.array(*[F.lit(w) for w in words])
        # distinct-first, then membership: length of the result is the
        # number of DISTINCT blocklist words present — the same value
        # both engines compute regardless of array_intersect dedup
        # semantics (the cross-engine-safe formulation).
        n_words = F.size(
            F.filter(
                F.array_distinct(
                    F.regexp_extract_all(t, F.lit(r"\w+"), 0)
                ),
                lambda x: F.array_contains(bad, x),
            )
        ).cast("bigint")
    else:
        n_words = F.lit(0).cast("bigint")
    n_phrases = F.lit(0).cast("bigint")
    for p in phrases:
        n_phrases = n_phrases + F.contains(t, F.lit(p)).cast("bigint")
    flags = _spread_batch(df).select(
        F.col(id_col).alias("id"),
        n_words.alias("n_bad_words"),
        n_phrases.alias("n_bad_phrases"),
    )
    return flags.withColumn(
        "keep", (F.col("n_bad_words") == 0) & (F.col("n_bad_phrases") == 0)
    )
