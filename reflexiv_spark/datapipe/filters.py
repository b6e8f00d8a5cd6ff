"""Published document-quality RULE BUNDLES — Gopher and C4.

The text family has the raw signals (``text_stats``, ``quality_score``,
``repetition_stats``); production pipelines rarely run bespoke signals —
they run the published filter sets verbatim so results are comparable
across labs. This module implements the two canonical ones:

- :func:`gopher_rules` — Rae et al. 2021, "Scaling Language Models:
  Methods, Analysis & Insights from Training Gopher", Appendix A (the
  quality-filter heuristics): word-count band, mean-word-length band,
  hash/ellipsis symbol ratio, bullet-line and ellipsis-line ratios,
  alphabetic-word ratio, stop-word presence.
- :func:`c4_rules` — Raffel et al. 2020, "Exploring the Limits of
  Transfer Learning with a Unified Text-to-Text Transformer" §2.2 (the
  C4 cleaning heuristics): keep lines ending in terminal punctuation
  with >= ``min_line_words`` words, drop pages containing "lorem ipsum"
  or a curly brace, drop pages with < 3 sentences, drop lines
  containing "javascript". (C4's bad-words blocklist is deliberately
  out of scope — it is a list lookup, not a heuristic; compose with
  ``vocab_coverage``-style broadcast probes if needed.)

Determinism contract (the ``dsir_select`` lesson): every emitted column
is a BIGINT count or a boolean derived from EXACT integer comparisons —
no ratio doubles anywhere. Each threshold ratio r = a/b is evaluated as
an integer cross-multiplication (e.g. mean word length in [3, 10] ⇔
``3·n_words <= word_chars <= 10·n_words``), so the DuckDB oracle
replays every flag bit-for-bit.

Execution shape: ONE Catalyst projection per document — token and line
arrays are materialized as columns once and referenced as attributes
inside the per-element lambdas (the round-10 HOF rule: an EXPRESSION
inlined into a lambda re-evaluates per element; an ATTRIBUTE is a read
of an already-computed value). Zero shuffles, zero Python: quality
filtering at 100 TB is a scan.

Reference scope note: the reference engine has no document filters;
this module is part of the engine-additions surface (SURVEY §8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.datapipe._layout import spread_batch as _spread_batch


# Gopher A1 stop words: "must contain at least two of the following
# English words: the, be, to, of, and, that, have, with"
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _occurrences(t: Column, pattern: str) -> Column:
    """Non-overlapping occurrence count of a regex literal — a pure
    integer (size of the match list; no length-difference division,
    keeping the module's all-integer contract)."""
    return F.size(F.regexp_extract_all(t, F.lit(pattern), 0)).cast("bigint")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Per-document Gopher quality counts and flags →
    DataFrame[id, n_words, word_chars, n_alpha_words, n_hash,
    n_ellipsis, n_lines, n_bullet_lines, n_ellipsis_lines, n_stop_hits,
    keep]. NULL text behaves as the empty string (zero words, one
    empty line after the split), keep = false.

    ``keep`` is the conjunction of the paper's rules, each an exact
    integer comparison:
    - ``min_words <= n_words <= max_words``
    - mean word length in [3, 10]: ``3*n_words <= word_chars <= 10*n_words``
    - symbol ratios <= 0.1 EACH (the paper states the hash and ellipsis
      thresholds separately): ``10*n_hash <= n_words`` AND
      ``10*n_ellipsis <= n_words``
    - bullet lines < 90%? paper: ">90% of lines starting with a bullet
      point" is a REJECT: keep iff ``10*n_bullet_lines <= 9*n_lines``
    - ellipsis-ending lines <= 30%: ``10*n_ellipsis_lines <= 3*n_lines``
    - >=80% words with an alphabetic char: ``5*n_alpha_words >= 4*n_words``
    - >= ``min_stop_hits`` distinct stop words present (paper: 2; a
      knob because narrow-vocabulary corpora legitimately tune it)
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    # spread(): per-word regex work; few-file inputs fan out to the
    # cores, many-file scans pass through (plan stays exchange-free)
    staged = _spread_batch(df).select(
        F.col(id_col).alias("id"),
        F.regexp_extract_all(t, F.lit(r"\S+"), 0).alias("__ws"),
        F.split(t, "\n").alias("__lines"),
        _occurrences(t, "#").alias("n_hash"),
        _occurrences(t, r"\.\.\.").alias("n_ellipsis"),
    )
    ws, lines = F.col("__ws"), F.col("__lines")
    n_words = F.size(ws).cast("bigint")
    word_chars = F.aggregate(
        ws, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
    )
    n_alpha = F.size(
        F.filter(ws, lambda x: F.lower(x).rlike("[a-z]"))
    ).cast("bigint")
    n_lines = F.size(lines).cast("bigint")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: F.ltrim(l).rlike(r"^[•\-\*]"),
        )
    ).cast("bigint")
    n_ell_lines = F.size(
        F.filter(lines, lambda l: F.rtrim(l).endswith("..."))
    ).cast("bigint")
    low_words = F.transform(ws, F.lower)
    n_stop = F.size(
        F.array_intersect(
            low_words, F.array(*[F.lit(s) for s in GOPHER_STOP_WORDS])
        )
    ).cast("bigint")
    out = staged.select(
        "id",
        n_words.alias("n_words"),
        word_chars.alias("word_chars"),
        n_alpha.alias("n_alpha_words"),
        "n_hash",
        "n_ellipsis",
        n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet_lines"),
        n_ell_lines.alias("n_ellipsis_lines"),
        n_stop.alias("n_stop_hits"),
    )
    c = F.col
    keep = (
        (c("n_words") >= min_words)
        & (c("n_words") <= max_words)
        & (3 * c("n_words") <= c("word_chars"))
        & (c("word_chars") <= 10 * c("n_words"))
        & (10 * c("n_hash") <= c("n_words"))
        & (10 * c("n_ellipsis") <= c("n_words"))
        & (10 * c("n_bullet_lines") <= 9 * c("n_lines"))
        & (10 * c("n_ellipsis_lines") <= 3 * c("n_lines"))
        & (5 * c("n_alpha_words") >= 4 * c("n_words"))
        & (c("n_stop_hits") >= min_stop_hits)
    )
    return out.withColumn("keep", keep)


def fineweb_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The three FineWeb custom quality heuristics (Penedo et al. 2024,
    "The FineWeb Datasets", §3.6 — the filters they derived on top of
    the C4/Gopher base set) → DataFrame[id, n_lines, n_punct_lines,
    n_short_lines, total_chars, dup_chars, keep].

    Keep is the conjunction of the paper's three REMOVE rules negated,
    each an exact integer cross-multiplication (module contract):

    - punctuation density: REMOVE when the fraction of lines ending in
      terminal punctuation (the C4 set ``. ! ? "``) is <= 0.12 —
      keep iff ``25 * n_punct_lines > 3 * n_lines``.
    - line-level repetition: REMOVE when the fraction of characters in
      duplicated lines is >= 0.1 — duplicated characters counted over
      every occurrence AFTER the first of each distinct line value, so
      ``dup_chars = Σ len(line) - Σ len(distinct line)`` (two in-row
      array folds, no per-line relation); keep iff
      ``10 * dup_chars < total_chars`` (a zero-char doc fails this
      strict inequality, but it already fails the punctuation clause).
    - short lines: REMOVE when the fraction of lines shorter than 30
      characters is >= 0.67 — keep iff
      ``100 * n_short_lines < 67 * n_lines``.

    NULL text behaves as the empty string (one empty line after the
    split → fails the punctuation clause → keep = false). Zero-shuffle
    single projection like the other two bundles (plan-guard test)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    staged = _spread_batch(df).select(
        F.col(id_col).alias("id"),
        F.split(t, "\n").alias("__lines"),
    )
    lines = F.col("__lines")
    n_lines = F.size(lines).cast("bigint")
    n_punct = F.size(
        F.filter(lines, lambda l: F.rtrim(l).rlike('[.!?"]$'))
    ).cast("bigint")
    n_short = F.size(
        F.filter(lines, lambda l: F.length(l) < 30)
    ).cast("bigint")
    total_chars = F.aggregate(
        lines, F.lit(0).cast("bigint"), lambda a, l: a + F.length(l)
    )
    distinct_chars = F.aggregate(
        F.array_distinct(lines),
        F.lit(0).cast("bigint"),
        lambda a, l: a + F.length(l),
    )
    out = staged.select(
        "id",
        n_lines.alias("n_lines"),
        n_punct.alias("n_punct_lines"),
        n_short.alias("n_short_lines"),
        total_chars.alias("total_chars"),
        (total_chars - distinct_chars).alias("dup_chars"),
    )
    c = F.col
    keep = (
        (25 * c("n_punct_lines") > 3 * c("n_lines"))
        & (10 * c("dup_chars") < c("total_chars"))
        & (100 * c("n_short_lines") < 67 * c("n_lines"))
    )
    return out.withColumn("keep", keep)


def c4_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """Per-document C4 cleaning → DataFrame[id, n_lines, n_kept_lines,
    n_sentences, has_lorem, has_brace, keep, clean_text].

    Line rule (kept lines only): ends in terminal punctuation
    (``. ! ? "``) after rtrim AND has >= ``min_line_words`` whitespace
    words AND does not contain "javascript" (case-insensitive).
    Page rules: no "lorem ipsum" (case-insensitive), no ``{``, and the
    KEPT text contains >= ``min_sentences`` terminal-punctuation marks.
    ``clean_text`` is the kept lines re-joined with ``\\n`` (empty
    string when nothing survives); NULL text → keep = false, empty
    clean_text."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    low = F.lower(t)
    staged = _spread_batch(df).select(
        F.col(id_col).alias("id"),
        F.split(t, "\n").alias("__lines"),
        F.contains(low, F.lit("lorem ipsum")).alias("has_lorem"),
        F.contains(t, F.lit("{")).alias("has_brace"),
    )
    lines = F.col("__lines")

    def _line_ok(l: Column) -> Column:
        r = F.rtrim(l)
        return (
            r.rlike('[.!?"]$')
            & (F.size(F.regexp_extract_all(l, F.lit(r"\S+"), 0))
               >= min_line_words)
            & ~F.contains(F.lower(l), F.lit("javascript"))
        )

    kept = F.filter(lines, _line_ok)
    staged = staged.select(
        "id",
        F.size(lines).cast("bigint").alias("n_lines"),
        "has_lorem",
        "has_brace",
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(kept).cast("bigint").alias("n_kept_lines"),
    )
    n_sent = (
        F.size(
            F.regexp_extract_all(F.col("clean_text"), F.lit(r"[.!?]"), 0)
        ).cast("bigint")
    )
    out = staged.withColumn("n_sentences", n_sent)
    keep = (
        ~F.col("has_lorem")
        & ~F.col("has_brace")
        & (F.col("n_sentences") >= min_sentences)
        & (F.col("n_kept_lines") >= 1)
    )
    return out.select(
        "id",
        "n_lines",
        "n_kept_lines",
        "n_sentences",
        "has_lorem",
        "has_brace",
        keep.alias("keep"),
        "clean_text",
    )
