"""Composed web-curation pipeline — the WET-side capstone: raw crawl
text → markup strip → Gopher quality gate → exact dedup → per-language
data card, as ONE lazy DataFrame composition of the engine's own
stages (``text.strip_markup`` → ``filters.gopher_rules`` →
``dedup.exact_dedup`` → ``report.corpus_report``).

This is the shape every web-corpus release actually runs (C4 §2.2,
Gopher Appendix A, FineWeb §3): the stages are individually
oracle-proven; this module makes the COMPOSITION a first-class,
hash-verifiable operator, so a wiring bug between stages (column
drift, verdict inversion, dedup on the wrong text) cannot hide behind
stage-level green rows.

Execution shape (the single-scan ``clean_corpus`` lesson): strip and
the Gopher verdict are pure projections, so the corpus is scanned ONCE
and flows through both without an exchange — the stage boundary trick
is that the rule bundles only ALIAS their ``id_col``, so a STRUCT key
carries (id, lang, source, clean_text) through them without a re-join.
The first corpus-sized exchange is the dedup hash on normalized clean
text; after that only the report's language-sized aggregates remain.
At 100 TB: one scan, one text-keyed exchange, dim-bounded output —
the same plan family as clean_corpus (whose rewrite measured 9→4
exchanges for exactly this reason).

Own module (imports text/filters/dedup/report, is imported by none of
them) so standing queries stay window-unaffected — the winnow_store.py
convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.datapipe.dedup import exact_dedup
from reflexiv_spark.datapipe.filters import gopher_rules
from reflexiv_spark.datapipe.report import corpus_report
from reflexiv_spark.datapipe.text import strip_markup


def web_curate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    source_col: str = "source",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Strip markup, keep Gopher-quality documents, drop exact
    duplicates of the CLEAN text (smallest id wins), and return the
    per-language :func:`corpus_report` data card of the curated corpus
    → DataFrame[lang, n_docs, n_empty, total_tokens, median_tokens,
    n_dup_docs, n_distinct_texts, n_sources].

    ``n_dup_docs`` is 0 by construction (the dedup stage ran); it stays
    in the schema so the card is drop-in comparable with the RAW
    corpus's card — the before/after pair releases publish.

    The Gopher thresholds forward to :func:`filters.gopher_rules`.
    Curated TEXT (not the card) is available by composing the stages
    directly; this operator exists for the gate + card shape."""
    carried = df.select(
        F.struct(
            F.col(id_col).alias("id"),
            F.col(lang_col).alias("lang"),
            F.col(source_col).alias("src"),
        ).alias("__carry"),
        F.col(text_col).alias("__text"),
    )
    cleaned = strip_markup(carried, text_col="__text", id_col="__carry")
    # re-pack with the CLEAN text so the quality stage (which keeps
    # only its id column + counts) carries it through in-row
    staged = cleaned.select(
        F.struct(
            F.col("__carry.id").alias("id"),
            F.col("__carry.lang").alias("lang"),
            F.col("__carry.src").alias("src"),
            F.col("__text").alias("text"),
        ).alias("__c2"),
        F.col("__text"),
    )
    quality = gopher_rules(
        staged,
        text_col="__text",
        id_col="__c2",
        min_words=min_words,
        max_words=max_words,
        min_stop_hits=min_stop_hits,
    )
    kept = quality.where(F.col("keep")).select(
        F.col("id.id").alias(id_col),
        F.col("id.lang").alias(lang_col),
        F.col("id.src").alias(source_col),
        F.col("id.text").alias(text_col),
    )
    deduped = exact_dedup(kept, text_col=text_col, id_col=id_col)
    # lazy barrier (the winnow_overlap lesson): corpus_report derives
    # its dup/median/base aggregates from three consumers of the same
    # input — without the barrier each one re-executes the whole
    # strip → quality → dedup chain (measured: 3 parquet scans, 13
    # exchanges; with it: 1 scan of the curated rows)
    deduped = deduped.localCheckpoint(eager=False)
    return corpus_report(
        deduped,
        text_col=text_col,
        id_col=id_col,
        lang_col=lang_col,
        source_col=source_col,
    )
