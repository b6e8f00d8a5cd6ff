"""Corpus report — the per-language "data card" summary table every
dataset release ships (what Gopher/The Pile/FineWeb publish as corpus
statistics): document and token counts, empty-document count, an exact
median document length, exact-duplicate counts, and source spread.

All-integer output (the dsir_select lesson as design rule): token
counts are exact ``\\S+`` run counts (the ``text_stats`` device), the
median is the value at rank ``(n+1) div 2`` ordering by
``(n_tokens, doc_id)`` — a pure function of the multiset, replayable
by an ANSI window — and duplicate counts come from md5-60bit
fingerprints of the normalized text (the ``exact_dedup`` device; a
60-bit collision would merge two distinct texts — ~1e-18 per pair,
the dedup family's accepted odds).

Scale shape: one corpus scan computes every per-document column; the
aggregation is one fingerprint-keyed count (dedup groups) + one
lang-keyed aggregate + one lang-keyed median window over doc-level
rows. Nothing is collected; the output is languages-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from reflexiv_spark.datapipe.dedup import md5_long, normalize_text


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    source_col: str | None = "source",
) -> DataFrame:
    """Per-language corpus statistics → DataFrame[lang, n_docs,
    n_empty, total_tokens, median_tokens, n_dup_docs, n_distinct_texts,
    n_sources].

    - ``n_empty``: NULL or whitespace-only documents (they also count
      0 toward ``total_tokens`` and enter the median at 0);
    - ``median_tokens``: exact — the ``n_tokens`` value at rank
      ``(n+1) div 2`` ordering by (n_tokens, doc_id);
    - ``n_dup_docs``: documents whose normalized text occurs more than
      once WITHIN the language (all members counted, non-NULL texts
      only); ``n_distinct_texts``: distinct normalized non-NULL texts;
    - ``n_sources``: distinct ``source_col`` values (0 when the column
      is absent or None).
    """
    t = F.col(text_col)
    has_src = source_col is not None and source_col in df.columns
    per_doc = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.size(
            F.filter(
                F.split(F.coalesce(t, F.lit("")), r"\s+"),
                lambda x: x != "",
            )
        ).cast("bigint").alias("n_tokens"),
        (F.length(F.trim(F.coalesce(t, F.lit("")))) == 0).alias("empty"),
        F.when(t.isNotNull(), md5_long(normalize_text(t))).alias("fp"),
        (
            F.col(source_col) if has_src else F.lit(None).cast("string")
        ).alias("src"),
    )
    dup = (
        per_doc.where(F.col("fp").isNotNull())
        .groupBy("lang", "fp")
        .agg(F.count(F.lit(1)).alias("grp"))
    )
    dup_stats = dup.groupBy("lang").agg(
        F.sum(F.when(F.col("grp") > 1, F.col("grp")).otherwise(0))
        .cast("bigint")
        .alias("n_dup_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_texts"),
    )
    w = Window.partitionBy("lang").orderBy("n_tokens", "doc_id")
    n = Window.partitionBy("lang")
    med = (
        per_doc.select(
            "lang",
            "n_tokens",
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(n).alias("__n"),
        )
        .where(F.col("__rn") == F.expr("div(__n + 1, 2)"))
        .select("lang", F.col("n_tokens").alias("median_tokens"))
    )
    base = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("empty"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_empty"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.count_distinct("src").cast("bigint").alias("n_sources"),
    )
    # eqNullSafe joins (round-13 ADVICE): groupBy and the windows both
    # produce a NULL-lang group, but a plain equi-join rejects NULL
    # keys — NULL-lang documents would appear in NO output row, and a
    # data card must account for every document. The NULL-lang group
    # survives as its own row.
    med = med.withColumnRenamed("lang", "__lang_m")
    dup_stats = dup_stats.withColumnRenamed("lang", "__lang_d")
    return (
        base.join(med, F.col("lang").eqNullSafe(F.col("__lang_m")))
        .drop("__lang_m")
        .join(
            dup_stats,
            F.col("lang").eqNullSafe(F.col("__lang_d")),
            "left",
        )
        .drop("__lang_d")
        .select(
            "lang",
            "n_docs",
            "n_empty",
            "total_tokens",
            "median_tokens",
            F.coalesce("n_dup_docs", F.lit(0)).cast("bigint").alias(
                "n_dup_docs"
            ),
            F.coalesce("n_distinct_texts", F.lit(0)).cast("bigint").alias(
                "n_distinct_texts"
            ),
            "n_sources",
        )
    )
