"""CCNet-style reference-model perplexity bucketing (Wenzek et al.,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data", LREC 2020).

The quality split CCNet popularized: score every document's tokens
under a language model trained on a CLEAN REFERENCE corpus (theirs: a
KenLM 5-gram on Wikipedia), then split each language's documents into
HEAD / MIDDLE / TAIL thirds by per-token perplexity — head is the
high-quality slice pretraining mixes upweight. The difference from
``text.unigram_logprob_score`` is the reference: that operator scores
documents under the corpus's OWN unigram model (fluency relative to
itself); this one measures distance from an external clean
distribution, which is what makes the split a QUALITY signal rather
than a typicality signal.

Model approximation, stated honestly: a hashed-bucket add-1-smoothed
UNIGRAM model (dim buckets — the dsir/divergence device), not a 5-gram
KenLM; the bucketing machinery is exact and the model is swappable
(the score is Σ -log10 p(bucket(token)) in integer micro-units).

Determinism contract: the model's per-bucket negative-log-prob is
floored ONCE to integer micro-units (the dsir device), per-document
totals are exact bigint sums, the per-token score is integral ``div``,
and the tertile split is an exact integer cross-multiplication on the
per-language rank (3·rank ≤ n → head, 3·rank ≤ 2n → middle, else
tail; rank ties break on doc_id) — every column replayable by an
ANSI-SQL oracle bit-for-bit.

Scale shape at 100 TB: the reference model is a dim-row broadcast; the
corpus is scanned once (single-scan tokenize like divergence.py); the
split is one per-language window over doc-level rows (docs-sized, not
token-sized — and per-language partitions are balanced unless one
language dominates, in which case the rank can ride the histogram
device instead; documented knob, not needed at current scales).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MICRO = 1_000_000


def _hash_mod(c: Column, dim: int, hash_family: str) -> Column:
    if hash_family == "md5":
        from reflexiv_spark.datapipe.dedup import md5_long

        return F.pmod(md5_long(c), F.lit(dim))
    return F.pmod(F.xxhash64(c), F.lit(dim))


def _tokens(text_col: str) -> Column:
    return F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(r"\w+"), 0
    )


def reference_nll_model(
    ref: DataFrame,
    text_col: str = "text",
    dim: int = 4096,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """DataFrame[idx, nll_micro] — the reference corpus's hashed-unigram
    model as per-bucket negative log10 probability in integer
    micro-units: nll(b) = floor(-log10((c_b + 1)/(total + dim)) · 1e6),
    every bucket present (absent buckets carry the +1 smoothing mass).
    dim-row, broadcastable — model-sized by construction."""
    spark = ref.sparkSession
    counts = (
        ref.select(F.explode(F.transform(_tokens(text_col),
                                         lambda w: F.concat(F.lit("u|"), w))
                             ).alias("f"))
        .select(_hash_mod(F.col("f"), dim, hash_family).alias("idx"))
        .groupBy("idx")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # bucket join + derived total
    )
    total = counts.agg(F.sum("c").alias("t"))
    buckets = spark.range(dim).select(F.col("id").alias("idx"))
    return (
        buckets.join(counts, "idx", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "idx",
            F.floor(
                -F.log10(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                    / (F.col("t") + dim).cast("double")
                )
                * MICRO
            ).cast("bigint").alias("nll_micro"),
        )
    )


def ccnet_buckets(
    docs: DataFrame,
    ref: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    dim: int = 4096,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Per-document reference-model score + CCNet head/middle/tail
    split → DataFrame[doc_id, lang, n_tokens, nll_micro_per_token,
    bucket].

    ``nll_micro_per_token`` = div(Σ nll_micro(token buckets), n_tokens)
    — the integer-micro per-token negative log10 likelihood under the
    reference model (monotone in perplexity: 10^(nll/1e6) per token).
    ``bucket``: within each language, rank documents ascending by
    (nll_micro_per_token, doc_id) and split into exact integer
    tertiles — 'head' (best-scoring third, 3·rank ≤ n), 'middle'
    (3·rank ≤ 2n), 'tail'. Zero-token documents score NULL and land in
    'tail' (CCNet drops them; keeping them flagged lets the caller
    decide)."""
    model = reference_nll_model(ref, text_col, dim, hash_family)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(text_col)).alias("w"),
    ).select(
        "doc_id",
        _hash_mod(F.concat(F.lit("u|"), F.col("w")), dim, hash_family).alias(
            "idx"
        ),
    )
    perdoc = (
        toks.join(F.broadcast(model), "idx")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("nll_micro").alias("s"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.expr("div(s, n_tokens)").cast("bigint").alias(
                "nll_micro_per_token"
            ),
        )
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang")
    ).join(perdoc, "doc_id", "left")
    w = Window.partitionBy("lang").orderBy(
        F.col("nll_micro_per_token").asc_nulls_last(), F.col("doc_id")
    )
    n = Window.partitionBy("lang")
    ranked = base.select(
        "doc_id",
        "lang",
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
        "nll_micro_per_token",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(n).alias("__n"),
    )
    bucket = (
        F.when(F.col("nll_micro_per_token").isNull(), F.lit("tail"))
        .when(3 * F.col("__rn") <= F.col("__n"), F.lit("head"))
        .when(3 * F.col("__rn") <= 2 * F.col("__n"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return ranked.select(
        "doc_id", "lang", "n_tokens", "nll_micro_per_token",
        bucket.alias("bucket"),
    )
