"""Benchmark decontamination — flag training documents that share word
n-grams with an evaluation set.

Every serious LLM data pipeline runs this step (the GPT-3 paper's
"13-gram overlap" rule and its descendants): any training document
containing an n-gram that also occurs in a benchmark/eval document is
suspect and gets dropped or audited.

100 TB shape: the eval side is tiny (benchmarks are thousands of
documents, not billions), so its distinct n-gram HASHES — 8 bytes each —
broadcast to every executor; the training side streams once, explodes
its n-grams Catalyst-side, and keeps only gram hashes that hit the
broadcast set. Nothing about the training corpus is ever shuffled except
the per-doc hit aggregation, keyed by doc id. The n-gram construction is
``transform`` over a guarded ``sequence`` — whole-stage codegen, no
Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.datapipe.dedup import md5_long


def word_ngrams(text: Column, n: int) -> Column:
    """array<string> of space-joined word ``n``-grams of ``text``
    (lower-cased ``\\w+`` tokens); empty when the document has fewer
    than ``n`` words.

    The token array enters the per-gram lambda as a LAMBDA VARIABLE
    (1-element outer transform), not inline: HOF lambdas re-evaluate
    their body per element, so an inlined ``ws`` re-runs the regexp
    tokenization once per n-gram (the winnow.py lesson, round 10)."""
    ws = F.regexp_extract_all(F.lower(F.coalesce(text, F.lit(""))), F.lit(r"\w+"), 0)
    return F.flatten(
        F.transform(
            F.array(ws),
            lambda w: F.when(
                F.size(w) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(w, i, n)),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
    )


def _gram_hash(gram: Column, hash_family: str) -> Column:
    if hash_family == "md5":
        return md5_long(gram)
    return F.xxhash64(gram)


def _exploded_ngram_hashes(
    df: DataFrame, text_col: str, id_col: str, n: int, hash_family: str
) -> DataFrame:
    """DataFrame[id, h] — one row per word n-gram occurrence.

    posexplode single tokens, then n−1 ``lead()`` steps over one
    doc-scoped window assemble each gram (same rows as
    :func:`word_ngrams`, ~7× cheaper at scale than materializing
    shifted arrays with slice/concat — rows carry one short token each
    and all leads ride a single window pass)."""
    from pyspark.sql import Window

    ws = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(r"\w+"), 0
    )
    we = df.select(F.col(id_col), F.posexplode(ws).alias("pos", "w0"))
    lw = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.lead("w0", i).over(lw).alias(f"w{i}") for i in range(1, n)]
    grams = we.select(id_col, "w0", *leads).where(
        F.col(f"w{n - 1}").isNotNull()
    )
    g = F.concat_ws(" ", *[F.col(f"w{i}") for i in range(n)])
    return grams.select(id_col, _gram_hash(g, hash_family).alias("h"))


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Contaminated training documents → DataFrame[doc_id, n_hits,
    n_distinct_grams]: total overlapping n-gram occurrences and how many
    distinct eval n-grams were hit. Documents with zero overlap are not
    returned (at corpus scale the contaminated set is the small output).

    The eval side reduces to distinct 8-byte gram hashes and broadcasts;
    the train side explodes grams and semi-joins the broadcast set —
    one scan of the corpus, one doc-keyed aggregation.
    """
    ev = (
        _exploded_ngram_hashes(eval_df, text_col, id_col, n, hash_family)
        .select("h")
        .distinct()
    )
    tr = _exploded_ngram_hashes(train, text_col, id_col, n, hash_family)
    return (
        tr.join(F.broadcast(ev), "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.count_distinct("h").alias("n_distinct_grams"),
        )
        .select(
            id_col,
            F.col("n_hits").cast("bigint").alias("n_hits"),
            F.col("n_distinct_grams").cast("bigint").alias("n_distinct_grams"),
        )
    )
