"""Keyword retrieval scoring — BM25 over the corpus.

Search-style scoring is the missing sibling of the similarity stack:
embeddings give ANN, MinHash gives near-dup, BM25 gives ranked keyword
retrieval (Robertson & Spärck Jones's probabilistic model, the default
lexical ranker in every search engine).

Plan shape at 100 TB: the query is a handful of term LITERALS, so one
corpus scan computes everything doc-local — tokenize once, dl =
size(tokens), per-term tf = an array filter — and no token row is ever
exploded or shuffled; what leaves the scan is ≤ |terms| struct rows per
matching doc. Corpus statistics (N, avgdl) are two scalar aggregates
broadcast back via tiny cross joins; the final score is one doc-keyed
sum. No global sort — callers top-k the result with a window/limit,
which Spark executes as TakeOrdered.

Determinism: scores use log10/division on identical doubles and round
to 6 — the same cross-engine-stable device as
:func:`reflexiv_spark.datapipe.text.unigram_logprob_score`, so the SQL
oracle replays the ranking exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_score(
    df: DataFrame,
    query: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
) -> DataFrame:
    """BM25 scores for every document matching ≥ 1 query term →
    DataFrame[doc_id, n_matched, score].

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·dl/avgdl))
    with idf(t) = log10(1 + (N − df_t + 0.5)/(df_t + 0.5)); dl counts
    ``\\w+`` word tokens, N and avgdl are corpus-wide.
    """
    terms = sorted({t for t in query.lower().split() if t})
    if not terms:
        # zero query terms → zero matches. Without this, F.array() of
        # zero structs has VOID element type and the F.filter below
        # fails to resolve (INVALID_EXTRACT_BASE_FIELD_TYPE); the old
        # broadcast-join form returned empty, so keep that contract.
        # Schema built programmatically (not a DDL f-string) so an
        # id_col needing backticks parses the same as the non-empty path.
        from pyspark.sql import types as T

        spark = df.sparkSession
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField(id_col, df.schema[id_col].dataType),
                    T.StructField("n_matched", T.LongType()),
                    T.StructField("score", T.DoubleType()),
                ]
            ),
        )

    tok_arr = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(r"\w+"), 0
    )
    # ONE corpus scan computes everything doc-local: the regex
    # tokenization (the dominant compute) runs once, dl is size() of the
    # token array, and per-term tf is an array filter against the
    # handful of query-term literals — so NO token row is ever exploded
    # or shuffled (the old form tokenized the corpus twice and exchanged
    # every token to count doc lengths), and the dl join disappears
    # because dl rides the same row as tf. `dl > 0` keeps the exact old
    # semantics: N/avgdl count docs with ≥1 token.
    tf_structs = F.array(
        *[
            F.struct(
                F.lit(t).alias("term"),
                F.size(
                    F.filter("__toks", lambda x: x == F.lit(t))
                ).cast("long").alias("tf"),
            )
            for t in terms
        ]
    )
    base = (
        df.select(F.col(id_col), tok_arr.alias("__toks"))
        .select(
            F.col(id_col),
            F.size("__toks").cast("long").alias("dl"),
            F.filter(tf_structs, lambda s: s.tf > 0).alias("__tfs"),
        )
        .where(F.col("dl") > 0)
        # consumed by the scalar stats agg AND the tf explode: doc-level
        # rows only (id, dl, ≤|terms| structs) — materialize the scan once
        .localCheckpoint(eager=False)
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )

    tf = base.where(F.size("__tfs") > 0).select(
        F.col(id_col),
        "dl",
        F.explode("__tfs").alias("__t"),
    ).select(
        id_col, "dl",
        F.col("__t.term").alias("term"),
        F.col("__t.tf").alias("tf"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.crossJoin(F.broadcast(stats.select("n_docs"))).select(
        "term",
        F.log10(
            1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )

    scored = (
        tf.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .select(
            id_col,
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matched"),
        F.round(F.sum("part"), round_digits).alias("score"),
    )
