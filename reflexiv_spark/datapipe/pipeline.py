"""Composed corpus-cleaning pipeline — the end-to-end shape of a
training-data preparation job, built from the engine's own primitives:

1. quality + language scoring (shuffle-free Catalyst expressions —
   :mod:`reflexiv_spark.datapipe.text`),
2. threshold filters (tokens band, quality floor, language allowlist),
3. exact dedup (one hash shuffle on normalized text, smallest id wins),
4. MinHash/LSH near-dup dedup among the survivors (banded candidate
   join, id-only candidate exchange).

Stage order is part of the contract: filters run FIRST so dedup
tie-breaks are decided among surviving rows only (dropping a low-quality
copy must not also delete its high-quality near-duplicate), and exact
dedup runs before MinHash so clone blocks never reach the band join (the
hot-bucket worst case — see tests/test_skew.py).

Every stage is deterministic and ANSI-SQL-expressible, so the whole
composition has a DuckDB oracle (``clean_corpus`` in
``__spark_entry__.oracle_sql()``) replaying it end to end with the md5
hash family; production runs xxhash64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.datapipe._layout import spread_batch
from reflexiv_spark.datapipe.dedup import exact_dedup, minhash_dedup
from reflexiv_spark.datapipe.text import _pred_lang, quality_score


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_quality: float = 0.6,
    langs: tuple[str, ...] | None = ("en",),
    near_dup: bool = True,
    max_dup_line_frac: float | None = None,
    max_top_bigram_frac: float | None = None,
    w: int = 8,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """documents → cleaned corpus: DataFrame[id, n_tokens, quality,
    pred_lang] of rows that pass the quality/language filters and survive
    exact + near-duplicate deduplication.

    100 TB shape: scoring is embarrassingly parallel (zero shuffle); the
    filters prune before anything shuffles; exact dedup is one hash
    exchange of surviving rows; MinHash adds one shingle aggregation and
    a banded id-only candidate join. Nothing is all-pairs.
    """
    # quality AND language ride ONE projection over ONE corpus scan —
    # both are pure Catalyst expressions, so the per-operator
    # DataFrame + id-join composition (round-11 form) re-scanned the
    # corpus twice and paid two id-keyed shuffles of the FULL text
    # column for nothing — the dominant cost at 100 TB. Rewrite is
    # output-identical, same oracle. spread_batch: the projection is
    # CPU-bound (~34 regex extractions per row), so a few-file local
    # input must fan out to the session's cores first; a many-file
    # scan passes through untouched (the winnow kernel's pattern).
    scored = quality_score(
        spread_batch(docs), text_col, id_col, keep_text=True
    ).withColumn("pred_lang", _pred_lang(F.col(text_col)))
    kept = scored.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("quality") >= min_quality)
    )
    if langs is not None:
        kept = kept.where(F.col("pred_lang").isin(*langs))
    if max_dup_line_frac is not None or max_top_bigram_frac is not None:
        # optional Gopher-repetition stage: rides repetition_stats, runs
        # with the other filters (before any dedup) so repetitive spam
        # never influences near-dup tie-breaking
        from reflexiv_spark.datapipe.text import repetition_stats

        rep = repetition_stats(docs, text_col, id_col).select(
            id_col, "dup_line_frac", "top_bigram_char_frac"
        )
        kept = kept.join(rep, id_col)
        if max_dup_line_frac is not None:
            kept = kept.where(F.col("dup_line_frac") <= max_dup_line_frac)
        if max_top_bigram_frac is not None:
            kept = kept.where(
                F.col("top_bigram_char_frac") <= max_top_bigram_frac
            )
        kept = kept.drop("dup_line_frac", "top_bigram_char_frac")

    deduped = exact_dedup(kept, text_col, id_col)
    if near_dup:
        # minhash_dedup references its input TWICE — once under the
        # signature aggregation (through its own lazy checkpoint) and
        # once as the left side of the final anti-join. The checkpoint
        # is a LogicalRDD, so Catalyst cannot mark the two upstream
        # subtrees equal and the whole prefix — source scan, the
        # ~34-regex quality/language projection, the filters, AND the
        # exact-dedup window exchange — executed twice (r13's
        # tokenize-once device applied at pipeline granularity,
        # guide §2.4/§5: reuse beats recompute when the recompute is a
        # full corpus scan + regex pass + exchange). One lazy barrier
        # makes both references read the same pinned survivor blocks;
        # rows are identical, output unchanged.
        from reflexiv_spark.plans.barriers import iteration_barrier

        deduped = iteration_barrier(deduped, eager=False)
        deduped = minhash_dedup(
            deduped,
            text_col,
            id_col,
            w=w,
            num_hashes=num_hashes,
            bands=bands,
            threshold=threshold,
            hash_family=hash_family,
        )
    return deduped.select(id_col, "n_tokens", "quality", "pred_lang")
