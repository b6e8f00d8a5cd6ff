"""Canonical k-mer counting — the reference's core workload.

Reference: ``reflexiv counter`` → text scan → sequence-line filter →
``mapPartitions`` canonical k-mer extraction over 2-bit packed longs →
``groupBy("value").count()`` → coverage filters → CSV sink
(``ReflexivDataFrameCounter.java:156-233``; 64-bit variant
``ReflexivDataFrameCounter64.java:200-202``).

Spark-first design: the extraction is a Catalyst ``transform``/``explode``
expression (no UDF), counting is the built-in hash aggregate (partial
map-side combine + final, spill-to-disk, AQE-coalesced post-shuffle), and
coverage filters are plain predicates applied after the agg — at 100 TB the
only shuffle is the single hash exchange on the canonical k-mer, which is
also the minimum possible for an exact count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.functions.kmer import explode_kmers

# Reference defaults: DefaultParam.java:104-105.
DEFAULT_MIN_COVERAGE = 2
DEFAULT_MAX_COVERAGE = 10_000_000


def count_kmers(
    reads: DataFrame,
    k: int,
    seq_col: str = "seq",
    canonical: bool = True,
    min_coverage: int = DEFAULT_MIN_COVERAGE,
    max_coverage: int = DEFAULT_MAX_COVERAGE,
    front_clip: int = 0,
    end_clip: int = 0,
    max_read_length: int | None = None,
    read_limit: int | None = None,
) -> DataFrame:
    """reads[seq] → DataFrame[kmer: string, count: long].

    front_clip/end_clip mirror the reference's read trimming (F3,
    ``ReflexivDataFrameCounter.java:471-478``); reads shorter than
    ``k + clips`` are dropped, matching the reference's length guard.
    max_read_length is F4 (default 600 in the reference's 4mc path,
    ``ReflexivDataFrameCounter.java:345-349``); read_limit is F8
    (``Parameter.java:443-450``).
    """
    df = reads
    if read_limit is not None:
        df = df.limit(read_limit)
    if max_read_length is not None:
        df = df.where(F.length(seq_col) < max_read_length)
    if front_clip or end_clip:
        df = df.where(F.length(seq_col) >= k + front_clip + end_clip).withColumn(
            seq_col,
            F.col(seq_col).substr(
                F.lit(front_clip + 1),
                F.length(seq_col) - F.lit(front_clip + end_clip),
            ),
        )
    kmers = explode_kmers(df, k, seq_col=seq_col, canonical=canonical)
    counts = kmers.groupBy("kmer").agg(F.count(F.lit(1)).alias("count"))
    if min_coverage > 1:
        counts = counts.where(F.col("count") >= min_coverage)  # F1
    if max_coverage is not None:
        counts = counts.where(F.col("count") <= max_coverage)  # F2
    return counts
