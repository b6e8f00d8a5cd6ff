"""Multi-k reduction ladder — ``reflexiv reduce`` (J2/W4/I3).

Reference: for consecutive k-mer sizes (k, k') in the k-list the sets are
unioned, end-align-sorted, and shorter-k k-mers whose sequence matches a
longer k-mer's end are dropped / variant-adjusted
(``ReflexivDSDynamicKmerRuduction.java:199-230`` — union at 202, sorts at
209/217/227; driver ladder ``Pipelines.java:1349-1560`` over the default
klist 23,31,41,53,67,81,95, ``DefaultParam.java:87``).

Spark-first: "matches a longer k-mer's end" is an equi-join, not a sort.
The long set contributes its two end k_s-mers (canonicalized); the short
set anti-joins against them — one hash exchange over a set ~2×|long|,
no global sorts, no range-partitioner sampling. The ladder is a driver
loop of such anti-joins, with each intermediate localCheckpoint'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.functions.kmer import canonical_kmer

# Reference default k-mer ladder: DefaultParam.java:87.
DEFAULT_KLIST = (23, 31, 41, 53, 67, 81, 95)


def filter_klist(kmers: DataFrame, klist: tuple[int, ...]) -> DataFrame:
    """F7: keep k-mers whose length is in the ladder whitelist — the
    guard the reference applies when re-reading mixed-k intermediate sets
    (``ReflexivDSDynamicKmerRuduction.java:3204``, ``kmerSizeCheck``
    ``:3277-3283``)."""
    return kmers.where(F.length("kmer").isin(*klist))


def long_kmer_ends(long_counts: DataFrame, k_short: int) -> DataFrame:
    """Canonical k_short-length end substrings of each longer k-mer.

    Both the leading and trailing k_short-mer (in canonical form) — the
    positions a shorter-k duplicate can occupy after end-alignment (W4).
    """
    km = F.col("kmer")
    ends = F.array(
        canonical_kmer(F.substring(km, 1, k_short)),
        canonical_kmer(
            F.substring(km, F.length(km) - F.lit(k_short - 1), F.lit(k_short))
        ),
    )
    return (
        long_counts.select(F.explode(ends).alias("kmer"))
        .dropDuplicates(["kmer"])
    )


def reduce_kmer_sets(
    short_counts: DataFrame,
    long_counts: DataFrame,
    k_short: int,
    k_long: int,
) -> DataFrame:
    """Drop short-k k-mers already represented at a longer k (J2/W4).

    Returns DataFrame[k, kmer, count]: surviving short-k rows tagged
    ``k_short`` unioned with all long-k rows tagged ``k_long``. A short
    canonical k-mer is redundant iff it equals the canonical form of a
    longer k-mer's leading or trailing k_short-mer.
    """
    ends = long_kmer_ends(long_counts, k_short)
    survivors = short_counts.join(ends, "kmer", "left_anti")
    return survivors.select(
        F.lit(k_short).alias("k"), "kmer", "count"
    ).unionByName(
        long_counts.select(F.lit(k_long).alias("k"), "kmer", "count")
    )


def reduce_kmer_ladder(
    reads: DataFrame,
    klist: tuple[int, ...] = DEFAULT_KLIST,
    seq_col: str = "seq",
    min_coverage: int = 2,
    max_coverage: int = 10_000_000,
) -> DataFrame:
    """Count every k in ``klist`` and reduce consecutive pairs (I3).

    Result: DataFrame[k, kmer, count] — for each adjacent (k_i, k_{i+1})
    the k_i set keeps only k-mers not represented at k_{i+1}; the largest
    k keeps everything. Mirrors the reference driver ladder
    (``Pipelines.java:1349-1560``) with Parquet-free in-session barriers
    (localCheckpoint) instead of per-step SparkSessions + gzip CSV.
    """
    from reflexiv_spark.operators.counter import count_kmers

    ks = sorted(klist)
    counts = {
        k: count_kmers(
            reads, k, seq_col=seq_col,
            min_coverage=min_coverage, max_coverage=max_coverage,
        ).localCheckpoint(eager=False)
        for k in ks
    }
    out: DataFrame | None = None
    for k_short, k_long in zip(ks, ks[1:]):
        ends = long_kmer_ends(counts[k_long], k_short)
        survivors = counts[k_short].join(ends, "kmer", "left_anti")
        tagged = survivors.select(F.lit(k_short).alias("k"), "kmer", "count")
        out = tagged if out is None else out.unionByName(tagged)
    top = counts[ks[-1]].select(F.lit(ks[-1]).alias("k"), "kmer", "count")
    return top if out is None else out.unionByName(top)
