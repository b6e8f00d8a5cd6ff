"""Contig patching kernels — pair-support counting and best-connection pick.

Reference: ``reflexiv patch`` builds read-seed ⋈ contig-seed pairs, counts
read support per (left contig, right contig) pair, and picks the best
connection per right contig — all hand-rolled as union → global sort →
ordered scan (``ReflexivDSDynamicKmerPatching.java:250-301``; the CC-pair
count ``filterForCCpair`` at ``:279-301``, best pick ``sort(right asc,
count desc)`` + first-per-key at ``:292-301``).

Spark-first: A4 is a plain ``groupBy(left, right).count()`` (partial
map-side combine, one hash exchange) and W6 is ``row_number() OVER
(PARTITION BY right ORDER BY support DESC, left)`` — no global sorts, no
range-partitioner sampling jobs. Both whole-stage-codegen'd; AQE handles
skewed popular contigs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from reflexiv_spark.functions.kmer import canonical_kmer


def count_pair_support(
    pairs: DataFrame,
    left_col: str,
    right_col: str,
    out_col: str = "support",
    weight_col: str | None = None,
) -> DataFrame:
    """A4: support count per (left, right) connection pair.

    ``weight_col`` carries read multiplicity when the caller collapsed
    duplicate reads to one row (content-deterministic ids)."""
    agg = (
        F.sum(weight_col) if weight_col else F.count(F.lit(1))
    ).alias(out_col)
    return pairs.groupBy(left_col, right_col).agg(agg)


def best_connection(
    pair_counts: DataFrame,
    left_col: str,
    right_col: str,
    support_col: str = "support",
) -> DataFrame:
    """W6: per right key keep the best-supported left connection.

    Ordering mirrors the reference's ``sort(col("right").asc,
    col("count").desc)`` + first-per-right-key scan
    (``ReflexivDSDynamicKmerPatching.java:292-301``); ties break on the
    left key ascending for determinism.
    """
    w = Window.partitionBy(right_col).orderBy(
        F.col(support_col).desc(), F.col(left_col).asc()
    )
    return (
        pair_counts.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _seed_expr(seq: Column, seed_k: int, from_end: bool) -> Column:
    if from_end:
        return canonical_kmer(F.substring(seq, -seed_k, seed_k))
    return canonical_kmer(F.substring(seq, 1, seed_k))


def patch_contigs(
    reads: DataFrame,
    contigs: DataFrame,
    seed_k: int = 31,
    min_support: int = 1,
    read_seq: str = "seq",
    contig_id: str = "contig_id",
    contig_seq: str = "seq",
) -> DataFrame:
    """J3+J4+W6: bridge contig pairs supported by reads.

    A read supports the connection (left → right) when it contains the
    canonical end-seed of ``left`` and the canonical start-seed of
    ``right``. Returns DataFrame[left, right, support] with the
    best-supported connection per right contig — the relational
    re-expression of ``ReflexivDSDynamicKmerPatching.java:250-301``:
    two equi-joins on the seed (Catalyst picks broadcast when the contig
    side is small), one pair-count aggregate, one window pick.

    Read ids are content hashes (identical reads collapse to one row
    whose multiplicity rides a weight column): the id never depends on
    partition recompute order, and the two seed-join branches below reuse
    the same exploded frame without the
    ``monotonically_increasing_id``-under-recompute hazard.
    """
    from reflexiv_spark.functions.kmer import explode_kmers

    # Accepted risk: a 64-bit content-hash collision between two distinct
    # read sequences would join one read's left hits with the other's right
    # hits, fabricating a support pair. P(collision) ≈ n²/2⁶⁵ — negligible
    # even at 10¹⁰ distinct reads, and cheaper than shuffling sequences as
    # join keys. Same trade in stitch_bridges / extend_contigs_with_reads.
    r = (
        reads.select(F.upper(F.col(read_seq)).alias("__rs"))
        .groupBy("__rs")
        .agg(F.count(F.lit(1)).alias("weight"))
        .withColumn("read_id", F.xxhash64("__rs"))
    )
    read_kmers = explode_kmers(
        r, seed_k, seq_col="__rs", keep_cols=["read_id", "weight"]
    ).select("read_id", "weight", F.col("kmer").alias("seed"))

    left_seeds = contigs.select(
        F.col(contig_id).alias("left"),
        _seed_expr(F.col(contig_seq), seed_k, from_end=True).alias("seed"),
    )
    right_seeds = contigs.select(
        F.col(contig_id).alias("right"),
        _seed_expr(F.col(contig_seq), seed_k, from_end=False).alias("seed"),
    )
    lefts = read_kmers.join(left_seeds, "seed").select(
        "read_id", "weight", "left"
    )
    rights = read_kmers.join(right_seeds, "seed").select("read_id", "right")
    pairs = lefts.join(rights, "read_id").where(F.col("left") != F.col("right"))
    support = count_pair_support(
        pairs.dropDuplicates(["read_id", "left", "right"]),
        "left",
        "right",
        weight_col="weight",
    )
    best = best_connection(support, "left", "right")
    return best.where(F.col("support") >= min_support)
