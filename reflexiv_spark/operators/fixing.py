"""Junction fixing — validate and merge contigs across unique fixed-k
junctions (A2/U2, ``04Fixing``/``05FixingAgain`` stages).

Reference: the reduced multi-k set is re-keyed on fixed 31-mers extracted
at contig ends, counted (``groupBy("kmer").count()``,
``ReflexivDSDynamicKmerFixing.java:203-211``), fork-filtered with error
correction, and run through ~18 rounds of the standard sort+merge
extension loop so contigs that share a *unique* junction 31-mer fuse
(``ReflexivDSDynamicKmerFixing.java:191-257``).

Spark-first: junction support is a hash aggregate; uniqueness is a fork
filter (window argmax / count-per-key); the merge rounds reuse the
randomized-contraction kernel with overlap = fix_k
(:func:`reflexiv_spark.operators.extension.extension_round`) — one hash
shuffle per round instead of a global sort per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.operators.extension import extend_to_convergence

# Reference fixes junctions with 31-mers regardless of the assembly k.
DEFAULT_FIX_K = 31


def junction_support(
    contigs: DataFrame,
    fix_k: int = DEFAULT_FIX_K,
    seq_col: str = "seq",
) -> DataFrame:
    """A2: support count of each contig-end fix_k-mer.

    DataFrame[kmer, n_starts, n_ends]: how many contigs start (prefix)
    and end (suffix) with this fix_k-mer. A (1, 1) row is a unique
    junction — exactly one upstream and one downstream contig.
    """
    s = F.col(seq_col)
    long_enough = contigs.where(F.length(s) >= fix_k)
    heads = long_enough.select(
        F.substring(s, 1, fix_k).alias("kmer"), F.lit(1).alias("is_start")
    )
    tails = long_enough.select(
        F.substring(s, -fix_k, fix_k).alias("kmer"), F.lit(0).alias("is_start")
    )
    return (
        heads.unionByName(tails)
        .groupBy("kmer")
        .agg(
            F.sum("is_start").cast("bigint").alias("n_starts"),
            F.sum(1 - F.col("is_start")).cast("bigint").alias("n_ends"),
        )
    )


def fix_junctions(
    contigs: DataFrame,
    fix_k: int = DEFAULT_FIX_K,
    seq_col: str = "seq",
    max_rounds: int = 18,
) -> DataFrame:
    """Merge contigs across unique junction fix_k-mers.

    Contig A (ending with kmer j) fuses with contig B (starting with j)
    when j is a unique junction (one such A, one such B) — the fork-free
    precondition of the contraction kernel, established here by filtering
    both ends to support == 1 (the reference's fork filters with error
    correction play the same role). The merge rounds are the shared
    randomized-contraction loop with overlap = fix_k; the reference runs
    18 sort+merge rounds (``ReflexivDSDynamicKmerFixing.java:234-245``).

    Returns DataFrame[seq] of fixed (possibly fused) contigs.
    """
    support = junction_support(contigs, fix_k, seq_col)
    # A key may contract only when exactly one contig ends with it and
    # exactly one starts with it — every group under such a key holds at
    # most one A-side and one B-side row, so the contraction is safe and
    # deterministic; all other keys pass through (ambiguous junctions are
    # left unfused, matching the reference's fork-filtered behavior).
    unique_j = support.where(
        (F.col("n_starts") == 1) & (F.col("n_ends") == 1)
    ).select(F.col("kmer").alias("key"))

    paths = contigs.where(F.length(seq_col) >= fix_k).select(
        F.col(seq_col).alias("seq"),
        F.lit(1).alias("left_cover"),
        F.lit(1).alias("right_cover"),
    )
    fused = extend_to_convergence(
        paths,
        k=fix_k + 1,
        max_iterations=max_rounds,
        min_iterations=min(15, max_rounds),
        overlap=fix_k,
        allowed_keys=unique_j,
    )
    short = contigs.where(F.length(seq_col) < fix_k).select(
        F.col(seq_col).alias("seq")
    )
    return fused.select("seq").unionByName(short).dropDuplicates()
