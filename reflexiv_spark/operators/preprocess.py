"""Read preprocessing: paired-end overlap merging (X1) and k-mer-spectrum
error correction (X3).

Reference: preprocessing pipes reads through the external FLASH binary for
pair merging and an in-JVM "Lighter"-style corrector
(``ReflexivDataFrameDecompresser.java:255-302``,
``ReflexivDataFrameErrorCorrecter.java:228,263-310``). Both are
re-expressed natively:

- **merge_read_pairs** — a pair merges when the tail of R1 overlaps the
  head of rc(R2). All candidate overlaps are scored inside one Catalyst
  expression (filter over a sequence of offsets, exact match); per-pair
  work is O(len²) worst case but bounded by read length — the same
  complexity FLASH pays, with no subprocess, no pipe, no external binary.
- **correct_reads** — single-base error correction by solid-k-mer voting,
  fully relational: weak-k-mer runs locate the error base (an error at
  base p makes exactly the k-mers starting in [p−k+1, p] weak), candidate
  substitutions regenerate the affected k-mers, and a join against the
  solid set votes the winner. No Bloom-filter broadcast, no driver state —
  the solid set stays distributed, so the 100 TB case is just a bigger
  join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from reflexiv_spark.functions.kmer import canonical_kmer, kmer_array, reverse_complement


def merge_read_pairs(
    r1: DataFrame,
    r2: DataFrame,
    id_col: str = "read_id",
    seq_col: str = "seq",
    min_overlap: int = 10,
    keep_unmerged: bool = True,
) -> DataFrame:
    """FLASH-equivalent paired-end merging → DataFrame[read_id, seq, merged].

    Pairs join on ``id_col`` (mate suffixes ``/1``, ``/2``, `` 1:…`` are
    stripped). The merged fragment is ``R1 + rc(R2)[o:]`` for the largest
    exact overlap o ≥ min_overlap; unmergeable pairs pass through as R1
    (and, with ``keep_unmerged``, R2) unchanged.
    """
    strip = lambda c: F.regexp_replace(c, r"[/ ][12].*$", "")  # noqa: E731
    a = r1.select(
        strip(F.col(id_col)).alias("pid"), F.upper(F.col(seq_col)).alias("s1")
    )
    b = r2.select(
        strip(F.col(id_col)).alias("pid"),
        reverse_complement(F.upper(F.col(seq_col))).alias("s2"),
    )
    paired = a.join(b, "pid", "full")

    o_candidates = F.filter(
        F.sequence(
            F.lit(min_overlap), F.least(F.length("s1"), F.length("s2"))
        ),
        lambda o: F.col("s1").substr(
            F.length("s1") - o + 1, o
        ) == F.col("s2").substr(F.lit(1), o),
    )
    best_o = F.array_max(o_candidates)
    both = F.col("s1").isNotNull() & F.col("s2").isNotNull()
    merged_seq = F.concat(
        F.col("s1"), F.expr("substring(s2, __o + 1)")
    )
    # both mates must be at least min_overlap long: F.sequence(lo, hi)
    # yields a DESCENDING range when hi < lo, which would score and accept
    # overlaps shorter than min_overlap on short mates.
    long_enough = F.least(F.length("s1"), F.length("s2")) >= min_overlap
    out = paired.withColumn(
        "__o", F.when(both & long_enough, best_o)
    ).select(
        F.col("pid").alias(id_col),
        F.when(F.col("__o").isNotNull(), merged_seq)
        .when(F.col("s1").isNotNull(), F.col("s1"))
        .otherwise(F.col("s2"))
        .alias(seq_col),
        F.col("__o").isNotNull().alias("merged"),
        F.col("s2").alias("__s2"),
        F.col("__o"),
    )
    if keep_unmerged:
        extra = out.where(
            ~F.col("merged") & F.col("__s2").isNotNull() & F.col(seq_col).isNotNull()
            & (F.col(seq_col) != F.col("__s2"))
        ).select(
            F.col(id_col),
            reverse_complement(F.col("__s2")).alias(seq_col),
            F.lit(False).alias("merged"),
        )
        return out.drop("__s2", "__o").unionByName(extra)
    return out.drop("__s2", "__o")


def correct_reads(
    reads: DataFrame,
    k: int = 21,
    min_coverage: int = 2,
    seq_col: str = "seq",
) -> DataFrame:
    """Correct single-base sequencing errors by solid-k-mer voting.

    A base error at position p turns exactly the k-mers starting in
    [p−k+1, p] weak (not in the solid set). Reads whose weak k-mers form
    one such run get 3 candidate substitutions at the implied base; the
    substitution whose regenerated k-mers score the most solid-set hits
    (strictly better than the original) wins. Everything is joins +
    windows + expressions; the solid set is never collected.
    """
    from reflexiv_spark.operators.counter import count_kmers

    # Pinned once (r14, guide §2.4): the solid set has TWO consumers —
    # the weak-k-mer mark join and the candidate-vote semi-join — and
    # the original read set re-derives under several chains below
    # (suspects feeds both the candidate chain and the final mapping
    # rejoin). Un-barriered, the pre-execution plan re-ran the full
    # counting (source scan + k-mer explode + agg) and the suspects
    # chain once PER REFERENCE: 12 source scans / 26 Generate nodes in
    # plans/r14/error_correct_before.txt. With the two checkpoints the
    # counting and the suspect analysis each execute exactly once.
    solid = count_kmers(
        reads, k, seq_col=seq_col, min_coverage=min_coverage, max_coverage=None
    ).select("kmer").localCheckpoint(eager=False)

    # Deterministic, recompute-stable identity: the sequence ITSELF is the
    # key (identical reads get identical corrections, so each distinct
    # sequence is analyzed once and the corrections join back to the
    # original reads at the end). This retires the last
    # monotonically_increasing_id + pinning checkpoint in the engine — no
    # ordering dependency, no collision caveat, and duplicate reads stop
    # paying for duplicate analysis.
    base = reads.select(F.upper(F.col(seq_col)).alias("seq")).distinct()
    # int-position explode (r13): slice per output row instead of
    # materializing the substring array per read (see kmer.explode_kmers).
    # posexplode keeps BOTH the array index (→ s, 1-based) and the
    # position value (→ the slice), so sub-k reads — where sequence()
    # descends and value ≠ index+1 — reproduce the old form bit-exactly.
    pos_kmers = base.select(
        "seq",
        F.posexplode(
            F.sequence(F.lit(1), F.length("seq") - F.lit(k - 1))
        ).alias("pos0", "__p"),
    ).select(
        "seq", (F.col("pos0") + 1).alias("s"),
        canonical_kmer(F.col("seq").substr(F.col("__p"), F.lit(k))).alias(
            "kmer"
        ),
    )
    marked = pos_kmers.join(
        solid.withColumn("__solid", F.lit(True)), "kmer", "left"
    ).select("seq", "s", F.coalesce("__solid", F.lit(False)).alias("solid"))

    per_read = marked.groupBy("seq").agg(
        F.count(F.lit(1)).alias("n_kmers"),
        F.sum(F.when(F.col("solid"), 0).otherwise(1)).alias("n_weak"),
        F.min(F.when(~F.col("solid"), F.col("s"))).alias("a"),
        F.max(F.when(~F.col("solid"), F.col("s"))).alias("b"),
    )
    # single contiguous weak run consistent with one base error:
    # interior (width == k, p = b), left-clipped (a == 1, p = b), or
    # right-clipped (b == L-k+1, p = a+k-1)
    L = F.length("seq")
    width = F.col("b") - F.col("a") + 1
    p_expr = (
        F.when(width == k, F.col("b"))
        .when(F.col("a") == 1, F.col("b"))
        .when(F.col("b") == L - F.lit(k - 1), F.col("a") + F.lit(k - 1))
    )
    suspects = per_read.where(
        (F.col("n_weak") > 0)
        & (width == F.col("n_weak"))  # contiguous run
        & (width <= k)
    ).withColumn("p", p_expr).where(F.col("p").isNotNull()).localCheckpoint(
        eager=False  # 2 consumers: candidate substitutions + mapping
    )

    # candidates: 3 substitutions at p; regenerate the affected k-mers
    cands = suspects.select(
        "seq", "p",
        F.explode(
            F.filter(
                F.array(F.lit("A"), F.lit("C"), F.lit("G"), F.lit("T")),
                lambda x: x != F.col("seq").substr(F.col("p"), F.lit(1)),
            )
        ).alias("x"),
    ).withColumn(
        "fixed",
        F.concat(
            F.col("seq").substr(F.lit(1), F.col("p") - 1),
            F.col("x"),
            F.expr("substring(seq, p + 1)"),
        ),
    )
    # int-position explode (r13): only the position VALUES feed the
    # slice (no index use), so this is row-identical to the old
    # transform-array form for ascending AND degenerate sequences
    affected = cands.select(
        "seq", "x", "fixed",
        F.explode(
            F.sequence(
                F.greatest(F.lit(1), F.col("p") - F.lit(k - 1)),
                F.least(F.length("fixed") - F.lit(k - 1), F.col("p")),
            )
        ).alias("__s"),
    ).select(
        "seq", "x", "fixed",
        canonical_kmer(F.col("fixed").substr(F.col("__s"), F.lit(k))).alias(
            "kmer"
        ),
    )
    votes = (
        affected.join(solid, "kmer", "left_semi")
        .groupBy("seq", "x", "fixed")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    w = Window.partitionBy("seq").orderBy(F.col("hits").desc(), F.col("x"))
    winners = (
        votes.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("hits") > 0))
        .select("seq", F.col("fixed").alias("corrected"))
    )
    # Multiplicity is restored with a JOIN, not array_repeat: keying the
    # per-distinct-seq corrections back to the original reads keeps output
    # at one row per input row with O(1) memory per row — a single
    # ultra-duplicated read (adapter/poly-A, routinely 10^6-10^8 copies)
    # must never materialize multiplicity×len bytes in one executor row.
    mapping = (
        suspects.join(winners, "seq", "left")
        .select(
            F.col("seq").alias("__orig"),
            F.coalesce("corrected", "seq").alias("__fixed"),
        )
    )
    return (
        reads.select(F.upper(F.col(seq_col)).alias("__orig"))
        .join(mapping, "__orig", "left")
        .select(F.coalesce("__fixed", "__orig").alias(seq_col))
    )
