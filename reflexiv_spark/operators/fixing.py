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

from reflexiv_spark.operators.extension import (
    _double_pointers,
    _init_pointers,
)

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
    when j is a unique junction (one such A, one such B) — established
    by filtering both ends to support == 1 (the reference's fork
    filters with error correction play the same role). Under that
    filter every contig has at most ONE junction-successor and ONE
    junction-predecessor, so the fusion graph is a disjoint union of
    simple paths and simple cycles — exactly the fork-free
    precondition of the DETERMINISTIC pointer-doubling kernel. The
    merge therefore reuses ``extension._init_pointers`` /
    ``_double_pointers`` at contig granularity (round 11; previously
    the shared randomized-contraction loop, whose probabilistic
    convergence test forces >= 15 rounds of eager barriers even on a
    two-link chain — 8.8 s of the sf0.1 meta ladder against ~1 s for
    the rank form; the reference's fixed 18 sort+merge rounds,
    ``ReflexivDSDynamicKmerFixing.java:234-245``, are the same
    safety margin paid unconditionally). Chains converge in
    log2(longest chain) rounds with the mover-probe early exit;
    junction CYCLES (every member in/out-degree 1) pass through
    UNFUSED — the anchored-path semantics the meta-ladder oracle's
    unique-junction walk defines (a walk from in-degree-0 anchors
    never enters a cycle).

    Returns DataFrame[seq] of fixed (possibly fused) contigs.
    """
    support = junction_support(contigs, fix_k, seq_col)
    unique_j = support.where(
        (F.col("n_starts") == 1) & (F.col("n_ends") == 1)
    ).select(F.col("kmer").alias("__pk"))

    cs = (
        contigs.where(F.length(seq_col) >= fix_k)
        .select(F.col(seq_col).alias("kid"))
        .dropDuplicates(["kid"])
        .localCheckpoint(eager=False)  # pre, suc, and the pass-through
    )
    # ONE materializing count: runs the dedup into the checkpoint and
    # hands the doubling loop its round bound up front (r14, the
    # rank_paths job-economy pattern — the old shape paid an EAGER init
    # barrier job plus the loop's own state.count() job; now the init
    # barrier is lazy and the loop starts counted: 2 driver-blocking
    # jobs → 1). state rows == cs rows is GUARANTEED here, not assumed:
    # suc is filtered to unique junctions (n_ends == 1 ⇒ each __pk is
    # the tail of exactly one contig), so the init left join matches at
    # most one predecessor per contig — the loop's first-probe
    # fork-free guard re-verifies it anyway.
    n_cs = cs.count()
    # pre: EVERY contig, keyed by its head fix_k-mer (so every contig
    # appears in the pointer state exactly once); suc: only tails that
    # are unique junctions — a unique key is the tail of exactly one
    # contig, so the left join below matches at most one predecessor.
    pre = cs.select("kid", F.substring("kid", 1, fix_k).alias("__pk"))
    suc = (
        cs.select(
            F.col("kid").alias("__pred"),
            F.substring("kid", -fix_k, fix_k).alias("__pk"),
        )
        .join(F.broadcast(unique_j), "__pk")
    )
    state, heads = _init_pointers(pre, suc, eager=False)
    state = _double_pointers(state, max_rounds, checkpoint_every=3, n_rows=n_cs)
    done = state.join(heads, "anc", "left_semi")
    parts = done.groupBy("anc").agg(
        F.array_sort(F.collect_list(F.struct("off", "kid"))).alias("xs")
    )
    rest = F.array_join(
        F.transform(
            F.slice(F.col("xs"), 2, F.greatest(F.size("xs") - 1, F.lit(0))),
            lambda x: F.substring(x["kid"], fix_k + 1, F.length(x["kid"])),
        ),
        "",
    )
    fused = parts.select(
        F.concat(F.col("xs").getItem(0)["kid"], rest).alias("seq")
    )
    # cycle members never reach a head — they pass through unfused
    # (with the head-anchored walk they are exactly the state rows the
    # semi-join dropped)
    cycles = state.join(heads, "anc", "left_anti").select(
        F.col("kid").alias("seq")
    )
    short = contigs.where(F.length(seq_col) < fix_k).select(
        F.col(seq_col).alias("seq")
    )
    return (
        fused.unionByName(cycles).unionByName(short).dropDuplicates()
    )
