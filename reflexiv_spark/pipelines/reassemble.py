"""Fragment reassembly — ``reflexiv reassembler`` (S7/J8).

Reference: ``ContigReader.java:60-140`` loads the fragment FASTA into
**driver-side hash maps** (primer → name) that executors consult — the
one pattern the 100 TB rule forbids (SURVEY.md §7.2 item 5). Here the
fragment set stays a DataFrame end to end: containment candidates come
from a seed-index equi-join (fragment's leading shingle hash vs contig
shingle hashes — J8 as a relational join, not a driver lookup), so the
stage stays bounded at any fragment count; only sub-seed fragments ride
a broadcast fallback, and nothing is collected.

Flow: assemble the reads → orientation-expand the contigs → (1) a
fragment fully contained in a contig adopts that contig (oriented to
match); (2) otherwise the fragment splices its best suffix→prefix
contig overlap onto each end (the merger kernel, RC round-trip for the
left end); (3) otherwise it passes through unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from reflexiv_spark.functions.kmer import reverse_complement
from reflexiv_spark.operators.merger import overlap_pairs
from reflexiv_spark.pipelines.assemble import assemble


def _both_strands(contigs: DataFrame) -> DataFrame:
    fwd = contigs.select(F.col("contig_id").alias("cid"), F.col("seq"))
    rev = contigs.select(
        F.concat(F.col("contig_id"), F.lit("(-)")).alias("cid"),
        reverse_complement(F.col("seq")).alias("seq"),
    )
    return fwd.unionByName(rev)


def _extend_right(frags: DataFrame, ctgs: DataFrame, min_overlap: int) -> DataFrame:
    """Extend each fragment rightward with its best-overlapping contig."""
    # plan barrier: this function references `frags` three times (tail
    # side, seq rejoin, untouched anti-join) and is applied twice
    # back-to-back (right end, then RC'd left end) — without the barrier
    # the second application's plan tree contains the first's several
    # times over, exploding analysis cost (measured: a 1,724-exchange
    # pre-execution plan; ~40 after the barriers)
    frags = frags.localCheckpoint(eager=False)
    # asymmetric overlap join: fragment suffixes vs contig prefixes ONLY
    # — the old form self-joined the frag ∪ contig union and semi-joined
    # 3 of the 4 quadrants away afterwards (paying the contig-tail
    # explode for candidates it then discarded)
    frag_pairs = overlap_pairs(
        frags.select(F.col("frag_id").alias("cid"), "seq"),
        seq_col="seq", id_col="cid",
        min_overlap=min_overlap, searchable_len=None,
        b_side=ctgs,
    )
    w = Window.partitionBy("id_a").orderBy(F.col("overlap").desc(), F.col("id_b"))
    best = (
        frag_pairs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    fa = frags.select(F.col("frag_id").alias("id_a"), F.col("seq").alias("seq_a"))
    cb = ctgs.select(F.col("cid").alias("id_b"), F.col("seq").alias("seq_b"))
    extended = (
        best.join(fa, "id_a")
        .join(cb, "id_b")
        .select(
            F.col("id_a").alias("frag_id"),
            F.concat(F.col("seq_a"), F.expr("substring(seq_b, overlap + 1)")).alias("seq"),
        )
    )
    untouched = frags.join(
        extended.select("frag_id"), "frag_id", "left_anti"
    ).select("frag_id", "seq")
    return extended.unionByName(untouched)


def _containment_hits(ctgs: DataFrame, fr: DataFrame, seed_k: int) -> DataFrame:
    """(frag_id, frag_seq) × (cid, seq) pairs where the contig contains the
    fragment — via a seed-index equi-join, never an unbounded nested loop.

    Index side: every ``seed_k``-shingle hash of every contig strand.
    Probe side: each fragment's leading ``seed_k``-mer hash (a container
    must contain the fragment's leading shingle). Hash collisions only add
    candidates; the exact ``contains`` verify removes them. Fragments
    shorter than ``seed_k`` have no probe shingle — they are rare and tiny
    by definition and ride a broadcast nested-loop fallback, the same
    split :func:`reflexiv_spark.operators.containment.contained_row_ids`
    uses for sub-``w`` rows.
    """
    long_fr = fr.where(F.length("frag_seq") >= seed_k)
    short_fr = fr.where(F.length("frag_seq") < seed_k)
    idx = ctgs.select(
        "cid",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.length("seq") - F.lit(seed_k - 1)),
                    lambda i: F.xxhash64(F.col("seq").substr(i, F.lit(seed_k))),
                )
            )
        ).alias("__sh"),
    ).where(F.length("seq") >= seed_k)
    probe = long_fr.select(
        "frag_id",
        "frag_seq",
        F.xxhash64(F.col("frag_seq").substr(F.lit(1), F.lit(seed_k))).alias("__sh"),
    )
    cand = probe.join(idx, "__sh").select("frag_id", "frag_seq", "cid").dropDuplicates()
    long_hits = (
        cand.join(ctgs, "cid")
        .where(F.contains(F.col("seq"), F.col("frag_seq")))
        .select("cid", "seq", "frag_id", "frag_seq")
    )
    short_hits = ctgs.join(
        F.broadcast(short_fr), F.contains(F.col("seq"), F.col("frag_seq"))
    ).select("cid", "seq", "frag_id", "frag_seq")
    return long_hits.unionByName(short_hits)


def reassemble(
    reads: DataFrame,
    fragments: DataFrame,
    k: int = 31,
    min_coverage: int = 2,
    min_overlap: int = 31,
    frag_id: str = "frag_id",
    frag_seq: str = "seq",
    contigs: DataFrame | None = None,
) -> DataFrame:
    """Extend gene fragments with read-assembled contigs.

    Returns DataFrame[frag_id, seq]. Deterministic picks: containment
    prefers the longest contig (tie: id); end extension prefers the
    longest overlap (tie: id). ``contigs`` (DataFrame[contig_id, seq],
    canonical strand) skips the internal assembly — callers that already
    hold contigs (or need a replayable contig set) pass them directly.
    """
    frags = fragments.select(
        F.col(frag_id).alias("frag_id"), F.upper(F.col(frag_seq)).alias("seq")
    )
    if contigs is None:
        contigs = assemble(
            reads, k=k, min_coverage=min_coverage, min_contig=k + 1
        ).select("contig_id", "seq")
    # EAGER deliberately (r14 measured rejection): lazy looked like a
    # free job removal (~0.95 s dedicated checkpoint job at sf0.1), but
    # the contig blocks have ~5 consumers fanning out of the SAME first
    # job (containment index + verify + both extension passes), and a
    # lazily-materializing checkpoint under that fan-out re-computed
    # partitions concurrently instead of reading pinned blocks —
    # interleaved A/B read 8.51 (eager) vs 8.93 s (lazy) min-of-4.
    contigs = contigs.localCheckpoint(eager=True)
    ctgs = _both_strands(contigs)

    # (1) containment: fragment inside a contig → adopt the contig,
    # already oriented since both strands are candidates (J8 re-expressed:
    # seed-index equi-join + exact verify, bounded at any fragment count)
    fr = frags.select(
        F.col("frag_id"), F.col("seq").alias("frag_seq")
    )
    hits = _containment_hits(ctgs, fr, seed_k=min(min_overlap, 15))
    w = Window.partitionBy("frag_id").orderBy(
        F.length("seq").desc(), F.col("cid")
    )
    adopted = (
        hits.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("frag_id", "seq")
        # consumed twice (output union + the anti-join feeding extension)
        .localCheckpoint(eager=False)
    )

    # (2) end extension for the rest: right end, then (via RC) left end
    rest = frags.join(adopted.select("frag_id"), "frag_id", "left_anti")
    right = _extend_right(rest, ctgs, min_overlap)
    flipped = right.select(
        "frag_id", reverse_complement(F.col("seq")).alias("seq")
    )
    both_ends = _extend_right(flipped, ctgs, min_overlap)
    extended = both_ends.select(
        "frag_id", reverse_complement(F.col("seq")).alias("seq")
    )
    return adopted.unionByName(extended)
