"""Contig stitching — ``reflexiv stitch`` (internal subcommand).

Reference: ``Pipelines.reflexivDSStitchingPipe`` (``Pipelines.java:208-237``)
bridges assembled contigs across coverage gaps by re-counting with
coverage-1 k-mers at k ∈ {61, 31, 21} and re-running the extension
machinery. The essence: a single read that carries the END k-mer of contig
A and, further right, the START k-mer of contig B is evidence that B
follows A; coverage-1 evidence is admitted (unlike assembly proper).

Spark-first: both matches are seed equi-joins of read (position, k-mer)
pairs against contig end/start seeds; support is a pair count (A4 shape),
the winning gap distance and partner are window argmaxes (W6 shape), and
the splice text comes from one deterministic representative read. Both
contig orientations participate (a bridge may involve either strand), and
an exact/RC dedup collapses the mirror-image duplicates afterwards.

Scaling caveat (measured, round 7 — BASELINE.md "Scaling curve"): on the
CLONED scale-up corpora the sf3→sf10 segment is super-linear (6.7× wall
for 3.4× data) while output stays flat (3,370 bridges at sf1/sf3/sf10).
Cause: every read's end-seed k-mer matches the ends of ALL clones of its
contig, so the per-read (L-hits × R-hits) candidate product grows
quadratically in clone MULTIPLICITY — a corpus-construction artifact,
not a plan defect (real corpora repeat through genuine repeat structure,
and the fan-out is bounded by true end-sharing). If a real corpus ever
shows clone-like end-sharing, bound the per-rid candidate lists (top-N
nearest end-hits per side) before the L×R pairing below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from reflexiv_spark.functions.kmer import reverse_complement
from reflexiv_spark.operators.dedup import dedup_exact_rc
from reflexiv_spark.plans.layout import spread
from reflexiv_spark.plans.parallelism import shuffle_partition_count

DEFAULT_STITCH_KS = (61, 31, 21)  # Pipelines.java:208-237


def _oriented(contigs: DataFrame, id_col: str, seq_col: str) -> DataFrame:
    fwd = contigs.select(
        F.col(id_col).alias("cid"),
        F.upper(F.col(seq_col)).alias("cseq"),
    )
    rev = contigs.select(
        F.concat(F.col(id_col), F.lit("(-)")).alias("cid"),
        reverse_complement(F.upper(F.col(seq_col))).alias("cseq"),
    )
    return fwd.unionByName(rev)


def _base_id(col):
    return F.regexp_replace(col, r"\(-\)$", "")


def stitch_bridges(
    reads: DataFrame,
    contigs: DataFrame,
    k: int,
    min_support: int = 1,
    read_seq: str = "seq",
    id_col: str = "contig_id",
    seq_col: str = "seq",
) -> DataFrame:
    """DataFrame[left, right, d, support, bridge_rid, bridge_pl]: the
    winning bridge per contig pair at seed size ``k``.

    ``d`` is the read-coordinate distance from the left-end seed to the
    right-start seed; ``d >= k`` means a gap of ``d - k`` bases filled
    from the read, ``d < k`` an overlap of ``k - d`` bases.

    Repeat-heavy-corpus caveat: per bridging read the candidate set is
    the CROSS PRODUCT of its left-end hits × right-start hits, so a
    corpus where many contigs share identical end k-mers (wholesale
    clones; a scaled benchmark built by duplication) grows candidates
    quadratically in the clone multiplicity even though the plan itself
    adds no quadratic term — measured on the cloned sf3→sf10 corpus as
    a super-linear wall segment with FLAT output (3,370 bridges at sf1/
    sf3/sf10; full analysis in BASELINE.md "Scaling curve"). Real
    corpora repeat via genuine repeat structure, bounding the fan-out
    by true end-sharing; if your corpus is clone-heavy, dedup contigs
    (``contig_dedup``) before stitching.
    """
    # Content-deterministic read ids (xxhash64 of the sequence): stable
    # under partition recompute, unlike monotonically_increasing_id, and
    # the dropDuplicates dedupes identical reads before the k-mer explode.
    # Support below is count_distinct(rid) — distinct bridging sequences —
    # so collapsing exact duplicates does not change it. Accepted risk: a
    # 64-bit collision merges two reads' hits (≈n²/2⁶⁵, see patch_contigs).
    #
    # Scale shape: only the FORWARD strand is exploded into (pos, kmer)
    # rows — half the dominant shuffle. RC-strand hits are derived
    # algebraically: the k-mer at position q of read R equals RC(s) iff
    # rc(R) carries seed s at position len-k+2-q, so the tiny seed side
    # doubles (each seed also enters as its RC with a '-' tag) instead of
    # the reads×read_len side. rid values are unchanged (xxhash64 of the
    # stranded sequence), so support/rep semantics are bit-identical to
    # exploding both strands.
    fwd = (
        spread(reads.select(F.upper(F.col(read_seq)).alias("rseq")))
        .dropDuplicates(["rseq"])
        .withColumn("rid", F.xxhash64("rseq"))
        .withColumn("rc_rseq", reverse_complement("rseq"))
        .withColumn("rc_rid", F.xxhash64("rc_rseq"))
        # consumed by the k-mer explode AND the final representative-read
        # join: materialize once instead of re-deriving per consumer
        .localCheckpoint(eager=False)
    )

    # int-position explode (r13): slice per output row instead of
    # materializing the substring array per read (see kmer.explode_kmers)
    poskmers = fwd.where(F.length("rseq") >= k).select(
        "rid",
        "rc_rid",
        "rseq",
        F.length("rseq").alias("__L"),
        F.explode(
            F.sequence(F.lit(1), F.length("rseq") - F.lit(k - 1))
        ).alias("pos"),
    ).select(
        "rid",
        "rc_rid",
        "__L",
        "pos",
        F.col("rseq").substr(F.col("pos"), F.lit(k)).alias("kmer"),
    )

    ori = _oriented(contigs, id_col, seq_col).where(
        F.length("cseq") >= k
    ).localCheckpoint(eager=False)
    # ONE tagged seed set → ONE pass over the exploded read k-mers (the
    # dominant cost: reads × read_len rows). Two separate joins would
    # recompute the explode and exchange it twice; the seed side is small
    # (2 rows per contig strand per orientation) so the planner
    # broadcasts it when it fits and shuffles otherwise.
    seeds = ori.select(
        F.lit("L").alias("__side"),
        F.col("cid"),
        F.substring("cseq", -k, k).alias("kmer"),
    ).unionByName(
        ori.select(
            F.lit("R").alias("__side"),
            F.col("cid"),
            F.substring("cseq", 1, k).alias("kmer"),
        )
    )
    seeds2 = seeds.withColumn("__strand", F.lit("+")).unionByName(
        seeds.select(
            "__side", "cid", reverse_complement("kmer").alias("kmer")
        ).withColumn("__strand", F.lit("-"))
    )
    hits = (
        poskmers.join(seeds2, "kmer")
        .select(
            F.when(F.col("__strand") == "+", F.col("rid"))
            .otherwise(F.col("rc_rid"))
            .alias("rid"),
            F.when(F.col("__strand") == "+", F.col("pos"))
            .otherwise(F.col("__L") - F.lit(k) + 2 - F.col("pos"))
            .alias("pos"),
            "__side",
            "cid",
        )
        # Pairing left-end hits with right-start hits of the SAME read is
        # logically a self-join on rid, but a self-join consumes `hits`
        # twice (forcing a checkpoint + two full re-reads) and fans out
        # quadratically per rid — far more COMPUTE and OUTPUT than its
        # input bytes (6.5 MB in → 46 MB out at sf1.0), exactly the shape
        # AQE's byte-based coalescing serialized onto 6 of 32 cores.
        # Instead: ONE numbered repartition on rid (user repartitions are
        # never AQE-coalesced and satisfy the groupBy's distribution, so
        # no extra exchange), then per-rid L/R lists and an explode of
        # their cross product. One pass, one shuffle, full parallelism.
        .repartition(shuffle_partition_count(reads), "rid")
    )
    per_rid = hits.groupBy("rid").agg(
        F.collect_list(
            F.when(F.col("__side") == "L", F.struct("pos", "cid"))
        ).alias("__ls"),
        F.collect_list(
            F.when(F.col("__side") == "R", F.struct("pos", "cid"))
        ).alias("__rs"),
    )
    br = (
        per_rid.select("rid", F.explode("__ls").alias("__l"), "__rs")
        .select("rid", "__l", F.explode("__rs").alias("__r"))
        .where(_base_id(F.col("__l.cid")) != _base_id(F.col("__r.cid")))
        .where(F.col("__r.pos") > F.col("__l.pos"))
        .select(
            "rid",
            F.col("__l.pos").alias("pl"),
            F.col("__l.cid").alias("left"),
            F.col("__r.cid").alias("right"),
            (F.col("__r.pos") - F.col("__l.pos")).alias("d"),
        )
    )
    # The representative read (smallest (rid, pl) — the old rep_w
    # row_number) is fused into the support agg as min(struct): structs
    # compare field-by-field, so min(struct(rid, pl)) IS orderBy(rid, pl)
    # LIMIT 1 per group, and the quadratic self-join executes ONCE instead
    # of twice (the old plan re-ran it to pick the representative after
    # the winners were known).
    support = br.groupBy("left", "right", "d").agg(
        F.count_distinct("rid").alias("support"),
        F.min(F.struct("rid", "pl")).alias("__rep"),
    )
    # winning distance per pair, then one outgoing bridge per left and one
    # incoming per right
    w_d = Window.partitionBy("left", "right").orderBy(
        F.col("support").desc(), F.col("d")
    )
    w_out = Window.partitionBy("left").orderBy(
        F.col("support").desc(), F.col("right")
    )
    w_in = Window.partitionBy("right").orderBy(
        F.col("support").desc(), F.col("left")
    )
    chosen = (
        support.withColumn("__rd", F.row_number().over(w_d))
        .where((F.col("__rd") == 1) & (F.col("support") >= min_support))
        .drop("__rd")
        .withColumn("__ro", F.row_number().over(w_out))
        .where(F.col("__ro") == 1)
        .drop("__ro")
        .withColumn("__ri", F.row_number().over(w_in))
        .where(F.col("__ri") == 1)
        .drop("__ri")
        .select(
            "left", "right", "d", "support",
            F.col("__rep.rid").alias("bridge_rid"),
            F.col("__rep.pl").alias("bridge_pl"),
        )
    )
    # rid → stranded sequence map (2 rows per forward read). Duplicate
    # rids — a read and its RC both present as forward reads — carry
    # IDENTICAL sequences, so instead of dropDuplicates here (a full
    # shuffle of every read's text) the small chosen side joins in (AQE
    # broadcasts it at runtime when it fits — no forced hint, so a
    # bridge set too large to broadcast degrades to a shuffle join
    # instead of dying on the 8 GB broadcast limit), the map streams
    # through, and the handful of content-identical duplicate output
    # rows dedup after.
    rid_map = fwd.select(
        F.col("rid").alias("bridge_rid"), F.col("rseq").alias("bridge_seq")
    ).unionByName(
        fwd.select(
            F.col("rc_rid").alias("bridge_rid"),
            F.col("rc_rseq").alias("bridge_seq"),
        )
    )
    return rid_map.join(chosen, "bridge_rid").dropDuplicates(
        ["left", "right", "d"]
    )


def stitch_round(
    reads: DataFrame,
    contigs: DataFrame,
    k: int,
    min_support: int = 1,
    id_col: str = "contig_id",
    seq_col: str = "seq",
) -> DataFrame:
    """One stitching pass at seed size ``k`` → DataFrame[contig_id, seq]."""
    bridges = stitch_bridges(
        reads, contigs, k, min_support=min_support,
        id_col=id_col, seq_col=seq_col,
    )
    ori = _oriented(contigs, id_col, seq_col)
    left_seq = ori.select(F.col("cid").alias("left"), F.col("cseq").alias("seq_l"))
    right_seq = ori.select(F.col("cid").alias("right"), F.col("cseq").alias("seq_r"))
    stitched = (
        bridges.join(left_seq, "left")
        .join(right_seq, "right")
        .select(
            F.concat_ws("~", F.col("left"), F.col("right")).alias(id_col),
            F.when(
                F.col("d") >= k,
                F.concat(
                    F.col("seq_l"),
                    F.col("bridge_seq").substr(
                        F.col("bridge_pl") + F.lit(k), F.col("d") - F.lit(k)
                    ),
                    F.col("seq_r"),
                ),
            )
            .otherwise(
                F.concat(
                    F.col("seq_l"),
                    F.expr(f"substring(seq_r, {k} + 1 - d)"),
                )
            )
            .alias(seq_col),
        )
    )
    used = (
        bridges.select(_base_id(F.col("left")).alias("cid"))
        .unionByName(bridges.select(_base_id(F.col("right")).alias("cid")))
        .distinct()
    )
    untouched = contigs.join(
        used, F.col(id_col) == F.col("cid"), "left_anti"
    ).select(F.col(id_col), F.upper(F.col(seq_col)).alias(seq_col))
    out = stitched.unionByName(untouched)
    return dedup_exact_rc(out, seq_col=seq_col, id_col=id_col)


def stitch_contigs(
    reads: DataFrame,
    contigs: DataFrame,
    ks: tuple[int, ...] = DEFAULT_STITCH_KS,
    min_support: int = 1,
    id_col: str = "contig_id",
    seq_col: str = "seq",
) -> DataFrame:
    """Multi-k stitching ladder (larger seeds first — most specific
    evidence wins before shorter, more promiscuous seeds run)."""
    cur = contigs
    for k in ks:
        cur = stitch_round(
            reads, cur, k, min_support=min_support,
            id_col=id_col, seq_col=seq_col,
        ).localCheckpoint(eager=True)
    return cur
