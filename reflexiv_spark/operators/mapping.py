"""Contig-end mapping and consensus extension — the ``07EndExtend`` stage
(X2/J6).

Reference flow (``ReflexivDSDynamicKmerMapping.java``): the driver
concatenates contig ends and builds a minimap2 index (``:150-230``),
executors pipe reads through minimap2 (``DSJavaPipeMinimap2 :1157-1267``),
SAM rows are parsed back (``SAMString2ROW :369-389``), and overhanging
reads consensus-extend each contig end
(``DSProcessSAMandExtendContigs :564-995``); the extended set merges back
with the untouched contigs by id (J6, ``:309-335``).

Spark-first: the default mapper is a seed equi-join (read k-mer positions ⋈
contig-end k-mer positions → alignment offset, exact substring verify) —
Catalyst joins end-to-end, no external process, no indels (the reference's
short-read preset ``-x sr`` is likewise near-exact). The consensus vote is
a groupBy count + window argmax per extension position, and the
"extend while depth holds" rule is a running-minimum window — no
sort+scan, no per-read Python. A real minimap2 can be swapped in through
:func:`pipe_minimap2` (subprocess via ``mapInPandas``, gated on the binary
being present) feeding :func:`sam_to_rows` into the same consensus kernel.
"""

from __future__ import annotations

import shutil

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from reflexiv_spark.functions.kmer import reverse_complement
from reflexiv_spark.plans.layout import spread
from reflexiv_spark.plans.parallelism import shuffle_partition_count

DEFAULT_SEARCHABLE = 600  # DefaultParam.java:127


def _pos_kmers(df: DataFrame, id_col: str, seq_col: str, k: int) -> DataFrame:
    """(id, pos, kmer) for every k-window; pos is 1-based."""
    # int-position explode (r13): slice per output row instead of
    # materializing the substring array per row (see kmer.explode_kmers)
    return (
        spread(df.where(F.length(seq_col) >= k))
        .select(
            F.col(id_col),
            F.col(seq_col),
            F.explode(
                F.sequence(F.lit(1), F.length(seq_col) - F.lit(k - 1))
            ).alias("pos"),
        )
        .select(
            id_col,
            "pos",
            F.col(seq_col).substr(F.col("pos"), F.lit(k)).alias("kmer"),
        )
    )


def seed_map_reads(
    reads: DataFrame,
    targets: DataFrame,
    seed_k: int = 21,
    read_id: str = "read_id",
    read_seq: str = "seq",
    target_id: str = "target_id",
    target_seq: str = "seq",
    contained_only: bool = True,
) -> DataFrame:
    """Exact read→target mapping via a seed equi-join.

    Returns DataFrame[read_id, target_id, offset]: the read matches the
    target starting at 1-based target position ``offset``. With
    ``contained_only`` the whole read must lie inside the target (every
    such occurrence is found: any occurrence seeds at all of its
    positions); otherwise overhanging alignments are kept too — the
    overlap region (≥ seed_k bases) must match exactly, which is the input
    the consensus extender needs. Candidates carry (ids, positions) only;
    sequences rejoin by id for the verify step.
    """
    r = reads.select(
        F.col(read_id).alias("rid"),
        F.upper(F.col(read_seq)).alias("rseq"),
        F.length(read_seq).alias("rlen"),
    ).localCheckpoint(eager=False)
    t = targets.select(
        F.col(target_id).alias("tid"),
        F.upper(F.col(target_seq)).alias("tseq"),
        F.length(target_seq).alias("tlen"),
    ).localCheckpoint(eager=False)

    rk = _pos_kmers(r, "rid", "rseq", seed_k).select(
        "rid", F.col("pos").alias("rpos"), "kmer"
    )
    tk = _pos_kmers(t, "tid", "tseq", seed_k).select(
        "tid", F.col("pos").alias("tpos"), "kmer"
    )
    cand = (
        rk.join(tk, "kmer")
        .select("rid", "tid", (F.col("tpos") - F.col("rpos") + 1).alias("offset"))
        .dropDuplicates(["rid", "tid", "offset"])
    )
    joined = cand.join(r, "rid").join(t, "tid")
    if contained_only:
        verified = joined.where(
            (F.col("offset") >= 1)
            & (F.col("offset") + F.col("rlen") - 1 <= F.col("tlen"))
            & (
                F.col("tseq").substr(F.col("offset"), F.col("rlen"))
                == F.col("rseq")
            )
        )
    else:
        # overlap region: read positions [rs, re] ↔ target [ts, ts+n-1]
        rs = F.greatest(F.lit(1), F.lit(2) - F.col("offset"))
        ts = F.greatest(F.lit(1), F.col("offset"))
        n = F.least(
            F.col("rlen") - rs + 1, F.col("tlen") - ts + F.lit(1)
        )
        verified = joined.where(
            (n >= seed_k)
            & (F.col("rseq").substr(rs, n) == F.col("tseq").substr(ts, n))
        )
    return verified.select(
        F.col("rid").alias(read_id),
        F.col("tid").alias(target_id),
        F.col("offset").cast("bigint").alias("offset"),
    )


def sam_to_rows(sam_lines: DataFrame, value_col: str = "value") -> DataFrame:
    """SAM text lines → DataFrame[qname, flag, rname, pos, mapq, cigar, seq]
    (``SAMString2ROW``, ``ReflexivDSDynamicKmerMapping.java:369-389``).

    Header lines (``@``-prefixed) and unmapped rows (rname ``*``) are
    dropped.
    """
    v = F.col(value_col)
    parts = F.split(v, "\t")
    return (
        sam_lines.where(~v.startswith("@"))
        .select(
            parts.getItem(0).alias("qname"),
            parts.getItem(1).cast("int").alias("flag"),
            parts.getItem(2).alias("rname"),
            parts.getItem(3).cast("long").alias("pos"),
            parts.getItem(4).cast("int").alias("mapq"),
            parts.getItem(5).alias("cigar"),
            parts.getItem(9).alias("seq"),
        )
        .where(F.col("rname") != "*")
    )


def pipe_minimap2(
    reads: DataFrame,
    index_path: str,
    minimap2_bin: str = "minimap2",
    preset: str = "sr",
    read_id: str = "read_id",
    read_seq: str = "seq",
) -> DataFrame:
    """Map reads through an external minimap2 process → SAM line rows.

    Executor-side subprocess pipe (the reference ships minimap2 to
    executors via ``addFile`` and pipes FASTQ through it,
    ``DSJavaPipeMinimap2``, ``ReflexivDSDynamicKmerMapping.java:1157-1267``).
    Each Arrow batch becomes one FASTA stream on the child's stdin; SAM
    comes back on stdout. Raises ``RuntimeError`` up front when the binary
    is absent — callers fall back to :func:`seed_map_reads`.
    """
    if shutil.which(minimap2_bin) is None:
        raise RuntimeError(
            f"{minimap2_bin!r} not found on PATH; use seed_map_reads() "
            "(built-in exact mapper) instead"
        )
    import subprocess

    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField("value", StringType(), False)])
    bin_path, idx = minimap2_bin, index_path

    def run_batches(batches):
        import pandas as pd

        for pdf in batches:
            fasta = "".join(
                f">{q}\n{s}\n" for q, s in zip(pdf["__id"], pdf["__seq"])
            )
            proc = subprocess.run(
                [bin_path, "-a", "-x", preset, idx, "-"],
                input=fasta.encode(),
                stdout=subprocess.PIPE,
                check=True,
            )
            lines = proc.stdout.decode().splitlines()
            yield pd.DataFrame({"value": lines})

    shaped = reads.select(
        F.col(read_id).cast("string").alias("__id"), F.col(read_seq).alias("__seq")
    )
    return shaped.mapInPandas(run_batches, schema)


def extract_contig_ends(
    contigs: DataFrame,
    searchable_len: int = DEFAULT_SEARCHABLE,
    id_col: str = "contig_id",
    seq_col: str = "seq",
) -> DataFrame:
    """DataFrame[contig_id, side('L'|'R'), end_seq]: the mappable tail of
    each contig end (the reference indexes ``06ContigEnds``,
    ``ReflexivDSDynamicKmerMapping.java:150-230``). The left end is
    reverse-complemented so BOTH sides present extension as "rightward
    growth" to the shared consensus kernel.
    """
    s = F.upper(F.col(seq_col))

    def tail(col: Column) -> Column:
        # substring with a negative start underflows for short strings —
        # short contigs contribute their whole sequence
        return F.when(F.length(col) <= searchable_len, col).otherwise(
            F.substring(col, -searchable_len, searchable_len)
        )

    right = contigs.select(
        F.col(id_col),
        F.lit("R").alias("side"),
        tail(s).alias("end_seq"),
    )
    left = contigs.select(
        F.col(id_col),
        F.lit("L").alias("side"),
        tail(reverse_complement(s)).alias("end_seq"),
    )
    return right.unionByName(left)


def _char_at(seq: Column, pos: Column) -> Column:
    return seq.substr(pos, F.lit(1))


def _consensus_from_overhangs(
    m: DataFrame, min_depth: int, n_part: int | None = None
) -> DataFrame:
    """Shared vote→majority→contiguity→assemble kernel: ``m`` rows carry
    (contig_id, side, wt, rseq, rlen, first_over); returns
    DataFrame[contig_id, side, extension]. Used by BOTH
    :func:`consensus_extensions` (the standalone/pipe_minimap2 path) and
    the fused :func:`extend_contigs_with_reads`, so the voting/tie/depth
    rules live in exactly one place.

    Exchange shape: ONE pinned repartition by contig_id clusters the
    overhang rows BEFORE the per-base explode. HashPartitioning(contig_id)
    is a subset of every downstream clustering requirement — the vote
    count (cid, side, q, base), the majority pick (cid, side, q), the
    contiguity window (cid, side), the assembly agg (cid, side) AND the
    caller's per-contig L/R pivot (cid) — so the entire chain through
    the pivot runs exchange-free where the naive plan cascades four
    exchanges (the r7 sf1.0 gap was sequential-stage floor, not bytes).
    Rows exchanged are read-sized overhangs, not exploded base votes.
    Skew bound: one partition holds one contig's overhang reads — both
    ends are ≤ searchable_len bases, so per-contig row count is coverage-
    bounded, the same bound the final window already imposed."""
    m = m.select("contig_id", "side", "wt", "rseq", "rlen", "first_over")
    m = (
        m.repartition(n_part, "contig_id")
        if n_part
        else m.repartition("contig_id")
    )
    # int-position explode (r13): slice per output row instead of
    # materializing the per-base char array per overhang row
    votes = m.select(
        "contig_id",
        "side",
        "wt",
        "rseq",
        F.posexplode(
            F.sequence(F.col("first_over"), F.col("rlen"))
        ).alias("q0", "__p"),
    ).select(
        "contig_id",
        "side",
        "wt",
        (F.col("q0") + 1).alias("q"),
        _char_at(F.col("rseq"), F.col("__p")).alias("base"),
    )
    counts = votes.groupBy("contig_id", "side", "q", "base").agg(
        F.sum("wt").alias("depth")
    )
    # majority base per position, ties → lexicographic: min(struct) with a
    # negated depth IS the orderBy(depth desc, base) row_number pick, as a
    # hash agg instead of a window sort
    best = counts.groupBy("contig_id", "side", "q").agg(
        F.min(F.struct((-F.col("depth")).alias("nd"), F.col("base"))).alias("__b")
    ).select(
        "contig_id", "side", "q",
        F.col("__b.base").alias("base"),
        (-F.col("__b.nd")).alias("depth"),
    )
    # contiguity + depth: position q survives iff every position 1..q has
    # depth >= min_depth and exists (q == row_number)
    run_w = (
        Window.partitionBy("contig_id", "side")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    surviving = (
        best.withColumn("min_depth_so_far", F.min("depth").over(run_w))
        .withColumn(
            "contiguous",
            F.row_number().over(
                Window.partitionBy("contig_id", "side").orderBy("q")
            )
            == F.col("q"),
        )
        .where((F.col("min_depth_so_far") >= min_depth) & F.col("contiguous"))
    )
    return surviving.groupBy("contig_id", "side").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("q"), F.col("base")))
                ),
                lambda s: s.getField("base"),
            ),
        ).alias("extension")
    )


def consensus_extensions(
    mapped: DataFrame,
    reads: DataFrame,
    ends: DataFrame,
    min_depth: int = 2,
    read_id: str = "read_id",
    read_seq: str = "seq",
) -> DataFrame:
    """Per (contig_id, side): the consensus extension string grown from
    overhanging mapped reads (``DSProcessSAMandExtendContigs``,
    ``ReflexivDSDynamicKmerMapping.java:564-995``).

    ``mapped`` is :func:`seed_map_reads` output against
    :func:`extract_contig_ends` targets (``target_id`` = struct-free
    ``contig_id || '/' || side`` handled by the caller — here it expects
    columns contig_id, side, offset, read_id). Rules: every overhang base
    votes; per position the majority base wins (ties → lexicographic) and
    must have depth ≥ ``min_depth``; extension stops at the first position
    failing the depth rule (running-minimum window keeps it contiguous).
    """
    # an optional `weight` column carries read multiplicity (content-
    # deduplicated reads vote once per original copy)
    wt = F.col("weight") if "weight" in reads.columns else F.lit(1)
    r = reads.select(
        F.col(read_id).alias("rid"),
        F.upper(F.col(read_seq)).alias("rseq"),
        F.length(read_seq).alias("rlen"),
        wt.cast("bigint").alias("wt"),
    )
    e = ends.select(
        "contig_id", "side", F.length("end_seq").alias("elen")
    )
    m = (
        mapped.join(r, F.col(read_id) == F.col("rid"))
        .join(e, ["contig_id", "side"])
        # read position of the first base PAST the end: elen - offset + 2
        .withColumn("first_over", F.col("elen") - F.col("offset") + 2)
        .where((F.col("first_over") >= 1) & (F.col("first_over") <= F.col("rlen")))
    )
    return _consensus_from_overhangs(m, min_depth)


def extend_contigs_with_reads(
    contigs: DataFrame,
    reads: DataFrame,
    seed_k: int = 21,
    min_depth: int = 2,
    searchable_len: int = DEFAULT_SEARCHABLE,
    id_col: str = "contig_id",
    seq_col: str = "seq",
    read_seq: str = "seq",
) -> DataFrame:
    """Full X2 stage: map reads onto both contig ends (both read strands),
    consensus-extend, splice extensions back (J6 equi-join on contig id).

    Returns DataFrame[contig_id, seq] for every input contig (extended or
    untouched).
    """
    # Content-deterministic read ids: identical reads collapse to one row
    # carrying their multiplicity as a vote weight. A nondeterministic id
    # (monotonically_increasing_id) could renumber reads when a partition
    # is recomputed after the forward side materialized, double-counting or
    # orphaning votes; hashing the sequence also dedupes BEFORE the seed
    # explode — fewer shuffled k-mer rows at scale.
    #
    # The mapping + voting below is the FUSED form of
    # seed_map_reads(contained_only=False) → consensus_extensions: the
    # standalone pair joins the read text by id twice (once for the
    # overlap verify, once for the vote explode); fusing keeps the text
    # attached from the single candidate⋈reads join straight through
    # verify and voting — one text shuffle instead of two, and the
    # compute-dense verify+explode stage runs at pinned parallelism
    # instead of the 2-3 tasks AQE's byte-based coalescing allotted it.
    n_part = shuffle_partition_count(reads)
    fwd = reads.select(F.upper(F.col(read_seq)).alias("seq"))
    rc = fwd.select(reverse_complement(F.col("seq")).alias("seq"))
    both = (
        fwd.unionByName(rc)
        .groupBy("seq")
        .agg(F.count(F.lit(1)).alias("weight"))
        # accepted ~n²/2⁶⁵ collision risk (see patch_contigs): a colliding
        # pair of reads would pool their votes under one id
        .withColumn("rid", F.xxhash64("seq"))
        # consumed by the seed mapper AND the consensus voter: materialize
        # the dedup shuffle once instead of per consumer. A checkpoint-free
        # exchange-reuse form was MEASURED (r8) and reverted: column
        # pruning specializes the two consumers' exchanges (k-mer side
        # prunes weight, vote side prunes nothing), so ReusedExchange
        # never fires and the dedup groupBy runs twice (+2.1 s at sf1.0)
        .localCheckpoint(eager=False)
    )

    ends = extract_contig_ends(
        contigs, searchable_len=searchable_len, id_col=id_col, seq_col=seq_col
    ).select(
        F.col(id_col).alias("contig_id"),
        "side",
        "end_seq",
        F.length("end_seq").alias("elen"),
    ).localCheckpoint(eager=False)

    # candidate offsets: read k-mer positions ⋈ end k-mer positions.
    # (An RC-closure halving of the read explode — canonical half only,
    # mirror hits derived against RC'd seeds, as stitch_bridges does —
    # was tried and REVERTED here: the seed side is contig ends, not a
    # handful of contigs, so doubling it doubles a non-tiny broadcast
    # build and costs more than the halved explode saves.)
    rk = _pos_kmers(
        both.select("rid", F.col("seq").alias("rseq")), "rid", "rseq", seed_k
    ).select("rid", F.col("pos").alias("rpos"), "kmer")
    # _pos_kmers keeps a single id column — carry (contig_id, side) as a
    # STRUCT id, never a delimited string: a contig id containing the
    # delimiter (FASTA headers like "read/1" are common) would split
    # wrong and silently drop every candidate for that contig
    ek = _pos_kmers(
        ends.select(
            F.struct("contig_id", "side").alias("eid"),
            F.col("end_seq").alias("eseq"),
        ),
        "eid",
        "eseq",
        seed_k,
    ).select(
        F.col("eid.contig_id").alias("contig_id"),
        F.col("eid.side").alias("side"),
        F.col("pos").alias("tpos"),
        "kmer",
    )
    # no forced broadcast on either join below: AQE broadcasts the small
    # side at runtime when it fits; a forced hint would die on the 8 GB
    # broadcast limit at metagenome contig counts instead of degrading
    # to a shuffle join
    cand = (
        rk.join(ek, "kmer")
        .select(
            "rid",
            "contig_id",
            "side",
            (F.col("tpos") - F.col("rpos") + 1).alias("offset"),
        )
        # repartition FIRST: HashPartitioning(rid) satisfies the distinct's
        # (rid, contig_id, side, offset) clustering (subset rule), so the
        # dedup runs partition-local instead of adding its own exchange —
        # one shuffle where the old dropDuplicates→repartition pair had two.
        # The numbered repartition also pins parallelism for the compute-
        # dense verify + vote-explode below (never AQE-coalesced) and
        # satisfies the rid join's distribution requirement.
        .repartition(n_part, "rid")
        .dropDuplicates(["rid", "contig_id", "side", "offset"])
    )
    m = (
        cand.join(
            both.select("rid", F.col("seq").alias("rseq"),
                        F.length("seq").alias("rlen"),
                        F.col("weight").cast("bigint").alias("wt")),
            "rid",
        )
        .join(ends.select("contig_id", "side", "end_seq", "elen"),
              ["contig_id", "side"])
    )
    # overlap verify (seed_map_reads contained_only=False semantics):
    # read positions [rs, rs+n) ↔ end positions [ts, ts+n) must match
    # exactly over n ≥ seed_k bases
    rs = F.greatest(F.lit(1), F.lit(2) - F.col("offset"))
    tsp = F.greatest(F.lit(1), F.col("offset"))
    nov = F.least(F.col("rlen") - rs + 1, F.col("elen") - tsp + F.lit(1))
    m = (
        m.where(
            (nov >= seed_k)
            & (F.col("rseq").substr(rs, nov) == F.col("end_seq").substr(tsp, nov))
        )
        # read position of the first base PAST the end: elen - offset + 2
        .withColumn("first_over", F.col("elen") - F.col("offset") + 2)
        .where(
            (F.col("first_over") >= 1) & (F.col("first_over") <= F.col("rlen"))
        )
    )
    ext = _consensus_from_overhangs(m, min_depth, n_part=n_part)
    # Both sides in ONE pass: a conditional agg replaces the old
    # checkpoint + L/R filtered splits + two joins (the split form read
    # the extension set three times and joined twice; at most 2 rows per
    # contig exist, so one max(when) agg pivots them into columns).
    # Partitioned by contig_id since the kernel's repartition → no
    # exchange here either.
    per_contig = ext.groupBy("contig_id").agg(
        F.max(F.when(F.col("side") == "L", F.col("extension"))).alias("__l"),
        F.max(F.when(F.col("side") == "R", F.col("extension"))).alias("__r"),
    ).withColumnRenamed("contig_id", id_col)
    base = contigs.select(F.col(id_col), F.upper(F.col(seq_col)).alias("__seq"))
    out = base.join(per_contig, id_col, "left").select(
        F.col(id_col),
        F.concat(
            # left extension was grown on the RC strand → flip back
            F.coalesce(
                reverse_complement(F.col("__l")), F.lit("")
            ),
            F.col("__seq"),
            F.coalesce(F.col("__r"), F.lit("")),
        ).alias(seq_col),
    )
    return out
