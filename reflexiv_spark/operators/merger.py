"""Redundant-contig merging — ``reflexiv merger`` (W8).

Reference: contigs sorted by length, then a per-partition neighbor scan
merges identical / contained / overlapping contigs; overlap must be at
least ``minLonger`` (60 bp) within the last ``searchableLength`` (600 bp)
of the upstream contig (``ReflexivDSMerger.java:161-175``, scan class
``:452-1067``; params ``DefaultParam.java:125-127``).

Spark-first: overlap detection is a seed equi-join, not a sort+scan. Each
downstream contig B contributes its leading ``seed_k``-mer; each upstream
contig A contributes every ``seed_k``-shingle of its searchable tail with
its position. A seed match at tail position p implies overlap
o = len(A) − p + 1; an exact suffix/prefix compare verifies, and the
best (longest-overlap) merge per downstream contig wins. Candidate
volume is bounded by searchable_len · |contigs| — independent of contig
length, the same trick the reference's searchableLength plays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Reference defaults: DefaultParam.java:125-127.
DEFAULT_MIN_OVERLAP = 60
DEFAULT_SEARCHABLE = 600


def overlap_pairs(
    contigs: DataFrame,
    seq_col: str = "seq",
    id_col: str = "contig_id",
    min_overlap: int = DEFAULT_MIN_OVERLAP,
    seed_k: int | None = None,
    searchable_len: int | None = DEFAULT_SEARCHABLE,
    b_side: DataFrame | None = None,
) -> DataFrame:
    """DataFrame[id_a, id_b, overlap]: best suffix(A)→prefix(B) overlap
    per (A, B), with overlap ≥ min_overlap.

    ``seed_k`` defaults to ``min_overlap`` (every valid overlap then
    contains the seed); ``searchable_len=None`` searches whole contigs.

    ``b_side`` (same ``seq_col``/``id_col`` schema) makes the join
    ASYMMETRIC: suffixes come from ``contigs`` (the A side), prefixes
    from ``b_side`` only. Callers that want cross-set overlaps (e.g.
    fragment→contig end extension) get exactly that quadrant instead of
    paying for the full self-join on the union and discarding 3/4 of
    the candidates afterwards. Default (None) is the symmetric
    self-overlap set, unchanged.

    ID-SPACE REQUIREMENT for ``b_side``: the two sides' id spaces must
    be DISJOINT (or share only ids meaning the same entity). The
    ``id_a != id_b`` self-pair filter still applies in the asymmetric
    quadrant — a ``b_side`` row whose id numerically collides with an
    unrelated A-side id would be silently dropped as a "self" pair
    (round-9 advisory). Callers joining independent sets should salt
    one side's ids (e.g. negate, or offset by max(id)+1) first; the
    filter is kept even with ``b_side`` because the existing consumers
    pass overlapping universes where equal id ⇒ same contig.
    """
    if seed_k is None:
        seed_k = min_overlap
    s, i = F.col(seq_col), F.col(id_col)
    base = contigs.select(i.alias("id"), s.alias("seq"), F.length(s).alias("len"))
    base_b = (
        base
        if b_side is None
        else b_side.select(i.alias("id"), s.alias("seq"), F.length(s).alias("len"))
    )

    tail_start = (
        F.greatest(F.lit(1), F.col("len") - F.lit(searchable_len - 1))
        if searchable_len is not None
        else F.lit(1)
    )
    # length guard BEFORE sequence(): Spark's sequence(start, stop) steps
    # backwards when stop < start, which would fabricate bogus positions
    # for contigs shorter than the seed.
    tails = base.where(F.col("len") >= seed_k).select(
        F.col("id").alias("id_a"),
        F.col("len").alias("len_a"),
        F.col("seq").alias("seq_a"),
        tail_start.alias("t0"),
    ).select(
        "id_a",
        "len_a",
        "seq_a",
        # int-position explode (r13): slice per output row instead of
        # materializing the (p, seed) struct array per contig
        F.explode(
            F.sequence(F.col("t0"), F.col("len_a") - F.lit(seed_k - 1))
        ).alias("p"),
    ).select(
        "id_a",
        "len_a",
        "p",
        F.col("seq_a").substr(F.col("p"), F.lit(seed_k)).alias("seed"),
    )
    heads = base_b.select(
        F.col("id").alias("id_b"),
        F.col("len").alias("len_b"),
        F.substring(F.col("seq"), 1, seed_k).alias("seed"),
    ).where(F.col("len_b") >= seed_k)

    cand = (
        tails.join(heads, "seed")
        .where(F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (F.col("len_a") - F.col("p") + 1).alias("overlap"),
        )
        .where(F.col("overlap") >= min_overlap)
        # the overlap cannot exceed B (suffix==prefix compare would fail
        # anyway; pruning here keeps the verify join small)
        .where(F.col("overlap") <= F.col("len_b"))
        .dropDuplicates(["id_a", "id_b", "overlap"])
    )
    seq_a = base.select(F.col("id").alias("id_a"), F.col("seq").alias("seq_a"))
    seq_b = base_b.select(F.col("id").alias("id_b"), F.col("seq").alias("seq_b"))
    verified = (
        cand.join(seq_a, "id_a")
        .join(seq_b, "id_b")
        .where(
            F.col("seq_a").substr(
                F.length("seq_a") - F.col("overlap") + 1, F.col("overlap")
            )
            == F.col("seq_b").substr(F.lit(1), F.col("overlap"))
        )
    )
    return verified.groupBy("id_a", "id_b").agg(
        F.max("overlap").cast("bigint").alias("overlap")
    )


def merge_contigs(
    contigs: DataFrame,
    seq_col: str = "seq",
    id_col: str = "contig_id",
    min_overlap: int = DEFAULT_MIN_OVERLAP,
    searchable_len: int | None = DEFAULT_SEARCHABLE,
    rounds: int = 3,
) -> DataFrame:
    """Merge overlapping contigs (best overlap per pair, one merge per
    contig end per round, ``rounds`` rounds), then drop merged-away and
    contained pieces.

    Returns DataFrame[contig_id, seq] — merged ids are ``idA+idB``.
    """
    from reflexiv_spark.operators.dedup import drop_contained_contigs
    from reflexiv_spark.operators.patching import best_connection

    cur = contigs.select(F.col(id_col).alias("cid"), F.col(seq_col).alias("seq"))
    for _ in range(rounds):
        pairs = overlap_pairs(
            cur, seq_col="seq", id_col="cid",
            min_overlap=min_overlap, searchable_len=searchable_len,
        )
        if pairs.isEmpty():
            break
        # one incoming merge per B, then one outgoing per A
        best_in = best_connection(pairs, "id_a", "id_b", support_col="overlap")
        w = Window.partitionBy("id_a").orderBy(F.col("overlap").desc(), F.col("id_b"))
        chosen = (
            best_in.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        # A contig consumed as a downstream (id_b) must not also head a
        # merge (id_a) in the same round: chain A→B→C would otherwise emit
        # B's bases into both A+B and B+C. Chains merge one link per round;
        # pure cycles (circular contigs) drop out entirely, which is the
        # safe outcome — merging a cycle duplicates content by definition.
        chosen = chosen.join(
            chosen.select(F.col("id_b").alias("id_a")).distinct(),
            "id_a",
            "left_anti",
        # chosen feeds four subplans (isEmpty, two merge joins, the used
        # union): materialize once so the overlap-pairs windowing behind it
        # isn't recomputed per consumer
        ).localCheckpoint(eager=True)
        if chosen.isEmpty():
            break
        sa = cur.select(F.col("cid").alias("id_a"), F.col("seq").alias("seq_a"))
        sb = cur.select(F.col("cid").alias("id_b"), F.col("seq").alias("seq_b"))
        merged = (
            chosen.join(sa, "id_a")
            .join(sb, "id_b")
            .select(
                F.concat_ws("+", F.col("id_a"), F.col("id_b")).alias("cid"),
                F.concat(
                    F.col("seq_a"),
                    F.expr("substring(seq_b, overlap + 1)"),
                ).alias("seq"),
            )
        )
        used = chosen.select(F.col("id_a").alias("cid")).unionByName(
            chosen.select(F.col("id_b").alias("cid"))
        ).distinct()
        rest = cur.join(used, "cid", "left_anti")
        from reflexiv_spark.plans.barriers import iteration_barrier

        cur = iteration_barrier(merged.unionByName(rest))
    deduped = drop_contained_contigs(
        cur, seq_col="seq", id_col="cid", w=min(31, min_overlap)
    )
    return deduped.select(F.col("cid").alias(id_col), F.col("seq").alias(seq_col))
