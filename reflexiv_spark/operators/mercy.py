"""Mercy k-mers — rescue single-coverage k-mers inside covered reads
(``reflexiv mercy``, W5/J5).

Reference: reads are joined with their solid-k-mer hit offsets, offsets
are sorted per read, and gaps between consecutive hits are scanned
(``ReflexivDSDynamicMercyKmer.java:913-1240``); the gap rule at
``:1335-1345``: a gap of g = b−a−1 missing k-mers is *skipped* when
k−1 ≤ g ≤ k+1 (the footprint of a single base error), otherwise every
k-mer starting in (a, b) is emitted with coverage 1 (emit ``:991-998``,
canonical pick included).

Spark-first: the hit list is a semi-join of the read's exploded
(position, canonical k-mer) pairs against the solid set; gap detection is
``lead(pos) OVER (PARTITION BY read ORDER BY pos)``; emission is a
``sequence``+``explode`` over the gap range — joins, windows and Catalyst
expressions only, no sort+scan, no per-read Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from reflexiv_spark.functions.kmer import canonical_kmer, kmer_array
from reflexiv_spark.plans.layout import spread


def mercy_kmers(
    reads: DataFrame,
    solid_kmers: DataFrame | None,
    k: int,
    seq_col: str = "seq",
    read_id_col: str | None = None,
    min_coverage: int = 2,
) -> DataFrame:
    """DataFrame[kmer, count=1]: rescued k-mers in intra-read coverage gaps.

    ``solid_kmers`` needs a canonical ``kmer`` column (typically the
    coverage-filtered counter output). Pass ``solid_kmers=None`` to derive
    the solid set (count ≥ ``min_coverage``) from the SAME exploded
    (position, k-mer) pairs the gap scan uses — one pass over the reads
    instead of a separate counter scan, identical counts by construction.
    When ``read_id_col`` is None a synthetic id is attached (ids only key
    the per-read window; they never reach the output).
    """
    if read_id_col is None:
        # content-hash ids, not monotonically_increasing_id: `base` feeds
        # both the k-mer explode and the final gap rejoin, and a recomputed
        # branch must see identical ids. Identical reads share an id —
        # harmless here (identical reads have identical gaps and the output
        # is deduplicated); collision risk as documented in patch_contigs.
        reads = reads.withColumn("__rid", F.xxhash64(F.upper(F.col(seq_col))))
        read_id_col = "__rid"
    # two selects: referencing an alias inside the same select's lambda
    # trips Spark's lateral-column-alias analysis
    base = spread(
        reads.select(
            F.col(read_id_col).alias("rid"), F.upper(F.col(seq_col)).alias("seq")
        )
    ).localCheckpoint(eager=False)
    # Shuffle hygiene: only (rid, pos, kmer) ride the explode → semi-join →
    # window path; the ~read-length× heavier seq column rejoins by rid only
    # for the (rare) gap rows. At sf0.1 this cuts the window exchange from
    # ~seq_len× amplified bytes to a few MB.
    # length guard BEFORE the window explode: kmer_array on a sub-k read
    # yields a DESCENDING sequence of bogus positions whose partial
    # substrings would otherwise pollute the fused solid-set derivation
    # int-position explode (r13): slice per output row instead of
    # materializing the substring array per read (see kmer.explode_kmers)
    pos_kmers = base.where(F.length("seq") >= k).select(
        "rid",
        "seq",
        F.explode(
            F.sequence(F.lit(1), F.length("seq") - F.lit(k - 1))
        ).alias("pos"),  # 1-based k-mer start offset
    ).select(
        "rid",
        "pos",
        canonical_kmer(F.col("seq").substr(F.col("pos"), F.lit(k))).alias(
            "kmer"
        ),
    )
    if solid_kmers is None:
        # fused counter: the explode is the stage's dominant cost, so the
        # solid set comes from the same pass (materialized once)
        pos_kmers = pos_kmers.localCheckpoint(eager=False)
        solid_kmers = (
            # same drop_invalid semantics as count_kmers: a non-ACGT k-mer
            # must never enter the solid set
            pos_kmers.where(~F.col("kmer").rlike("[^ACGT]"))
            .groupBy("kmer")
            .agg(F.count(F.lit(1)).alias("__c"))
            .where(F.col("__c") >= min_coverage)
        )
    hits = pos_kmers.join(
        solid_kmers.select("kmer").dropDuplicates(), "kmer", "left_semi"
    ).select("rid", "pos")
    w = Window.partitionBy("rid").orderBy("pos")
    gaps = (
        hits.withColumn("b", F.lead("pos").over(w))
        .withColumnRenamed("pos", "a")
        .where(
            F.col("b").isNotNull()
            & (F.col("b") - F.col("a") > 1)
            # skip single-error footprints: k-1 <= gap <= k+1
            & ~(
                (F.col("b") - F.col("a") - 1 >= k - 1)
                & (F.col("b") - F.col("a") - 1 <= k + 1)
            )
        )
    )
    mercy = gaps.join(base, "rid").select(
        "seq",
        F.explode(F.sequence(F.col("a") + 1, F.col("b") - 1)).alias("p"),
    ).select(
        canonical_kmer(F.col("seq").substr(F.col("p"), F.lit(k))).alias("kmer")
    )
    return mercy.dropDuplicates().select("kmer", F.lit(1).alias("count"))
