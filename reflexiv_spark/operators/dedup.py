"""Contig deduplication — exact strand duplicates + contained contigs
(A3/J7/W7).

Reference: marker k-mers from each contig are counted
(``ReflexivDSDynamicKmerDedup.java:211-219`` — groupBy("kmer").count(),
filter(count >= 2)); contigs whose markers all land in another contig are
then detected by a double sort + neighbor containment scan, including
reverse-complement duplicates (``:225-280``; RCmerge,
``DefaultParam.java:133``).

Spark-first: the same marker idea becomes a bucketed inverted-index join —
the probe is each contig's MINIMUM canonical w-shingle (a contained
contig's every shingle, in particular its minimum, appears in the
container, in either orientation since shingles are canonicalized), and an
exact ``contains`` check against both orientations verifies. Shares its
shape with :func:`reflexiv_spark.datapipe.dedup.drop_contained` (the
datapipe generalization, SURVEY.md §7.1 item 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.functions.kmer import canonical_kmer, reverse_complement
from reflexiv_spark.plans.layout import spread


def _canon_shingles(col, w: int):
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.sequence(F.lit(1), F.length(c) - F.lit(w - 1)),
        lambda i: canonical_kmer(c.substr(i, F.lit(w))),
    )


def dedup_exact_rc(
    contigs: DataFrame, seq_col: str = "seq", id_col: str = "contig_id"
) -> DataFrame:
    """Drop exact and reverse-complement duplicates (keep smallest id)."""
    from pyspark.sql import Window

    w = Window.partitionBy(canonical_kmer(seq_col)).orderBy(F.col(id_col))
    return (
        contigs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def drop_contained_contigs(
    contigs: DataFrame,
    seq_col: str = "seq",
    id_col: str = "contig_id",
    w: int = 31,
) -> DataFrame:
    """Remove contigs contained in a longer contig, in either orientation.

    Drop rule: contig d is dropped iff some contig D satisfies
    ``len(D) > len(d)`` and (``contains(D, d)`` or ``contains(D, rc(d))``),
    or lengths are equal and the same containment holds with
    ``D.id < d.id`` (exact/RC duplicates). Candidates are bucketed on the
    probe's minimum canonical w-shingle; only (id, shingle) pairs ride the
    candidate join — sequences rejoin by id for the verify step.
    """
    s, i = F.col(seq_col), F.col(id_col)
    # Materialize the projected base once (lazily): the operator fans out
    # into 6 self-join branches, and without a barrier Catalyst collapses
    # the caller's seq-producing expressions INTO the per-shingle lambdas
    # (re-running them once per array element per branch). The reference
    # persists DISK_ONLY at the same spot
    # (``ReflexivDSDynamicKmerDedup.java:200``).
    base = spread(
        contigs.select(i.alias("__id"), s.alias("__seq"), F.length(s).alias("__len"))
    ).localCheckpoint(eager=False)
    long_rows = base.where(F.col("__len") >= w)
    short_rows = base.where((F.col("__len") < w) & (F.col("__len") > 0))

    # Canonical shingles collapse to 8-byte xxhash64 values before the
    # candidate exchange (hash-set containment follows from shingle-set
    # containment; collisions only add candidates that the contains-verify
    # step removes).
    hashed = F.array_distinct(F.transform(_canon_shingles("__seq", w), lambda x: F.xxhash64(x)))
    idx = long_rows.select(
        F.col("__id").alias("sup_id"),
        F.col("__len").alias("sup_len"),
        F.explode(hashed).alias("sh"),
    ).alias("supside")
    probe = long_rows.select(
        F.col("__id").alias("sub_id"),
        F.col("__len").alias("sub_len"),
        F.array_min(hashed).alias("sh"),
    ).alias("subside")
    len_pred = (F.col("supside.sup_id") != F.col("subside.sub_id")) & (
        (F.col("supside.sup_len") > F.col("subside.sub_len"))
        | (
            (F.col("supside.sup_len") == F.col("subside.sub_len"))
            & (F.col("supside.sup_id") < F.col("subside.sub_id"))
        )
    )
    cand = (
        probe.join(idx, F.col("subside.sh") == F.col("supside.sh"))
        .where(len_pred)
        .select("sub_id", "sup_id")
        .dropDuplicates()
    )
    sub_seqs = long_rows.select(
        F.col("__id").alias("sub_id"), F.col("__seq").alias("sub_seq")
    )
    sup_seqs = long_rows.select(
        F.col("__id").alias("sup_id"), F.col("__seq").alias("sup_seq")
    )
    rc_contains = F.contains(
        F.col("sup_seq"), F.col("sub_seq")
    ) | F.contains(F.col("sup_seq"), reverse_complement(F.col("sub_seq")))
    dropped_long = (
        cand.join(sub_seqs, "sub_id")
        .join(sup_seqs, "sup_id")
        .where(rc_contains)
        .select(F.col("sub_id").alias("__id"))
    )
    short_probe = short_rows.select(
        F.col("__id").alias("sub_id"),
        F.col("__seq").alias("sub_seq"),
        F.col("__len").alias("sub_len"),
    ).alias("subside")
    dropped_short = (
        base.alias("supside")
        .join(F.broadcast(short_probe))
        .where(
            (F.col("supside.__id") != F.col("subside.sub_id"))
            & (
                (F.col("supside.__len") > F.col("subside.sub_len"))
                | (
                    (F.col("supside.__len") == F.col("subside.sub_len"))
                    & (F.col("supside.__id") < F.col("subside.sub_id"))
                )
            )
            & (
                F.contains(F.col("supside.__seq"), F.col("subside.sub_seq"))
                | F.contains(
                    F.col("supside.__seq"),
                    reverse_complement(F.col("subside.sub_seq")),
                )
            )
        )
        .select(F.col("subside.sub_id").alias("__id"))
    )
    dropped = dropped_long.unionByName(dropped_short).distinct()
    return contigs.join(dropped, i == dropped["__id"], "left_anti")


def dedup_contigs(
    contigs: DataFrame,
    seq_col: str = "seq",
    id_col: str = "contig_id",
    marker_w: int = 31,
) -> DataFrame:
    """Full dedup stage: exact/RC duplicates, then contained contigs —
    the ``/Assembly`` final-stage semantics
    (``ReflexivDSDynamicKmerDedup.java:191-300``)."""
    exact = dedup_exact_rc(contigs, seq_col=seq_col, id_col=id_col)
    return drop_contained_contigs(
        exact, seq_col=seq_col, id_col=id_col, w=marker_w
    )
