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
from reflexiv_spark.operators.containment import contained_row_ids


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
    dropped = contained_row_ids(
        contigs,
        seq_col,
        id_col,
        w,
        shingles=lambda c: _canon_shingles(c, w),
        verify=lambda sup, sub: F.contains(sup, sub)
        | F.contains(sup, reverse_complement(sub)),
    )
    return contigs.join(dropped, F.col(id_col) == dropped["__id"], "left_anti")


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
