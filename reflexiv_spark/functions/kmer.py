"""Genomic k-mer expression kernels.

The reference implements these as bit-twiddling helpers inside
``mapPartitions`` closures over 2-bit-packed longs (canonical builder
``ReflexivDataFrameCounter.java:448-511``, reverse complement
``ReflexivDSKmerLeftAndRightSorting.java:1569-1665``, sub-k-mer extraction
``ReflexivDSDynamicKmerFirstFour.java:906-1300``). Because the reference's
canonical pick — numerically smaller of the two 2-bit encodings with
A=00,C=01,G=10,T=11 (``ReflexivDataFrameCounter.java:502-506``) — equals the
lexicographically smaller string under A<C<G<T, the whole kernel set is
expressible as Catalyst string expressions: no UDFs, no packing, full
whole-stage codegen. Parquet dictionary + zstd recovers most of the 2-bit
packing's shuffle-size advantage (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_COMPLEMENT_FROM = "ACGTacgt"
_COMPLEMENT_TO = "TGCAtgca"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def reverse_complement(seq: Column | str) -> Column:
    """Reverse complement of a DNA string column (C3).

    ``N`` and any non-ACGT character map to themselves.
    """
    return F.reverse(F.translate(_col(seq), _COMPLEMENT_FROM, _COMPLEMENT_TO))


def canonical_kmer(kmer: Column | str) -> Column:
    """Canonical form: lexicographic min of (kmer, revcomp(kmer)) (C2).

    Equivalent to the reference's numeric-min canonical pick because the
    2-bit code is order-isomorphic to A<C<G<T
    (``ReflexivDataFrameCounter.java:502-506``).
    """
    k = _col(kmer)
    return F.least(k, reverse_complement(k))


def kmer_array(seq: Column | str, k: int) -> Column:
    """All k-length substrings of ``seq`` as an array column.

    Pure Catalyst (``transform`` + ``sequence`` + ``substring``) so the
    sliding window runs inside whole-stage codegen. Caller must guarantee
    ``length(seq) >= k`` (``sequence(1, n)`` with n < 1 errors in Spark);
    :func:`explode_kmers` applies that guard.
    """
    s = _col(seq)
    return F.transform(
        F.sequence(F.lit(1), F.length(s) - F.lit(k - 1)),
        lambda i: s.substr(i, F.lit(k)),
    )


def explode_kmers(
    df,
    k: int,
    seq_col: str = "seq",
    out_col: str = "kmer",
    canonical: bool = True,
    drop_invalid: bool = True,
    keep_cols: list[str] | None = None,
):
    """Explode each sequence row into its k-mers (C2+C4 pipeline step).

    drop_invalid drops k-mers containing non-ACGT characters (the reference
    spot-checks bases at the read-filter stage, S3, and maps others onto the
    2-bit alphabet; dropping is the semantically safe equivalent).
    """
    from reflexiv_spark.plans.layout import spread

    cols = [F.col(c) for c in (keep_cols or [])]
    out = (
        # ~read_len× amplification happens inside this explode: make sure
        # a small/single-partition input doesn't serialize it on one core.
        spread(df.where(F.length(seq_col) >= k))
        # Uppercase before windowing: reverse_complement handles lowercase
        # but the drop_invalid rlike and canonical compare are case-
        # sensitive — un-uppercased input would silently lose k-mers.
        #
        # Window shape (r13, guide §1.2 step 2 — per-task work): explode
        # the POSITION ints and slice per output row, instead of
        # materializing an array of L−k+1 k-char substrings per input
        # row and exploding that (which also re-evaluated the upper()
        # inside the transform lambda once per element). Same rows out;
        # measured 0.30 → 0.18 s on the raw k=61 window at sf0.1.
        .select(*cols, F.upper(F.col(seq_col)).alias("__useq"))
        .select(
            *cols,
            "__useq",
            F.explode(
                F.sequence(F.lit(1), F.length("__useq") - F.lit(k - 1))
            ).alias("__p"),
        )
        .select(
            *cols, F.col("__useq").substr(F.col("__p"), F.lit(k)).alias(out_col)
        )
    )
    if drop_invalid:
        out = out.where(~F.col(out_col).rlike("[^ACGT]"))
    if canonical:
        out = out.withColumn(out_col, canonical_kmer(out_col))
    return out


def prefix_subkmer(kmer: Column | str, k: int | None = None) -> Column:
    """Leading (k-1)-mer — the "forward" sub-k-mer key (C4).

    Works for variable-length rows when ``k`` is None: everything but the
    last base.
    """
    s = _col(kmer)
    if k is not None:
        return s.substr(F.lit(1), F.lit(k - 1))
    return s.substr(F.lit(1), F.length(s) - F.lit(1))


def suffix_subkmer(kmer: Column | str, k: int | None = None) -> Column:
    """Trailing (k-1)-mer — the "reflected" sub-k-mer key (C4)."""
    s = _col(kmer)
    n = F.lit(k - 1) if k is not None else F.length(s) - F.lit(1)
    return s.substr(F.length(s) - n + F.lit(1), n)
