"""Fork (branch/bubble) filtering — argmax-per-group pruning.

Reference: ``DSFilterForkSubKmer`` / ``DSFilterForkReflectedSubKmer``
(``ReflexivDSKmerLeftAndRightSorting.java:360-904``): global sort on the
sub-k-mer, then a per-partition ordered scan keeping the highest-coverage
row per sub-k-mer group (ties → larger extension), optionally requiring the
winner to exceed ``minErrorCoverage`` (4× min coverage,
``DefaultParam.java:106``).

Spark-first: this is textbook ``row_number() OVER (PARTITION BY subkmer
ORDER BY cover DESC, ext DESC)`` — a single hash-shuffle window, no global
sort, whole-stage codegen'd. At 100 TB the window's hash exchange replaces
the reference's range-partitioner sampling job + full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def filter_forks(
    df: DataFrame,
    key_col: str,
    cover_col: str = "cover",
    tie_cols: tuple[str, ...] = (),
    min_winner_cover: int | None = None,
) -> DataFrame:
    """Keep the best row per ``key_col`` group (W1/W2/A5).

    Ordering: coverage desc, then ``tie_cols`` desc (the reference breaks
    ties toward the larger extension), deterministic.

    ``min_winner_cover`` mirrors the reference's ``minErrorCoverage`` gate
    (4× min coverage, ``DefaultParam.java:106``): it applies **only to rows
    that won an actual fork** (group size > 1) — a low-coverage branch that
    beat competitors is suspect, but an unforked low-coverage k-mer is kept
    (``DSFilterForkSubKmer``, ``ReflexivDSKmerLeftAndRightSorting.java:426-624``).
    """
    order = [F.col(cover_col).desc()] + [F.col(c).desc() for c in tie_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    wg = Window.partitionBy(key_col)
    out = (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wg))
        .where(F.col("__rn") == 1)
    )
    if min_winner_cover is not None:
        out = out.where(
            (F.col("__n") == 1) | (F.col(cover_col) >= min_winner_cover)
        )
    return out.drop("__rn", "__n")
