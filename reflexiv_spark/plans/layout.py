"""Physical-layout helpers.

``spread`` addresses a local-mode/small-file blind spot that also exists
on clusters with few large row groups: an operator that *amplifies* its
input 100-300× inside per-row lambdas (k-mer windows, shingle explodes)
inherits the scan's partition count, so a 1-partition scan serializes the
whole explode onto one core. A round-robin repartition of the (small, by
precondition) input before the amplification restores parallelism; inputs
that already have >= default-parallelism partitions pass through
untouched, so the helper is a no-op on well-partitioned 100 TB scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism iff it
    currently has fewer partitions; otherwise return it unchanged."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
