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

from py4j.protocol import Py4JError
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism iff it
    currently has fewer partitions; otherwise return it unchanged.

    Decision cost matters more than decision precision here: a 100 TB scan
    must pass through without forcing physical planning. Order of checks:

    1. File-backed plans with >= target input files pass through: each
       file contributes at least one split, and counting files only reads
       the analyzed plan's FileIndex (already built, reused at execution).
    2. Only plausibly-small inputs (few/no files — local relations, post-
       checkpoint plans) pay the exact ``rdd.getNumPartitions()`` check;
       at the near-leaf call sites in this package those plans are
       shallow, so the planner pass is cheap.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        if len(df.inputFiles()) >= target:
            return df
    except (AnalysisException, Py4JError):
        # "plan has no file index" (streaming / local relations on some
        # plan shapes) — fall through to the exact partition count; any
        # other error class should surface, not be swallowed here
        pass
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
