"""Parallelism helpers for operators that pin numbered repartitions.

Separate from ``layout`` so that adding/changing these helpers does not
mark every layout-importing query as window-affected in
``tools/check_window.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

def shuffle_partition_count(df: DataFrame) -> int:
    """The session's shuffle-partition count as an int, falling back to
    ``sparkContext.defaultParallelism`` when the conf holds a
    non-numeric value (some platforms set it to ``"auto"``). Used by
    operators that pin a numbered ``repartition`` so AQE's byte-based
    coalescing cannot serialize a compute-dense fan-out stage."""
    spark = df.sparkSession
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism
