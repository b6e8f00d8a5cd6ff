"""Bucketed-table layout: shuffle-free co-located joins.

The reference re-shuffles its k-mer/contig tables at every step of its
staged pipeline (each step is its own SparkSession reading the previous
step's CSV — ``Pipelines.java:832-839``: the shuffle is re-paid per
step). On Spark the idiomatic fix is the bucketed Parquet table: write
once bucketed (and sorted) by the join/aggregation key, and every later
equi-join or groupBy on that key reads co-located buckets with NO
exchange — at 100 TB that turns the dominant repeated cost of a staged
pipeline (the join shuffle) into a one-time write cost.

``write_bucketed``/``read_bucketed`` wrap the saveAsTable plumbing
(bucket metadata lives in the session catalog; the data is plain
Parquet at ``path``), and ``tests/test_bucketing.py`` proves the plan
property: a self-join of two tables bucketed on the key has zero
Exchange operators between scan and join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (+ sorted) Parquet table.

    ``buckets`` should be sized so one bucket of the LARGER join side
    fits an executor task comfortably (bucket count is fixed at write
    time; both join sides must use the same count for a shuffle-free
    join). ``path`` makes it an external table (data survives catalog
    drops).
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (a plain
    ``spark.read.parquet(path)`` would lose it and re-shuffle)."""
    return spark.table(table)
