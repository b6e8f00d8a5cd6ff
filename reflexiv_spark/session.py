"""SparkSession factory with the engine's standard configuration.

The reference hand-tunes a shrinking shuffle-partition schedule and tiny
input splits (``Pipelines.java:877-1258``, ``ReflexivDataFrameCounter.java:107``);
we rely on AQE for both (SURVEY.md §4). Session timezone is pinned to UTC so
results hash-match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark import SparkConf
from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "reflexiv-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession configured for the engine.

    Defaults scale with the local test harness (``local[$SPARK_GRAFT_CPUS]``)
    but every setting is cluster-appropriate: AQE handles partition
    coalescing and skew joins at any scale, so nothing here needs retuning
    for a 1000-executor deployment.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32

    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    elif not SparkConf().contains("spark.master"):
        # No deployment-provided master (spark-submit/cluster sets
        # spark.master via system properties, which SparkConf sees) —
        # fall back to local mode for bare `python` invocations. Never
        # override a cluster master with local.
        builder = builder.master(f"local[{cpus}]")
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch sizing for the mapInPandas kernels (guide §4.2
        # "keep batch sizes large enough for vectorization to pay off"):
        # the engine's kernel columns are narrow numerics — int64 ids,
        # fixed 64-dim int64 embeddings, short read strings — so the
        # 10k-row default leaves NumPy/GEMM batches far below their
        # efficient size and pays 6.5x the crossing overhead. 65536 rows
        # ≈ 32 MB for the widest embedding batch; fat rows (multimodal
        # blobs) stay bounded by Spark 4's
        # spark.sql.execution.arrow.maxBytesPerBatch (64 MB default),
        # which caps the batch BYTES regardless of this row count.
        # Measured r13 (interleaved A/B, sf0.1): kmer_count 1.02→0.91,
        # semantic_dedup 1.71→1.60, kmeans_assign 0.78→0.70, knn_graph
        # 1.51→1.39, pq_encode 0.46→0.39 s; neutral elsewhere. Results
        # unchanged (all kernels are row-wise or merge-aggregated —
        # batch boundaries are not observable in any output).
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "65536"),
        )
        # File-split sizing: the default 4 MiB open-cost floor stops
        # megabyte-scale local test files from splitting at all, so a
        # CPU-bound map stage (token hashing, decode) runs on 1-2 of 32
        # cores. 256 KiB keeps small inputs splitting down to
        # totalBytes/defaultParallelism; on a real cluster files are
        # ≥ row-group sized and maxPartitionBytes (128 MiB default)
        # governs instead — override via SPARK_GRAFT_OPEN_COST if a
        # deployment's file-open latency warrants the bigger floor.
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST", str(256 * 1024)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Constraint propagation is a driver-side planning cost that the
        # engine pays per plan (and ITERATIVE loops pay per round — the
        # contraction/CC/pagerank loops replan a growing tree every
        # iteration). Measured r13, interleaved A/B over the 7 most
        # expensive headliners: 5-7% aggregate wall reduction with it
        # off, up to 16% on the loop queries; results are unaffected (it
        # is a logical-planning inference, not a semantics change). The
        # engine's operators filter NULL join keys explicitly where
        # pruning matters, so the inferred-IsNotNull pushdown it would
        # add is redundant here. Env-parameterised: a deployment whose
        # ad-hoc queries rely on inferred transitive predicates can turn
        # it back on without touching code.
        .config(
            "spark.sql.constraintPropagation.enabled",
            os.environ.get("SPARK_GRAFT_CONSTRAINT_PROP", "false"),
        )
        # PySpark 4's DataFrame debugging decorates every DataFrame/
        # Column op with a Python stack walk plus 3 extra py4j round
        # trips (a conf.get and an origin set/clear) purely to enrich
        # error messages with the call site. Query CONSTRUCTION is
        # driver-side py4j chatter the engine pays per query (and loop
        # queries per round); measured r13 interleaved A/B on
        # q_end_extend: build 1.6-2.4 s → 1.4-2.0 s (~15-20%) with it
        # off. No effect on results or execution — error messages just
        # lose the "was called from <file>:<line>" suffix. Env-
        # parameterised for deployments that want the richer errors.
        .config(
            "spark.python.sql.dataFrameDebugging.enabled",
            os.environ.get("SPARK_GRAFT_DF_DEBUG", "false"),
        )
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
