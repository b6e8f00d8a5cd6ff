"""Sequence packing — assign documents to fixed-size token windows.

LLM pretraining consumes a corpus as a single token stream chopped into
context-length windows ("concat-then-chunk"). The batch-prep step is:
order documents deterministically, take the running token total, and
give every document its window id and offset. The semantics are a
global prefix sum — trivially sequential, and the naive Spark rendering
(`Window.orderBy(...)` with no partition key) collapses to ONE task.

The scalable rendering here is the classic two-phase scan:

1. range-shuffle rows by the order key (`repartitionByRange` — ascending
   key ranges land in ascending partition ids),
2. per-partition running sums with an ordinary partitioned window,
3. collect only the per-partition TOTALS (one long per partition) to
   the driver, prefix-sum those, and broadcast the offsets back via a
   tiny join.

Where the range boundaries fall does not affect the answer — the
prefix sum is a pure function of the (key, tokens) relation — so the
result is partitioning-invariant and a SQL window oracle replays it
exactly. At 100 TB this is one shuffle of (id, int) rows plus an
N-partition driver exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_prefix_sum(
    df: DataFrame, order_col: str, value_col: str, out_col: str = "cum"
) -> DataFrame:
    """DataFrame + running total of ``value_col`` in ``order_col`` order
    (inclusive). Two-phase: range shuffle → partition-local window →
    driver prefix of per-partition totals (one long each) joined back.
    ``order_col`` must be unique (it is the deterministic stream order).
    """
    ranged = df.repartitionByRange(F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    ranged = ranged.localCheckpoint(eager=False)
    w = Window.partitionBy("__pid").orderBy(order_col)
    local = ranged.withColumn("__local", F.sum(value_col).over(w))
    totals = (
        ranged.groupBy("__pid").agg(F.sum(value_col).alias("__tot")).collect()
    )
    prefix = {}
    acc = 0
    for r in sorted(totals, key=lambda r: r["__pid"]):
        prefix[r["__pid"]] = acc
        acc += r["__tot"] or 0
    spark = df.sparkSession
    pre = spark.createDataFrame(
        [(int(p), int(v)) for p, v in prefix.items()], "__pid int, __pre long"
    )
    return (
        local.join(F.broadcast(pre), "__pid")
        .withColumn(out_col, (F.col("__local") + F.col("__pre")).cast("long"))
        .drop("__pid", "__local", "__pre")
    )


def pack_sequences(
    docs: DataFrame,
    window_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """DataFrame[doc_id, n_tokens, bin_id, bin_offset]: each document's
    window ("bin") and starting offset when the corpus is concatenated
    in ``id_col`` order and chunked every ``window_tokens`` tokens.
    Documents may straddle a boundary — exactly like the token stream
    they model; ``bin_id`` is the window the document STARTS in.

    If ``tokens_col`` is None, tokens are counted as ``\\w+`` words of
    ``text_col`` (the same rule as :mod:`reflexiv_spark.datapipe.text`).
    """
    if tokens_col is None:
        nt = F.size(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                F.lit(r"\w+"),
                0,
            )
        )
        t = docs.select(F.col(id_col), nt.cast("long").alias("n_tokens"))
    else:
        t = docs.select(
            F.col(id_col), F.col(tokens_col).cast("long").alias("n_tokens")
        )
    c = global_prefix_sum(t, id_col, "n_tokens", out_col="__cum")
    # integer DIV/MOD (start is non-negative, so truncation == floor in
    # both engines — no float division anywhere near 2^53 totals)
    c = c.withColumn("__start", F.col("__cum") - F.col("n_tokens"))
    return c.select(
        id_col,
        "n_tokens",
        F.expr(f"__start DIV {window_tokens}").cast("bigint").alias("bin_id"),
        F.pmod("__start", F.lit(window_tokens)).cast("bigint").alias("bin_offset"),
    )
