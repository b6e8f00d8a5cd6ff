"""Training-shard export — plan, manifest, and physically write a
curated corpus as contiguous, roughly-token-balanced shards.

The last step of every pretraining data pipeline is materialization:
the curated corpus leaves the warehouse as a directory of shard files
(JSONL or parquet; WebDataset-style tar is the same layout one format
over) that the training loader streams sequentially. The contract the
loader wants:

* **deterministic** — re-running the export reproduces byte-identical
  shard membership (resumable training / data ablations depend on it);
* **document-contiguous** — a document lives wholly in one shard, and
  shard order follows the deterministic corpus order, so a loader can
  seek to "shard 1234" and know exactly which slice of the stream it
  holds;
* **roughly token-balanced** — each shard carries ~``target_tokens``
  (±1 document), so data-parallel workers draw near-equal work.

The plan is pure arithmetic on the corpus's token prefix sum: a
document belongs to the shard its FIRST token falls in,
``shard_id = floor(start / target_tokens)`` where ``start`` is the
running token total before the document (the same two-phase
:func:`~reflexiv_spark.datapipe.packing.global_prefix_sum` scan that
``pack_sequences`` uses — one range shuffle plus an N-partition driver
exchange; no global single-task window). Unlike ``pack_sequences`` the
assignment is document-atomic: nothing straddles, so a shard's token
sum is ``target_tokens ± one document`` — the standard Megatron/
WebDataset "approximate shards" rule. (The alternative "close the
shard when the next doc would overflow" greedy rule is a sequential
recurrence with no partition-decomposable form — its shard boundary
depends on every prior fill decision — and buys nothing but a
one-document tighter cap, so it is deliberately not the contract
here.)

Scale shape: the plan moves only ``(id, n_tokens)`` rows (prefix-sum
exchange + shard_id window exchange, offsets broadcast back); the
write path moves the text bytes — twice when the text must be joined
back by id (join exchange + the shard_id colocation repartition),
zero extra times when the plan already carries every payload column
(the offset window leaves it hash-partitioned by shard_id). Nothing
corpus-sized ever reaches the driver; the manifest is an O(n_shards)
aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from reflexiv_spark.datapipe.packing import global_prefix_sum


def _with_tokens(
    docs: DataFrame,
    id_col: str,
    tokens_col: str | None,
    text_col: str,
    keep: list[str],
) -> DataFrame:
    """(id, n_tokens, *keep) projection; ``\\w+`` word count of
    ``text_col`` when no token column is supplied (the same rule as
    ``datapipe.text`` / ``pack_sequences``)."""
    if tokens_col is None:
        nt = F.size(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                F.lit(r"\w+"),
                0,
            )
        )
    else:
        # NULL-proof like the text path (which coalesces text to ''):
        # a NULL count would make the prefix sum, shard_id, and offset
        # all NULL and silently drop the document from every shard
        nt = F.coalesce(F.col(tokens_col), F.lit(0))
    cols = [F.col(id_col)] + [F.col(c) for c in keep]
    return docs.select(*cols, nt.cast("long").alias("n_tokens"))


def plan_shards(
    docs: DataFrame,
    target_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """DataFrame[id, *keep_cols, n_tokens, shard_id, shard_offset]:
    deterministic document-contiguous shard assignment in ``id_col``
    order — ``shard_id = start DIV target_tokens`` where ``start`` is
    the corpus-stream token offset before the document, and
    ``shard_offset`` the TRUE token offset within the shard
    (``start − the shard's first document's start``; under the
    document-atomic rule shards do not begin exactly at target
    boundaries, so ``start mod target`` would be wrong — a loader
    seeking inside a shard needs the real offset).

    The offset window partitions by ``shard_id`` with no ordering (a
    hash shuffle of ``(id, int)`` rows bounded at ~target tokens of
    documents per partition, no sort) and leaves the result
    hash-partitioned by ``shard_id`` — exactly the layout the physical
    writer needs, so :func:`write_shards` adds no exchange when the
    plan already carries every payload column (it still pays the text
    join + colocation exchanges when text must be joined back — see
    its docstring)."""
    if target_tokens <= 0:
        raise ValueError("target_tokens must be positive")
    t = _with_tokens(docs, id_col, tokens_col, text_col, list(keep_cols))
    c = global_prefix_sum(t, id_col, "n_tokens", out_col="__cum")
    c = c.withColumn("__start", F.col("__cum") - F.col("n_tokens"))
    # integer DIV on a non-negative start: truncation == floor in both
    # engines, no float division anywhere near 2^53 totals
    c = c.withColumn(
        "shard_id",
        F.expr(f"__start DIV {target_tokens}").cast("bigint"),
    )
    first = Window.partitionBy("shard_id")
    return c.select(
        id_col,
        *keep_cols,
        "n_tokens",
        "shard_id",
        (F.col("__start") - F.min("__start").over(first))
        .cast("bigint")
        .alias("shard_offset"),
    )


def shard_manifest(plan: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-shard data card over a :func:`plan_shards` result:
    DataFrame[shard_id, n_docs, n_tokens, first_id, last_id] — the
    O(n_shards) summary a loader (or an auditor) reads instead of the
    shards themselves."""
    return plan.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.min(id_col).alias("first_id"),
        F.max(id_col).alias("last_id"),
    )


def write_shards(
    docs: DataFrame,
    path: str,
    target_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
    fmt: str = "jsonl",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Materialize the corpus as ``path/shard_id=K/`` directories of
    JSONL (one ``to_json`` line per document) or parquet, sharded by
    :func:`plan_shards`; returns the manifest DataFrame.

    Shuffle accounting at 100 TB, counted honestly: the PLAN itself
    moves only ``(id, n_tokens)`` rows (prefix-sum exchange + the
    shard_id window exchange). The TEXT bytes move when the plan is
    joined back to the documents (one corpus-sized exchange of text by
    id — the plan side is row-count-huge, so no broadcast escape) and
    once more in the explicit ``repartition(shard_id)`` that colocates
    each shard before ``partitionBy`` — two text-sized exchanges
    total. When no join is needed (``text_col`` absent or carried via
    ``keep_cols``) the plan is ALREADY hash-partitioned by shard_id
    from the offset window, so the writer adds no exchange at all.
    """
    if fmt not in ("jsonl", "parquet"):
        raise ValueError(f"unknown shard format: {fmt!r}")
    plan = plan_shards(
        docs, target_tokens, id_col, tokens_col, text_col, keep_cols
    )
    payload_cols = [id_col, *keep_cols, "n_tokens", "shard_offset"]
    if text_col in docs.columns and text_col not in keep_cols:
        # carry the text through a plan join rather than re-deriving it
        # (also when the caller supplied a precomputed token column —
        # a shard file without its documents' text is not an export);
        # the join re-keys the rows by id, so restore the shard layout
        out = plan.join(docs.select(id_col, text_col), id_col).repartition(
            "shard_id"
        )
        payload_cols.append(text_col)
    else:
        # plan output is already hash-partitioned by shard_id (the
        # offset window) — an explicit repartition would be a second,
        # redundant exchange
        out = plan
    if fmt == "parquet":
        out.select("shard_id", *payload_cols).write.mode(
            "overwrite"
        ).partitionBy("shard_id").parquet(path)
    else:
        out.select(
            "shard_id",
            # ignoreNullFields=false: to_json otherwise DROPS the key
            # for NULL values (e.g. text=NULL docs from --keep-all
            # crawls), and a loader doing rec["text"] would crash —
            # every JSONL record carries the full payload schema
            F.to_json(
                F.struct(*payload_cols), {"ignoreNullFields": "false"}
            ).alias("value"),
        ).write.mode("overwrite").partitionBy("shard_id").text(path)
    return shard_manifest(plan, id_col)
