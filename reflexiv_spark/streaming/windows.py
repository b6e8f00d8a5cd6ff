"""Windowed / sessionized / stateful streaming aggregations.

Design: transformations take DataFrames (batch OR streaming — identical
code path, the Structured Streaming contract) and return DataFrames; the
caller owns sources (``spark.readStream``) and sinks (``writeStream``).
Late data is bounded with watermarks; custom per-key state uses
``applyInPandasWithState`` (Arrow-batched, RocksDB/HDFS state store on a
cluster).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)


def windowed_counts(
    df: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = "15 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling (or sliding) windowed counts + sums per key.

    On a streaming DataFrame the watermark bounds state and admits late
    rows up to the given delay; on a batch DataFrame the same call is a
    plain windowed aggregation (watermark is a no-op there).
    """
    src = df
    if watermark is not None and src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    win = (
        F.window(ts_col, window, slide)
        if slide is not None
        else F.window(ts_col, window)
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    out_cols = ["n"] + (["sum_value"] if value_col is not None else [])
    return (
        src.groupBy(win.alias("w"), *keys)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            *keys,
            *out_cols,
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    gap: str = "30 minutes",
    watermark: str | None = "15 minutes",
) -> DataFrame:
    """Session windows: activity bursts per key separated by ≥ gap."""
    src = df
    if watermark is not None and src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("s"), key)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            key,
            "n_events",
        )
    )


_DEDUP_STATE = StructType([StructField("seen", LongType())])


def streaming_dedup(
    df: DataFrame, key_col: str = "event_id"
) -> DataFrame:
    """Stateful exactly-first dedup across micro-batches.

    Keeps the first row per key ever seen; later occurrences (any batch)
    are dropped. Per-key state is one counter in the state store —
    ``applyInPandasWithState``, the engine's custom-stateful-operator
    surface (the batch analog is ``dropDuplicates``; streaming
    ``dropDuplicates`` needs a watermark to bound state, this variant
    demonstrates explicit state management).
    """
    out_schema = df.schema

    def dedup_fn(
        key: tuple, pdfs: Iterator, state: GroupState
    ) -> Iterator:
        seen = state.get[0] if state.exists else 0
        for pdf in pdfs:
            if seen == 0 and len(pdf) > 0:
                seen = 1
                yield pdf.head(1)
        state.update((seen,))

    return df.groupBy(key_col).applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=_DEDUP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def clean_doc_stream(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    min_quality: float = 0.6,
) -> DataFrame:
    """Streaming twin of the batch cleaning pipeline
    (:func:`reflexiv_spark.datapipe.pipeline.clean_corpus`): quality
    scoring + threshold filters are the SAME stateless Catalyst
    expressions (transformations work identically on streaming frames),
    and exact dedup becomes the stateful exactly-first operator keyed by
    the normalized content hash — duplicates are suppressed ACROSS
    micro-batches (and across restarts via the checkpointed state
    store; see tests/test_streaming.py's restart drill).

    Returns a streaming DataFrame[id, text, n_tokens, quality]; write
    with update output mode (foreachBatch for file sinks).
    """
    from reflexiv_spark.datapipe.dedup import normalize_text
    from reflexiv_spark.datapipe.text import quality_score

    scored = quality_score(stream, text_col, id_col, keep_text=True).where(
        (F.col("n_tokens") >= min_tokens) & (F.col("quality") >= min_quality)
    )
    keyed = scored.withColumn("__key", F.md5(normalize_text(text_col)))
    return streaming_dedup(keyed, key_col="__key").drop("__key")


def stream_from_files(
    spark,
    path: str,
    schema,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream (the standard landing-zone ingestion shape)."""
    r = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.load(path)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    tolerance: str = "1 hour",
    watermark: str = "2 hours",
    left_id: str = "event_id",
    right_id: str = "event_id",
) -> DataFrame:
    """Stream-stream interval join — the streaming twin of
    ``reflexiv_spark.operators.temporal.range_join_pairs``: pairs of
    left/right events with the same key where the left event happens at
    or after the right one, within ``tolerance``.

    Both sides carry a watermark so Structured Streaming can BOUND the
    join state: a buffered right row becomes garbage once the watermark
    passes its timestamp + tolerance, which is exactly the condition
    the time-range predicate expresses. Without the time bound the
    state store would grow forever — the bound is the price of an
    unbounded input, and Spark enforces it at analysis time for
    append-mode stream-stream joins.

    Returns DataFrame[key, lid, rid, lts, rts]; append output mode.
    """
    lt = (
        left.select(
            F.col(on).alias("__k"),
            F.col(left_id).alias("lid"),
            F.col(ts_col).alias("lts"),
        )
        .withWatermark("lts", watermark)
    )
    rt = (
        right.select(
            F.col(on).alias("__rk"),
            F.col(right_id).alias("rid"),
            F.col(ts_col).alias("rts"),
        )
        .withWatermark("rts", watermark)
    )
    joined = lt.join(
        rt,
        (F.col("__k") == F.col("__rk"))
        & (F.col("lts") >= F.col("rts"))
        & (F.col("lts") <= F.col("rts") + F.expr(f"INTERVAL {tolerance}")),
    )
    return joined.select(
        F.col("__k").alias(on), "lid", "rid", "lts", "rts"
    )


def streaming_hot_tokens(
    df: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    window: str = "1 hour",
    min_count: int = 100,
    watermark: str | None = "15 minutes",
) -> DataFrame:
    """Windowed heavy hitters over the token stream → (win_start,
    win_end, token, n) for tokens whose exact per-window count reaches
    ``min_count``.

    One stateful operator: tokenize (codegen'd regexp, zero state) →
    windowed hash count (the ONLY shuffle; watermark bounds state to
    live windows) → threshold filter. In append mode rows emit once,
    when the watermark closes the window — the streaming analog of the
    batch CMS heavy-hitters pass (``datapipe/sketch.py``), exact
    instead of sketched because per-window state is already bounded by
    the watermark. On a batch DataFrame the same call is the plain
    windowed count (batch/stream equivalence contract).
    """
    src = df
    if watermark is not None and src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    toks = src.select(
        F.col(ts_col),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                F.lit(r"\w+"),
                0,
            )
        ).alias("token"),
    )
    return (
        toks.groupBy(F.window(ts_col, window).alias("w"), "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "token",
            "n",
        )
    )


def streaming_top_tokens(
    df: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    window: str = "1 hour",
    k: int = 10,
    watermark: str | None = "15 minutes",
) -> DataFrame:
    """Exact per-window top-k tokens → (win_start, win_end, top:
    array<struct<n, token>> ranked desc).

    Two CHAINED stateful aggregations (Spark 3.4+ multiple-stateful-
    operator support): the windowed token count, then a re-window over
    ``window_time`` that folds each closed window's counts into one
    ranked array ((n, token) struct order — count desc, ties by token
    desc — fully deterministic). Append mode only on streams — each
    window emits once, after the watermark passes.
    """
    src = df
    if watermark is not None and src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    counts = (
        src.select(
            F.col(ts_col),
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                    F.lit(r"\w+"),
                    0,
                )
            ).alias("token"),
        )
        .groupBy(F.window(ts_col, window).alias("w"), "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.groupBy(
            F.window(F.window_time("w"), window).alias("w2")
        )
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct("n", "token")), asc=False
                ),
                1,
                k,
            ).alias("top")
        )
        .select(
            F.col("w2.start").alias("win_start"),
            F.col("w2.end").alias("win_end"),
            "top",
        )
    )


def streaming_quantile_summary(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    capacity: int = 32,
    watermark: str | None = "15 minutes",
) -> DataFrame:
    """Per-event-time-window rank-grid quantile summary → (win_start,
    win_end, rank, value) — the streaming face of
    :func:`reflexiv_spark.datapipe.quantile.quantile_sketch` (identical
    semantics per window: values at sorted multiset ranks {1, 1+step,
    …} ∪ {n}, step = ⌈n/capacity⌉, all-integer arithmetic).

    The per-window distribution monitor a training-data pipeline runs
    over its ingest stream (doc-length / token-count p50-p99 per hour)
    — a full per-window sort would need unbounded state; the rank grid
    needs only the per-(window, value) exact counts.

    Two chained stateful aggregations (the ``streaming_top_tokens``
    shape, Spark 3.4+): (1) windowed ``groupBy(value)`` count — the
    only data-sized state, bounded by the watermark times value
    cardinality; (2) a ``window_time`` re-window folds each CLOSED
    window's sorted (value, cnt) list into the summary with one
    ``F.aggregate`` cumulative pass — pure codegen'd expressions, no
    Python, no per-window driver work. Append mode: each window's
    summary emits once, when the watermark closes it. On a batch
    DataFrame the same call computes the same summaries (equivalence
    contract, pinned against the batch ``quantile_sketch`` in
    ``tests/test_streaming.py``).
    """
    cap = max(1, int(capacity))
    src = df
    if watermark is not None and src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    v = F.col(value_col).cast("long")
    counts = (
        src.where(v.isNotNull())
        .select(F.col(ts_col), v.alias("value"))
        .groupBy(F.window(ts_col, window).alias("w"), "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    folded = (
        counts.groupBy(F.window(F.window_time("w"), window).alias("w2"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct("value", "cnt"))
            ).alias("xs")
        )
    )
    n = F.aggregate(
        "xs", F.lit(0).cast("bigint"), lambda a, x: a + x["cnt"]
    )
    stepped = folded.select(
        "w2",
        "xs",
        n.alias("n"),
    ).select(
        "w2",
        "xs",
        "n",
        F.expr(f"(n + {cap - 1}) div {cap}").cast("bigint").alias("step"),
    )

    # one cumulative pass over the sorted runs: for each (value, cnt)
    # run spanning multiset ranks (lo, hi], emit the grid ranks
    # ≡ 1 (mod step) inside it — first = lo - lo%step + 1, bumped past
    # lo (all bigint ops, the quantile_sketch devices verbatim)
    def _emit(acc, x):
        lo = acc["cum"]
        hi = acc["cum"] + x["cnt"]
        step = F.col("step")
        first0 = lo - F.pmod(lo, step) + F.lit(1).cast("bigint")
        first = F.when(first0 <= lo, first0 + step).otherwise(first0)
        seq = F.when(
            first <= hi, F.sequence(first, hi, step)
        ).otherwise(F.array().cast("array<bigint>"))
        rows = F.transform(
            seq,
            lambda r: F.struct(
                r.alias("rank"), x["value"].alias("value")
            ),
        )
        return F.struct(
            hi.alias("cum"), F.concat(acc["out"], rows).alias("out")
        )

    init = F.struct(
        F.lit(0).cast("bigint").alias("cum"),
        F.array().cast("array<struct<rank:bigint,value:bigint>>").alias(
            "out"
        ),
    )
    top = F.struct(
        F.col("n").alias("rank"),
        F.element_at("xs", -1)["value"].alias("value"),
    )
    summary = F.array_distinct(
        F.concat(
            F.aggregate("xs", init, _emit, lambda acc: acc["out"]),
            F.array(top),
        )
    )
    return (
        stepped.where(F.col("n") > 0)
        .select(
            F.col("w2.start").alias("win_start"),
            F.col("w2.end").alias("win_end"),
            F.explode(summary).alias("s"),
        )
        .select(
            "win_start",
            "win_end",
            F.col("s.rank").alias("rank"),
            F.col("s.value").alias("value"),
        )
    )
