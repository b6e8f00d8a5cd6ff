"""Temporal joins Spark lacks as built-ins: as-of join and bounded
range join, expressed as compositions of existing DataFrame operators
(the brief's category (a) — no Python, no UDFs).

**As-of join** ("for each left event, the latest right event at or
before it, per key") is NOT expressible as an equi-join, and the naive
rendering — an inequality join + argmax — compiles to a
BroadcastNestedLoopJoin that is quadratic per key. The scalable
rendering here is the tagged-union scan: union both sides with a tag,
one shuffle on the key, one in-partition sort by (ts, tag), and a
``last(right_payload, ignorenulls=True)`` running window carries the
most recent right row onto every left row. Cost: ONE hash shuffle +
local sort — the same as any groupBy — regardless of how many right
rows precede each left row.

**Range join** ("pairs within a time tolerance") degenerates to a
nested-loop under a bare inequality predicate. Bucketing time into
``tolerance``-wide bins turns it into an equi-join on (key, bin) with
each left row probing its own and its neighbouring bin — candidate
pairs are bounded by actual temporal locality, then the exact predicate
filters. This is the standard interval-join device (Flink's interval
join, DuckDB's IEJoin literature) on plain DataFrame ops.

Both have exact SQL oracles (DuckDB ships native ASOF JOIN; the range
join's oracle is the plain inequality join the bucketed plan avoids).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_us(c: Column) -> Column:
    """Timestamp (TZ or NTZ) → int64 microseconds. NTZ casts through
    TIMESTAMP using the session zone (UTC in this engine's sessions);
    differences and bin SPACING are zone-invariant either way — a zone
    is a constant offset that cancels in every comparison below."""
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: tuple[str, ...] = ("value",),
    suffix: str = "_right",
    tolerance_s: int | None = None,
) -> DataFrame:
    """Each ``left`` row + the columns of the latest ``right`` row with
    ``right.ts <= left.ts`` for the same ``on`` key (NULLs when no right
    row precedes; ties at equal ts take the right row). Optional
    ``tolerance_s`` drops matches older than the window.

    One shuffle on ``on``; the window scan is in-partition.
    """
    lt = left.withColumn("__tag", F.lit(1))
    rt = right.select(
        on,
        ts,
        *[F.col(c) for c in right_cols],
    ).withColumn("__tag", F.lit(0))

    carried = [f"{c}{suffix}" for c in right_cols]
    u = lt.unionByName(
        rt.select(
            *[
                F.col(c).alias(f"{c}{suffix}") if c in right_cols else F.col(c)
                for c in rt.columns
            ]
        ),
        allowMissingColumns=True,
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Timestamp and every payload column travel in ONE struct so they
    # all come from the same (latest) right row — carrying payloads in
    # separate last(ignorenulls) windows would let a NULL payload on the
    # matched row fall back to a stale earlier row's value and let the
    # tolerance check validate freshness against a different row than
    # the one supplying the value.
    rrow = F.when(
        F.col("__tag") == 0,
        F.struct(
            F.col(ts).alias("__rts"),
            *[F.col(f"{c}{suffix}").alias(c) for c in right_cols],
        ),
    )
    picked = u.select(
        "*", F.last(rrow, ignorenulls=True).over(w).alias("__r")
    )
    out = picked.where(F.col("__tag") == 1)
    if tolerance_s is not None:
        fresh = (
            _epoch_us(F.col(ts)) - _epoch_us(F.col("__r.__rts"))
        ) <= tolerance_s * 1_000_000
        keep = [
            F.when(fresh, F.col(f"__r.{c}")).alias(f"{c}{suffix}")
            for c in right_cols
        ]
    else:
        keep = [
            F.col(f"__r.{c}").alias(f"{c}{suffix}") for c in right_cols
        ]
    return out.select(
        *[c for c in left.columns],
        *keep,
    )


def range_join_pairs(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    tolerance_s: int = 300,
    left_id: str = "event_id",
    right_id: str = "event_id",
) -> DataFrame:
    """Pairs (left_id, right_id) sharing ``on`` with
    ``0 <= left.ts - right.ts <= tolerance_s`` — via the time-bin
    equi-join: bin = floor(epoch/tolerance); each left row joins its own
    and the previous bin, then the exact predicate filters. Candidates
    are bounded by rows that are actually temporally close, never a
    per-key cross product.
    """
    tol_us = tolerance_s * 1_000_000
    lb = left.select(
        F.col(on),
        F.col(left_id).alias("lid"),
        _epoch_us(F.col(ts)).alias("lts"),
    ).withColumn(
        "bin",
        F.explode(
            F.array(
                F.floor(F.col("lts") / tol_us).cast("long"),
                F.floor(F.col("lts") / tol_us).cast("long") - 1,
            )
        ),
    )
    rb = right.select(
        F.col(on),
        F.col(right_id).alias("rid"),
        _epoch_us(F.col(ts)).alias("rts"),
    ).withColumn("bin", F.floor(F.col("rts") / tol_us).cast("long"))
    # no dedup needed: a right row lives in exactly one bin and each
    # left row probes two DISTINCT bins, so a pair can only match once
    return (
        lb.join(rb, [on, "bin"])
        .where(
            (F.col("lts") - F.col("rts") >= 0)
            & (F.col("lts") - F.col("rts") <= tol_us)
        )
        .select(on, "lid", "rid")
    )
