"""Distributed exact quantiles via value histograms.

``ORDER BY`` quantiles need a global sort; ``approx_percentile`` is not
deterministic across engines. For integer-valued measures with bounded
cardinality (token counts, line counts, durations in ms) there is a
third way that is both exact and scalable: aggregate a (group, value)
histogram — the shuffle carries one row per DISTINCT value per group,
not one per input row — then take a running sum along the value axis and
read each quantile as the smallest value whose cumulative count reaches
``ceil(p·n)``. That definition (the lower/"disc" quantile) is pure
integer arithmetic, so a SQL oracle reproduces it bit for bit.

At 100 TB: token counts have ~10^5 distinct values; the histogram
aggregation is map-side combinable, the window runs over tiny per-group
histograms, and nothing global is sorted.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    percentiles: Sequence[int] = (25, 50, 90, 99),
) -> DataFrame:
    """Exact lower quantiles of integer ``value_col`` per group →
    DataFrame[*group_cols, n_rows, p<P> for each P].

    q_P = min { v : cum_count(v) ≥ ceil(P·n/100) } — computed from the
    per-group value histogram with a cumulative window, all integer
    arithmetic (``ceil`` via ``(n·P + 99) div 100``).
    """
    gcols = list(group_cols)
    hist = df.groupBy(*gcols, value_col).agg(F.count(F.lit(1)).alias("__c"))
    w = Window.partitionBy(*gcols).orderBy(value_col)
    wg = Window.partitionBy(*gcols)
    cum = hist.select(
        *gcols,
        F.col(value_col).cast("bigint").alias("__v"),
        F.sum("__c").over(w).alias("__cum"),
        F.sum("__c").over(wg).alias("__n"),
    )
    aggs = [F.max("__n").cast("bigint").alias("n_rows")]
    for p in percentiles:
        rank = (F.col("__n") * p + 99) / 100  # integer ceil(n*p/100)
        rank = F.floor(rank)
        aggs.append(
            F.min(F.when(F.col("__cum") >= rank, F.col("__v"))).alias(f"p{p}")
        )
    return cum.groupBy(*gcols).agg(*aggs)
