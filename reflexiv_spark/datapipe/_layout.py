"""Shared batch/streaming guard for :func:`reflexiv_spark.plans.layout.spread`.

``spread()`` calls ``df.rdd`` to read the partition count, which is
illegal on a streaming plan — but the datapipe kernels that use it
(winnowing, deletion neighborhoods, quality rules) are stateless
projections that compose fine with ``readStream``; micro-batch
partitioning belongs to the source. So streaming inputs pass through
and only batch inputs get the fan-out.

One shared definition (round-11 ADVICE): the guard was previously
copy-pasted into winnow.py / editdist.py / filters.py, inviting drift.
The eventual home is a one-line ``if df.isStreaming: return df`` at the
top of ``plans.layout.spread`` itself — that edit marks every consumer
of layout.py window-affected in ``tools/check_window.py``, so it is
budgeted for a round whose oracle window admits them (SURVEY §8); when
it lands, this module folds away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from reflexiv_spark.plans.layout import spread


def spread_batch(df: DataFrame) -> DataFrame:
    """spread() for batch inputs, pass-through for streaming ones."""
    return df if df.isStreaming else spread(df)
