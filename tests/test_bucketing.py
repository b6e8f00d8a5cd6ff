"""Bucketed co-located joins: the join of two tables bucketed on the key
must plan with ZERO shuffle exchanges (the scale primitive for staged
pipelines — write the shuffle once, reuse it every step). Broadcast is
disabled in-test: at real scale neither side of a 100 TB join broadcasts,
so the property that matters is the sort-merge join reading co-located
buckets directly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reflexiv_spark.plans.bucketing import read_bucketed, write_bucketed


@pytest.fixture
def no_broadcast(spark):
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    old = {}
    for k in keys:
        try:
            old[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001
            old[k] = None
        spark.conf.set(k, "-1")
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bucketed_join_has_no_shuffle(spark, tmp_path, no_broadcast):
    left = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(left, "bk_left", "k", 8, path=str(tmp_path / "l"))
    write_bucketed(right, "bk_right", "k", 8, path=str(tmp_path / "r"))
    try:
        l, r = read_bucketed(spark, "bk_left"), read_bucketed(spark, "bk_right")
        joined = l.join(r, "k")
        rows = {x["k"]: (x["a"], x["b"]) for x in joined.collect()}
        assert len(rows) == 5000 and rows[123] == (246, 369)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan

        # groupBy on the bucket key: also shuffle-free (the bucket layout
        # satisfies the aggregation's required distribution)
        agg = l.groupBy("k").agg(F.sum("a").alias("s"))
        assert agg.count() == 5000
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in agg_plan, agg_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")
