"""Rank-grid quantile summary (datapipe/quantile.py): exact-integer rank
semantics on planted inputs, layout invariance, capacity bound, rank
error bound vs exact quantiles, and the mergeable-summary error bound —
the sketch-family completion pre-announced for the round-10 oracle
window (SURVEY §8)."""

from __future__ import annotations

import random


def _exact_quantile(sorted_vals, q):
    import math

    n = len(sorted_vals)
    r = max(1, math.ceil(q * n))
    return sorted_vals[r - 1]


def test_quantile_sketch_exact_small(spark):
    """n ≤ capacity → step 1 → the summary IS the sorted multiset with
    exact ranks (duplicates counted)."""
    from reflexiv_spark.datapipe.quantile import quantile_sketch

    vals = [5, 1, 3, 3, 9, 7]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = sorted(
        (r.rank, r.value) for r in quantile_sketch(df, "x", capacity=16).collect()
    )
    want = sorted(enumerate(sorted(vals), start=1))
    assert got == [(r, v) for r, v in want]


def test_quantile_sketch_grid_and_capacity(spark):
    """n = 1000, capacity 10 → step 100 → ranks 1,101,…,901 plus 1000;
    values are the exact order statistics at those ranks."""
    from reflexiv_spark.datapipe.quantile import quantile_sketch

    rng = random.Random(7)
    vals = [rng.randrange(0, 10_000) for _ in range(1000)]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    rows = {r.rank: r.value for r in quantile_sketch(df, "x", capacity=10).collect()}
    s = sorted(vals)
    assert set(rows) == {1 + 100 * i for i in range(10)} | {1000}
    for r, v in rows.items():
        assert v == s[r - 1], (r, v, s[r - 1])
    # capacity bound holds
    assert len(rows) <= 11
    # layout invariance: exact integer ranks are a pure function of the
    # multiset
    rows2 = {
        r.rank: r.value
        for r in quantile_sketch(df.repartition(13), "x", capacity=10).collect()
    }
    assert rows2 == rows


def test_quantile_values_error_bound(spark):
    """quantile_values answers within one grid step of the exact order
    statistic — the ε = 1/(2·capacity) summary guarantee (rank error
    ≤ step = ⌈n/capacity⌉)."""
    from reflexiv_spark.datapipe.quantile import quantile_sketch, quantile_values

    rng = random.Random(21)
    vals = [int(rng.gauss(0, 1) * 1e6) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    summ = quantile_sketch(df, "x", capacity=64)
    got = {r.q: r.value for r in quantile_values(summ, [0.01, 0.25, 0.5, 0.9, 0.99]).collect()}
    s = sorted(vals)
    import math

    step = math.ceil(len(vals) / 64)
    for q, v in got.items():
        target = max(1, math.ceil(q * len(vals)))
        # the answered value sits at SOME rank within [target, target+step]
        lo = s[target - 1]
        hi = s[min(len(s), target + step) - 1]
        assert lo <= v <= hi, (q, v, lo, hi)


def test_quantile_sketch_nulls_and_empty(spark):
    from reflexiv_spark.datapipe.quantile import quantile_sketch

    df = spark.createDataFrame([(None,), (4,), (None,), (2,)], "x long")
    got = sorted((r.rank, r.value) for r in quantile_sketch(df, "x").collect())
    assert got == [(1, 2), (2, 4)]
    empty = spark.createDataFrame([], "x long")
    assert quantile_sketch(empty, "x").count() == 0


def test_merge_quantile_sketches_error_bound(spark):
    """Merging summaries of disjoint shards: combined ranks within
    step_A + step_B of the true merged ranks, for every summary value."""
    from reflexiv_spark.datapipe.quantile import (
        merge_quantile_sketches,
        quantile_sketch,
    )

    rng = random.Random(3)
    a_vals = [rng.randrange(0, 100_000) for _ in range(3000)]
    b_vals = [rng.randrange(50_000, 200_000) for _ in range(2000)]
    da = spark.createDataFrame([(v,) for v in a_vals], "x long")
    db = spark.createDataFrame([(v,) for v in b_vals], "x long")
    import math

    cap = 32
    step_a = math.ceil(len(a_vals) / cap)
    step_b = math.ceil(len(b_vals) / cap)
    merged = merge_quantile_sketches(
        quantile_sketch(da, "x", capacity=cap),
        quantile_sketch(db, "x", capacity=cap),
    ).collect()
    s = sorted(a_vals + b_vals)
    import bisect

    for r in merged:
        true_rank = bisect.bisect_right(s, r.value)
        assert abs(r.rank - true_rank) <= step_a + step_b, (
            r.value,
            r.rank,
            true_rank,
        )
    # the merged top anchors at the true total count
    assert max(r.rank for r in merged) == len(s)


def test_quantile_sketch_plan_shape(spark):
    """100 TB plan guard: exactly one data-sized hash exchange (the
    value groupBy) plus the range exchange of the two-phase prefix sum
    and the model-sized broadcast of (n, step) — no single-task global
    window, no per-row Python, and never more than these exchanges."""
    import re

    from reflexiv_spark.datapipe.quantile import quantile_sketch

    df = spark.createDataFrame([(i % 97,) for i in range(2000)], "x long")
    plan = (
        quantile_sketch(df, "x", capacity=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    hash_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    range_ex = len(re.findall(r"Exchange rangepartitioning", plan))
    single_ex = len(re.findall(r"Exchange SinglePartition", plan))
    # the groupBy(value) + prefix-sum machinery sits behind the shared
    # lazy barrier (materialized by the partition-totals driver hop);
    # above it only the summary-sized distinct may exchange
    assert hash_ex <= 1, plan
    assert range_ex <= 1, plan
    # a global orderBy/window would show as a SinglePartition exchange
    # feeding a Sort/Window — the shape this operator must never take
    assert single_ex == 0, plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_staged_merge_driver_pair_parity(spark):
    """The round-11 STAGED driver pair gated locally this round:
    q_token_quantiles_merge (two disjoint doc_id-parity shard summaries
    combined by side-wise rank addition) and its
    _SQL_TOKEN_QUANTILES_MERGE DuckDB twin must agree on rows, schema,
    and values at sf0.01 (SURVEY §8 staging protocol — the round-10
    window is exactly full, so the pair registers next round)."""
    import duckdb

    import __spark_entry__ as ent

    sdf = ent.q_token_quantiles_merge(spark, "/root/testdata/sf0.01")
    srows = sorted((r.rank, r.value) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    cur = con.execute(ent._SQL_TOKEN_QUANTILES_MERGE)
    assert [d[0] for d in cur.description] == ["rank", "value"]
    orows = sorted(tuple(r) for r in cur.fetchall())
    assert len(srows) == len(orows) > 10
    assert srows == orows
    # the merged summary's top rank is the full corpus size: the merge
    # lost no mass
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert max(r for r, _ in srows) == n_docs


def test_staged_driver_pair_parity(spark):
    """The round-10 driver pair, gated LOCALLY this round: the staged
    q_token_quantiles_sketch query and its _SQL_TOKEN_QUANTILES_SKETCH
    DuckDB oracle must agree on rows, schema, and values at sf0.01 —
    the same comparison the driver will run when the pair registers
    next round (SURVEY §8 staging protocol)."""
    import duckdb

    import __spark_entry__ as ent

    sdf = ent.q_token_quantiles_sketch(spark, "/root/testdata/sf0.01")
    srows = sorted((r.rank, r.value) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    cur = con.execute(ent._SQL_TOKEN_QUANTILES_SKETCH)
    assert [d[0] for d in cur.description] == ["rank", "value"]
    orows = sorted(tuple(r) for r in cur.fetchall())
    assert srows == orows and len(srows) >= 30
