"""Deterministic global training shuffle (datapipe/sampling.py
corpus_shuffle): permutation totality, partitioning invariance, salt
independence, two-phase (no single-task window) plan shape, and the
round-13 staged driver pair gated locally against DuckDB (SURVEY §8
staging protocol)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_shuffle_is_total_permutation(spark):
    """positions are exactly 0..n-1 and the order follows
    (shuffle_key, id)."""
    from reflexiv_spark.datapipe.sampling import corpus_shuffle

    df = spark.range(257).selectExpr("id AS doc_id")
    out = corpus_shuffle(df).collect()
    assert sorted(r.position for r in out) == list(range(257))
    ordered = sorted(out, key=lambda r: (r.shuffle_key, r.doc_id))
    assert [r.position for r in ordered] == list(range(257))


def test_shuffle_partitioning_invariant(spark):
    """The permutation is a pure function of the rows — identical
    under adversarial input layouts (the 100 TB re-execution
    contract)."""
    from reflexiv_spark.datapipe.sampling import corpus_shuffle

    df = spark.range(200).selectExpr("id AS doc_id")
    a = {(r.doc_id, r.position) for r in corpus_shuffle(df).collect()}
    b = {
        (r.doc_id, r.position)
        for r in corpus_shuffle(df.repartition(7, "doc_id")).collect()
    }
    c = {
        (r.doc_id, r.position)
        for r in corpus_shuffle(df.coalesce(1)).collect()
    }
    assert a == b == c


def test_shuffle_salt_draws_independent_epochs(spark):
    """Different salts give different permutations (per-epoch
    reshuffling); the same salt is bit-stable."""
    from reflexiv_spark.datapipe.sampling import corpus_shuffle

    df = spark.range(100).selectExpr("id AS doc_id")
    e0 = [r.doc_id for r in corpus_shuffle(df, salt="ep0").orderBy("position").collect()]
    e0b = [r.doc_id for r in corpus_shuffle(df, salt="ep0").orderBy("position").collect()]
    e1 = [r.doc_id for r in corpus_shuffle(df, salt="ep1").orderBy("position").collect()]
    assert e0 == e0b
    assert e0 != e1
    assert sorted(e0) == sorted(e1)


def test_shuffle_xxhash_family(spark):
    """The production hash family also yields a total permutation."""
    from reflexiv_spark.datapipe.sampling import corpus_shuffle

    df = spark.range(64).selectExpr("id AS doc_id")
    out = corpus_shuffle(df, hash_family="xxhash64").collect()
    assert sorted(r.position for r in out) == list(range(64))


def test_shuffle_no_single_task_window(spark):
    """Plan guard: the rank comes from the two-phase scan — every
    Window in the executed plan is partitioned by __pid, never a
    global (empty-partition-spec) window."""
    from reflexiv_spark.datapipe.sampling import corpus_shuffle

    df = spark.range(500).selectExpr("id AS doc_id")
    plan = (
        corpus_shuffle(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__pid" in line, line


def test_shuffle_feeds_shard_plan(spark):
    """Composition: shuffled position as the shard order column gives
    document-atomic shards over the shuffled stream."""
    from reflexiv_spark.datapipe.sampling import corpus_shuffle
    from reflexiv_spark.datapipe.shards import plan_shards

    docs = spark.range(50).selectExpr(
        "id AS doc_id", "'tok tok tok tok' AS text"
    )
    pos = corpus_shuffle(docs)
    shuffled = docs.join(pos, "doc_id").select(
        F.col("position").alias("doc_id"), "text"
    )
    plan = plan_shards(shuffled, target_tokens=40)
    rows = plan.collect()
    assert len(rows) == 50
    assert sorted(r.doc_id for r in rows) == list(range(50))


def _duck(sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    return con.execute(sql).fetchall()


def test_staged_shuffle_parity(spark):
    """The round-13 STAGED driver pair gated locally: q_corpus_shuffle
    vs _SQL_CORPUS_SHUFFLE at sf0.01 (SURVEY §8 staging protocol)."""
    import __spark_entry__ as ent

    sdf = ent.q_corpus_shuffle(spark, "/root/testdata/sf0.01")
    got = sorted(tuple(r) for r in sdf.collect())
    want = sorted(tuple(r) for r in _duck(ent._SQL_CORPUS_SHUFFLE))
    assert len(got) == 500
    assert got == want


def test_training_layout_plan_mode(spark):
    """manifest=False returns the per-document plan over the shuffled
    stream: positions 0..n_kept-1, shards contiguous in position."""
    from reflexiv_spark.datapipe.export import training_layout

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", "tok " * (5 + i % 7)) for i in range(60)],
        "doc_id long, source string, text string",
    )
    plan = training_layout(
        docs, target_tokens=20, budget_frac=0.9, manifest=False
    ).collect()
    n = len(plan)
    assert 0 < n <= 60
    assert sorted(r.position for r in plan) == list(range(n))
    by_pos = sorted(plan, key=lambda r: r.position)
    # shard ids are non-decreasing along the shuffled stream
    sids = [r.shard_id for r in by_pos]
    assert sids == sorted(sids)


def test_training_layout_epoch_salt_reshards(spark):
    """A different epoch salt re-permutes the SAME kept set (the mix
    is fixed by mix_salt): same total docs/tokens, different layout."""
    from reflexiv_spark.datapipe.export import training_layout

    docs = spark.createDataFrame(
        [(i, f"s{i % 2}", "tok " * (3 + i % 5)) for i in range(80)],
        "doc_id long, source string, text string",
    )
    a = training_layout(docs, 30, budget_frac=0.8, epoch_salt="e0",
                        manifest=False).collect()
    b = training_layout(docs, 30, budget_frac=0.8, epoch_salt="e1",
                        manifest=False).collect()
    assert {r.doc_id for r in a} == {r.doc_id for r in b}
    assert sum(r.n_tokens for r in a) == sum(r.n_tokens for r in b)
    assert {(r.doc_id, r.position) for r in a} != {
        (r.doc_id, r.position) for r in b
    }


def test_staged_training_layout_parity(spark):
    """The round-13 STAGED driver pair gated locally: q_training_layout
    vs _SQL_TRAINING_LAYOUT at sf0.01 (SURVEY §8 staging protocol)."""
    import __spark_entry__ as ent

    sdf = ent.q_training_layout(spark, "/root/testdata/sf0.01")
    got = sorted(tuple(r) for r in sdf.collect())
    want = sorted(tuple(r) for r in _duck(ent._SQL_TRAINING_LAYOUT))
    assert len(got) > 3                 # several shards at sf0.01
    assert got == want
