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
