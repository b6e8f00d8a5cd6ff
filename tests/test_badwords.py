"""Blocklist-word page filtering (datapipe/badwords.py): planted
word/phrase hits, NULL edges, keep_only equivalence, input validation,
zero-shuffle plan shape, and the round-13 staged driver pair gated
locally against DuckDB (SURVEY §8 staging protocol)."""

from __future__ import annotations

import pytest


def test_badwords_planted(spark):
    """Exact-token word hits (no substring false positives), phrase
    substring hits, distinct counting, NULL text keeps."""
    from reflexiv_spark.datapipe.badwords import badwords_filter

    rows = [
        (1, "a clean document about the weather"),
        (2, "contains badword once"),
        (3, "badword badword twice but one DISTINCT and also evil"),
        (4, "the badwords token must not match by prefix"),  # badwordS
        (5, "an evil phrase lives here"),
        (6, None),
        (7, "BADWORD uppercase still matches"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.id: r
        for r in badwords_filter(
            df, words=("badword", "evil"), phrases=("evil phrase",)
        ).collect()
    }
    assert got[1].keep is True
    assert got[2].n_bad_words == 1 and got[2].keep is False
    # two distinct words hit, duplicates counted once
    assert got[3].n_bad_words == 2
    # exact-token: "badwords" does not match "badword"
    assert got[4].n_bad_words == 0 and got[4].keep is True
    assert got[5].n_bad_phrases == 1 and got[5].keep is False
    assert got[6].n_bad_words == 0 and got[6].keep is True
    assert got[7].n_bad_words == 1      # lowercased match


def test_badwords_keep_only_matches_flags(spark):
    """keep_only=True returns exactly the rows the flag relation keeps
    (the direct-predicate path equals the flags path), with the input
    schema intact."""
    from reflexiv_spark.datapipe.badwords import badwords_filter

    rows = [(i, f"doc {i} " + ("bad " if i % 3 == 0 else "ok ")) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    flags = badwords_filter(df, words=("bad",))
    want = {r.id for r in flags.collect() if r.keep}
    kept = badwords_filter(df, words=("bad",), keep_only=True)
    assert kept.columns == df.columns
    assert {r.doc_id for r in kept.collect()} == want


def test_badwords_validation(spark):
    from reflexiv_spark.datapipe.badwords import badwords_filter

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-word"):
        badwords_filter(df, words=("two words",))
    # non-\w entries can never match a token (review finding): loud
    # error instead of a silent no-op blocklist entry
    with pytest.raises(ValueError, match="non-word"):
        badwords_filter(df, words=("s&m",))
    with pytest.raises(ValueError, match="non-empty"):
        badwords_filter(df, words=("",))
    with pytest.raises(ValueError, match="non-empty"):
        badwords_filter(df, words=("ok",), phrases=("",))
    with pytest.raises(ValueError, match="bounded"):
        badwords_filter(df, words=tuple(f"w{i}" for i in range(10_001)))
    with pytest.raises(ValueError, match="phrase"):
        badwords_filter(df, phrases=tuple(f"p {i}" for i in range(201)))


def test_badwords_zero_shuffle_plan(spark):
    """The flag relation is ONE projection over the scan — no Exchange
    (quality filtering at 100 TB is a scan)."""
    from reflexiv_spark.datapipe.badwords import badwords_filter

    df = spark.range(100).selectExpr(
        "id AS doc_id", "concat('text ', id) AS text"
    )
    plan = (
        badwords_filter(df, words=("bad",), phrases=("x y",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def _duck(sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    return con.execute(sql).fetchall()


def test_staged_driver_pair_parity(spark):
    """The round-13 STAGED driver pair gated locally: q_badwords vs
    _SQL_BADWORDS at sf0.01 (SURVEY §8 staging protocol)."""
    import __spark_entry__ as ent

    sdf = ent.q_badwords(spark, "/root/testdata/sf0.01")
    got = sorted(tuple(r) for r in sdf.collect())
    want = sorted(tuple(r) for r in _duck(ent._SQL_BADWORDS))
    assert len(got) == 500
    # every column discriminates at sf0.01
    assert any(r[1] > 0 for r in got) and any(r[1] == 0 for r in got)
    assert any(r[2] > 0 for r in got) and any(r[2] == 0 for r in got)
    assert any(r[3] for r in got) and not all(r[3] for r in got)
    assert got == want


def test_badwords_stream_matches_batch(spark, tmp_path):
    """badwords_filter is a stateless projection, so it composes with
    readStream unchanged (spread_batch passes streaming plans
    through): same flags per doc, batch or stream, across multiple
    micro-batches."""
    import json

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from reflexiv_spark.datapipe.badwords import badwords_filter
    from reflexiv_spark.streaming.windows import stream_from_files

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    d = tmp_path / "docs"
    d.mkdir()
    rows1 = [
        {"doc_id": 1, "text": "a clean document"},
        {"doc_id": 2, "text": "contains badword here"},
    ]
    rows2 = [
        {"doc_id": 3, "text": "an evil phrase lives here"},
        {"doc_id": 4, "text": None},
    ]
    for name, rows in (("b1.json", rows1), ("b2.json", rows2)):
        with open(d / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    stream = stream_from_files(
        spark, str(d), schema, max_files_per_trigger=1
    )
    out = badwords_filter(
        stream, words=("badword",), phrases=("evil phrase",)
    )
    q = (
        out.writeStream.format("memory")
        .queryName("bw_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.id, r.n_bad_words, r.n_bad_phrases, r.keep)
        for r in spark.sql("SELECT * FROM bw_stream").collect()
    }
    batch = spark.read.schema(schema).json(str(d))
    want = {
        (r.id, r.n_bad_words, r.n_bad_phrases, r.keep)
        for r in badwords_filter(
            batch, words=("badword",), phrases=("evil phrase",)
        ).collect()
    }
    assert got == want
    assert len(got) == 4 and sum(1 for g in got if not g[3]) == 2


def test_badwords_random_property_vs_python_reference(spark):
    """Randomized property vs a literal Python reference: random-word
    documents (with punctuation, case noise, NULLs, and planted
    word/phrase hits) must agree exactly on every output column. One
    batched DataFrame (the repo's hypothesis-with-Spark pattern)."""
    import random
    import re

    from reflexiv_spark.datapipe.badwords import badwords_filter

    rng = random.Random(2026)
    vocab = ["alpha", "beta", "gamma", "delta", "bad1", "bad2",
             "Epsilon", "ZETA", "eta,", "theta."]
    words = ("bad1", "bad2", "rare")
    phrases = ("alpha beta", "gamma delta epsilon")

    rows = []
    for i in range(60):
        body = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 20)))
        if rng.random() < 0.1:
            body = None
        rows.append((i, body))

    def ref(text):
        t = (text or "").lower()
        toks = set(re.findall(r"\w+", t, re.ASCII))
        nw = sum(1 for w in words if w in toks)
        np_ = sum(1 for p in phrases if p in t)
        return (nw, np_, nw == 0 and np_ == 0)

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.id: (r.n_bad_words, r.n_bad_phrases, r.keep)
        for r in badwords_filter(df, words=words, phrases=phrases).collect()
    }
    want = {i: ref(t) for i, t in rows}
    assert got == want
    # the noise actually exercises both outcomes
    assert any(not v[2] for v in want.values())
    assert any(v[2] for v in want.values())
