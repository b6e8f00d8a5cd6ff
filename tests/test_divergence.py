"""Corpus KL divergence (datapipe/divergence.py): literal Python
reference, identity/zero and direction properties, summary sum, and the
round-12 staged driver pair gated locally against DuckDB (SURVEY §8
staging protocol)."""

from __future__ import annotations

import hashlib
import math


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_divergence(a_texts, b_texts, dim=64):
    """Literal reference: md5-hashed unigram+bigram buckets, add-1
    smoothing, per-bucket floor(1e6 * pa * (log10 pa - log10 pb))."""

    def feats(texts):
        out = []
        for t in texts:
            ws = (t or "").lower().split()
            ws = [w for w in "".join(
                c if c.isalnum() or c == "_" else " " for c in " ".join(ws)
            ).split()]
            out += [f"u|{w}" for w in ws]
            out += [f"b|{ws[i]} {ws[i+1]}" for i in range(len(ws) - 1)]
        return [(_md5_60(f)) % dim for f in out]

    fa, fb = feats(a_texts), feats(b_texts)
    ca = {i: fa.count(i) for i in range(dim)}
    cb = {i: fb.count(i) for i in range(dim)}
    ta, tb = len(fa), len(fb)
    rows = {}
    for i in range(dim):
        pa = (ca[i] + 1) / (ta + dim)
        pb = (cb[i] + 1) / (tb + dim)
        rows[i] = (
            ca[i],
            cb[i],
            math.floor(pa * (math.log10(pa) - math.log10(pb)) * 1e6),
            math.floor(pb * (math.log10(pb) - math.log10(pa)) * 1e6),
        )
    return rows


def test_matches_python_reference(spark):
    from reflexiv_spark.datapipe.divergence import corpus_divergence

    a_texts = ["the cat sat on the mat", "a dog ran fast", None]
    b_texts = ["the cat sat on the mat", "quantum flux capacitors hum"]
    a = spark.createDataFrame(
        [(i, t) for i, t in enumerate(a_texts)], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(i, t) for i, t in enumerate(b_texts)], "doc_id long, text string"
    )
    got = {
        r.idx: (r.ca, r.cb, r.kl_ab_micro, r.kl_ba_micro)
        for r in corpus_divergence(
            a, b, dim=64, hash_family="md5"
        ).collect()
    }
    assert got == _ref_divergence(a_texts, b_texts, dim=64)


def test_identical_corpora_zero_and_direction(spark):
    """KL(A||A) is exactly 0 in every bucket (floor of exact 0.0); a
    shifted corpus produces positive total divergence both ways."""
    from pyspark.sql import functions as F

    from reflexiv_spark.datapipe.divergence import (
        corpus_divergence,
        divergence_summary,
    )

    rows = [(i, f"alpha beta gamma doc {i % 3}") for i in range(20)]
    a = spark.createDataFrame(rows, "doc_id long, text string")
    same = corpus_divergence(a, a, dim=32, hash_family="md5")
    agg = same.agg(
        F.sum(F.abs("kl_ab_micro")), F.sum(F.abs("kl_ba_micro"))
    ).first()
    assert (agg[0], agg[1]) == (0, 0)

    b = spark.createDataFrame(
        [(i, "delta epsilon zeta entirely different words") for i in range(20)],
        "doc_id long, text string",
    )
    s = divergence_summary(a, b, dim=32, hash_family="md5").first()
    # micro-floors bound each bucket's error below; totals stay positive
    assert s.kl_ab_micro > 0 and s.kl_ba_micro > 0


def test_summary_is_exact_sum(spark):
    from pyspark.sql import functions as F

    from reflexiv_spark.datapipe.divergence import (
        corpus_divergence,
        divergence_summary,
    )

    a = spark.createDataFrame(
        [(1, "one two three"), (2, "four five")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(1, "one two seven eight")], "doc_id long, text string"
    )
    t = corpus_divergence(a, b, dim=16, hash_family="md5")
    s = divergence_summary(a, b, dim=16, hash_family="md5").first()
    manual = t.agg(F.sum("kl_ab_micro"), F.sum("kl_ba_micro")).first()
    assert (s.kl_ab_micro, s.kl_ba_micro) == (manual[0], manual[1])


def test_staged_driver_pair_parity(spark):
    """The round-12 STAGED driver pair gated locally this round:
    q_corpus_divergence vs _SQL_CORPUS_DIVERGENCE at sf0.01."""
    import duckdb

    import __spark_entry__ as ent

    sdf = ent.q_corpus_divergence(spark, "/root/testdata/sf0.01")
    assert sdf.columns == ["idx", "ca", "cb", "kl_ab_micro", "kl_ba_micro"]
    got = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.execute(ent._SQL_CORPUS_DIVERGENCE).fetchall()
    )
    assert len(got) == 512
    assert any(r[3] != 0 for r in got)
    assert got == want


def test_windowed_divergence_matches_corpus_divergence(spark):
    """Batch windowed_divergence over one window == corpus_divergence
    of (window docs, reference) summed — same floor-micro device."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from reflexiv_spark.datapipe.divergence import (
        corpus_divergence,
        reference_histogram,
        windowed_divergence,
    )

    ref_docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(10)],
        "doc_id long, text string",
    )
    win_docs = spark.createDataFrame(
        [
            (1, datetime(2026, 1, 1, 10, 5), "alpha beta zeta eta"),
            (2, datetime(2026, 1, 1, 10, 40), "theta iota kappa"),
            (3, datetime(2026, 1, 1, 11, 10), "alpha alpha alpha beta"),
        ],
        "doc_id long, ts timestamp, text string",
    )
    dim = 64
    ref = reference_histogram(ref_docs, dim=dim, hash_family="md5")
    got = {
        r.win_start.hour: (r.n_features, r.kl_wr_micro, r.kl_rw_micro)
        for r in windowed_divergence(
            win_docs, ref, window="1 hour", dim=dim, hash_family="md5"
        ).collect()
    }
    assert set(got) == {10, 11}
    # cross-check each window against the batch operator
    for hour, ids in ((10, (1, 2)), (11, (3,))):
        wdocs = win_docs.where(F.col("doc_id").isin(*ids)).select(
            "doc_id", "text"
        )
        t = corpus_divergence(
            wdocs, ref_docs, dim=dim, hash_family="md5"
        )
        s = t.agg(
            F.sum("kl_ab_micro"), F.sum("kl_ba_micro"), F.sum("ca")
        ).first()
        assert got[hour] == (s[2], s[0], s[1])


def test_windowed_divergence_stream_equals_batch(spark, tmp_path):
    """The streaming plan (chained stateful aggs + in-row KL fold)
    emits exactly the batch rows for closed windows."""
    import shutil
    from datetime import datetime

    from reflexiv_spark.datapipe.divergence import (
        reference_histogram,
        windowed_divergence,
    )

    ref_docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta common") for i in range(5)],
        "doc_id long, text string",
    )
    dim = 32
    ref = reference_histogram(ref_docs, dim=dim, hash_family="md5")
    rows = [
        (1, datetime(2026, 1, 1, 10, 5), "alpha beta drift words"),
        (2, datetime(2026, 1, 1, 10, 50), "more drift vocabulary here"),
        (3, datetime(2026, 1, 1, 12, 10), "late closes the first window"),
    ]
    src = tmp_path / "src"
    spark.createDataFrame(
        rows, "doc_id long, ts timestamp, text string"
    ).write.parquet(str(src))

    batch = windowed_divergence(
        spark.read.parquet(str(src)), ref, window="1 hour", dim=dim,
        hash_family="md5",
    )
    want = {tuple(r) for r in batch.collect()}

    stream = spark.readStream.schema(
        "doc_id long, ts timestamp, text string"
    ).parquet(str(src))
    out = windowed_divergence(
        stream, ref, window="1 hour", watermark="30 minutes", dim=dim,
        hash_family="md5",
    )
    sink = tmp_path / "sink"
    chk = tmp_path / "chk"
    q = (
        out.writeStream.format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(chk))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.read.parquet(str(sink)).collect()}
    # append mode emits only watermark-CLOSED windows: the hour-12 row
    # is still open when the source drains, so the emitted set is the
    # closed subset of the batch result
    assert got
    assert got <= want
    assert {r[0].hour for r in got} == {10}
    shutil.rmtree(chk, ignore_errors=True)


def test_divergence_plan_guard(spark):
    """100 TB plan shape: downstream of the two dim-bounded histogram
    checkpoints NOTHING shuffles — the bucket join and both scalar
    totals attach as broadcasts; no sort-merge join, no Python
    crossing. (The per-corpus histogram aggregation shuffles inside
    the checkpoint materialization; this pins that the divergence
    table itself is exchange-free.)"""
    from pyspark.sql import functions as F

    from reflexiv_spark.datapipe.divergence import corpus_divergence

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    df = corpus_divergence(
        docs.where(F.col("doc_id") % 10 == 0),
        docs.where(F.col("doc_id") % 10 != 0),
        dim=512,
        hash_family="md5",
    )
    final = (
        df._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert "Exchange hashpartitioning" not in final, final
    assert final.count("BroadcastHashJoin") + final.count(
        "BroadcastNestedLoopJoin"
    ) >= 3
    assert "SortMergeJoin" not in final
    assert "InPandas" not in final and "EvalPython" not in final
