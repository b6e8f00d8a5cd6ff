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
