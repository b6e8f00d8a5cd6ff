"""CCNet-style reference-model perplexity bucketing
(datapipe/ccnet.py): literal Python reference, quality-direction
property, tertile arithmetic, zero-token edge, and the round-12 staged
driver pair gated locally against DuckDB (SURVEY §8 staging
protocol)."""

from __future__ import annotations

import hashlib
import math


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(t):
    out, cur = [], []
    for ch in (t or "").lower():
        if ch.isalnum() or ch == "_":
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def _ref_buckets(docs, ref_texts, dim=64):
    """Literal reference: md5-bucket unigram model of the reference,
    floor-micro NLL, integral per-token division, per-lang integer
    tertiles (ties on doc_id; NULL-scored docs ranked last, 'tail')."""
    counts = {}
    total = 0
    for t in ref_texts:
        for w in _toks(t):
            i = _md5_60("u|" + w) % dim
            counts[i] = counts.get(i, 0) + 1
            total += 1
    nll = {
        i: math.floor(
            -math.log10((counts.get(i, 0) + 1) / (total + dim)) * 1e6
        )
        for i in range(dim)
    }
    scored = []
    for doc_id, lang, t in docs:
        ws = _toks(t)
        if ws:
            s = sum(nll[_md5_60("u|" + w) % dim] for w in ws)
            scored.append((doc_id, lang, len(ws), s // len(ws)))
        else:
            scored.append((doc_id, lang, 0, None))
    out = {}
    langs = {lang for _, lang, _, _ in scored}
    for lang in langs:
        grp = [r for r in scored if r[1] == lang]
        grp.sort(
            key=lambda r: (r[3] is None, r[3] if r[3] is not None else 0, r[0])
        )
        n = len(grp)
        for rank, (doc_id, _, nt, pt) in enumerate(grp, start=1):
            if pt is None:
                b = "tail"
            elif 3 * rank <= n:
                b = "head"
            elif 3 * rank <= 2 * n:
                b = "middle"
            else:
                b = "tail"
            out[doc_id] = (lang, nt, pt, b)
    return out


def test_matches_python_reference_and_quality_direction(spark):
    from reflexiv_spark.datapipe.ccnet import ccnet_buckets

    ref_texts = [
        "the cat sat on the mat and the dog sat too",
        "the sun rose over the hill and the day began",
    ] * 3
    docs = [
        (1, "en", "the cat sat on the mat"),          # reference-like
        (2, "en", "zqx jvw kpf qqq zzz xxy"),          # far from reference
        (3, "en", "the dog sat and the sun rose"),     # reference-like
        (4, "en", ""),                                 # zero tokens
        (5, "en", "the day began over the hill"),
        (6, "en", "vvv uuu ttt sss rrr qqq"),
        (7, "de", "der hund und die katze"),
        (8, "de", "the cat sat on the mat"),
        (9, "de", "mmm nnn ooo ppp"),
    ]
    rdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ref_texts)], "doc_id long, text string"
    )
    ddf = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    got = {
        r.doc_id: (r.lang, r.n_tokens, r.nll_micro_per_token, r.bucket)
        for r in ccnet_buckets(ddf, rdf, dim=64, hash_family="md5").collect()
    }
    want = _ref_buckets(docs, ref_texts, dim=64)
    assert got == want
    # quality direction: reference-like docs outrank gibberish
    assert got[1][2] < got[2][2]
    assert got[4][3] == "tail" and got[4][2] is None
    # per-language split: each lang has at least one head
    assert any(v[3] == "head" and v[0] == "de" for v in got.values())
    assert any(v[3] == "head" and v[0] == "en" for v in got.values())


def test_tertile_counts(spark):
    """With 9 scored docs in one language the split is exactly 3/3/3."""
    from reflexiv_spark.datapipe.ccnet import ccnet_buckets

    ref = spark.createDataFrame(
        [(0, "alpha beta gamma delta " * 3)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(i, "en", "alpha beta " + "zz " * i) for i in range(1, 10)],
        "doc_id long, lang string, text string",
    )
    got = [
        r.bucket
        for r in ccnet_buckets(docs, ref, dim=32, hash_family="md5").collect()
    ]
    assert sorted(got) == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3


def test_staged_driver_pair_parity(spark):
    """The round-12 STAGED driver pair gated locally this round:
    q_ccnet_buckets vs _SQL_CCNET_BUCKETS at sf0.01."""
    import duckdb

    import __spark_entry__ as ent

    sdf = ent.q_ccnet_buckets(spark, "/root/testdata/sf0.01")
    assert sdf.columns == [
        "doc_id", "lang", "n_tokens", "nll_micro_per_token", "bucket"
    ]
    got = sorted(
        tuple(r) for r in sdf.collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.execute(ent._SQL_CCNET_BUCKETS).fetchall()
    )
    assert len(got) == 450
    assert {r[4] for r in got} == {"head", "middle", "tail"}
    assert got == want
