"""CCNet-style reference-model perplexity bucketing
(datapipe/ccnet.py): literal Python reference (unigram and the
round-12 unigram+bigram interpolated model), quality-direction
property, tertile arithmetic over the SCORED population, zero-token
and empty-reference edges, and the registered driver pair gated
locally against DuckDB (SURVEY §8 protocol)."""

from __future__ import annotations

import hashlib
import math

MICRO = 1_000_000


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


def _feats(ws, bigram):
    fs = [("u", "u|" + w) for w in ws]
    if bigram and len(ws) >= 2:
        fs += [
            ("b", f"b|{ws[i]} {ws[i + 1]}") for i in range(len(ws) - 1)
        ]
    return fs


def _ref_buckets(docs, ref_texts, dim=64, lam=None):
    """Literal reference: md5-bucket add-1 model(s) of the reference,
    floor-micro NLL, integral per-token division (λ-blended when lam
    is set), per-lang integer tertiles over SCORED docs (ties on
    doc_id; NULL-scored docs ranked last, 'tail', excluded from n)."""
    bigram = lam is not None
    counts: dict[tuple[str, int], int] = {}
    totals = {"u": 0, "b": 0}
    for t in ref_texts:
        for kind, f in _feats(_toks(t), bigram):
            i = _md5_60(f) % dim
            counts[(kind, i)] = counts.get((kind, i), 0) + 1
            totals[kind] += 1
    def nll(kind, i):
        return math.floor(
            -math.log10(
                (counts.get((kind, i), 0) + 1) / (totals[kind] + dim)
            )
            * 1e6
        )
    scored = []
    for doc_id, lang, t in docs:
        ws = _toks(t)
        if not ws:
            scored.append((doc_id, lang, 0, None))
            continue
        su = sum(nll("u", _md5_60(f) % dim) for k, f in _feats(ws, False))
        uni_pt = su // len(ws)
        if bigram and len(ws) >= 2:
            sb = sum(
                nll("b", _md5_60(f) % dim)
                for k, f in _feats(ws, True)
                if k == "b"
            )
            bi_pt = sb // (len(ws) - 1)
            pt = (lam * uni_pt + (MICRO - lam) * bi_pt) // MICRO
        else:
            pt = uni_pt
        scored.append((doc_id, lang, len(ws), pt))
    out = {}
    langs = {lang for _, lang, _, _ in scored}
    for lang in langs:
        grp = [r for r in scored if r[1] == lang]
        grp.sort(
            key=lambda r: (r[3] is None, r[3] if r[3] is not None else 0, r[0])
        )
        n = sum(1 for r in grp if r[3] is not None)
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


_REF_TEXTS = [
    "the cat sat on the mat and the dog sat too",
    "the sun rose over the hill and the day began",
] * 3

_DOCS = [
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


def _run(spark, docs, ref_texts, dim, lam):
    from reflexiv_spark.datapipe.ccnet import ccnet_buckets

    rdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ref_texts)], "doc_id long, text string"
    )
    ddf = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    return {
        r.doc_id: (r.lang, r.n_tokens, r.nll_micro_per_token, r.bucket)
        for r in ccnet_buckets(
            ddf, rdf, dim=dim, hash_family="md5", bigram_lambda_micro=lam
        ).collect()
    }


def test_matches_python_reference_and_quality_direction(spark):
    got = _run(spark, _DOCS, _REF_TEXTS, 64, None)
    want = _ref_buckets(_DOCS, _REF_TEXTS, dim=64)
    assert got == want
    # quality direction: reference-like docs outrank gibberish
    assert got[1][2] < got[2][2]
    assert got[4][3] == "tail" and got[4][2] is None
    # per-language split: each lang has at least one head
    assert any(v[3] == "head" and v[0] == "de" for v in got.values())
    assert any(v[3] == "head" and v[0] == "en" for v in got.values())


def test_bigram_interpolation_matches_reference(spark):
    """The round-12 interpolated model (λ=0.5): literal parity, plus
    the word-order property a unigram model cannot express — shuffled
    reference words score worse than the fluent original."""
    docs = _DOCS + [
        # same unigram profile as doc 1, scrambled word order
        (10, "en", "mat the on sat cat the"),
        # single token: no bigrams, falls back to the unigram score
        (11, "en", "the"),
    ]
    got = _run(spark, docs, _REF_TEXTS, 64, 500_000)
    want = _ref_buckets(docs, _REF_TEXTS, dim=64, lam=500_000)
    assert got == want
    # word-order awareness: the scramble scores strictly worse
    assert got[1][2] < got[10][2]
    # λ=1e6 recovers the pure unigram model exactly
    full = _run(spark, docs, _REF_TEXTS, 64, MICRO)
    uni = _run(spark, docs, _REF_TEXTS, 64, None)
    assert {k: v[2] for k, v in full.items()} == {
        k: v[2] for k, v in uni.items()
    }


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


def test_tertiles_over_scored_docs_only(spark):
    """Round-12 ADVICE fix: zero-token docs do not count toward n —
    9 scored + 6 empty docs still split the scored population 3/3/3
    (under the old all-docs n=15, 3·rank ≤ 15 would have put 5 scored
    docs in head)."""
    from reflexiv_spark.datapipe.ccnet import ccnet_buckets

    ref = spark.createDataFrame(
        [(0, "alpha beta gamma delta " * 3)], "doc_id long, text string"
    )
    rows = [(i, "en", "alpha beta " + "zz " * i) for i in range(1, 10)]
    rows += [(100 + i, "en", "") for i in range(6)]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )
    got = {
        r.doc_id: r.bucket
        for r in ccnet_buckets(docs, ref, dim=32, hash_family="md5").collect()
    }
    scored = [got[i] for i in range(1, 10)]
    assert sorted(scored) == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    assert all(got[100 + i] == "tail" for i in range(6))


def test_empty_reference_is_uniform_not_null(spark):
    """Round-12 ADVICE fix: an empty reference corpus degenerates to
    the uniform add-1 model (total=0) — every doc still scores (the
    same per-token NLL, floor(log10(dim)·1e6)) instead of silently
    landing in 'tail' with NULL scores."""
    from reflexiv_spark.datapipe.ccnet import ccnet_buckets

    ref = spark.createDataFrame([], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "en", "alpha beta"), (2, "en", "gamma delta epsilon")],
        "doc_id long, lang string, text string",
    )
    got = {
        r.doc_id: r.nll_micro_per_token
        for r in ccnet_buckets(docs, ref, dim=32, hash_family="md5").collect()
    }
    expect = math.floor(-math.log10(1 / 32) * 1e6)
    assert got == {1: expect, 2: expect}


def test_staged_driver_pair_parity(spark):
    """The round-12 REGISTERED driver pair gated locally:
    q_ccnet_buckets (λ=0.5 interpolated, scored-population tertiles)
    vs _SQL_CCNET_BUCKETS at sf0.01."""
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
