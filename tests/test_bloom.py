"""Bloom membership sketch (datapipe/bloom.py): zero false negatives,
sane false-positive rate, exact mergeability, determinism/layout
invariance, and the round-11 staged driver pair gated locally against
DuckDB (SURVEY §8 staging protocol)."""

from __future__ import annotations


def test_bloom_zero_false_negatives_and_fp_rate(spark):
    """Every inserted key probes present (Bloom's hard guarantee); on a
    disjoint probe vocabulary the false-positive rate stays near the
    analytic (1 - e^{-kn/m})^k ≈ 0.4% at n=500, m=2^16, k=4."""
    from reflexiv_spark.datapipe.bloom import bloom_build, bloom_probe_terms

    member_words = " ".join(f"in{i}" for i in range(500))
    other_words = " ".join(f"out{i}" for i in range(500))
    keys = spark.createDataFrame(
        [(f"in{i}",) for i in range(500)], "key string"
    )
    bloom = bloom_build(keys, "key", m_bits=1 << 16, k_hashes=4)
    docs = spark.createDataFrame(
        [(1, member_words), (2, other_words), (3, None)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_terms, r.n_hits)
        for r in bloom_probe_terms(docs, bloom, m_bits=1 << 16).collect()
    }
    assert got[1] == (500, 500), got[1]  # zero false negatives
    n_terms, n_hits = got[2]
    assert n_terms == 500 and n_hits <= 25, got[2]  # FPR ≤ 5% (≈0.4% exp.)
    assert got[3] == (0, 0)  # no-term docs report (0, 0)


def test_bloom_merge_exact(spark):
    """merge(filter(A), filter(B)) is BIT-IDENTICAL to filter(A ∪ B) —
    Bloom union is the bitwise OR, no approximation stacks."""
    from reflexiv_spark.datapipe.bloom import bloom_build, bloom_merge

    a = spark.createDataFrame([(f"a{i}",) for i in range(200)], "key string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(200)], "key string")
    fa = bloom_build(a, "key", m_bits=4096, k_hashes=3)
    fb = bloom_build(b, "key", m_bits=4096, k_hashes=3)
    merged = sorted(
        (r.word, r.bits) for r in bloom_merge(fa, fb).collect()
    )
    direct = sorted(
        (r.word, r.bits)
        for r in bloom_build(
            a.unionByName(b), "key", m_bits=4096, k_hashes=3
        ).collect()
    )
    assert merged == direct


def test_bloom_determinism_and_layout_invariance(spark):
    """The filter is a pure function of the key multiset: repartitioning
    cannot perturb a single bit, and both hash families are stable."""
    from reflexiv_spark.datapipe.bloom import bloom_build

    keys = spark.createDataFrame(
        [(f"k{i % 300}",) for i in range(900)], "key string"
    )
    for fam in ("xxhash64", "md5"):
        one = sorted(
            (r.word, r.bits)
            for r in bloom_build(
                keys, "key", m_bits=8192, k_hashes=4, hash_family=fam
            ).collect()
        )
        two = sorted(
            (r.word, r.bits)
            for r in bloom_build(
                keys.repartition(7), "key", m_bits=8192, k_hashes=4,
                hash_family=fam,
            ).collect()
        )
        assert one == two and len(one) > 0


def test_bloom_probe_plan_no_corpus_shuffle_join(spark):
    """100 TB plan guard: the probe corpus never shuffles against the
    build side — every filter attach is a BroadcastHashJoin; the only
    hash exchanges are the per-doc term distinct and the final count."""
    from reflexiv_spark.datapipe.bloom import bloom_build, bloom_probe_terms

    keys = spark.createDataFrame([(f"k{i}",) for i in range(100)], "key string")
    bloom = bloom_build(keys, "key", m_bits=4096, k_hashes=4)
    docs = spark.createDataFrame(
        [(i, "k1 k2 zzz") for i in range(50)], "doc_id long, text string"
    )
    out = bloom_probe_terms(docs, bloom, m_bits=4096, k_hashes=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("BroadcastHashJoin") == 4, final
    # no filter attach may shuffle: any SortMergeJoin on a word/position
    # key means the probe corpus was exchanged against the build side
    # (the doc-keyed base ⟕ agg join is data-sized on BOTH sides and
    # legitimately free to SMJ)
    smj_lines = [
        ln for ln in final.splitlines() if "SortMergeJoin" in ln
    ]
    assert not any("__w" in ln or "__p" in ln for ln in smj_lines), final
    assert "EvalPython" not in final and "InPandas" not in final


def test_staged_bloom_driver_pair_parity(spark):
    """The round-11 STAGED driver pair gated locally this round:
    q_bloom_decontam and _SQL_BLOOM_DECONTAM must agree on rows,
    schema, and values at sf0.01 (SURVEY §8 staging protocol — the
    round-10 window is exactly full, so the pair registers next
    round)."""
    import duckdb

    import __spark_entry__ as ent

    sdf = ent.q_bloom_decontam(spark, "/root/testdata/sf0.01")
    srows = sorted((r.doc_id, r.n_terms, r.n_hits) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    cur = con.execute(ent._SQL_BLOOM_DECONTAM)
    assert [d[0] for d in cur.description] == ["doc_id", "n_terms", "n_hits"]
    orows = sorted(tuple(r) for r in cur.fetchall())
    assert len(srows) == len(orows) > 100
    assert srows == orows
    # the Bloom guarantee on real data: every raw doc sharing its whole
    # vocab with the target corpus would hit 100%; at minimum no doc
    # reports more hits than terms and totals are plausible
    assert all(h <= t for _, t, h in srows)
