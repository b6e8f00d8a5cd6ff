"""CLI surface tests — ``python -m reflexiv_spark`` subcommands invoked
in-process, including the flagship ``meta`` with staged resume (I4)."""

from __future__ import annotations

import shutil

from reflexiv_spark.__main__ import main
from tests.conftest import random_genome, revcomp, simulate_reads


def _write_reads(spark, path, reads):
    spark.createDataFrame([(r,) for r in reads], ["seq"]).write.parquet(str(path))


def test_cli_counter_and_run(spark, tmp_path):
    g = random_genome(300, seed=17)
    reads = simulate_reads(g, read_len=60, coverage=10, seed=17)
    inp = tmp_path / "reads.parquet"
    _write_reads(spark, inp, reads)

    counts_out = tmp_path / "counts"
    assert main([
        "counter", "-i", str(inp), "-o", str(counts_out),
        "--informat", "parquet", "-k", "15", "--min-cov", "2",
    ]) == 0
    counts = spark.read.parquet(str(counts_out))
    assert counts.columns == ["kmer", "count"] and counts.count() > 0

    run_out = tmp_path / "contigs"
    assert main([
        "run", "-i", str(inp), "-o", str(run_out),
        "--informat", "parquet", "-k", "15", "--min-contig", "100",
    ]) == 0
    seqs = [r["seq"] for r in spark.read.parquet(str(run_out)).collect()]
    assert seqs and all(s in g or revcomp(s) in g for s in seqs)


def test_cli_meta_with_staged_resume(spark, tmp_path):
    """meta --workdir: completed rounds are skipped on re-invocation —
    the reference's _SUCCESS-gated step resume, exercised from the CLI
    (kill-equivalent: round_k15 wiped, round_k11 must be reused)."""
    g = random_genome(400, seed=5)
    reads = simulate_reads(g, read_len=60, coverage=10, seed=5)
    inp = tmp_path / "reads.parquet"
    _write_reads(spark, inp, reads)
    wd, out1, out2 = tmp_path / "wd", tmp_path / "o1", tmp_path / "o2"

    argv = [
        "meta", "-i", str(inp), "--informat", "parquet",
        "--klist", "11,15", "--min-cov", "2", "--min-contig", "30",
        "--workdir", str(wd),
    ]
    assert main(argv + ["-o", str(out1)]) == 0
    marker = wd / "round_k11" / "_SUCCESS"
    assert marker.exists() and (wd / "round_k15" / "_SUCCESS").exists()
    m1 = marker.stat().st_mtime_ns

    # simulate a mid-run death after round_k11: later stages gone
    shutil.rmtree(wd / "round_k15")
    assert main(argv + ["-o", str(out2)]) == 0
    assert marker.stat().st_mtime_ns == m1, "round_k11 was rebuilt, not resumed"
    assert (wd / "round_k15" / "_SUCCESS").exists()

    s1 = {r["seq"] for r in spark.read.parquet(str(out1)).collect()}
    s2 = {r["seq"] for r in spark.read.parquet(str(out2)).collect()}
    assert s1 == s2 and s1


def test_cli_preprocess_pair_merge_and_correct(spark, tmp_path):
    g = random_genome(260, seed=8)
    r1 = [(f"p{i}/1", g[i * 3 : i * 3 + 80]) for i in range(30)]
    r2 = [(f"p{i}/2", revcomp(g[i * 3 + 40 : i * 3 + 120])) for i in range(30)]
    p1, p2 = tmp_path / "r1.parquet", tmp_path / "r2.parquet"
    spark.createDataFrame(r1, ["read_id", "seq"]).write.parquet(str(p1))
    spark.createDataFrame(r2, ["read_id", "seq"]).write.parquet(str(p2))

    out = tmp_path / "pp"
    assert main([
        "preprocess", "-i", str(p1), "--in2", str(p2), "-o", str(out),
        "--informat", "parquet", "--correct", "-k", "15",
    ]) == 0
    merged = spark.read.parquet(str(out))
    seqs = [r["seq"] for r in merged.collect()]
    # overlapping mates fuse into 120 bp fragments
    assert any(len(s) == 120 for s in seqs)
    assert all(s in g or revcomp(s) in g for s in seqs)


def test_cli_preprocess_fasta_output(spark, tmp_path):
    """ADVICE r4: preprocess --outformat fasta must not crash on the
    missing contig_id column — read ids are (re)generated as needed."""
    g = random_genome(200, seed=9)
    inp = tmp_path / "reads.parquet"
    _write_reads(spark, inp, simulate_reads(g, read_len=60, coverage=8, seed=9))

    out = tmp_path / "pp.fasta"
    assert main([
        "preprocess", "-i", str(inp), "-o", str(out),
        "--informat", "parquet", "--outformat", "fasta",
        "--correct", "-k", "15",
    ]) == 0
    from reflexiv_spark.sources.records import read_fasta

    back = read_fasta(spark, str(out)).collect()
    assert back and all(r.id.startswith("read-") for r in back)
    assert all(r.seq in g or revcomp(r.seq) in g for r in back)


def test_cli_text_clean(spark, tmp_path):
    base = (
        "the quick brown fox jumps over the lazy dog and that is the "
        "story of the morning in the field where everything is calm "
        "and the day begins slowly with light in the trees"
    )
    rows = [(1, base), (2, base), (3, "too short")]
    inp = tmp_path / "docs.parquet"
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(str(inp))
    out = tmp_path / "cleaned"
    assert main([
        "text-clean", "-i", str(inp), "-o", str(out), "--min-tokens", "10",
    ]) == 0
    got = spark.read.parquet(str(out)).collect()
    assert [r.doc_id for r in got] == [1]  # clone and short doc dropped
    assert got[0].pred_lang == "en" and got[0].quality >= 0.6


def test_cli_text_cluster_and_decontam(spark, tmp_path):
    base = (
        "the quick brown fox jumps over the lazy dog and that is the "
        "story of the morning in the field where everything is calm"
    )
    near = base.replace("morning", "evening")
    rows = [(1, base), (2, near), (3, "something else entirely here now")]
    inp = tmp_path / "docs.parquet"
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(str(inp))

    out = tmp_path / "clusters"
    assert main(["text-cluster", "-i", str(inp), "-o", str(out)]) == 0
    got = {r.doc_id: r.component for r in spark.read.parquet(str(out)).collect()}
    assert got == {1: 1, 2: 1}  # the near-dup pair, clustered; 3 absent

    star = tmp_path / "clusters_star"
    assert main([
        "text-cluster", "-i", str(inp), "-o", str(star), "--star",
    ]) == 0
    got_star = {r.doc_id: r.component for r in spark.read.parquet(str(star)).collect()}
    assert got_star == got  # same components via spanning-star candidates

    kept = tmp_path / "kept"
    assert main([
        "text-cluster", "-i", str(inp), "-o", str(kept), "--keep-best",
    ]) == 0
    ids = sorted(r.doc_id for r in spark.read.parquet(str(kept)).collect())
    assert len(ids) == 2 and 3 in ids  # one of {1,2} plus the singleton

    ev = tmp_path / "eval.parquet"
    spark.createDataFrame(
        [(100, "quick brown fox jumps over")], "doc_id long, text string"
    ).write.parquet(str(ev))
    dec = tmp_path / "contaminated"
    assert main([
        "decontam", "-i", str(inp), "-o", str(dec), "--eval", str(ev), "-n", "4",
    ]) == 0
    hit = {r.doc_id for r in spark.read.parquet(str(dec)).collect()}
    assert hit == {1, 2}


def test_cli_bpe_train(spark, tmp_path):
    inp = tmp_path / "docs.parquet"
    spark.createDataFrame(
        [(1, "low lower lowest low low")], "doc_id long, text string"
    ).write.parquet(str(inp))
    out = tmp_path / "merges"
    assert main(["bpe-train", "-i", str(inp), "-o", str(out), "--merges", "3"]) == 0
    rows = spark.read.parquet(str(out)).orderBy("step").collect()
    assert [r.step for r in rows] == [1, 2, 3]
    assert rows[0].left == "l" and rows[0].right == "o"  # 'lo' ×5 words


def test_cli_text_pack(spark, tmp_path):
    inp = tmp_path / "docs.parquet"
    spark.createDataFrame(
        [(i, "tok " * 30) for i in range(1, 11)], "doc_id long, text string"
    ).write.parquet(str(inp))
    out = tmp_path / "packed"
    assert main(["text-pack", "-i", str(inp), "-o", str(out), "--window", "100"]) == 0
    got = {r.doc_id: (r.bin_id, r.bin_offset)
           for r in spark.read.parquet(str(out)).collect()}
    # 30 tokens/doc in id order: doc 4 starts at 90 -> straddles into bin 0
    assert got[1] == (0, 0) and got[4] == (0, 90) and got[5] == (1, 20)


def test_cli_text_split_spans_pagerank(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta iota " * 2,
          "en" if i % 2 else "de") for i in range(20)],
        ["doc_id", "text", "lang"],
    )
    inp = tmp_path / "docs.parquet"
    docs.write.parquet(str(inp))

    split_out = tmp_path / "split"
    assert main([
        "text-split", "-i", str(inp), "-o", str(split_out),
        "--fractions", "train:0.9,test:0.1",
    ]) == 0
    rows = spark.read.parquet(str(split_out)).collect()
    assert len(rows) == 20
    per = {}
    for r in rows:
        per.setdefault((r["lang"], r["split"]), 0)
        per[(r["lang"], r["split"])] += 1
    assert per[("en", "train")] == 9 and per[("en", "test")] == 1
    assert per[("de", "train")] == 9 and per[("de", "test")] == 1

    spans_out = tmp_path / "spans"
    assert main([
        "text-spans", "-i", str(inp), "-o", str(spans_out), "-n", "8",
    ]) == 0
    sp = spark.read.parquet(str(spans_out)).collect()
    assert all(r["dup_tokens"] == r["n_tokens"] for r in sp)  # all clones

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1)], ["src", "dst"]
    )
    einp = tmp_path / "edges.parquet"
    edges.write.parquet(str(einp))
    pr_out = tmp_path / "pr"
    assert main([
        "pagerank", "-i", str(einp), "-o", str(pr_out), "--iters", "20",
    ]) == 0
    pr = {r["node"]: r["rank"] for r in spark.read.parquet(str(pr_out)).collect()}
    assert set(pr) == {1, 2, 3, 4}
    assert pr[1] == max(pr.values())  # 1 has two in-edges (near fixed point)


def test_cli_score_strip_select_ndv(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (i,
             f"<p>doc {i} alpha beta gamma delta epsilon zeta token{i % 7}</p>",
             "en" if i % 2 else "de",
             100 - i)
            for i in range(20)
        ],
        ["doc_id", "text", "lang", "n_chars"],
    )
    inp = tmp_path / "docs.parquet"
    docs.write.parquet(str(inp))

    strip_out = tmp_path / "strip"
    assert main(["text-strip", "-i", str(inp), "-o", str(strip_out)]) == 0
    st = {r["doc_id"]: r for r in spark.read.parquet(str(strip_out)).collect()}
    assert st[0]["text"].startswith("doc 0 alpha") and "<p>" not in st[0]["text"]

    score_out = tmp_path / "score"
    assert main(["text-score", "-i", str(inp), "-o", str(score_out)]) == 0
    sc = spark.read.parquet(str(score_out)).collect()
    assert len(sc) == 20 and all(-1.0 <= r["logit"] <= 1.0 for r in sc)

    sel_out = tmp_path / "select"
    assert main([
        "text-select", "-i", str(inp), "-o", str(sel_out), "--budget", "20",
    ]) == 0
    sel = spark.read.parquet(str(sel_out)).collect()
    assert 0 < len(sel) < 20  # budget bites per group
    assert {r["lang"] for r in sel} == {"en", "de"}

    ndv_out = tmp_path / "ndv"
    assert main([
        "ndv", "-i", str(inp), "-o", str(ndv_out),
        "--key-col", "text", "--group-col", "lang",
    ]) == 0
    assert len(spark.read.parquet(str(ndv_out)).collect()) == 2


def test_cli_pq_encode_search(spark, tmp_path):
    import random

    rng = random.Random(3)
    vecs = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(64)],
        ["vec_id", "embedding"],
    )
    inp = tmp_path / "emb.parquet"
    vecs.write.parquet(str(inp))

    enc_out = tmp_path / "codes"
    assert main(["pq-encode", "-i", str(inp), "-o", str(enc_out)]) == 0
    enc = spark.read.parquet(str(enc_out)).collect()
    assert len(enc) == 64 and all(len(r["codes"].split("-")) == 8 for r in enc)

    srch_out = tmp_path / "topk"
    assert main([
        "pq-search", "-i", str(inp), "-o", str(srch_out), "-k", "5",
    ]) == 0
    top = spark.read.parquet(str(srch_out)).collect()
    assert len(top) == 5
    assert min(r["adc_sqdist"] for r in top) == 0  # query is a codebook entry


def test_cli_text_split_rejects_bad_fractions(spark, tmp_path):
    """ADVICE r6: a malformed or non-summing --fractions must exit with a
    clear argparse error, not an IndexError or a silent remainder dump."""
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "a", "en")], ["doc_id", "text", "lang"])
    inp = tmp_path / "d.parquet"
    docs.write.parquet(str(inp))
    out = tmp_path / "o"
    for bad in ["train:0.5,val:0.1", "train=0.8,val:0.2", "train:x,val:0.2"]:
        with _pytest.raises(SystemExit) as ei:
            main(["text-split", "-i", str(inp), "-o", str(out),
                  "--fractions", bad])
        assert ei.value.code == 2


def test_cli_semdedup(spark, tmp_path):
    """semdedup subcommand: planted duplicate pair collapses to one
    survivor; distinct vectors all survive."""
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(12)]
    rows.append((99, list(rows[3][1])))  # exact clone of vec 3
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    inp = tmp_path / "emb.parquet"
    emb.write.parquet(str(inp))
    out = tmp_path / "kept"
    assert main([
        "semdedup", "-i", str(inp), "-o", str(out),
        "--dim", "8", "--threshold", "0.999", "--n-centroids", "4",
    ]) == 0
    kept = {r["vec_id"] for r in spark.read.parquet(str(out)).collect()}
    assert (3 in kept) != (99 in kept)  # exactly one of the clone pair
    assert kept >= set(range(12)) - {3}  # no false positives


def test_cli_dsir(spark, tmp_path):
    """dsir subcommand: weights mode ranks target-like raw docs higher;
    --select-k emits exactly k rows."""
    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta " * 3) for i in range(4)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "zulu yankee xray whiskey")],
        "doc_id long, text string",
    )
    rawp, tgtp = tmp_path / "raw.parquet", tmp_path / "tgt.parquet"
    raw.write.parquet(str(rawp)); target.write.parquet(str(tgtp))

    wout = tmp_path / "w"
    assert main(["dsir", "-i", str(rawp), "--target", str(tgtp),
                 "-o", str(wout), "--dim", "256"]) == 0
    got = {r["doc_id"]: r["log_weight"]
           for r in spark.read.parquet(str(wout)).collect()}
    assert got[1] > got[2]

    sout = tmp_path / "s"
    assert main(["dsir", "-i", str(rawp), "--target", str(tgtp),
                 "-o", str(sout), "--dim", "256", "--select-k", "1"]) == 0
    sel = spark.read.parquet(str(sout)).collect()
    assert len(sel) == 1


def test_cli_text_train(spark, tmp_path):
    """text-train emits a model parquet that separates planted classes."""
    rows = [(i, "alpha beta gamma" if i % 2 == 0 else "zulu yankee xray",
             i % 2 == 0) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    inp = tmp_path / "docs.parquet"
    docs.write.parquet(str(inp))
    out = tmp_path / "model"
    assert main(["text-train", "-i", str(inp), "-o", str(out),
                 "--label-col", "y", "--dim", "128", "--iters", "3"]) == 0
    w = spark.read.parquet(str(out))
    assert w.columns == ["idx", "weight"] and w.count() > 0

    from reflexiv_spark.datapipe.classifier import logreg_predict
    z = {r.doc_id: r.z for r in logreg_predict(docs, w, dim=128).collect()}
    assert all(z[i] > 0 for i in range(0, 20, 2))
    assert all(z[i] < 0 for i in range(1, 20, 2))


def test_cli_quantiles(spark, tmp_path):
    """quantiles subcommand: raw summary has exact grid ranks; --qs
    evaluates quantile points within the step bound."""
    df = spark.createDataFrame([(i, i * 10) for i in range(1, 101)],
                               "doc_id long, n_tokens long")
    inp = tmp_path / "in.parquet"
    df.write.parquet(str(inp))

    sout = tmp_path / "s"
    assert main(["quantiles", "-i", str(inp), "-o", str(sout),
                 "--capacity", "10"]) == 0
    rows = {r["rank"]: r["value"]
            for r in spark.read.parquet(str(sout)).collect()}
    assert set(rows) == {1 + 10 * i for i in range(10)} | {100}
    assert rows[1] == 10 and rows[51] == 510 and rows[100] == 1000

    qout = tmp_path / "q"
    assert main(["quantiles", "-i", str(inp), "-o", str(qout),
                 "--capacity", "10", "--qs", "0.5,0.99"]) == 0
    got = {r["q"]: r["value"] for r in spark.read.parquet(str(qout)).collect()}
    assert got[0.5] in (510, 520) and got[0.99] in (1000,)


def test_cli_knn(spark, tmp_path):
    """knn subcommand: edge parquet with k edges per vector."""
    rows = [(i, [1.0 + 0.001 * i, 0.5]) for i in range(8)]
    inp = tmp_path / "emb.parquet"
    spark.createDataFrame(rows, "vec_id long, embedding array<float>") \
        .write.parquet(str(inp))
    out = tmp_path / "edges"
    assert main(["knn", "-i", str(inp), "-o", str(out),
                 "--dim", "2", "-k", "3", "--n-centroids", "1"]) == 0
    got = spark.read.parquet(str(out)).collect()
    per_src = {}
    for r in got:
        per_src.setdefault(r.src, set()).add(r.dst)
    assert set(per_src) == set(range(8))
    assert all(len(v) == 3 for v in per_src.values())


def test_cli_ivfpq_search(spark, tmp_path):
    """ivfpq-search subcommand: top-k parquet with the query (min id)
    at ADC distance 0 in front."""
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [(i, (rng.randn(16) + (3.0 if i < 10 else -3.0)).tolist())
            for i in range(20)]
    inp = tmp_path / "emb.parquet"
    spark.createDataFrame(rows, "vec_id long, embedding array<float>") \
        .write.parquet(str(inp))
    out = tmp_path / "hits"
    assert main(["ivfpq-search", "-i", str(inp), "-o", str(out),
                 "--dim", "16", "-m", "4", "--ksub", "8",
                 "--n-centroids", "4", "--n-probes", "2", "-k", "5"]) == 0
    got = sorted(spark.read.parquet(str(out)).collect(),
                 key=lambda r: (r.adc_sqdist, r.vec_id))
    assert len(got) == 5
    assert got[0].vec_id == 0 and got[0].adc_sqdist == 0
    assert all(r.adc_sqdist >= 0 for r in got)


def test_cli_bloom_decontam(spark, tmp_path):
    """bloom-decontam subcommand: docs sharing the target vocabulary
    hit 100% of their terms; disjoint docs hit ~0 (false positives
    only)."""
    target = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string")
    raw = spark.createDataFrame(
        [(1, "alpha beta beta gamma"), (2, "zulu yankee xray whiskey")],
        "doc_id long, text string")
    tp, rp = tmp_path / "tgt.parquet", tmp_path / "raw.parquet"
    target.write.parquet(str(tp)); raw.write.parquet(str(rp))
    out = tmp_path / "flagged"
    assert main(["bloom-decontam", "-i", str(rp), "--target", str(tp),
                 "-o", str(out), "--m-bits", "65536"]) == 0
    got = {r.doc_id: (r.n_terms, r.n_hits)
           for r in spark.read.parquet(str(out)).collect()}
    assert got[1] == (3, 3)      # all distinct terms in the filter
    assert got[2][0] == 4 and got[2][1] <= 1  # at most FP noise


def test_cli_edit_join(spark, tmp_path):
    """edit-join subcommand: typo variants pair at their exact
    distance; unrelated docs don't."""
    docs = spark.createDataFrame(
        [(1, "spark engine"), (2, "spark enginX"), (3, "unrelated body")],
        "doc_id long, text string")
    inp = tmp_path / "docs.parquet"
    docs.write.parquet(str(inp))
    out = tmp_path / "pairs"
    assert main(["edit-join", "-i", str(inp), "-o", str(out),
                 "-d", "1", "--key-len", "16"]) == 0
    got = [(r.id_a, r.id_b, r.dist)
           for r in spark.read.parquet(str(out)).collect()]
    assert got == [(1, 2, 1)]


def test_cli_winnow(spark, tmp_path):
    """winnow subcommand: fingerprints mode emits (id, pos, fp); pairs
    mode flags the shared-passage pair."""
    passage = "a long shared boilerplate sentence repeated verbatim"
    docs = spark.createDataFrame(
        [(1, "intro " + passage), (2, passage + " outro"),
         (3, "nothing in common zzz qqq vvv")],
        "doc_id long, text string")
    inp = tmp_path / "docs.parquet"
    docs.write.parquet(str(inp))
    fp_out = tmp_path / "fps"
    assert main(["winnow", "-i", str(inp), "-o", str(fp_out)]) == 0
    fps = spark.read.parquet(str(fp_out))
    assert fps.columns == ["id", "pos", "fp"]
    assert fps.count() > 10
    pr_out = tmp_path / "pairs"
    assert main(["winnow", "-i", str(inp), "-o", str(pr_out),
                 "--pairs", "--min-shared", "2"]) == 0
    pairs = {(r.id_a, r.id_b) for r in spark.read.parquet(str(pr_out)).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)
    rs_out = tmp_path / "clean"
    assert main(["winnow", "-i", str(inp), "-o", str(rs_out),
                 "--remove-spans"]) == 0
    clean = {r.id: r for r in spark.read.parquet(str(rs_out)).collect()}
    assert passage in clean[1].clean_text      # owner keeps
    assert passage not in clean[2].clean_text  # non-owner excised
    assert clean[2].n_spans > 0 and clean[3].n_spans == 0


def test_cli_winnow_probe_store_round_trip(spark, tmp_path):
    """winnow-probe subcommand: first batch with --emit-store builds
    the store; the second batch probes it and flags the doc repeating
    the first batch's passage."""
    passage = "a long shared boilerplate sentence repeated verbatim"
    day1 = spark.createDataFrame(
        [(1, "intro " + passage + " outro")], "doc_id long, text string")
    day2 = spark.createDataFrame(
        [(2, "fresh words then " + passage + " again"),
         (3, "nothing in common zzz qqq vvv")],
        "doc_id long, text string")
    d1, d2 = tmp_path / "d1.parquet", tmp_path / "d2.parquet"
    day1.write.parquet(str(d1))
    day2.write.parquet(str(d2))
    store = tmp_path / "store"
    assert main(["winnow-probe", "-i", str(d1),
                 "-o", str(tmp_path / "r1"), "--emit-store",
                 str(store)]) == 0
    assert main(["winnow-probe", "-i", str(d2),
                 "-o", str(tmp_path / "r2"), "--store", str(store)]) == 0
    rep = {
        r.doc_id: r
        for r in spark.read.parquet(str(tmp_path / "r2")).collect()
    }
    assert rep[2].flagged and rep[2].n_hits >= 2
    assert not rep[3].flagged


def test_cli_winnow_argument_guards(spark, tmp_path):
    """Round-12 ADVICE: --ref without --remove-spans and --max-df with
    --remove-spans --ref are argparse errors, not silently-ignored
    flags."""
    import pytest as _pytest

    docs = spark.createDataFrame(
        [(1, "some text here")], "doc_id long, text string")
    inp = tmp_path / "docs.parquet"
    docs.write.parquet(str(inp))
    ref = tmp_path / "ref.parquet"
    docs.write.parquet(str(ref))
    with _pytest.raises(SystemExit) as ei:
        main(["winnow", "-i", str(inp), "-o", str(tmp_path / "o1"),
              "--ref", str(ref)])
    assert ei.value.code == 2
    with _pytest.raises(SystemExit) as ei:
        main(["winnow", "-i", str(inp), "-o", str(tmp_path / "o2"),
              "--remove-spans", "--ref", str(ref), "--max-df", "5"])
    assert ei.value.code == 2


def test_cli_quality_filter(spark, tmp_path):
    """quality-filter subcommand: gopher flags the short doc, c4 with
    --keep-only emits only the punctuated multi-sentence doc."""
    docs = spark.createDataFrame(
        [
            (1, "This is a document that we have written with care. "
                "It talks about the weather and the sea and such. " * 3),
            (2, "tiny"),
        ],
        "doc_id long, text string",
    )
    inp = tmp_path / "docs.parquet"
    docs.write.parquet(str(inp))
    g_out = tmp_path / "gopher"
    assert main(["quality-filter", "-i", str(inp), "-o", str(g_out),
                 "--ruleset", "gopher", "--min-words", "30"]) == 0
    got = {r.id: r.keep for r in spark.read.parquet(str(g_out)).collect()}
    assert got == {1: True, 2: False}
    c_out = tmp_path / "c4"
    assert main(["quality-filter", "-i", str(inp), "-o", str(c_out),
                 "--ruleset", "c4", "--keep-only"]) == 0
    kept = spark.read.parquet(str(c_out)).collect()
    assert [r.id for r in kept] == [1] and kept[0].n_sentences >= 3


def test_cli_semantic_decontam(spark, tmp_path):
    """semantic-decontam subcommand: the near-parallel train vector
    flags against its eval twin; the orthogonal one passes."""
    d = 8
    ev = spark.createDataFrame(
        [(100, [1.0] + [0.0] * (d - 1))], "vec_id long, embedding array<float>")
    tr = spark.createDataFrame(
        [(1, [0.95, 0.05] + [0.0] * (d - 2)),
         (2, [0.0] * (d - 1) + [1.0])],
        "vec_id long, embedding array<float>")
    ep, tp = tmp_path / "ev.parquet", tmp_path / "tr.parquet"
    ev.write.parquet(str(ep)); tr.write.parquet(str(tp))
    out = tmp_path / "flagged"
    assert main(["semantic-decontam", "-i", str(tp), "--eval", str(ep),
                 "-o", str(out), "--threshold", "0.9", "--dim", str(d)]) == 0
    got = [(r.vec_id, r.eval_id) for r in spark.read.parquet(str(out)).collect()]
    assert got == [(1, 100)]


def test_cli_divergence_and_fineweb(spark, tmp_path):
    """divergence subcommand emits the 512-row bucket table (and the
    1-row --summary); quality-filter --ruleset fineweb keeps the
    punctuated doc and drops the unpunctuated one; winnow --ref
    excises reference-matching spans."""
    a = spark.createDataFrame(
        [(i, "alpha beta gamma delta common words") for i in range(5)],
        "doc_id long, text string")
    b = spark.createDataFrame(
        [(i, "epsilon zeta eta theta other words") for i in range(5)],
        "doc_id long, text string")
    pa, pb = tmp_path / "a.parquet", tmp_path / "b.parquet"
    a.write.parquet(str(pa)); b.write.parquet(str(pb))
    out = tmp_path / "div"
    assert main(["divergence", "-i", str(pa), "--other", str(pb),
                 "-o", str(out), "--dim", "64"]) == 0
    t = spark.read.parquet(str(out))
    assert t.count() == 64
    sout = tmp_path / "divs"
    assert main(["divergence", "-i", str(pa), "--other", str(pb),
                 "-o", str(sout), "--dim", "64", "--summary"]) == 0
    s = spark.read.parquet(str(sout)).head()
    assert s.kl_ab_micro > 0 and s.kl_ba_micro > 0

    docs = spark.createDataFrame(
        [(1, "A good long sentence ends here properly today.\n"
             "Another fine long sentence also ends with a period.\n"
             "And one more decent sentence closes out the page."),
         (2, "no punctuation anywhere on this line\n"
             "and none on this other line either\n"
             "nor here at the very end")],
        "doc_id long, text string")
    pd_ = tmp_path / "docs.parquet"
    docs.write.parquet(str(pd_))
    fout = tmp_path / "fw"
    assert main(["quality-filter", "-i", str(pd_), "-o", str(fout),
                 "--ruleset", "fineweb"]) == 0
    got = {r.id: r.keep for r in spark.read.parquet(str(fout)).collect()}
    assert got == {1: True, 2: False}

    leaked = "a benchmark passage repeated verbatim in training"
    tr = spark.createDataFrame(
        [(1, f"head {leaked} tail")], "doc_id long, text string")
    rf = spark.createDataFrame(
        [(9, leaked)], "doc_id long, text string")
    pt, pr = tmp_path / "tr.parquet", tmp_path / "rf.parquet"
    tr.write.parquet(str(pt)); rf.write.parquet(str(pr))
    rout = tmp_path / "ref_clean"
    assert main(["winnow", "-i", str(pt), "-o", str(rout),
                 "--remove-spans", "--ref", str(pr)]) == 0
    r = spark.read.parquet(str(rout)).head()
    assert leaked not in r.clean_text and r.n_spans > 0


def test_cli_ccnet_buckets(spark, tmp_path):
    ref = spark.createDataFrame(
        [(0, "the cat sat on the mat and the dog sat too " * 2)],
        "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "en", "the cat sat on the mat"),
         (2, "en", "zzz qqq xxx vvv www uuu"),
         (3, "en", "the dog sat too on the mat")],
        "doc_id long, lang string, text string")
    pr, pd_ = tmp_path / "ref.parquet", tmp_path / "docs.parquet"
    ref.write.parquet(str(pr)); docs.write.parquet(str(pd_))
    out = tmp_path / "buckets"
    assert main(["ccnet-buckets", "-i", str(pd_), "--ref", str(pr),
                 "-o", str(out)]) == 0
    got = {r.doc_id: r.bucket for r in spark.read.parquet(str(out)).collect()}
    assert got[2] == "tail"              # gibberish lands in the tail
    assert "head" in got.values()


def test_cli_badwords_and_shuffle(spark, tmp_path):
    """badwords-filter: word + phrase hits flagged, --keep-only emits
    survivors, --words-file routes whitespace entries to phrases, no
    list at all errors; text-shuffle: positions are a permutation."""
    docs = spark.createDataFrame(
        [
            (1, "a clean document"),
            (2, "contains badword here"),
            (3, "an evil phrase lives here"),
        ],
        "doc_id long, text string",
    )
    inp = tmp_path / "docs.parquet"
    docs.write.parquet(str(inp))
    out = tmp_path / "flags"
    assert main(["badwords-filter", "-i", str(inp), "-o", str(out),
                 "--words", "badword", "--phrases", "evil phrase"]) == 0
    got = {r.id: r.keep for r in spark.read.parquet(str(out)).collect()}
    assert got == {1: True, 2: False, 3: False}
    wf = tmp_path / "list.txt"
    wf.write_text("badword\nevil phrase\n\n")
    k_out = tmp_path / "kept"
    assert main(["badwords-filter", "-i", str(inp), "-o", str(k_out),
                 "--words-file", str(wf), "--keep-only"]) == 0
    kept = spark.read.parquet(str(k_out)).collect()
    assert [r.doc_id for r in kept] == [1]
    assert set(kept[0].asDict()) == {"doc_id", "text"}
    import pytest as _pytest
    with _pytest.raises(SystemExit) as ei:
        main(["badwords-filter", "-i", str(inp),
              "-o", str(tmp_path / "x")])
    assert ei.value.code == 2
    s_out = tmp_path / "shuffled"
    assert main(["text-shuffle", "-i", str(inp), "-o", str(s_out),
                 "--salt", "ep0"]) == 0
    rows = spark.read.parquet(str(s_out)).collect()
    assert sorted(r.position for r in rows) == [0, 1, 2]


def test_cli_training_layout(spark, tmp_path):
    """training-layout subcommand: manifest covers every kept token
    once; --plan emits the per-document layout."""
    docs = spark.createDataFrame(
        [(i, f"s{i % 2}", "tok " * (4 + i % 5)) for i in range(40)],
        "doc_id long, source string, text string",
    )
    inp = tmp_path / "docs.parquet"
    docs.write.parquet(str(inp))
    m_out = tmp_path / "manifest"
    assert main(["training-layout", "-i", str(inp), "-o", str(m_out),
                 "--target-tokens", "25", "--budget-frac", "0.9"]) == 0
    man = spark.read.parquet(str(m_out)).collect()
    assert len(man) >= 2
    p_out = tmp_path / "plan"
    assert main(["training-layout", "-i", str(inp), "-o", str(p_out),
                 "--target-tokens", "25", "--budget-frac", "0.9",
                 "--plan"]) == 0
    plan = spark.read.parquet(str(p_out)).collect()
    assert sum(r.n_tokens for r in man) == sum(r.n_tokens for r in plan)
    assert sorted(r.position for r in plan) == list(range(len(plan)))


def test_cli_embedding_probe(spark, tmp_path):
    """embedding-probe: --build trains the quantizer and emits
    store+centroids; a probe run flags the planted near-duplicate and
    --emit-store round-trips the updated store."""
    dim = 8
    corpus = spark.createDataFrame(
        [(100, [1.0] + [0.0] * (dim - 1)), (101, [0.0, 1.0] + [0.0] * (dim - 2))],
        "vec_id long, embedding array<float>",
    )
    cp = tmp_path / "corpus.parquet"
    corpus.write.parquet(str(cp))
    st, ct = tmp_path / "store", tmp_path / "cents"
    assert main(["embedding-probe", "-i", str(cp), "-o",
                 str(tmp_path / "built"), "--build", "--dim", str(dim),
                 "--n-centroids", "2", "--emit-store", str(st),
                 "--emit-centroids", str(ct)]) == 0
    batch = spark.createDataFrame(
        [(1, [0.95, 0.05] + [0.0] * (dim - 2)),
         (2, [0.0] * (dim - 1) + [1.0])],
        "vec_id long, embedding array<float>",
    )
    bp = tmp_path / "batch.parquet"
    batch.write.parquet(str(bp))
    rep = tmp_path / "report"
    st2 = tmp_path / "store2"
    assert main(["embedding-probe", "-i", str(bp), "-o", str(rep),
                 "--store", str(st), "--centroids", str(ct),
                 "--threshold", "0.9", "--dim", str(dim),
                 "--emit-store", str(st2)]) == 0
    got = {r.vec_id: (r.flagged, r.best_store_id)
           for r in spark.read.parquet(str(rep)).collect()}
    assert got[1] == (True, 100) and got[2] == (False, None)
    assert spark.read.parquet(str(st2)).count() == 4
    # probing without the model errors loudly
    import pytest as _pytest
    with _pytest.raises(SystemExit) as ei:
        main(["embedding-probe", "-i", str(bp), "-o", str(tmp_path / "x"),
              "--store", str(st)])
    assert ei.value.code == 2


def test_cli_store_emit_same_path_guard(spark, tmp_path):
    """--emit-store == --store errors up front for every store-probing
    command (overwrite would delete the lazily-read source)."""
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    inp = tmp_path / "in.parquet"
    docs.write.parquet(str(inp))
    st = tmp_path / "store"
    for argv in (
        ["dedup-incremental", "-i", str(inp), "-o", str(tmp_path / "a"),
         "--store", str(st), "--emit-store", str(st)],
        ["winnow-probe", "-i", str(inp), "-o", str(tmp_path / "b"),
         "--store", str(st), "--emit-store", str(st)],
        ["embedding-probe", "-i", str(inp), "-o", str(tmp_path / "c"),
         "--store", str(st), "--centroids", str(tmp_path / "m"),
         "--emit-store", str(st)],
    ):
        with _pytest.raises(SystemExit) as ei:
            main(argv)
        assert ei.value.code == 2
