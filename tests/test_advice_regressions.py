"""Regression tests for ADVICE findings (rounds 2 and 4).

Round 2:
1. merge_read_pairs must not accept overlaps shorter than min_overlap when
   one mate is shorter than min_overlap (descending F.sequence range).
2. merge_contigs must not emit a contig's bases into two merged outputs in
   one round (chain A→B→C double-consumption).
3. count_kmers_packed(max_coverage=None) means "no ceiling", matching
   count_kmers — not an empty result.
4. extend_contigs_with_reads vote depth must count read multiplicity even
   though reads are content-deduplicated (deterministic xxhash64 ids).

Round 4:
5. correct_reads restores multiplicity by JOIN (one output row per input
   row) — never explode(array_repeat(...)) which materializes one
   multiplicity×len row.
6. rank_paths drops cycles but still assembles linear paths, and
   assemble_from_counts(algorithm="rank") threads max_iterations.
7. ivf_topk excludes zero-norm centroids instead of dividing by zero.
"""

from __future__ import annotations

from tests.conftest import random_genome, revcomp, simulate_reads


def test_merge_read_pairs_rejects_short_mate_overlap(spark):
    from reflexiv_spark.operators.preprocess import merge_read_pairs

    # R2 is 5 bp and overlaps R1's tail exactly; min_overlap=10 must reject.
    r1_seq = random_genome(20, seed=7)
    r2_seq = revcomp(r1_seq[-5:])
    r1 = spark.createDataFrame([("p/1", r1_seq)], "read_id string, seq string")
    r2 = spark.createDataFrame([("p/2", r2_seq)], "read_id string, seq string")
    rows = merge_read_pairs(r1, r2, min_overlap=10).collect()
    assert not any(r.merged for r in rows)
    # both mates pass through unmerged
    assert sorted(r.seq for r in rows) == sorted([r1_seq, r2_seq])


def test_merge_contigs_chain_no_duplicate_bases(spark):
    from reflexiv_spark.operators.merger import merge_contigs

    g = random_genome(600, seed=71)
    # A: [0,260), B: [200,460), C: [400,600) — chain A→B→C, 60 bp overlaps
    df = spark.createDataFrame(
        [("A", g[:260]), ("B", g[200:460]), ("C", g[400:])],
        "contig_id string, seq string",
    )
    # one round: B is consumed downstream of A, so it must NOT also head a
    # B→C merge — total bases stay 600 + len(C) (C untouched), not 880+
    one = merge_contigs(df, min_overlap=60, rounds=1, searchable_len=None).collect()
    total = sum(len(r.seq) for r in one)
    assert total == 460 + 200  # A+B (460) and untouched C (200)
    # enough rounds: the whole chain folds into the genome exactly once
    full = merge_contigs(df, min_overlap=60, rounds=3, searchable_len=None).collect()
    assert [r.seq for r in full] == [g]
    assert full[0].contig_id.count("B") == 1  # no 'A+B+B+C' id double-count


def test_count_kmers_packed_none_ceiling(spark):
    from reflexiv_spark.operators.counter import count_kmers
    from reflexiv_spark.operators.counter_packed import count_kmers_packed

    reads = spark.createDataFrame(
        [(r,) for r in simulate_reads(random_genome(300, seed=72), coverage=8, seed=73)],
        "seq string",
    )
    packed = count_kmers_packed(
        reads, 21, min_coverage=2, max_coverage=None
    ).collect()
    plain = count_kmers(reads, 21, min_coverage=2, max_coverage=None).collect()
    assert len(packed) > 0
    assert sorted((r.kmer, r["count"]) for r in packed) == sorted(
        (r.kmer, r["count"]) for r in plain
    )


def test_extend_votes_count_duplicate_reads(spark):
    from reflexiv_spark.operators.mapping import extend_contigs_with_reads

    g = random_genome(400, seed=74)
    contig = g[:300]
    # the extension evidence is ONE read repeated — with min_depth=2 it only
    # passes if multiplicity survives content-dedup (weight column)
    ext_read = g[280:340]
    reads = spark.createDataFrame(
        [(ext_read,), (ext_read,)], "seq string"
    )
    contigs = spark.createDataFrame([("c1", contig)], "contig_id string, seq string")
    out = extend_contigs_with_reads(
        contigs, reads, seed_k=20, min_depth=2
    ).collect()
    assert len(out) == 1
    assert out[0].seq == g[:340]  # right end grew by the read's overhang


def test_correct_reads_one_row_per_input_under_duplication(spark):
    from reflexiv_spark.operators.preprocess import correct_reads

    g = random_genome(200, seed=75)
    clean = simulate_reads(g, read_len=50, coverage=10, seed=76, rc_prob=0.0)
    # one read with a single-base error, duplicated 3× (below min_coverage
    # so its error k-mers stay weak): output must stay exactly one row per
    # input row — multiplicity restored by JOIN, not array_repeat — and
    # every copy gets the same correction
    orig = g[10:60]
    bad = ("T" if orig[0] != "T" else "A") + orig[1:]
    reads = spark.createDataFrame(
        [(r,) for r in clean] + [(bad,)] * 3, "seq string"
    )
    out = correct_reads(reads, k=21, min_coverage=4).collect()
    assert len(out) == len(clean) + 3
    assert sum(1 for r in out if r.seq == orig) >= 3


def test_rank_paths_drops_cycles_keeps_paths_and_threads_iterations(spark):
    from pyspark.sql import functions as F

    from reflexiv_spark.functions.kmer import kmer_array
    from reflexiv_spark.operators.extension import rank_paths

    k = 5
    # seeds chosen so line + wrapped-cycle k-mers form a fork-free graph
    # (every (k-1)-prefix/suffix key unique)
    line = random_genome(40, seed=37)
    circ = random_genome(12, seed=3)
    circ_wrapped = circ + circ[: k - 1]  # 12 k-mers forming a pure cycle
    rows = spark.createDataFrame(
        [(x,) for x in [line, circ_wrapped]], "seq string"
    ).select(F.explode(kmer_array(F.col("seq"), k)).alias("kmer"))
    counts = rows.groupBy("kmer").agg(
        F.count(F.lit(1)).cast("int").alias("count")
    )
    out = rank_paths(counts, k, max_rounds=40).collect()
    seqs = sorted(r.seq for r in out)
    # the anchored path assembles; the cycle (no in-degree-0 head, length
    # 12 — not a power of two) is dropped rather than spinning the loop
    assert seqs == [line]
    # max_rounds threads through: 1 doubling round reaches ancestors ≤ 2
    # hops away, so the 36-k-mer path cannot fully assemble
    short = rank_paths(counts, k, max_rounds=1).collect()
    assert max(len(r.seq) for r in short) < len(line)


def test_ivf_topk_excludes_zero_norm_centroids(spark):
    import numpy as np

    from reflexiv_spark.datapipe.similarity import ivf_topk

    rng = np.random.RandomState(79)
    rows = []
    # ids 1-2: all components quantize to 0 (floor(0.0004*1000) = 0) —
    # as centroids these must be excluded, not divided by
    for i in (1, 2):
        rows.append((i, [0.0004] * 16))
    for i in range(3, 23):
        rows.append((i, rng.randn(16).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ivf_topk(df, dim=16, k=2, n_centroids=3, n_probes=2).collect()
    assert out, "zero-norm centroids must not empty the result"
    assert all(r.score is not None and r.score == r.score for r in out)
    # queries were assigned via the surviving centroid(s) only
    assert {r.vec_id for r in out} >= set(range(3, 23))


# --- round 6 ---


def test_bpe_train_survives_exhausted_merges(spark):
    """n_merges beyond what the corpus supports must stop changing the
    vocabulary, not crossJoin it against a 0-row merge and wipe it."""
    from reflexiv_spark.datapipe.bpe import bpe_encode, bpe_train

    df = spark.createDataFrame(
        [(1, "ab ab ab")], "doc_id long, text string"
    )
    # "ab" supports exactly one merge (a+b); ask for ten
    merges, vocab = bpe_train(df, n_merges=10)
    mrows = merges.collect()
    assert len(mrows) == 1 and mrows[0].merged == "ab"
    vrows = vocab.collect()
    assert len(vrows) == 1 and vrows[0].syms == ["ab"]
    enc = bpe_encode(df, [(m.left, m.right) for m in mrows]).collect()
    assert enc[0].tokens == ["ab", "ab", "ab"]


def test_bpe_train_zero_possible_merges(spark):
    from reflexiv_spark.datapipe.bpe import bpe_train

    # single-symbol words: no adjacent pair exists at all
    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    merges, vocab = bpe_train(df, n_merges=3)
    assert merges.count() == 0
    assert {tuple(r.syms) for r in vocab.collect()} == {("a",), ("b",)}


def test_asof_null_payload_comes_from_matched_row(spark):
    """A matched right row whose payload is NULL must yield NULL — not a
    stale earlier row's value — and the tolerance check must measure
    freshness against the row that supplies the payload."""
    from reflexiv_spark.operators.temporal import asof_join

    right = spark.createDataFrame(
        [("u", 1, 10), ("u", 5, None)],
        "user_id string, ts long, value int",
    )
    left = spark.createDataFrame(
        [("u", 6, "e1")], "user_id string, ts long, event string"
    )
    out = asof_join(left, right, on="user_id").collect()
    assert len(out) == 1 and out[0].value_right is None
    # with tolerance 3: the matched row is ts=5 (fresh, NULL payload) —
    # NOT ts=1 with a fresh-looking NULL-skipping fallback
    out_tol = asof_join(
        left, right, on="user_id", tolerance_s=3
    ).collect()
    assert len(out_tol) == 1 and out_tol[0].value_right is None
    # sanity: a non-null matched payload still carries through
    left2 = spark.createDataFrame(
        [("u", 2, "e2")], "user_id string, ts long, event string"
    )
    out2 = asof_join(left2, right, on="user_id").collect()
    assert out2[0].value_right == 10


def test_kmv_distinct_by_preserves_group_type(spark):
    from reflexiv_spark.datapipe.sketch import kmv_distinct_by

    rows = [(uid, f"item-{uid}-{i}") for uid in (100, 200) for i in range(50)]
    df = spark.createDataFrame(rows, "user_id long, item string")
    out = kmv_distinct_by(df, "item", "user_id", k=16)
    assert dict(out.dtypes)["user_id"] == "bigint"
    got = {r.user_id: r.est_ndv for r in out.collect()}
    assert set(got) == {100, 200}
    for est in got.values():
        assert 30 <= est <= 80  # KMV tolerance at k=16, true NDV 50


def test_keep_best_unscored_docs_still_compete(spark):
    from reflexiv_spark.datapipe.cluster import keep_best_per_cluster

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 7)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id1 long, id2 long"
    )
    # cluster {1,2,3}: only 2 is scored -> 2 must win, 1 and 3 must lose
    # cluster {4,5}: nobody scored -> smallest id survives
    score = spark.createDataFrame([(2, 0.9)], "doc_id long, quality double")
    kept = {
        r.doc_id
        for r in keep_best_per_cluster(docs, pairs, score).collect()
    }
    assert kept == {2, 4, 6}


def test_ivf_refine_branch_all_zero_vectors(spark):
    from reflexiv_spark.datapipe.similarity import ivf_topk

    df = spark.createDataFrame(
        [(i, [0.0] * 8) for i in range(1, 9)],
        "vec_id long, embedding array<double>",
    )
    # refine branch (kmeans centroids all zero-norm) must not raise —
    # it degrades to an empty result like the sampled branch
    out = ivf_topk(
        df, dim=8, k=2, n_centroids=2, n_probes=2, refine_iters=1
    ).collect()
    assert out == []


def test_bpe_train_sampled_mode_matches_exact_on_sample(spark):
    """sample=r must equal exact training run on the same hash-sampled
    subset (same algorithm, same tie-breaks) — the production
    train-on-sample / encode-everywhere split."""
    from reflexiv_spark.datapipe.bpe import bpe_encode, bpe_train
    from reflexiv_spark.datapipe.sampling import hash_sample

    rows = [
        (i, "the quick brown fox " * (1 + i % 3) + "jumps over lazy dogs")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges_s, _ = bpe_train(df, n_merges=5, sample=0.5, sample_salt="t")
    sub = hash_sample(df, 0.5, id_col="doc_id", salt="t")
    assert 0 < sub.count() < 40
    merges_e, _ = bpe_train(sub, n_merges=5)
    got = [(r.step, r.left, r.right) for r in merges_s.collect()]
    want = [(r.step, r.left, r.right) for r in merges_e.collect()]
    assert got == want and len(got) == 5
    # and the learned rules encode the FULL corpus
    pairs = [(r.left, r.right) for r in sorted(merges_s.collect(), key=lambda r: r.step)]
    enc = bpe_encode(df, pairs)
    assert enc.count() == 40


def test_stratified_split_bin_is_exact_integer_division(spark):
    """Regression: the histogram bin used `(h / shift).cast('long')`,
    which divides in DOUBLES — a 60-bit hash exceeds the 53-bit
    mantissa, so hashes within ~128 below a bin boundary rounded UP
    into the wrong bin, breaking the '(bin, h, id) orders like (h, id)'
    invariant stratified_split's ranking rests on. The bin must equal
    exact integer division for every 60-bit value."""
    from pyspark.sql import functions as F

    shift = (1 << 60) // 65536
    crafted = [
        65535 * shift - 1,   # the reproduction: double-rounds to bin 65535
        65535 * shift,       # exact boundary
        (1 << 60) - 1,
        12345 * shift - 77,
        0,
        1,
    ]
    df = spark.createDataFrame([(h,) for h in crafted], "h long")
    old = {  # what the buggy expression computes
        r["h"]: r["b"]
        for r in df.select("h", (F.col("h") / F.lit(shift)).cast("long").alias("b")).collect()
    }
    new = {
        r["h"]: r["b"]
        for r in df.select("h", F.shiftright(F.col("h"), 44).alias("b")).collect()
    }
    for h in crafted:
        assert new[h] == h // shift, f"shiftright wrong for {h}"
    assert old[65535 * shift - 1] == 65535  # documents the old bug
    assert new[65535 * shift - 1] == 65534  # exact


def test_fasta_wrap_separator_before_trailing_newline(spark):
    """Regression: the wrap regex used (?!$), but Java's $ also matches
    BEFORE a final line terminator, so a doc whose 100-char boundary is
    followed only by a trailing newline lost its separator and diverged
    from the chunk-and-join oracle. (?=.) with DOTALL inserts the
    separator iff any character follows — chunk-join semantics."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a" * 100 + "\n")], "doc_id long, text string")
    got = df.select(
        F.regexp_replace("text", r"(?s)(.{100})(?=.)", "$1\n").alias("w")
    ).collect()[0]["w"]
    assert got == "a" * 100 + "\n" + "\n"  # separator + the content newline


def test_stratified_split_rejects_bad_fractions(spark):
    """ADVICE r6: fractions not summing to 1 must raise, not silently
    dump the remainder into the last split."""
    import pytest as _pytest

    from reflexiv_spark.datapipe.sampling import stratified_split

    df = spark.createDataFrame(
        [(1, "en"), (2, "en")], "doc_id long, lang string"
    )
    with _pytest.raises(ValueError, match="sum to 1"):
        stratified_split(df, fractions=(("train", 0.5), ("val", 0.1)))
    with _pytest.raises(ValueError, match=">= 0"):
        stratified_split(df, fractions=(("train", 1.5), ("val", -0.5)))
    with _pytest.raises(ValueError, match="non-empty"):
        stratified_split(df, fractions=())
    # the canonical 0.8/0.1/0.1 (float sum 0.9999999999999999) still OK
    stratified_split(df)


def test_del1_empty_string_yields_empty_array(spark):
    """ADVICE r10: sequence(1, 0) is the DESCENDING [1, 0], so an
    unguarded _del1('') returned ['', ''] — masked by downstream
    array_distinct but wrong as a stated contract. The guard makes the
    docstring true: empty string -> empty array, and the depth-0 string
    itself is still the only variant of ''."""
    from pyspark.sql import functions as F

    from reflexiv_spark.datapipe.editdist import (
        _del1,
        deletion_neighborhood,
    )

    df = spark.createDataFrame([("",), ("ab",)], "s string")
    got = {
        r.s: (r.d, r.n)
        for r in df.select(
            "s",
            _del1(F.col("s")).alias("d"),
            deletion_neighborhood(F.col("s"), 2).alias("n"),
        ).collect()
    }
    assert got[""] == ([], [""])
    assert sorted(got["ab"][0]) == ["a", "b"]
    assert sorted(got["ab"][1]) == ["", "a", "ab", "b"]


def test_gopher_symbol_ratios_are_separate(spark):
    """ADVICE r10: Rae et al. App. A states the hash and ellipsis 0.1
    thresholds SEPARATELY; the old code tested the sum (strictly
    stricter). A doc with hash ratio 1/15 and ellipsis ratio 1/15 —
    each under 0.1, sum over — must now keep."""
    from reflexiv_spark.datapipe.filters import gopher_rules

    text = (
        "the quick brown fox jumps over that lazy dog with plenty "
        "and more of words # and ... also"
    )  # 19 words, 1 hash, 1 ellipsis, no ellipsis-ending line
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = gopher_rules(df, min_words=10, min_stop_hits=2).head()
    assert r.n_hash == 1 and r.n_ellipsis == 1
    assert 10 * (r.n_hash + r.n_ellipsis) > r.n_words  # old rule rejected
    assert r.keep is True
