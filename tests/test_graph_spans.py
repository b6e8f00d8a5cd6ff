"""Round-6 additions: duplicate n-gram spans, span removal, PageRank,
vocabulary coverage, event transitions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reflexiv_spark.datapipe.dedup import (
    drop_duplicate_spans,
    duplicate_ngram_spans,
)
from reflexiv_spark.datapipe.graph import pagerank
from reflexiv_spark.datapipe.text import vocab_coverage


@pytest.fixture(scope="module")
def docs(spark):
    # doc 1 and 2 share an 8+-token run; doc 3 is unique; doc 4 repeats
    # an 8-gram internally (self-duplication also counts).
    shared = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, f"intro words here {shared} and a unique tail one"),
        (2, f"other opening {shared} different ending text two"),
        (3, "entirely unique document with no repeated phrases at all ok"),
        (4, " ".join(["alpha beta gamma delta epsilon zeta eta theta"] * 2)),
        (5, "short doc"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


class TestDuplicateNgramSpans:
    def test_marks_shared_runs(self, docs):
        out = _rows(duplicate_ngram_spans(docs, n=8))
        assert set(out) == {1, 2, 3, 4, 5}
        # docs 1 and 2 share a 10-token run -> three 8-grams, one merged
        # span covering 10 tokens each
        for d in (1, 2):
            assert out[d]["dup_ngrams"] == 3
            assert out[d]["dup_spans"] == 1
            assert out[d]["dup_tokens"] == 10
        assert out[3]["dup_tokens"] == 0 and out[3]["dup_spans"] == 0
        # doc 4: 16 tokens, period 8 -> every 8-gram repeats corpus-wide
        # (positions 0 and 8 are equal), one span covering all 16
        assert out[4]["dup_tokens"] == 16
        assert out[4]["dup_spans"] == 1
        # under-n docs survive with zeros
        assert out[5]["n_tokens"] == 2 and out[5]["dup_tokens"] == 0

    def test_frac_and_family_agreement(self, docs):
        a = _rows(duplicate_ngram_spans(docs, n=8, hash_family="xxhash64"))
        b = _rows(duplicate_ngram_spans(docs, n=8, hash_family="md5"))
        assert a == b
        for d, r in a.items():
            assert r["dup_frac"] == round(r["dup_tokens"] / max(r["n_tokens"], 1), 6)


class TestDropDuplicateSpans:
    def test_removes_marked_tokens_in_order(self, docs):
        out = _rows(drop_duplicate_spans(docs, n=8))
        assert out[1]["cleaned"] == "intro words here and a unique tail one"
        assert out[1]["n_tokens_kept"] == 8
        assert out[1]["n_tokens_dropped"] == 10
        assert out[3]["n_tokens_dropped"] == 0
        assert out[4]["cleaned"] == ""
        assert out[5]["cleaned"] == "short doc"

    def test_consistent_with_span_stats(self, docs):
        stats = _rows(duplicate_ngram_spans(docs, n=8))
        dropped = _rows(drop_duplicate_spans(docs, n=8))
        for d in stats:
            assert dropped[d]["n_tokens_dropped"] == stats[d]["dup_tokens"]


class TestPagerank:
    def test_star_graph_ranks_center_highest(self, spark):
        edges = spark.createDataFrame(
            [(i, 0) for i in range(1, 6)] + [(0, 9)], ["src", "dst"]
        )
        r = {row["node"]: row["rank"] for row in pagerank(edges, iters=3).collect()}
        assert set(r) == {0, 1, 2, 3, 4, 5, 9}
        # closed-form fixed point: rank(0) = 0.15 + 0.85 * 5 * 0.15,
        # rank(9) = 0.15 + 0.85 * rank(0) — 9 inherits the hub's mass
        assert r[0] == pytest.approx(0.7875)
        assert r[9] == pytest.approx(0.15 + 0.85 * 0.7875)
        # source-only nodes never receive mass: rank = teleport only
        for leaf in (1, 2, 3, 4, 5):
            assert r[leaf] == pytest.approx(0.15)

    def test_two_cycle_fixed_point(self, spark):
        # a <-> b is symmetric: every iteration keeps rank 1.0 exactly
        edges = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
        r = {row["node"]: row["rank"] for row in pagerank(edges, iters=4).collect()}
        assert r == {1: pytest.approx(1.0), 2: pytest.approx(1.0)}

    def test_multi_edges_collapse(self, spark):
        once = spark.createDataFrame([(1, 2), (1, 3)], ["src", "dst"])
        thrice = spark.createDataFrame(
            [(1, 2), (1, 2), (1, 2), (1, 3)], ["src", "dst"]
        )
        a = sorted(pagerank(once, iters=2).collect())
        b = sorted(pagerank(thrice, iters=2).collect())
        assert a == b


class TestVocabCoverage:
    def test_oov_rates(self, spark):
        df = spark.createDataFrame(
            [
                (1, "aa aa aa bb"),
                (2, "aa bb cc"),
                (3, "zz qq"),
                (4, None),
            ],
            ["doc_id", "text"],
        )
        out = _rows(vocab_coverage(df, vocab_size=2))
        # vocab = {aa (4), bb (2)}; cc/zz/qq are OOV
        assert out[1]["oov_tokens"] == 0
        assert out[2]["oov_tokens"] == 1
        assert out[3]["oov_tokens"] == 2 and out[3]["oov_frac"] == 1.0
        assert out[4]["n_tokens"] == 0 and out[4]["oov_frac"] == 0.0

    def test_boundary_tie_is_deterministic(self, spark):
        # b and c tie at count 1; token-asc keeps b in a size-2 vocab
        df = spark.createDataFrame([(1, "a a c b")], ["doc_id", "text"])
        out = _rows(vocab_coverage(df, vocab_size=2))
        assert out[1]["oov_tokens"] == 1


class TestEventTransitions:
    def test_pairs_and_probs(self, spark):
        import __spark_entry__ as entry

        df = entry.q_event_transitions(spark, "/root/testdata/sf0.001")
        rows = df.collect()
        assert rows
        by_src = {}
        for r in rows:
            by_src.setdefault(r["from_type"], []).append(r["p"])
        for ps in by_src.values():
            assert sum(ps) == pytest.approx(1.0, abs=1e-4)


class TestStratifiedSplit:
    def test_exact_proportions_and_determinism(self, spark):
        from reflexiv_spark.datapipe.sampling import stratified_split

        rows = [(i, "en" if i < 60 else "de") for i in range(100)]
        df = spark.createDataFrame(rows, ["doc_id", "lang"])
        out = stratified_split(df, hash_family="md5").collect()
        by = {}
        for r in out:
            by.setdefault((r["lang"], r["split"]), set()).add(r["doc_id"])
        assert len({(k[0], d) for k, v in by.items() for d in v}) == 100
        # en: n=60 -> 48/6/6; de: n=40 -> 32/4/4
        assert len(by[("en", "train")]) == 48
        assert len(by[("en", "val")]) == 6
        assert len(by[("en", "test")]) == 6
        assert len(by[("de", "train")]) == 32
        assert len(by[("de", "val")]) == 4
        assert len(by[("de", "test")]) == 4
        # re-layout stability: same assignment from a repartitioned input
        out2 = stratified_split(df.repartition(7), hash_family="md5").collect()
        assert {(r["doc_id"], r["split"]) for r in out2} == {
            (r["doc_id"], r["split"]) for r in out
        }

    def test_histogram_rank_equals_plain_window_rank(self, spark):
        """The prefix-bin + within-bin-rank formulation must equal the
        naive stratum-wide window rank (the oracle's form)."""
        from pyspark.sql import Window

        from reflexiv_spark.datapipe.dedup import md5_long
        from reflexiv_spark.datapipe.sampling import stratified_split

        rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
        df = spark.createDataFrame(rows, ["doc_id", "lang"])
        ours = {
            r["doc_id"]: r["split"]
            for r in stratified_split(df, hash_family="md5", n_bins=8).collect()
        }
        h = F.pmod(
            md5_long(F.concat(F.col("doc_id").cast("string"), F.lit("|split"))),
            F.lit(1 << 60),
        )
        w = Window.partitionBy("lang").orderBy("h", "doc_id")
        naive = (
            df.withColumn("h", h)
            .withColumn("rn", F.row_number().over(w))
            .withColumn("n", F.count("*").over(Window.partitionBy("lang")))
            .withColumn(
                "split",
                F.when(F.col("rn") <= F.floor(F.lit(0.8) * F.col("n")), "train")
                .when(F.col("rn") <= F.floor(F.lit(0.9) * F.col("n")), "val")
                .otherwise("test"),
            )
            .collect()
        )
        assert ours == {r["doc_id"]: r["split"] for r in naive}


class TestBigramLogprob:
    def test_model_math(self, spark):
        import math

        from reflexiv_spark.datapipe.text import bigram_logprob_score

        # corpus: "a b" x2 and "a c"; V=3; C(a)=3, C(a b)=2, C(a c)=1
        df = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "a c"), (4, "solo")],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r for r in bigram_logprob_score(df).collect()}
        # V = 4 tokens: a, b, c, solo
        exp_ab = round(math.log10((2 + 1) / (3 + 4)), 6)
        exp_ac = round(math.log10((1 + 1) / (3 + 4)), 6)
        assert out[1]["avg_logprob"] == exp_ab
        assert out[2]["avg_logprob"] == exp_ab
        assert out[3]["avg_logprob"] == exp_ac
        assert out[3]["avg_logprob"] < out[1]["avg_logprob"]
        assert out[4]["n_bigrams"] == 0 and out[4]["avg_logprob"] == 0.0

    def test_word_order_sensitivity(self, spark):
        """A scrambled twin of a repeated fluent sentence scores lower —
        the property the unigram scorer cannot see."""
        from reflexiv_spark.datapipe.text import bigram_logprob_score

        fluent = "the cat sat on the mat"
        rows = [(i, fluent) for i in range(5)] + [(99, "mat the on sat cat the")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r["avg_logprob"] for r in bigram_logprob_score(df).collect()}
        assert out[99] < out[0]


class TestTriangleCount:
    def test_k4_every_node_in_three(self, spark):
        from reflexiv_spark.datapipe.graph import triangle_count

        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        out = {
            r["node"]: r["triangles"]
            for r in triangle_count(spark.createDataFrame(k4, ["src", "dst"])).collect()
        }
        assert out == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_square_has_none(self, spark):
        from reflexiv_spark.datapipe.graph import triangle_count

        c4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
        out = triangle_count(spark.createDataFrame(c4, ["src", "dst"])).collect()
        assert all(r["triangles"] == 0 for r in out) and len(out) == 4

    def test_direction_multiplicity_and_loops_collapse(self, spark):
        from reflexiv_spark.datapipe.graph import triangle_count

        messy = [(0, 1), (1, 0), (1, 2), (1, 2), (2, 0), (2, 2)]
        out = {
            r["node"]: r["triangles"]
            for r in triangle_count(spark.createDataFrame(messy, ["src", "dst"])).collect()
        }
        assert out == {0: 1, 1: 1, 2: 1}
