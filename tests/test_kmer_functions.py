"""Kernel unit tests vs brute-force python strings (SURVEY.md §5 item 1)."""

from pyspark.sql import functions as F

from reflexiv_spark.functions.kmer import (
    canonical_kmer,
    explode_kmers,
    kmer_array,
    prefix_subkmer,
    reverse_complement,
    suffix_subkmer,
)
from tests.conftest import brute_force_kmer_counts, random_genome, revcomp


def test_reverse_complement(spark):
    cases = ["ACGT", "AAAA", "GATTACA", "ACGTN", "A"]
    df = spark.createDataFrame([(c,) for c in cases], ["seq"])
    got = [r[0] for r in df.select(reverse_complement("seq")).collect()]

    def rc(s):  # brute force; N maps to itself
        return s[::-1].translate(str.maketrans("ACGTacgt", "TGCAtgca"))

    assert got == [rc(c) for c in cases]


def test_canonical_kmer(spark):
    cases = ["ACGT", "TTTT", "GATTACA", "CCCG"]
    df = spark.createDataFrame([(c,) for c in cases], ["kmer"])
    got = [r[0] for r in df.select(canonical_kmer("kmer")).collect()]
    assert got == [min(c, revcomp(c)) for c in cases]


def test_kmer_array_window(spark):
    df = spark.createDataFrame([("ACGTAC",)], ["seq"])
    got = df.select(kmer_array("seq", 3).alias("a")).collect()[0]["a"]
    assert got == ["ACG", "CGT", "GTA", "TAC"]


def test_subkmer_extraction(spark):
    df = spark.createDataFrame([("ACGTA",)], ["kmer"])
    row = df.select(
        prefix_subkmer("kmer", 5).alias("p"),
        suffix_subkmer("kmer", 5).alias("s"),
        prefix_subkmer("kmer").alias("pv"),
        suffix_subkmer("kmer").alias("sv"),
    ).collect()[0]
    assert row["p"] == "ACGT"
    assert row["s"] == "CGTA"
    assert row["pv"] == "ACGT"
    assert row["sv"] == "CGTA"


def test_explode_kmers_matches_brute_force(spark):
    g = random_genome(500, seed=7)
    seqs = [g[i : i + 60] for i in range(0, 440, 37)] + ["ACGTNNACGTACGTACG"]
    df = spark.createDataFrame([(s,) for s in seqs], ["seq"])
    got = (
        explode_kmers(df, 15)
        .groupBy("kmer")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = brute_force_kmer_counts(seqs, 15)
    assert {r["kmer"]: r["n"] for r in got} == want


def test_explode_kmers_rides_int_position_explode(spark):
    """r13 plan guard: the sliding window explodes position INTS and
    slices in the fused projection — it must not regress to exploding a
    materialized array of k-char substrings (a per-row allocation of
    L-k+1 strings, measured 40% slower on the isolated window)."""
    df = spark.createDataFrame([("ACGTACGTACGTACGT",)], ["seq"])
    plan = (
        explode_kmers(df, 15)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "explode(sequence(" in plan
    # the substring lambda must not sit under the generator
    gen_line = next(l for l in plan.splitlines() if "Generate" in l)
    assert "lambdafunction" not in gen_line
    assert "substr" not in gen_line
