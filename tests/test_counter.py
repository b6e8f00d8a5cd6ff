"""Counter operator vs dict-count oracle (SURVEY.md §5 item 2)."""

from reflexiv_spark.operators.counter import count_kmers
from tests.conftest import brute_force_kmer_counts, random_genome, simulate_reads


def test_count_kmers_matches_dict_oracle(spark):
    genome = random_genome(2000, seed=42)
    reads = simulate_reads(genome, read_len=100, coverage=10, seed=42)
    df = spark.createDataFrame([(r,) for r in reads], ["seq"])
    got = {
        r["kmer"]: r["count"]
        for r in count_kmers(df, 31, min_coverage=1, max_coverage=None).collect()
    }
    assert got == brute_force_kmer_counts(reads, 31)


def test_coverage_filters(spark):
    genome = random_genome(2000, seed=1)
    reads = simulate_reads(genome, read_len=100, coverage=8, seed=1)
    df = spark.createDataFrame([(r,) for r in reads], ["seq"])
    got = {
        r["kmer"]: r["count"]
        for r in count_kmers(df, 21, min_coverage=3, max_coverage=10).collect()
    }
    want = {
        k: v
        for k, v in brute_force_kmer_counts(reads, 21).items()
        if 3 <= v <= 10
    }
    assert got == want


def test_clipping(spark):
    reads = ["ACGTACGTACGTACGTACGT"]
    df = spark.createDataFrame([(r,) for r in reads], ["seq"])
    got = {
        r["kmer"]: r["count"]
        for r in count_kmers(
            df, 5, min_coverage=1, max_coverage=None, front_clip=2, end_clip=3
        ).collect()
    }
    want = brute_force_kmer_counts([reads[0][2:-3]], 5)
    assert got == want
