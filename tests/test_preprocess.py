"""Paired-read merging and error-correction tests (planted truth)."""

from __future__ import annotations

from tests.conftest import random_genome, revcomp, simulate_reads


def test_merge_read_pairs_exact_overlap(spark):
    from reflexiv_spark.operators.preprocess import merge_read_pairs

    frag = random_genome(150, seed=41)
    r1 = spark.createDataFrame(
        [("p1/1", frag[:100]), ("p2/1", random_genome(90, seed=42))],
        "read_id string, seq string",
    )
    r2 = spark.createDataFrame(
        [("p1/2", revcomp(frag[50:150])), ("p2/2", random_genome(90, seed=43))],
        "read_id string, seq string",
    )
    rows = merge_read_pairs(r1, r2, min_overlap=20).collect()
    by_pid = {}
    for r in rows:
        by_pid.setdefault(r.read_id, []).append(r)
    # p1: overlap 50 → single merged fragment reconstructs frag
    p1 = by_pid["p1"]
    assert len(p1) == 1 and p1[0].merged and p1[0].seq == frag
    # p2: no overlap → both mates pass through unmerged
    p2 = by_pid["p2"]
    assert len(p2) == 2 and not any(r.merged for r in p2)


def test_merge_handles_unpaired_reads(spark):
    from reflexiv_spark.operators.preprocess import merge_read_pairs

    r1 = spark.createDataFrame([("a/1", "ACGTACGTACGTACGTACGT")], "read_id string, seq string")
    r2 = spark.createDataFrame([("b/2", "TTTTACGTACGTACGTACGT")], "read_id string, seq string")
    rows = merge_read_pairs(r1, r2, min_overlap=10).collect()
    assert {r.read_id for r in rows} == {"a", "b"}
    assert not any(r.merged for r in rows)


def test_correct_reads_fixes_single_error(spark):
    from reflexiv_spark.operators.preprocess import correct_reads

    genome = random_genome(600, seed=44)
    good = simulate_reads(genome, read_len=100, coverage=12, seed=45, rc_prob=0)
    # plant one read with a single substitution at position 50 (0-based)
    true_read = genome[200:300]
    err = list(true_read)
    err[50] = {"A": "C", "C": "G", "G": "T", "T": "A"}[err[50]]
    bad_read = "".join(err)
    reads = spark.createDataFrame(
        [(r,) for r in good] + [(bad_read,)], "seq string"
    )
    out = [r.seq for r in correct_reads(reads, k=21, min_coverage=2).collect()]
    assert len(out) == len(good) + 1
    assert bad_read not in out  # the error was repaired
    assert out.count(true_read) == good.count(true_read) + 1


def test_correct_reads_leaves_clean_reads_alone(spark):
    from reflexiv_spark.operators.preprocess import correct_reads

    genome = random_genome(400, seed=46)
    good = simulate_reads(genome, read_len=80, coverage=10, seed=47, rc_prob=0)
    reads = spark.createDataFrame([(r,) for r in good], "seq string")
    out = sorted(r.seq for r in correct_reads(reads, k=21).collect())
    assert out == sorted(good)
