"""Regression tests for the round-2 ADVICE findings.

1. merge_read_pairs must not accept overlaps shorter than min_overlap when
   one mate is shorter than min_overlap (descending F.sequence range).
2. merge_contigs must not emit a contig's bases into two merged outputs in
   one round (chain A→B→C double-consumption).
3. count_kmers_packed(max_coverage=None) means "no ceiling", matching
   count_kmers — not an empty result.
4. extend_contigs_with_reads vote depth must count read multiplicity even
   though reads are content-deduplicated (deterministic xxhash64 ids).
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
