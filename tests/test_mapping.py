"""X2/J6 mapping stage: seed mapper, SAM parse, consensus end extension."""

from __future__ import annotations

import pytest

from tests.conftest import random_genome, revcomp


def test_seed_map_reads_contained_offsets(spark):
    from reflexiv_spark.operators.mapping import seed_map_reads

    g = random_genome(400, seed=61)
    targets = spark.createDataFrame([("t1", g)], "target_id string, seq string")
    reads = spark.createDataFrame(
        [("r0", g[0:50]), ("r1", g[100:160]), ("r2", g[350:400]), ("alien", "ACGT" * 15)],
        "read_id string, seq string",
    )
    out = {(r.read_id, r.target_id): r.offset for r in
           seed_map_reads(reads, targets, seed_k=21).collect()}
    assert out[("r0", "t1")] == 1
    assert out[("r1", "t1")] == 101
    assert out[("r2", "t1")] == 351
    assert ("alien", "t1") not in out


def test_seed_map_reads_finds_every_occurrence(spark):
    from reflexiv_spark.operators.mapping import seed_map_reads

    core = random_genome(30, seed=62)
    t = core + random_genome(40, seed=63) + core  # two occurrences
    targets = spark.createDataFrame([("t", t)], "target_id string, seq string")
    reads = spark.createDataFrame([("r", core)], "read_id string, seq string")
    offs = sorted(
        r.offset for r in seed_map_reads(reads, targets, seed_k=15).collect()
    )
    assert offs == [1, 71]


def test_seed_map_reads_overhang_mode(spark):
    from reflexiv_spark.operators.mapping import seed_map_reads

    g = random_genome(200, seed=64)
    # target = prefix; read overhangs the right end by 30
    targets = spark.createDataFrame([("t", g[:150])], "target_id string, seq string")
    reads = spark.createDataFrame([("r", g[120:180])], "read_id string, seq string")
    contained = seed_map_reads(reads, targets, seed_k=21, contained_only=True).collect()
    assert contained == []
    over = seed_map_reads(reads, targets, seed_k=21, contained_only=False).collect()
    assert [(r.read_id, r.offset) for r in over] == [("r", 121)]


def test_sam_to_rows(spark):
    from reflexiv_spark.operators.mapping import sam_to_rows

    lines = [
        ("@SQ\tSN:c1\tLN:1000",),
        ("r1\t0\tc1\t42\t60\t50M\t*\t0\t0\tACGTACGT\tFFFFFFFF",),
        ("r2\t4\t*\t0\t0\t*\t*\t0\t0\tTTTT\tFFFF",),
    ]
    df = spark.createDataFrame(lines, "value string")
    rows = sam_to_rows(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.qname, r.flag, r.rname, r.pos, r.mapq, r.cigar, r.seq) == (
        "r1", 0, "c1", 42, 60, "50M", "ACGTACGT"
    )


def test_pipe_minimap2_gated_without_binary(spark):
    from reflexiv_spark.operators.mapping import pipe_minimap2

    reads = spark.createDataFrame([("r", "ACGT")], "read_id string, seq string")
    with pytest.raises(RuntimeError, match="seed_map_reads"):
        pipe_minimap2(reads, "/nonexistent.mmi", minimap2_bin="definitely-not-on-path")


def test_extend_contigs_with_reads_recovers_both_ends(spark):
    from reflexiv_spark.operators.mapping import extend_contigs_with_reads

    g = random_genome(1200, seed=65)
    contig = g[200:1000]  # truncated by 200 on each side
    contigs = spark.createDataFrame(
        [("c1", contig)], "contig_id string, seq string"
    )
    # perfect tiling reads, both strands, heavy coverage
    reads = []
    for start in range(0, len(g) - 120 + 1, 7):
        r = g[start:start + 120]
        reads.append((r,))
        reads.append((revcomp(r),))
    reads_df = spark.createDataFrame(reads, "seq string")
    out = extend_contigs_with_reads(
        contigs, reads_df, seed_k=21, min_depth=2, searchable_len=300
    ).collect()
    assert len(out) == 1
    seq = out[0].seq
    assert contig in seq
    assert seq in g  # every extended base is genuine genome sequence
    # reads are 120bp with a 21bp anchor: up to ~99 recoverable per side
    left_gain = seq.index(contig[:50]) if contig[:50] in seq else 0
    right_gain = len(seq) - left_gain - len(contig)
    assert left_gain >= 60, left_gain
    assert right_gain >= 60, right_gain


def test_extend_contigs_untouched_when_no_overhangs(spark):
    from reflexiv_spark.operators.mapping import extend_contigs_with_reads

    g = random_genome(500, seed=66)
    contigs = spark.createDataFrame([("c", g)], "contig_id string, seq string")
    # reads strictly inside the contig: nothing to extend
    reads = spark.createDataFrame(
        [(g[50:150],), (g[200:320],)], "seq string"
    )
    out = extend_contigs_with_reads(contigs, reads, seed_k=21).collect()
    assert [(r.contig_id, r.seq) for r in out] == [("c", g)]
