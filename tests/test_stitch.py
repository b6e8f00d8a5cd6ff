"""Stitch pipeline: bridge contigs across coverage gaps via read evidence."""

from __future__ import annotations

from tests.conftest import random_genome, revcomp


def _reads_df(spark, genome, read_len=150, step=3):
    rows = []
    for s in range(0, len(genome) - read_len + 1, step):
        rows.append((genome[s:s + read_len],))
    return spark.createDataFrame(rows, "seq string")


def test_stitch_bridges_gap(spark):
    from reflexiv_spark.pipelines.stitch import stitch_contigs

    g = random_genome(1700, seed=71)
    a, b = g[0:800], g[880:1700]  # 80bp coverage gap between contigs
    contigs = spark.createDataFrame(
        [("A", a), ("B", b)], "contig_id string, seq string"
    )
    out = stitch_contigs(_reads_df(spark, g), contigs, ks=(31,)).collect()
    assert len(out) == 1
    seq = out[0].seq
    assert seq == g or revcomp(seq) == g


def test_stitch_handles_rc_contig(spark):
    from reflexiv_spark.pipelines.stitch import stitch_contigs

    g = random_genome(1600, seed=72)
    a, b = g[0:750], revcomp(g[820:1600])  # B stored reverse-complemented
    contigs = spark.createDataFrame(
        [("A", a), ("B", b)], "contig_id string, seq string"
    )
    out = stitch_contigs(_reads_df(spark, g), contigs, ks=(31,)).collect()
    assert len(out) == 1
    seq = out[0].seq
    assert seq == g or revcomp(seq) == g


def test_stitch_overlapping_contigs(spark):
    from reflexiv_spark.pipelines.stitch import stitch_contigs

    g = random_genome(1500, seed=73)
    a, b = g[0:780], g[770:1500]  # 10bp overlap: d < k path
    contigs = spark.createDataFrame(
        [("A", a), ("B", b)], "contig_id string, seq string"
    )
    out = stitch_contigs(_reads_df(spark, g), contigs, ks=(31,)).collect()
    assert len(out) == 1
    seq = out[0].seq
    assert seq == g or revcomp(seq) == g


def test_stitch_leaves_unrelated_contigs_alone(spark):
    from reflexiv_spark.pipelines.stitch import stitch_contigs

    g1 = random_genome(900, seed=74)
    g2 = random_genome(900, seed=75)
    contigs = spark.createDataFrame(
        [("X", g1), ("Y", g2)], "contig_id string, seq string"
    )
    # reads only from g1's interior: no read carries X's end AND Y's start
    reads = _reads_df(spark, g1[100:700])
    out = {r.contig_id: r.seq for r in
           stitch_contigs(reads, contigs, ks=(31,)).collect()}
    assert out == {"X": g1, "Y": g2}
