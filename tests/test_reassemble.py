"""Reassembler (S7/J8) + counter F4/F7/F8 parity tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import brute_force_kmer_counts, random_genome, revcomp, simulate_reads


def test_reassemble_extends_fragment_both_ends(spark):
    from reflexiv_spark.pipelines.reassemble import reassemble

    genome = random_genome(3000, seed=51)
    reads = simulate_reads(genome, read_len=100, coverage=15, seed=52)
    reads_df = spark.createDataFrame([(r,) for r in reads], "seq string")
    # fragment = middle slice of the genome
    frag = genome[1400:1700]
    frag_df = spark.createDataFrame([("f1", frag)], "frag_id string, seq string")
    out = reassemble(reads_df, frag_df, k=31, min_overlap=31).collect()
    assert len(out) == 1
    seq = out[0].seq
    assert frag in seq  # adopted contig is oriented to match the fragment
    assert len(seq) > 2 * len(frag)  # extended well beyond the fragment
    assert seq in genome or revcomp(seq) in genome  # genuine genome sequence


def test_reassemble_untouched_fragment_passes_through(spark):
    from reflexiv_spark.pipelines.reassemble import reassemble

    genome = random_genome(1500, seed=53)
    reads = simulate_reads(genome, read_len=100, coverage=15, seed=54)
    reads_df = spark.createDataFrame([(r,) for r in reads], "seq string")
    alien = random_genome(200, seed=99)  # unrelated to the reads
    frag_df = spark.createDataFrame([("f2", alien)], "frag_id string, seq string")
    out = reassemble(reads_df, frag_df, k=31).collect()
    assert [(r.frag_id, r.seq) for r in out] == [("f2", alien)]


def test_counter_f4_f8_guards(spark):
    from reflexiv_spark.operators.counter import count_kmers

    rows = [("A" * 30 + "CGT" * 10,), (random_genome(700, seed=55),)]
    df = spark.createDataFrame(rows, "seq string")
    # F4: max_read_length drops the 700bp read entirely
    counts = count_kmers(df, 21, min_coverage=1, max_read_length=600)
    expected = brute_force_kmer_counts([rows[0][0]], 21)
    got = {r.kmer: r["count"] for r in counts.collect()}
    assert got == expected
    # F8: read_limit keeps only the first read
    limited = count_kmers(df, 21, min_coverage=1, read_limit=1)
    assert limited.count() <= len(expected) + len(
        brute_force_kmer_counts([rows[1][0]], 21)
    )


def test_filter_klist(spark):
    from reflexiv_spark.operators.reduction import filter_klist

    df = spark.createDataFrame(
        [("ACGTACGTACG",), ("ACGTACGTACGTACG",), ("ACG",)], "kmer string"
    )
    out = {r.kmer for r in filter_klist(df, (11, 15)).collect()}
    assert out == {"ACGTACGTACG", "ACGTACGTACGTACG"}


def test_fasta_tab_roundtrip(spark):
    from reflexiv_spark.sources.fastq import fasta_to_tab, tab_to_reads

    df = spark.createDataFrame([("c1", "acgt"), ("c2", "GGTT")], "id string, seq string")
    back = tab_to_reads(fasta_to_tab(df)).collect()
    assert {(r.id, r.seq) for r in back} == {("c1", "ACGT"), ("c2", "GGTT")}
