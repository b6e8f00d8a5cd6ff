"""End-to-end run on the reference's own example dataset.

The reference ships ``example/paired_dat{1,2}.fq.gz`` — simulated 100 bp
paired reads (with sequencing errors) whose headers reveal the ground
truth: one source contig of 4,576 bp at ~14.9× coverage
(``@NODE_1_length_4576_cov_14.939248-…``; ``docs/example.html``
"Test-run": ``reflexiv run -fastq 'example/paired_dat*.fq.gz' -kmer 31``).
This is the reference's one implied integration test (SURVEY.md §5); here
it runs through the native gzip-FASTQ reader → pair merging (X1) →
single-k assembly, and must recover that contig.
"""

from __future__ import annotations

from pathlib import Path

import pytest

EXAMPLE_DIR = Path("/root/reference/example")
R1 = EXAMPLE_DIR / "paired_dat1.fq.gz"
R2 = EXAMPLE_DIR / "paired_dat2.fq.gz"

pytestmark = pytest.mark.skipif(
    not (R1.exists() and R2.exists()),
    reason="reference example dataset not available",
)

GROUND_TRUTH_LEN = 4576  # docs/example.html; read headers


def test_reference_example_assembles_to_single_contig(spark):
    from reflexiv_spark.operators.preprocess import merge_read_pairs
    from reflexiv_spark.pipelines.assemble import assemble
    from reflexiv_spark.sources.fastq import read_fastq

    r1 = read_fastq(spark, str(R1))
    r2 = read_fastq(spark, str(R2))
    assert r1.count() == 1150 and r2.count() == 1150  # 4,600 FASTQ lines each

    merged = merge_read_pairs(r1, r2, id_col="read_id", seq_col="seq")
    contigs = assemble(merged, k=31, min_coverage=2, min_contig=500).collect()

    lens = sorted(len(r["seq"]) for r in contigs)
    # Deterministic pipeline → deterministic single-contig reconstruction;
    # sequencing errors may shave end bases the coverage floor can't hold
    # (observed: 4,575 of 4,576).
    assert len(lens) == 1, f"expected one contig, got lengths {lens}"
    assert GROUND_TRUTH_LEN - 26 <= lens[0] <= GROUND_TRUTH_LEN, lens


def test_reference_example_read_parser_matches_gzip_contents(spark):
    """The splittable FASTQ parser must see every record of the gzip files
    with intact ids/seqs (spot-check the documented header shape)."""
    from pyspark.sql import functions as F

    from reflexiv_spark.sources.fastq import read_fastq

    r1 = read_fastq(spark, str(R1))
    bad = r1.where(
        ~F.col("read_id").startswith("NODE_1_length_4576")
        | F.col("seq").rlike("[^ACGTN]")
        | (F.length("seq") != 100)
    ).count()
    assert bad == 0
