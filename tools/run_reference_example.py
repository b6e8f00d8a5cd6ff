#!/usr/bin/env python
"""Run the reference's example dataset end-to-end and print the contigs.

Equivalent of the reference's documented smoke run
(``docs/example.html``: ``reflexiv run -fastq 'example/paired_dat*.fq.gz'
-kmer 31``) on this engine: gzip FASTQ → pair merge (X1) → k=31 assembly.
Ground truth: one contig of 4,576 bp at ~14.9× coverage.

Usage: python tools/run_reference_example.py [example_dir] [out.fasta]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    example = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference/example")
    out = sys.argv[2] if len(sys.argv) > 2 else None

    from reflexiv_spark.operators.preprocess import merge_read_pairs
    from reflexiv_spark.pipelines.assemble import assemble
    from reflexiv_spark.session import get_spark
    from reflexiv_spark.sources.fastq import read_fastq, write_fasta

    spark = get_spark(app_name="reference-example", shuffle_partitions=8)
    t0 = time.time()
    r1 = read_fastq(spark, str(example / "paired_dat1.fq.gz"))
    r2 = read_fastq(spark, str(example / "paired_dat2.fq.gz"))
    merged = merge_read_pairs(r1, r2, id_col="read_id", seq_col="seq")
    contigs = assemble(merged, k=31, min_coverage=2, min_contig=500)
    rows = contigs.select("contig_id", "seq").collect()
    for r in rows:
        print(f"{r['contig_id']}\tlen={len(r['seq'])}")
    print(f"{len(rows)} contig(s) in {time.time() - t0:.1f}s (truth: 1 × 4,576 bp)")
    if out:
        write_fasta(contigs, out, id_col="contig_id", seq_col="seq")
        print(f"wrote {out}")
    return 0 if rows else 1


if __name__ == "__main__":
    raise SystemExit(main())
