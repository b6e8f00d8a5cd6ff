"""Sources & sinks (SURVEY.md §2.1 S1-S7, K1-K2): FASTQ/FASTA readers and
FASTA writer. Internal interchange format is Parquet (replacing the
reference's gzip-CSV stage barriers)."""
