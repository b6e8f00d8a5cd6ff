"""FASTQ / FASTA readers and FASTA writer.

Reference reads FASTQ as raw text lines and keeps sequence lines by a
heuristic filter — len > 20, not '@'/'+'-prefixed, ACGTN spot-checks at
positions 0/4/9/14/19 (``DSFastqFilterOnlySeq``,
``ReflexivDataFrameCounter.java:238-289``). We provide both:

- :func:`read_fastq` — a REAL 4-line-record parser producing
  ``(read_id, seq, qual)`` (what FIXTURES.md §2 specifies). Implemented via
  ``zipWithIndex`` grouping: 2 extra partition-scan jobs but exact. Line
  order within ``spark.read.text`` of a single file is stable; for
  multi-file globs each file's lines stay contiguous because we index per
  file via input_file_name partitioning.
- :func:`read_fastq_seqs_heuristic` — the reference's cheap filter as pure
  Catalyst predicates (no extra jobs, single pass), for parity + scale: at
  100 TB the heuristic path avoids the global index entirely and is the
  right default when read IDs aren't needed.

FASTA: multi-line records are reassembled with a running "last header"
window — no ``wholeTextFiles`` (which would OOM on a 100 GB FASTA).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_fastq(spark: SparkSession, path: str) -> DataFrame:
    """FASTQ → DataFrame[read_id, seq, qual] (exact 4-line parser)."""
    lines = spark.read.text(path).select(
        F.input_file_name().alias("file"), F.col("value")
    )
    # Global line index per file: zipWithIndex preserves textFile order.
    rdd = lines.rdd.zipWithIndex().map(
        lambda t: (t[0]["file"], t[1], t[0]["value"])
    )
    idx = spark.createDataFrame(rdd, "file: string, idx: long, value: string")
    w = Window.partitionBy("file").orderBy("idx")
    recs = (
        idx.withColumn("line_in_file", F.row_number().over(w) - 1)
        .withColumn("rec", F.floor(F.col("line_in_file") / 4))
        .withColumn("fld", F.col("line_in_file") % 4)
        .groupBy("file", "rec")
        .pivot("fld", [0, 1, 2, 3])
        .agg(F.first("value"))
    )
    return recs.select(
        F.regexp_replace(F.col("0"), "^@", "").alias("read_id"),
        F.upper(F.col("1")).alias("seq"),
        F.col("3").alias("qual"),
    ).where(F.col("seq").isNotNull())


def read_fastq_seqs_heuristic(spark: SparkSession, path: str) -> DataFrame:
    """FASTQ → DataFrame[seq] via the reference's sequence-line heuristic
    (S3) as Catalyst predicates — single scan, no shuffle, no indexing."""
    lines = spark.read.text(path)
    v = F.col("value")
    checks = [
        F.substring(v, p, 1).isin("A", "C", "G", "T", "N")
        for p in (1, 5, 10, 15, 20)
    ]
    cond = (
        (F.length(v) > 20)
        & ~v.startswith("@")
        & ~v.startswith("+")
    )
    for c in checks:
        cond = cond & c
    return lines.where(cond).select(F.upper(v).alias("seq"))


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """FASTA → DataFrame[id, seq]; supports multi-line (wrapped) records.

    Reference equivalents: contig CSV/FASTA scans (S6,
    ``ReflexivDSMerger.java:144-148``) and the driver-side ``ContigReader``
    (S7) — which we deliberately do NOT reproduce driver-side (100 TB rule:
    never collect; broadcast the small side instead, SURVEY.md §7.2).
    """
    lines = spark.read.text(path).select(
        F.input_file_name().alias("file"), F.col("value")
    )
    rdd = lines.rdd.zipWithIndex().map(
        lambda t: (t[0]["file"], t[1], t[0]["value"])
    )
    idx = spark.createDataFrame(rdd, "file: string, idx: long, value: string")
    w = Window.partitionBy("file").orderBy("idx")
    tagged = idx.withColumn(
        "hdr", F.when(F.col("value").startswith(">"), F.col("value"))
    ).withColumn(
        "rec_hdr",
        F.last("hdr", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        tagged.where(~F.col("value").startswith(">") & (F.length("value") > 0))
        .groupBy("file", "rec_hdr")
        # collect_list order is not guaranteed → sort by line index first.
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "value"))),
                    lambda s: s["value"],
                ),
                "",
            ).alias("seq")
        )
        .select(
            F.regexp_replace(F.col("rec_hdr"), "^>", "").alias("id"),
            F.upper(F.col("seq")).alias("seq"),
        )
    )


def write_fasta(df: DataFrame, path: str, id_col: str = "id", seq_col: str = "seq",
                wrap: int = 100) -> None:
    """contigs → FASTA text (K2), 100-char wrapped like the reference
    (``ReflexivDSMain.java:773-790``). IDs are taken from ``id_col`` —
    deterministic, unlike the reference's ``zipWithIndex`` numbering
    (FIXTURES.md §6 determinism note)."""
    # sequence(1, 0) is an illegal range in Spark — one empty-seq row would
    # fail the whole write job, so drop them up front.
    df = df.where(F.length(seq_col) > 0)
    wrapped = df.select(
        F.concat(
            F.lit(">"),
            F.col(id_col),
            F.lit("\n"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.sequence(
                        F.lit(1), F.length(seq_col), F.lit(wrap)
                    ),
                    lambda i: F.col(seq_col).substr(i, F.lit(wrap)),
                ),
            ),
        ).alias("value")
    )
    wrapped.write.mode("overwrite").text(path)
