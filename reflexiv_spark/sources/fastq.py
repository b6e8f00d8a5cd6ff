"""FASTQ / FASTA readers and FASTA writer.

Reference reads FASTQ as raw text lines and keeps sequence lines by a
heuristic filter — len > 20, not '@'/'+'-prefixed, ACGTN spot-checks at
positions 0/4/9/14/19 (``DSFastqFilterOnlySeq``,
``ReflexivDataFrameCounter.java:238-289``). We provide both:

- :func:`read_fastq` / :func:`read_fasta` — exact record parsers
  re-exported from :mod:`reflexiv_spark.sources.records`: byte-range
  splits with boundary sync, Arrow-batched, no RDD round-trip, many
  tasks per file (see that module for the 100 TB design notes).
- :func:`read_fastq_seqs_heuristic` — the reference's cheap filter as pure
  Catalyst predicates (no extra jobs, single pass), for parity + scale:
  when read IDs aren't needed this stays entirely JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reflexiv_spark.sources.records import read_fasta, read_fastq  # noqa: F401  (re-exported)


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


def read_text_4mc(
    spark: SparkSession,
    path: str,
    input_format: str = "com.hadoop.mapreduce.FourMcTextInputFormat",
) -> DataFrame:
    """S2: splittable-LZ4 (4mc) text scan escape hatch.

    The reference reads 4mc-compressed FASTQ through
    ``sc.newAPIHadoopFile(path, FourMcTextInputFormat, LongWritable, Text)``
    (``ReflexivDataFrameCounter.java:161-176``; the 4mc dependency at
    ``pom.xml:38-48``). Parquet/zstd is the sanctioned substitute in this
    engine (SURVEY.md §2 S2) — this hatch exists for drop-in parity when
    the 4mc jar is on the executor classpath. Raises ``RuntimeError`` with
    a clear message when it is not.

    The RDD crossing is confined to this one reader: values convert to a
    DataFrame[value] immediately, so everything downstream (the S3 filter,
    k-mer counting) stays in Catalyst.
    """
    sc = spark.sparkContext
    try:
        rdd = sc.newAPIHadoopFile(
            path,
            input_format,
            "org.apache.hadoop.io.LongWritable",
            "org.apache.hadoop.io.Text",
        )
    except Exception as e:  # noqa: BLE001 — py4j raises opaque Java errors
        # Blame the missing jar only when the Java exception actually is a
        # class-loading failure; anything else (bad path, permissions)
        # surfaces as-is rather than behind a misleading message.
        jexc = getattr(e, "java_exception", None)
        cls = ""
        if jexc is not None:
            try:
                cls = jexc.getClass().getName()
            except Exception:  # noqa: BLE001 — dead gateway etc.
                cls = ""
        blob = cls + str(e)
        if "ClassNotFoundException" in blob or "NoClassDefFoundError" in blob:
            raise RuntimeError(
                f"4mc input format {input_format!r} is not on the classpath "
                "(add the 4mc jar via spark.jars) — or convert the input to "
                "Parquet/zstd and use the standard readers"
            ) from e
        raise
    return rdd.values().map(lambda t: (t,)).toDF(["value"])


def read_contig_csv(spark: SparkSession, path: str) -> DataFrame:
    """S6: 2-column contig CSV scan → DataFrame[contig_id, seq]
    (``ReflexivDSDynamicKmerMapping.java:320-323`` reads the previous
    stage's CSV dump with ``spark.read().csv``).

    Explicit schema (no inference pass). Rows with a missing/empty
    sequence are dropped — an intentional deviation from the reference
    (its ``OldContig2Row`` parser copies rows verbatim,
    ``ReflexivDSDynamicKmerMapping.java:352-366``): a blank contig is
    never meaningful downstream and would crash the k-mer windows.
    """
    df = spark.read.csv(path, schema="contig_id string, seq string")
    return df.where(
        F.col("seq").isNotNull() & (F.length("seq") > 0)
    ).select("contig_id", F.upper(F.col("seq")).alias("seq"))


def read_legacy_kmer_tuples(spark: SparkSession, path: str) -> DataFrame:
    """S5: legacy ``(kmer,count)`` tuple-text scan → DataFrame[kmer, count].

    The reference strips ``(`` / ``)`` from old RDD-era text dumps inside
    its binarizers (``ReflexivDSDynamicKmerRuduction.java:3197-3207``,
    marked obsolete by SURVEY.md §2 S5 — new dumps are normalized CSV at
    write time). Kept as a one-function compatibility reader so archived
    Count_* dumps stay loadable; malformed lines are dropped rather than
    poisoning the count column.
    """
    lines = spark.read.text(path)
    stripped = F.translate(F.col("value"), "() ", "")
    parts = F.split(stripped, ",")
    # F.get, not getItem: malformed lines split into fewer fields, and
    # ANSI mode turns an out-of-bounds getItem into a job-killing error
    return (
        lines.select(
            F.upper(F.get(parts, 0)).alias("kmer"),
            F.get(parts, 1).cast("long").alias("count"),
        )
        .where(
            F.col("count").isNotNull()
            & (F.length("kmer") > 0)
            & ~F.col("kmer").rlike("[^ACGTN]")
        )
    )


def read_kmer_counts(spark: SparkSession, path: str) -> DataFrame:
    """S4: k-mer count CSV scan — read ``Count_*/part*.csv[.gz]`` back as
    DataFrame[kmer, count] (``ReflexivDSKmerLeftAndRightSorting.java:164``;
    sink counterpart :func:`reflexiv_spark.plans.stages.write_csv`).

    Explicit schema: no inference pass over the data (an inference scan
    reads every file twice — wrong at 100 TB). Gzip decompression is
    handled by Spark's codec layer from the file extension.
    """
    return spark.read.csv(path, schema="kmer string, count long")


def fasta_to_tab(df: DataFrame, id_col: str = "id", seq_col: str = "seq") -> DataFrame:
    """C9: FASTA-shaped rows → single tab-joined text column (the shape
    the reference pipes to external tools,
    ``ReflexivDataFrameDecompresser.java:250-302``)."""
    return df.select(
        F.concat_ws("\t", F.col(id_col), F.col(seq_col)).alias("value")
    )


def tab_to_reads(df: DataFrame, value_col: str = "value") -> DataFrame:
    """C9 inverse: tab text → (id, seq) rows."""
    parts = F.split(F.col(value_col), "\t")
    return df.select(
        parts.getItem(0).alias("id"), F.upper(parts.getItem(1)).alias("seq")
    )


def write_fasta(df: DataFrame, path: str, id_col: str = "id", seq_col: str = "seq",
                wrap: int = 100) -> None:
    """contigs → FASTA text (K2), 100-char wrapped like the reference
    (``ReflexivDSMain.java:773-790``). IDs are taken from ``id_col`` —
    deterministic, unlike the reference's ``zipWithIndex`` numbering
    (FIXTURES.md §6 determinism note)."""
    df = df.where(F.length(seq_col) > 0)
    # one regex pass inserts "\n" after every full wrap-block except a
    # trailing one — identical to chunk-and-join, no array materialized
    wrapped = df.select(
        F.concat(
            F.lit(">"),
            F.col(id_col),
            F.lit("\n"),
            F.regexp_replace(
                seq_col, f"(?s)(.{{{wrap}}})(?=.)", "$1\n"
            ),
        ).alias("value")
    )
    wrapped.write.mode("overwrite").text(path)
