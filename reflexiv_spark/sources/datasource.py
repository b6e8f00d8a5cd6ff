"""Spark 4 Python DataSource registration for FASTQ/FASTA.

The engine's primary readers (:mod:`reflexiv_spark.sources.records`)
drive the byte-range parsers through ``mapInPandas`` over a splits
table. This module exposes the SAME parsers through Spark's pluggable
Python DataSource API (SPARK-44076, Spark 4.x) so the formats compose
with the standard reader surface:

    spark.dataSource.register(FastqDataSource)
    spark.read.format("fastq").load("reads.fq")        # read_id, seq, qual
    spark.read.format("fastabio").load("refs.fa")      # id, seq

Each input partition is one byte-range split (same
``_list_splits`` plan: parallelism = total_bytes / split_size,
boundary sync at the first record at-or-after the range start), so the
DataSource path scales identically to the mapInPandas path — one task
per range, no driver parsing. The two paths share every parsing line;
a test asserts identical rows on the reference example file.

("fastabio", not "fasta": short names must not collide with built-in
formats, and DuckDB/Spark ecosystems commonly ship a csv-backed
"fasta".)
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from reflexiv_spark.sources.records import (
    _list_splits,
    _parse_fasta_range,
    _parse_fastq_range,
)


class _RangePartition(InputPartition):
    def __init__(self, file: str, start: int, length: int):
        self.file = file
        self.start = start
        self.length = length


class _RangeReaderBase(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("path is required (pass .load(path))")
        self.split_size = int(options.get("split_size", 64 << 20))

    def partitions(self):
        splits = _list_splits(self.path, self.split_size)
        if not splits:
            raise FileNotFoundError(f"no input files match {self.path!r}")
        return [_RangePartition(f, s, ln) for f, s, ln in splits]


class FastqDataSource(DataSource):
    """``spark.read.format("fastq")`` → DataFrame[read_id, seq, qual]."""

    @classmethod
    def name(cls) -> str:
        return "fastq"

    def schema(self) -> str:
        return "read_id string, seq string, qual string"

    def reader(self, schema):
        return _FastqReader(self.options)


class _FastqReader(_RangeReaderBase):
    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        yield from _parse_fastq_range(
            partition.file, partition.start, partition.length
        )


class FastaDataSource(DataSource):
    """``spark.read.format("fastabio")`` → DataFrame[id, seq]."""

    @classmethod
    def name(cls) -> str:
        return "fastabio"

    def schema(self) -> str:
        return "id string, seq string"

    def reader(self, schema):
        return _FastaReader(self.options)


class _FastaReader(_RangeReaderBase):
    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for rid, seq in _parse_fasta_range(
            partition.file, partition.start, partition.length
        ):
            yield rid, seq.decode("ascii", "replace").upper()


class WarcDataSource(DataSource):
    """``spark.read.format("warc")`` → one row per WARC record (the
    Common Crawl ingestion format; schema in
    :mod:`reflexiv_spark.sources.warc`)."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        from reflexiv_spark.sources.warc import WARC_SCHEMA

        return WARC_SCHEMA

    def reader(self, schema):
        return _WarcReader(self.options)


class _WarcReader(_RangeReaderBase):
    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        from reflexiv_spark.sources.warc import _parse_warc_range

        yield from _parse_warc_range(
            partition.file, partition.start, partition.length
        )


def register(spark) -> None:
    """Register all formats on a session (idempotent)."""
    spark.dataSource.register(FastqDataSource)
    spark.dataSource.register(FastaDataSource)
    spark.dataSource.register(WarcDataSource)
