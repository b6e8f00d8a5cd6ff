"""WARC (Web ARChive, ISO 28500) reader — the Common Crawl ingestion
format, and the raw-input side of every web-scale training-data
pipeline this engine's datapipe operators consume.

Format (public spec, WARC/1.0-1.1): records are a version line
(``WARC/1.0``), CRLF-terminated ``Key: value`` headers up to a blank
line, exactly ``Content-Length`` payload bytes, then two CRLFs. A
``response`` record's payload is a full HTTP message; the body after
the first blank line is what text-extraction pipelines want.

Built from scratch on the same byte-range split machinery as the
FASTQ/FASTA readers (:mod:`reflexiv_spark.sources.records`):
parallelism = total_bytes / split_size, one task per range, no driver
parsing. Boundary sync: a split that starts mid-record scans forward
to the first VALIDATED record start — a ``WARC/x.y`` line whose
following header block parses cleanly through the blank line with a
digit ``Content-Length`` (a payload byte string that merely looks
like a version line fails the header validation and scanning
continues; a real version line seen DURING a failed header scan
restarts validation from that line, so false positives can never
swallow a true record). Ownership matches the FASTQ convention: a
record belongs to the split iff its version line starts at relative
offset <= length; the next split's partial-line skip discards the
line its range begins in.

``*.warc.gz`` (Common Crawl ships per-record gzip members;
``gzip``/``zlib`` read concatenated members as one stream) gets a
single range per file, like the other compressed formats.

Output schema (one row per record):
  record_id, warc_type, target_uri, warc_date, content_type string,
  content_length bigint, http_status int (NULL unless the payload is
  an HTTP message), payload binary (the raw WARC payload),
  http_body binary (payload minus HTTP headers; NULL when not HTTP)
— binary columns follow the engine's opaque-blob multimodal contract
(``datapipe.multimodal`` sniffs/decodes them downstream).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from reflexiv_spark.sources.records import _RangeReader, _splits_df

WARC_SCHEMA = (
    "record_id string, warc_type string, target_uri string,"
    " warc_date string, content_type string, content_length long,"
    " http_status int, payload binary, http_body binary"
)
_COLUMNS = [
    "record_id", "warc_type", "target_uri", "warc_date", "content_type",
    "content_length", "http_status", "payload", "http_body",
]

_VERSIONS = (b"0.9", b"0.16", b"0.17", b"0.18", b"1.0", b"1.1")


def _is_version_line(line: bytes) -> bool:
    line = line.rstrip(b"\r")
    return line.startswith(b"WARC/") and line[5:] in _VERSIONS


def _parse_headers(
    r: _RangeReader,
) -> tuple[dict[bytes, bytes] | None, bytes | None, int]:
    """Header block after a version line → (headers, None, -1) on
    success; (None, line, line_start) when an invalid line breaks the
    block — the line and its byte offset are returned so the caller
    can restart sync from it if it is itself a version-line candidate
    (the offset keeps split-ownership decisions exact)."""
    headers: dict[bytes, bytes] = {}
    while True:
        line_start = r.pos
        line = r.next_line()
        if line is None:
            return None, None, -1
        stripped = line.rstrip(b"\r")
        if stripped == b"":
            break
        if b":" not in stripped:
            return None, line, line_start
        k, _, v = stripped.partition(b":")
        headers[k.strip().lower()] = v.strip()
    if not headers.get(b"content-length", b"").isdigit():
        return None, None, -1
    return headers, None, -1


def _http_parts(payload: bytes) -> tuple[int | None, bytes | None]:
    if not payload.startswith(b"HTTP/"):
        return None, None
    sep = payload.find(b"\r\n\r\n")
    if sep == -1:
        return None, None
    head, body = payload[:sep], payload[sep + 4 :]
    status_line = head.split(b"\r\n", 1)[0].split()
    status = None
    if len(status_line) >= 2 and status_line[1].isdigit():
        status = int(status_line[1])
    return status, body


def _parse_warc_range(file: str, start: int, length: int) -> Iterator[tuple]:
    r = _RangeReader(file, start, length)
    try:
        if start > 0 and not r.compressed:
            r.skip_partial_line()
        # (line, true byte offset of its start) — a retry candidate is
        # a real version line seen inside a FAILED header scan of a
        # payload byte string that merely looked like one
        pending: tuple[bytes, int] | None = None
        while True:
            if pending is not None:
                line, line_start = pending
                pending = None
            else:
                line_start = r.pos
                if line_start > length and not r.compressed:
                    return  # next record start belongs to the next split
                line = r.next_line()
                if line is None:
                    return
            if not _is_version_line(line):
                continue
            if line_start > length and not r.compressed:
                return
            headers, bad, bad_start = _parse_headers(r)
            if headers is None:
                if bad is not None and _is_version_line(bad):
                    pending = (bad, bad_start)
                continue
            n = int(headers[b"content-length"])
            payload = r.read_bytes(n)
            if len(payload) < n:
                return  # truncated final record: drop, do not mis-frame
            status, body = _http_parts(payload)
            yield (
                headers.get(b"warc-record-id", b"").decode("utf-8", "replace"),
                headers.get(b"warc-type", b"").decode("utf-8", "replace"),
                headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
                or None,
                headers.get(b"warc-date", b"").decode("utf-8", "replace")
                or None,
                headers.get(b"content-type", b"").decode("utf-8", "replace")
                or None,
                n,
                status,
                payload,
                body,
            )
    finally:
        r.close()


_TYPES = {
    "record_id": "string",
    "warc_type": "string",
    "target_uri": "string",
    "warc_date": "string",
    "content_type": "string",
    "content_length": "long",
    "http_status": "int",
    "payload": "binary",
    "http_body": "binary",
}

# Flush an output RecordBatch when the accumulated binary payload
# crosses this many bytes (or _BATCH_ROWS rows): bounds Python-side
# memory to ~2 batches per task and keeps every Arrow binary array far
# from the int32 offset limit.
_BATCH_BYTES = 32 << 20
_BATCH_ROWS = 4096


def read_warc(
    spark: SparkSession,
    path: str,
    split_size: int = 64 << 20,
    columns: list[str] | None = None,
) -> DataFrame:
    """WARC → one row per record (see module docstring for the schema)
    — exact, splittable, no RDD; one task per byte range.

    ``columns`` prunes the OUTPUT at the source (schema order is
    preserved): a ``mapInArrow`` source cannot receive Catalyst's
    column pruning, and the payload/http_body binaries dominate the
    Arrow crossing (~2× the file bytes when both ship), so callers that
    only need the text side (``warc-extract`` ships ``http_body`` but
    not ``payload``) or the metadata side (URL analytics) should ask
    for just those columns. Framing work is identical either way; only
    the bytes crossing into the JVM change.

    The rows cross as pyarrow RecordBatches built column-wise from the
    framing generator — not as pandas object frames — which keeps the
    per-record Python cost to list appends and hands Spark
    zero-copy-ready binary arrays.
    """
    if columns is None:
        cols = list(_COLUMNS)
    else:
        unknown = set(columns) - set(_COLUMNS)
        if unknown:
            raise ValueError(f"unknown WARC columns: {sorted(unknown)}")
        cols = [c for c in _COLUMNS if c in set(columns)]
    schema = ", ".join(f"{c} {_TYPES[c]}" for c in cols)
    idxs = [_COLUMNS.index(c) for c in cols]
    binary_idxs = [
        i for i, c in zip(idxs, cols) if c in ("payload", "http_body")
    ]

    def parse(batches: Iterator) -> Iterator:
        import pyarrow as pa

        pa_types = {
            "string": pa.string(),
            "long": pa.int64(),
            "int": pa.int32(),
            "binary": pa.binary(),
        }

        def flush(data):
            arrays = [
                pa.array(data[j], type=pa_types[_TYPES[c]])
                for j, c in enumerate(cols)
            ]
            return pa.RecordBatch.from_arrays(arrays, cols)

        for batch in batches:
            files = batch.column("file").to_pylist()
            starts = batch.column("start").to_pylist()
            lengths = batch.column("length").to_pylist()
            for file, start, length in zip(files, starts, lengths):
                data = [[] for _ in cols]
                nbytes = 0
                for row in _parse_warc_range(file, int(start), int(length)):
                    for j, i in enumerate(idxs):
                        data[j].append(row[i])
                    for i in binary_idxs:
                        nbytes += len(row[i] or b"")
                    if (
                        nbytes >= _BATCH_BYTES
                        or len(data[0]) >= _BATCH_ROWS
                    ):
                        yield flush(data)
                        data = [[] for _ in cols]
                        nbytes = 0
                if data and data[0]:
                    yield flush(data)

    return _splits_df(spark, path, split_size).mapInArrow(
        parse, schema=schema
    )
