"""WARC reader (sources/warc.py): from-scratch record framing, HTTP
payload splitting, adversarial payloads containing fake version lines,
split-size invariance (exactly-once per record across byte-range
boundaries), multi-member gzip (the Common Crawl shape), and the
Spark 4 DataSource path equality."""

from __future__ import annotations

import gzip

from reflexiv_spark.sources.warc import read_warc


def _record(
    rid: str,
    wtype: str = "response",
    uri: str | None = "http://example.com/a",
    payload: bytes = b"",
    extra_headers: tuple[tuple[str, str], ...] = (),
) -> bytes:
    head = [b"WARC/1.0"]
    head.append(b"WARC-Type: " + wtype.encode())
    head.append(b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">")
    head.append(b"WARC-Date: 2024-01-01T00:00:00Z")
    if uri is not None:
        head.append(b"WARC-Target-URI: " + uri.encode())
    for k, v in extra_headers:
        head.append(k.encode() + b": " + v.encode())
    head.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200) -> bytes:
    return (
        b"HTTP/1.1 " + str(status).encode() + b" OK\r\n"
        b"Content-Type: text/html\r\n\r\n" + body
    )


def _corpus(n: int = 12) -> bytes:
    out = [
        _record("info", wtype="warcinfo", uri=None,
                payload=b"software: synthetic\r\n")
    ]
    for i in range(n):
        body = (f"<html>doc {i} " + "x" * (40 + 13 * i) + "</html>").encode()
        out.append(_record(f"resp-{i}", payload=_http(body, 200 + i % 5)))
        out.append(
            _record(f"req-{i}", wtype="request",
                    payload=b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n")
        )
    # adversarial: a resource record whose payload CONTAINS a fake
    # version line at line start, followed by junk that fails header
    # validation — the sync scanner must not mis-frame on it
    fake = b"preamble\r\nWARC/1.0\r\nnot a header line at all\r\nmore junk\r\n"
    out.append(_record("trap", wtype="resource", payload=fake))
    return b"".join(out)


def test_record_framing_and_http_split(spark, tmp_path):
    p = tmp_path / "a.warc"
    p.write_bytes(_corpus(5))
    rows = {r.record_id: r for r in read_warc(spark, str(p)).collect()}
    assert len(rows) == 1 + 5 * 2 + 1  # warcinfo + 5x(resp,req) + trap
    r0 = rows["<urn:uuid:resp-0>"]
    assert r0.warc_type == "response"
    assert r0.target_uri == "http://example.com/a"
    assert r0.http_status == 200
    assert bytes(r0.http_body).startswith(b"<html>doc 0 ")
    assert bytes(r0.payload).startswith(b"HTTP/1.1 200 OK")
    assert r0.content_length == len(bytes(r0.payload))
    # request records are HTTP too but have no status line -> NULL
    rq = rows["<urn:uuid:req-0>"]
    assert rq.http_status is None and rq.http_body is None
    # the adversarial payload survives byte-for-byte
    trap = rows["<urn:uuid:trap>"]
    assert b"WARC/1.0" in bytes(trap.payload)
    assert trap.http_status is None
    info = rows["<urn:uuid:info>"]
    assert info.warc_type == "warcinfo" and info.target_uri is None


def test_split_size_invariance(spark, tmp_path):
    """Every record lands exactly once whatever the byte ranges — the
    FASTQ exactness contract; the adversarial fake-version-line record
    is in the corpus, so boundary sync validation is exercised."""
    p = tmp_path / "b.warc"
    p.write_bytes(_corpus(12))
    expected = sorted(
        (r.record_id, r.content_length, bytes(r.payload))
        for r in read_warc(spark, str(p), split_size=1 << 20).collect()
    )
    assert len(expected) == 1 + 12 * 2 + 1
    for split in (97, 256, 1111, 4096):
        got = sorted(
            (r.record_id, r.content_length, bytes(r.payload))
            for r in read_warc(spark, str(p), split_size=split).collect()
        )
        assert got == expected, f"split_size={split}"


def test_multi_member_gzip(spark, tmp_path):
    """Common Crawl ships one gzip member per record; the stream reads
    as one range with every record intact."""
    raw = _corpus(4)
    records = raw.split(b"WARC/1.0\r\n")[1:]
    p = tmp_path / "c.warc.gz"
    with open(p, "wb") as fh:
        for rec in records:
            fh.write(gzip.compress(b"WARC/1.0\r\n" + rec))
    rows = read_warc(spark, str(p)).collect()
    plain = tmp_path / "c.warc"
    plain.write_bytes(raw)
    want = read_warc(spark, str(plain)).collect()
    assert sorted(r.record_id for r in rows) == sorted(
        r.record_id for r in want
    )


def test_datasource_path_matches_reader(spark, tmp_path):
    from reflexiv_spark.sources.datasource import register

    p = tmp_path / "d.warc"
    p.write_bytes(_corpus(6))
    register(spark)
    via_ds = sorted(
        (r.record_id, bytes(r.payload))
        for r in spark.read.format("warc")
        .option("split_size", "512")
        .load(str(p))
        .collect()
    )
    via_fn = sorted(
        (r.record_id, bytes(r.payload))
        for r in read_warc(spark, str(p)).collect()
    )
    assert via_ds == via_fn


def test_cli_warc_extract(spark, tmp_path):
    """warc-extract subcommand: WARC → documents-shaped parquet, HTTP
    200 responses only by default, stable 62-bit doc ids with the
    source record_id riding along (collision recoverability)."""
    from reflexiv_spark.__main__ import main

    p = tmp_path / "g.warc"
    p.write_bytes(_corpus(5))
    out = tmp_path / "docs"
    assert main(["warc-extract", "-i", str(p), "-o", str(out)]) == 0
    docs = spark.read.parquet(str(out))
    rows = docs.collect()
    # only resp-0 and resp-5k... statuses cycle 200..204; 200 hits i%5==0
    assert {r.http_status for r in rows} == {200}
    assert all(r.url == "http://example.com/a" for r in rows)
    assert all(r.text.startswith("<html>doc ") for r in rows)
    assert len({r.doc_id for r in rows}) == len(rows)  # ids distinct
    # record_id present and unique — the collision-recovery column
    assert len({r.record_id for r in rows}) == len(rows)
    # re-run → identical ids (determinism)
    out2 = tmp_path / "docs2"
    assert main(["warc-extract", "-i", str(p), "-o", str(out2)]) == 0
    assert sorted(r.doc_id for r in rows) == sorted(
        r.doc_id for r in spark.read.parquet(str(out2)).collect()
    )


def test_cli_wet_extract(spark, tmp_path):
    """--wet: 'conversion' records' raw payloads become the text
    column (the Common Crawl WET shape)."""
    from reflexiv_spark.__main__ import main

    recs = b"".join(
        _record(f"wet-{i}", wtype="conversion",
                uri=f"http://example.com/{i}",
                payload=f"extracted text of page {i}\nsecond line".encode())
        for i in range(4)
    ) + _record("info", wtype="warcinfo", uri=None, payload=b"x: y\r\n")
    p = tmp_path / "h.warc"
    p.write_bytes(recs)
    out = tmp_path / "wet"
    assert main(["warc-extract", "-i", str(p), "-o", str(out),
                 "--wet"]) == 0
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) == 4  # warcinfo excluded
    assert all(r.text.startswith("extracted text of page ") for r in rows)
    assert all(r.http_status is None for r in rows)
    # --keep-all with --wet is a contradiction: erroring beats silently
    # ignoring the flag (round-13 ADVICE guard)
    import pytest

    with pytest.raises(SystemExit):
        main(["warc-extract", "-i", str(p), "-o", str(tmp_path / "x"),
              "--wet", "--keep-all"])


def test_fuzz_corruption_never_crashes_or_misframes(tmp_path):
    """Seeded random corruption of a valid corpus (byte flips,
    deletions, junk insertions): the parser must never raise, never
    emit a row whose payload length disagrees with its Content-Length,
    and any surviving record id must come from the original corpus
    (framing can drop records under corruption, never invent them).
    Pure-Python drive of _parse_warc_range — no Spark session."""
    import random

    from reflexiv_spark.sources.warc import _parse_warc_range

    base = _corpus(8)
    rng = random.Random(1234)
    original_payloads = {}
    p0 = tmp_path / "orig.warc"
    p0.write_bytes(base)
    for r in _parse_warc_range(str(p0), 0, len(base)):
        original_payloads[r[0]] = r[7]
    survived_any = 0
    for trial in range(60):
        data = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            kind = rng.randrange(3)
            pos = rng.randrange(len(data))
            if kind == 0:  # flip
                data[pos] ^= 1 << rng.randrange(8)
            elif kind == 1:  # delete a chunk
                del data[pos : pos + rng.randint(1, 50)]
            else:  # insert junk (sometimes WARC-looking)
                junk = (
                    b"WARC/1.0\r\njunk\r\n"
                    if rng.random() < 0.3
                    else bytes(rng.randrange(256) for _ in range(20))
                )
                data[pos:pos] = junk
        p = tmp_path / f"fz{trial}.warc"
        p.write_bytes(bytes(data))
        # whole-range and two split framings: must not raise, and every
        # emitted row honors content_length == len(payload)
        for start, length in ((0, len(data)), (0, 997), (997, len(data))):
            for r in _parse_warc_range(str(p), start, length):
                assert r[5] == len(r[7])
        # records whose id AND payload both match an original are true
        # survivors — count them to prove corruption degrades the
        # corpus gracefully instead of zeroing it
        whole = list(_parse_warc_range(str(p), 0, len(data)))
        survived_any += sum(
            1 for r in whole if original_payloads.get(r[0]) == r[7]
        )
    # with <= 6 point mutations over ~18 records x 60 trials, the vast
    # majority of records must survive intact
    assert survived_any > 60 * 10


def test_truncated_final_record_dropped(spark, tmp_path):
    """A record cut off mid-payload is dropped, never mis-framed."""
    full = _corpus(3)
    cut = full[: len(full) - 30]
    p = tmp_path / "e.warc"
    p.write_bytes(cut)
    whole = {r.record_id for r in read_warc(spark, str(tmp_path / "e.warc")).collect()}
    pf = tmp_path / "f.warc"
    pf.write_bytes(full)
    all_ids = {r.record_id for r in read_warc(spark, str(pf)).collect()}
    assert whole < all_ids  # strictly fewer, nothing bogus


def test_column_pruned_read_matches_full(spark, tmp_path):
    """Round-13 Arrow source: columns= prunes at the source (the
    mapInArrow schema itself shrinks) and every surviving column equals
    the full read's values; unknown columns error."""
    import pytest as _pytest

    p = tmp_path / "c.warc"
    p.write_bytes(_corpus(6))
    full = {r.record_id: r for r in read_warc(spark, str(p)).collect()}
    pruned = read_warc(
        spark, str(p), columns=["record_id", "http_status", "http_body"]
    )
    assert pruned.columns == ["record_id", "http_status", "http_body"]
    for r in pruned.collect():
        f = full[r.record_id]
        assert (r.http_status, r.http_body) == (f.http_status, f.http_body)
    assert len(full) == pruned.count()
    with _pytest.raises(ValueError, match="unknown WARC columns"):
        read_warc(spark, str(p), columns=["nope"])
