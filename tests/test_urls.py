"""URL curation family (datapipe/urls.py): parsing edge cases against
a literal Python reference, blocklist/extension filter semantics,
domain statistics, and the two round-13 STAGED driver pairs gated
locally against DuckDB (SURVEY §8 staging protocol)."""

from __future__ import annotations

import re

_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"
_EXT_RE = r"\.([a-zA-Z0-9]{1,8})$"
_DOMAIN_RE = r"([^.]+\.[^.]+)$"


def _ref_parse(url):
    lu = (url or "").lower()
    m = re.search(_HOST_RE, lu)
    host = m.group(1) if m else ""
    m = re.search(_PATH_RE, lu)
    path = m.group(1) if m else ""
    seg = path.split("/")[-1]
    m = re.search(_EXT_RE, seg)
    ext = m.group(1).lower() if m else ""
    m = re.search(_DOMAIN_RE, host)
    domain = m.group(1) if m else ""
    return host, domain, path, ext


URLS = [
    (1, "https://www.example.com/a/b.html?q=1#frag"),
    (2, "http://user:pw@Sub.Example.COM:8080/path/file.PDF"),
    (3, "https://example.com"),                      # no path
    (4, "https://single/nopath.js"),                 # one-label host
    (5, "ftp://files.archive.org/pub/data.tar.gz"),  # gz ext
    (6, "not a url at all"),
    (7, None),
    (8, "https://a.b.c.d.co.uk/deep/x.y.z.txt"),
    (9, "https://example.com/trailing/"),            # empty last seg
    (10, "https://example.com/no-ext/readme"),
]


def test_parse_matches_python_reference(spark):
    from reflexiv_spark.datapipe.urls import parse_urls

    df = spark.createDataFrame(URLS, "doc_id long, url string")
    got = {
        r.doc_id: (r.host, r.domain, r.path, r.ext)
        for r in parse_urls(df).collect()
    }
    want = {i: _ref_parse(u) for i, u in URLS}
    assert got == want
    # spot semantics: credentials/port stripped, case folded
    assert got[2][0] == "sub.example.com"
    assert got[2][3] == "pdf"
    assert got[8][1] == "co.uk"  # the documented two-label heuristic
    assert got[6] == ("", "", "", "") and got[7] == ("", "", "", "")


def test_url_filter_semantics(spark):
    from reflexiv_spark.datapipe.urls import url_filter

    df = spark.createDataFrame(
        [
            (1, "https://www.good.com/page.html"),
            (2, "https://www.good.com/file.exe"),     # ext blocked
            (3, "https://spam.bad.com/x"),            # domain blocked
            (4, "https://www.bad.com/y.txt"),         # domain blocked
            (5, "https://blocked-host.ok.com/z"),     # exact host blocked
            (6, "https://fine.ok.com/w"),
        ],
        "doc_id long, url string",
    )
    blocked = spark.createDataFrame(
        [("bad.com",), ("blocked-host.ok.com",)], "domain string"
    )
    got = {r.doc_id: (r.ext_ok, r.domain_ok, r.kept)
           for r in url_filter(df, blocked).collect()}
    assert got[1] == (True, True, True)
    assert got[2] == (False, True, False)
    assert got[3] == (True, False, False)   # domain of spam.bad.com = bad.com
    assert got[4] == (True, False, False)
    assert got[5] == (True, False, False)   # host-level hit
    assert got[6] == (True, True, True)
    # no blocklist: domain_ok is uniformly true
    free = {r.doc_id: r.domain_ok for r in url_filter(df).collect()}
    assert all(free.values())


def test_domain_stats(spark):
    from reflexiv_spark.datapipe.urls import domain_stats

    df = spark.createDataFrame(
        [
            (1, "https://www.a.com/x", "abcd"),
            (2, "https://a.com/y", "ef"),
            (3, "https://cdn.a.com/z", None),
            (4, "https://b.org/w", "ghi"),
        ],
        "doc_id long, url string, text string",
    )
    got = {r.domain: (r.n_docs, r.n_hosts, r.total_chars)
           for r in domain_stats(df).collect()}
    assert got["a.com"] == (3, 3, 6)
    assert got["b.org"] == (1, 1, 3)


def test_cross_engine_regex_parity_random_corpus(spark):
    """The parsing contract is 'same answer under java.util.regex, RE2
    (DuckDB), and Python re' — hammer it with a seeded random corpus of
    URL-ish and garbage strings across all three engines."""
    import random

    import duckdb

    from reflexiv_spark.datapipe.urls import parse_urls

    rng = random.Random(42)
    alphabet = "abcXYZ019.:/?#@%-_~()[]{}\\ \t"
    schemes = ["https://", "http://", "ftp://", "x+y-z.9://", "://", ""]
    rows = []
    for i in range(500):
        s = rng.choice(schemes) + "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 60))
        )
        rows.append((i, s))
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r.doc_id: (r.host, r.domain, r.path, r.ext)
        for r in parse_urls(df).collect()
    }
    want = {i: _ref_parse(u) for i, u in rows}
    assert got == want
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck = {
        i: (h, d, p, e)
        for i, h, d, p, e in con.execute(
            "SELECT doc_id,"
            r" regexp_extract(lower(coalesce(url, '')),"
            r" '^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1),"
            r" regexp_extract(regexp_extract(lower(coalesce(url, '')),"
            r" '^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1),"
            r" '([^.]+\.[^.]+)$', 1),"
            r" regexp_extract(lower(coalesce(url, '')),"
            r" '^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1),"
            r" lower(regexp_extract(list_extract(string_split("
            r"regexp_extract(lower(coalesce(url, '')),"
            r" '^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1), '/'), -1),"
            r" '\.([a-zA-Z0-9]{1,8})$', 1))"
            " FROM t"
        ).fetchall()
    }
    assert duck == want


def test_streaming_equals_batch(spark, tmp_path):
    """url_filter is a stateless projection + stream-static broadcast
    blocklist join, so readStream composes: streaming output over a
    file source equals the batch output on the same rows."""
    from reflexiv_spark.datapipe.urls import url_filter

    rows = [
        (1, "https://www.good.com/page.html"),
        (2, "https://spam.bad.com/x.exe"),
        (3, None),
    ]
    src = tmp_path / "docs"
    spark.createDataFrame(rows, "doc_id long, url string").write.parquet(
        str(src)
    )
    blocked = spark.createDataFrame([("bad.com",)], "domain string")
    batch = sorted(
        tuple(r)
        for r in url_filter(spark.read.parquet(str(src)), blocked).collect()
    )
    stream = spark.readStream.schema("doc_id long, url string").parquet(
        str(src)
    )
    q = (
        url_filter(stream, blocked)
        .writeStream.format("memory")
        .queryName("urlf_eq")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            tuple(r) for r in spark.sql("select * from urlf_eq").collect()
        )
    finally:
        q.stop()
    assert got == batch and len(batch) == 3


def test_cli_url_filter(spark, tmp_path):
    from reflexiv_spark.__main__ import main

    docs = spark.createDataFrame(
        [(1, "https://good.com/a.html", "x"),
         (2, "https://bad.com/b.html", "y"),
         (3, "https://good.com/c.exe", "z")],
        "doc_id long, url string, text string",
    )
    inp = tmp_path / "docs.parquet"
    docs.write.parquet(str(inp))
    bl = tmp_path / "bl.parquet"
    spark.createDataFrame([("bad.com",)], "domain string").write.parquet(
        str(bl)
    )
    out = tmp_path / "kept"
    assert main(["url-filter", "-i", str(inp), "-o", str(out),
                 "--blocklist", str(bl), "--keep-only"]) == 0
    kept = {r.doc_id for r in spark.read.parquet(str(out)).collect()}
    assert kept == {1}
    st = tmp_path / "stats"
    assert main(["url-filter", "-i", str(inp), "-o", str(st),
                 "--stats"]) == 0
    got = {r.domain: r.n_docs for r in spark.read.parquet(str(st)).collect()}
    assert got == {"good.com": 2, "bad.com": 1}


def _duck(sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    return con.execute(sql).fetchall()


def test_staged_url_filter_parity(spark):
    """The round-13 STAGED driver pair gated locally this round:
    q_url_filter vs _SQL_URL_FILTER at sf0.01."""
    import __spark_entry__ as ent

    sdf = ent.q_url_filter(spark, "/root/testdata/sf0.01")
    assert sdf.columns == [
        "doc_id", "host", "domain", "ext", "ext_ok", "domain_ok", "kept"
    ]
    got = sorted(tuple(r) for r in sdf.collect())
    want = sorted(tuple(r) for r in _duck(ent._SQL_URL_FILTER))
    assert len(got) == 500
    ko = {r[6] for r in got}
    assert ko == {True, False}  # the verdict discriminates
    assert got == want


def test_staged_domain_stats_parity(spark):
    """The round-13 STAGED driver pair gated locally this round:
    q_domain_stats vs _SQL_DOMAIN_STATS at sf0.01."""
    import __spark_entry__ as ent

    sdf = ent.q_domain_stats(spark, "/root/testdata/sf0.01")
    assert sdf.columns == ["domain", "n_docs", "n_hosts", "total_chars"]
    got = sorted(tuple(r) for r in sdf.collect())
    want = sorted(tuple(r) for r in _duck(ent._SQL_DOMAIN_STATS))
    assert len(got) == 20  # one row per source
    assert all(r[1] == 25 and r[2] == 2 for r in got)  # 25 docs, 2 hosts
    assert got == want


def test_psl_registered_domains(spark):
    """Round-13 PSL support: multi-label public suffixes resolve to the
    true registrable domain; unlisted TLDs fall back to the implicit
    '*' rule (== the last-two-label heuristic); a host that IS a public
    suffix has no registrable domain."""
    from reflexiv_spark.datapipe.urls import parse_urls

    psl = spark.createDataFrame(
        [("co.uk",), ("uk",), ("com.au",), ("au",), ("com",),
         ("pvt.k12.ma.us",)],  # a real 4-label PSL entry
        "suffix string",
    )
    urls = [
        (1, "https://shop.example.co.uk/x.html"),     # 2-label suffix
        (2, "https://www.library.com.au/y"),          # 2-label suffix
        (3, "https://www.example.com/z"),             # 1-label suffix
        (4, "https://deep.a.b.school.pvt.k12.ma.us/") ,  # 4-label suffix
        (5, "https://example.co.uk"),                 # registrable, no www
        (6, "https://co.uk/"),                        # host IS a suffix
        (7, "https://foo.bar.unlistedtld/p"),         # implicit '*' rule
        (8, "https://single/x"),                      # one-label host
        (9, None),                                    # NULL url
    ]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    got = {
        r.doc_id: r.domain
        for r in parse_urls(df, psl=psl).collect()
    }
    assert got[1] == "example.co.uk"
    assert got[2] == "library.com.au"
    assert got[3] == "example.com"
    assert got[4] == "school.pvt.k12.ma.us"
    assert got[5] == "example.co.uk"
    assert got[6] == ""            # no registrable domain
    assert got[7] == "bar.unlistedtld"
    assert got[8] == ""            # one label, nothing registrable
    assert got[9] == ""            # NULL url → '' components
    # the non-domain columns are untouched by the PSL path
    heur = parse_urls(df)
    pairs = {
        (r.doc_id): (r.host, r.path, r.ext) for r in heur.collect()
    }
    for r in parse_urls(df, psl=psl).collect():
        assert (r.host, r.path, r.ext) == pairs[r.doc_id]


def test_psl_flows_through_filter_and_stats(spark):
    """url_filter blocklist entries match at the PSL registered domain,
    and domain_stats aggregates by it."""
    from reflexiv_spark.datapipe.urls import domain_stats, url_filter

    psl = spark.createDataFrame([("co.uk",), ("com",)], "suffix string")
    df = spark.createDataFrame(
        [(1, "https://a.bad.co.uk/x.html", "t1"),
         (2, "https://b.bad.co.uk/y.html", "t22"),
         (3, "https://good.com/z.html", "t333")],
        "doc_id long, url string, text string",
    )
    blocked = spark.createDataFrame([("bad.co.uk",)], "domain string")
    kept = {
        r.doc_id: r.kept
        for r in url_filter(df, blocked, psl=psl).collect()
    }
    assert kept == {1: False, 2: False, 3: True}
    stats = {
        r.domain: (r.n_docs, r.n_hosts, r.total_chars)
        for r in domain_stats(df, psl=psl).collect()
    }
    assert stats["bad.co.uk"] == (2, 2, 2 + 3)
    assert stats["good.com"] == (1, 1, 4)


def test_cli_psl_flag(spark, tmp_path):
    """--psl: the CLI wires a parquet suffix list through url-filter."""
    from reflexiv_spark.__main__ import main

    df = spark.createDataFrame(
        [(1, "https://shop.example.co.uk/x.html")],
        "doc_id long, url string",
    )
    psl = spark.createDataFrame([("co.uk",)], "suffix string")
    inp, pslp = tmp_path / "in.parquet", tmp_path / "psl.parquet"
    df.write.parquet(str(inp))
    psl.write.parquet(str(pslp))
    out = tmp_path / "out"
    assert main(["url-filter", "-i", str(inp), "-o", str(out),
                 "--psl", str(pslp)]) == 0
    r = spark.read.parquet(str(out)).collect()[0]
    assert r.domain == "example.co.uk"


def test_staged_domain_stats_psl_parity(spark):
    """The round-14 STAGED driver pair gated locally this round:
    q_domain_stats_psl vs _SQL_DOMAIN_STATS_PSL at sf0.01 — the PSL
    matcher (2-label suffix, listed 1-label, implicit '*' fallback,
    bare-suffix host) under the cross-engine oracle."""
    import __spark_entry__ as ent

    sdf = ent.q_domain_stats_psl(spark, "/root/testdata/sf0.01")
    assert sdf.columns == ["domain", "n_docs", "n_hosts", "total_chars"]
    got = sorted(tuple(r) for r in sdf.collect())
    want = sorted(tuple(r) for r in _duck(ent._SQL_DOMAIN_STATS_PSL))
    domains = {r[0] for r in got}
    assert "" in domains  # the bare-suffix hosts aggregate under ''
    assert any(d.endswith("-site.co.uk") for d in domains)  # 3-label
    assert any(d.endswith("-site.org") for d in domains)  # '*' fallback
    assert got == want


def test_psl_too_long_suffix_errors_lazily(spark):
    """A PSL entry beyond _PSL_MAX_LABELS fails LOUDLY at the first
    action (lazy raise_error — no eager plan-time job), never a
    silent mis-registration."""
    import pytest

    from reflexiv_spark.datapipe.urls import parse_urls

    df = spark.createDataFrame(
        [(1, "https://a.b.example.co.uk/x")], "doc_id long, url string"
    )
    psl = spark.createDataFrame(
        [("a.b.c.d.e.f.g",), ("co.uk",)], "suffix string"
    )
    out = parse_urls(df, psl=psl)      # plan construction must not run a job
    with pytest.raises(Exception, match="PSL entry exceeds"):
        out.collect()
