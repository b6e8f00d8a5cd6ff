"""URL parsing, blocklist filtering, and per-domain statistics — the
URL-level curation stage of web-corpus pipelines (C4 §2.2 drops pages
from bad-word domain lists; FineWeb §3.1 and CCNet apply UT1-style
blocklist + extension filters BEFORE any text ever gets scored; every
Common Crawl pipeline aggregates per registered domain for crawl-mix
and per-domain dedup decisions).

Parsing is a deliberate regexp chain, NOT ``F.parse_url``: every
pattern is RE2-compatible and means the same thing in Java regex and
DuckDB, so the SQL oracles replay each column bit-for-bit (the
``redact_pii``/``strip_markup`` determinism contract). Columns:

- ``host``: lower-cased authority, port and credentials stripped;
- ``domain``: the last two dot-labels of the host (the pragmatic
  registered-domain heuristic — a public-suffix list is a data file,
  not an algorithm, and slots in as a broadcast join when provided);
- ``path``: from the first ``/`` after the authority to ``?``/``#``;
- ``ext``: lower-cased extension of the last path segment ('' when
  none).

Scale shape: parsing is a zero-shuffle projection; blocklists are
model-sized broadcast joins (never a corpus shuffle); ``domain_stats``
is one map-side-combined hash aggregate keyed by domain — the same
shape at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2-safe building blocks (no lookarounds/backrefs) — identical
# semantics under java.util.regex and DuckDB's RE2.
_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"
_EXT_RE = r"\.([a-zA-Z0-9]{1,8})$"
_DOMAIN_RE = r"([^.]+\.[^.]+)$"


def _host(url: Column) -> Column:
    return F.regexp_extract(F.lower(url), _HOST_RE, 1)


def parse_urls(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """DataFrame[id, host, domain, path, ext] — '' for components a
    malformed URL lacks (never NULL: '' composes with the filters and
    group-bys without NULL-key special cases)."""
    u = F.coalesce(F.col(url_col), F.lit(""))
    host = _host(u)
    path = F.regexp_extract(F.lower(u), _PATH_RE, 1)
    last_seg = F.element_at(F.split(path, "/"), -1)
    return df.select(
        F.col(id_col),
        host.alias("host"),
        F.regexp_extract(host, _DOMAIN_RE, 1).alias("domain"),
        path.alias("path"),
        F.lower(F.regexp_extract(last_seg, _EXT_RE, 1)).alias("ext"),
    )


# The extension allowlist web-text pipelines keep: pages that plausibly
# hold prose. Everything binary/code/media is curation noise.
TEXT_EXTS = ("", "html", "htm", "php", "asp", "aspx", "jsp", "txt", "md")


def url_filter(
    df: DataFrame,
    blocked_domains: DataFrame | None = None,
    url_col: str = "url",
    id_col: str = "doc_id",
    allowed_exts: tuple[str, ...] = TEXT_EXTS,
) -> DataFrame:
    """Per-document URL curation verdict →
    DataFrame[id, host, domain, ext, ext_ok, domain_ok, kept].

    ``ext_ok``: extension in ``allowed_exts``; ``domain_ok``: domain
    (and exact host) absent from ``blocked_domains`` (a DataFrame with
    a ``domain`` column — UT1-style blocklists are model-sized, so the
    probe is one broadcast left join; pass None to skip).
    ``kept = ext_ok AND domain_ok``. Keeps every row with its verdict
    so callers can audit drop reasons; filter on ``kept`` to curate.
    """
    parsed = parse_urls(df, url_col, id_col)
    ext_ok = F.col("ext").isin(*allowed_exts)
    if blocked_domains is None:
        out = parsed.select(
            id_col, "host", "domain", "ext",
            ext_ok.alias("ext_ok"), F.lit(True).alias("domain_ok"),
        )
    else:
        bl = F.broadcast(
            blocked_domains.select(
                F.lower(F.col("domain")).alias("__bad"),
                F.lit(True).alias("__hit"),
            ).distinct()
        )
        out = (
            parsed.join(bl, parsed["domain"] == F.col("__bad"), "left")
            .withColumnRenamed("__hit", "__dom_hit")
            .drop("__bad")
            .join(bl, parsed["host"] == F.col("__bad"), "left")
            .select(
                id_col, "host", "domain", "ext",
                ext_ok.alias("ext_ok"),
                (F.col("__dom_hit").isNull() & F.col("__hit").isNull()).alias(
                    "domain_ok"
                ),
            )
        )
    return out.withColumn("kept", F.col("ext_ok") & F.col("domain_ok"))


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    text_col: str | None = "text",
) -> DataFrame:
    """Per-registered-domain corpus statistics →
    DataFrame[domain, n_docs, n_hosts, total_chars] — the crawl-mix /
    per-domain-dedup planning table. One hash aggregate keyed by
    domain; ``total_chars`` is 0-filled when ``text_col`` is None or
    missing."""
    parsed = parse_urls(df, url_col, id_col)
    if text_col is not None and text_col in df.columns:
        chars = df.select(
            F.col(id_col),
            F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("__c"),
        )
        parsed = parsed.join(chars, id_col)
    else:
        parsed = parsed.withColumn("__c", F.lit(0))
    return parsed.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count_distinct("host").cast("bigint").alias("n_hosts"),
        F.sum("__c").cast("bigint").alias("total_chars"),
    )
