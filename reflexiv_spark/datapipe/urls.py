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
- ``domain``: the registered domain — by default the last two
  dot-labels of the host (a pragmatic heuristic, wrong for multi-label
  public suffixes: ``example.co.uk`` → ``co.uk``); pass a public-
  suffix list (``psl=``, round 13) to get the true registrable domain
  via longest-suffix-match broadcast joins;
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


# Longest public suffix the PSL matcher considers. The real PSL's
# longest entries are 4 labels (a handful of 5-label historic entries
# exist; callers who need them can raise this — each step is one more
# model-sized broadcast join).
_PSL_MAX_LABELS = 4


def parse_urls(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    psl: DataFrame | None = None,
) -> DataFrame:
    """DataFrame[id, host, domain, path, ext] — '' for components a
    malformed URL lacks (never NULL: '' composes with the filters and
    group-bys without NULL-key special cases).

    ``psl`` (round 13): an optional public-suffix list — a DataFrame
    with a ``suffix`` column of plain dotted suffixes (``co.uk``,
    ``com.au``, ``uk`` …) — fixing the registered-domain column for
    multi-label suffixes (``shop.example.co.uk`` → ``example.co.uk``,
    not ``co.uk``). Matching is LONGEST-suffix-wins over at most
    ``_PSL_MAX_LABELS`` labels, executed as one model-sized broadcast
    left join per label count — the corpus never shuffles. Unlisted
    TLDs fall back to the PSL's implicit ``*`` rule (the last label is
    the suffix ⇒ domain = last two labels, the same answer as the
    default heuristic); a host that IS a public suffix has no
    registrable domain → ``''``. Wildcard (``*.ck``) and exception
    (``!www.ck``) PSL rules are data-prep: expand them to plain
    suffixes before passing the frame. ``psl=None`` (default) keeps
    the last-two-label heuristic — and the oracle replay — unchanged."""
    u = F.coalesce(F.col(url_col), F.lit(""))
    host = _host(u)
    path = F.regexp_extract(F.lower(u), _PATH_RE, 1)
    last_seg = F.element_at(F.split(path, "/"), -1)
    ext = F.lower(F.regexp_extract(last_seg, _EXT_RE, 1))
    if psl is None:
        return df.select(
            F.col(id_col),
            host.alias("host"),
            F.regexp_extract(host, _DOMAIN_RE, 1).alias("domain"),
            path.alias("path"),
            ext.alias("ext"),
        )
    base = df.select(
        F.col(id_col),
        host.alias("host"),
        path.alias("path"),
        ext.alias("ext"),
        F.split(host, r"\.").alias("__labels"),
    )
    sfx = psl.select(F.lower(F.col("suffix")).alias("__sfx")).distinct()
    # reject suffixes the matcher would silently never match (the real
    # PSL has a handful of 5-label entries): a silently-ignored suffix
    # mis-registers every host under it. The guard is a LAZY
    # raise_error on the suffix relation itself (not a driver collect:
    # an eager job at plan-construction time would run once per
    # url_filter/domain_stats call and break lazy/streaming
    # composition) — it fires executor-side at the first action with
    # the offending entry in the message.
    sfx = sfx.withColumn(
        "__sfx",
        F.when(
            F.size(F.split(F.col("__sfx"), r"\.")) > _PSL_MAX_LABELS,
            F.raise_error(
                F.concat(
                    F.lit(
                        "PSL entry exceeds _PSL_MAX_LABELS="
                        f"{_PSL_MAX_LABELS} labels: "
                    ),
                    F.col("__sfx"),
                    F.lit(
                        "; raise the limit or drop it explicitly — "
                        "silently ignoring it would mis-register every "
                        "host under that suffix"
                    ),
                )
            ),
        ).otherwise(F.col("__sfx")),
    )
    cur = base
    for m in range(_PSL_MAX_LABELS, 0, -1):
        blm = F.broadcast(
            sfx.where(
                F.size(F.split(F.col("__sfx"), r"\.")) == m
            ).withColumnRenamed("__sfx", f"__sfx{m}")
        )
        cand = F.when(
            F.size("__labels") >= m,
            F.array_join(F.slice("__labels", -m, m), "."),
        )
        cur = cur.join(blm, cand == F.col(f"__sfx{m}"), "left")
    # longest match wins; no match → the implicit '*' rule (1 label)
    nsfx = F.coalesce(
        *[
            F.when(F.col(f"__sfx{m}").isNotNull(), F.lit(m))
            for m in range(_PSL_MAX_LABELS, 0, -1)
        ],
        F.lit(1),
    )
    nlab = F.size("__labels")
    domain = F.when(
        nlab > nsfx,
        F.array_join(
            F.slice("__labels", -(nsfx + F.lit(1)), nsfx + F.lit(1)), "."
        ),
    ).otherwise(F.lit(""))
    return cur.select(
        F.col(id_col),
        "host",
        domain.alias("domain"),
        "path",
        "ext",
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
    psl: DataFrame | None = None,
) -> DataFrame:
    """Per-document URL curation verdict →
    DataFrame[id, host, domain, ext, ext_ok, domain_ok, kept].

    ``ext_ok``: extension in ``allowed_exts``; ``domain_ok``: domain
    (and exact host) absent from ``blocked_domains`` (a DataFrame with
    a ``domain`` column — UT1-style blocklists are model-sized, so the
    probe is one broadcast left join; pass None to skip).
    ``kept = ext_ok AND domain_ok``. Keeps every row with its verdict
    so callers can audit drop reasons; filter on ``kept`` to curate.
    ``psl`` forwards to :func:`parse_urls` so blocklist entries like
    ``example.co.uk`` match at the true registered domain.
    """
    parsed = parse_urls(df, url_col, id_col, psl=psl)
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
    psl: DataFrame | None = None,
) -> DataFrame:
    """Per-registered-domain corpus statistics →
    DataFrame[domain, n_docs, n_hosts, total_chars] — the crawl-mix /
    per-domain-dedup planning table. One hash aggregate keyed by
    domain; ``total_chars`` is 0-filled when ``text_col`` is None or
    missing. ``psl`` forwards to :func:`parse_urls` (without it every
    ccTLD host aggregates under its public suffix, e.g. ``co.uk``)."""
    parsed = parse_urls(df, url_col, id_col, psl=psl)
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
