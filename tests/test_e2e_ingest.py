"""End-to-end capstones: (1) ingestion — synthetic WARC crawl →
warc-extract CLI → markup stripping → URL + quality curation → exact
dedup → corpus report; (2) export — curated docs → blocklist filter →
temperature mix → epoch shuffle → physical JSONL shards → loader
replay (conservation + contiguity). Proves the advertised
Common-Crawl-shaped composition works across module boundaries, not
just per-operator."""

from __future__ import annotations

from tests.test_warc import _http, _record


def _page(i: int, body_words: str) -> bytes:
    html = (
        f"<html><head><title>page {i}</title>"
        "<script>var x = 1;</script></head>"
        f"<body><p>{body_words}</p></body></html>"
    ).encode()
    return _record(
        f"page-{i}",
        uri=f"https://site{i % 3}.example.com/articles/{i}.html",
        payload=_http(html),
    )


def test_warc_to_curated_corpus(spark, tmp_path):
    from reflexiv_spark.__main__ import main
    from reflexiv_spark.datapipe.dedup import exact_dedup
    from reflexiv_spark.datapipe.report import corpus_report
    from reflexiv_spark.datapipe.text import strip_markup
    from reflexiv_spark.datapipe.urls import url_filter

    words = "the quick brown fox jumps over the lazy dog again and again"
    recs = []
    for i in range(12):
        recs.append(_page(i, f"{words} article number {i}"))
    # two exact clones of page 3's body on other URLs
    recs.append(_page(100, f"{words} article number 3"))
    recs.append(_page(101, f"{words} article number 3"))
    warc = tmp_path / "crawl.warc"
    warc.write_bytes(b"".join(recs))

    raw = tmp_path / "raw"
    assert main(["warc-extract", "-i", str(warc), "-o", str(raw)]) == 0
    docs = spark.read.parquet(str(raw))
    assert docs.count() == 14

    # URL curation: block one site, verdicts discriminate
    blocked = spark.createDataFrame(
        [("site2.example.com",)], "domain string"
    )
    verdicts = url_filter(docs, blocked)
    kept_ids = {
        r.doc_id for r in verdicts.where("kept").collect()
    }
    assert 0 < len(kept_ids) < 14
    curated = docs.join(
        verdicts.where("kept").select("doc_id"), "doc_id"
    )

    # markup stripping: tags and script bodies gone, prose kept
    stripped = strip_markup(curated)
    texts = {r.doc_id: r.text for r in stripped.collect()}
    assert all("<" not in t and "var x" not in t for t in texts.values())
    assert all("quick brown fox" in t for t in texts.values())

    # exact dedup over the stripped text — expected survivor count
    # computed from the stripped texts themselves (normalized form:
    # lower + trim + whitespace collapse)
    import re as _re

    def _norm(t):
        return _re.sub(r"\s+", " ", t.strip().lower())

    groups: dict[str, int] = {}
    for t in texts.values():
        groups[_norm(t)] = groups.get(_norm(t), 0) + 1
    deduped = exact_dedup(stripped, "text", "doc_id")
    assert deduped.count() == len(groups)

    # data card over the curated corpus (constant lang, no source col)
    from pyspark.sql import functions as F

    report = corpus_report(
        stripped.withColumn("lang", F.lit("en")), source_col=None
    ).collect()
    assert len(report) == 1
    row = report[0]
    assert row.n_docs == len(texts)
    assert row.n_distinct_texts == len(groups)
    assert row.n_dup_docs == sum(c for c in groups.values() if c > 1)
    assert row.total_tokens > 0 and row.median_tokens > 0


def test_curated_corpus_to_training_shards(spark, tmp_path):
    """Export-tier capstone: curated docs → blocklist filter →
    temperature mix → epoch shuffle → physical JSONL shards, then a
    LOADER replay proves conservation — every kept document appears
    in exactly one shard, token totals match the manifest, and the
    within-shard order follows the shuffled positions."""
    import json
    from pathlib import Path

    from pyspark.sql import functions as F

    from reflexiv_spark.datapipe.badwords import badwords_filter
    from reflexiv_spark.datapipe.sampling import corpus_shuffle, temperature_mix
    from reflexiv_spark.datapipe.shards import shard_manifest, write_shards

    rows = []
    for i in range(120):
        src = "web" if i % 3 else "books"
        bad = " forbidden" if i % 17 == 0 else ""
        rows.append((i, src, f"token stream number {i} with words{bad} " * 3))
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )

    clean = badwords_filter(docs, words=("forbidden",), keep_only=True)
    n_clean = clean.count()
    assert n_clean == sum(1 for i in range(120) if i % 17 != 0)

    mixed = temperature_mix(clean, alpha=0.5, budget_frac=0.9)
    kept = {r.doc_id: r.n_tokens for r in mixed.collect()}
    assert 0 < len(kept) <= n_clean

    pos = corpus_shuffle(mixed, salt="ep0", keep_cols=("n_tokens",))
    stream = pos.select(
        F.col("position").alias("doc_id"),
        F.col("doc_id").alias("orig_id"),
        F.col("n_tokens").alias("n_tok"),
    ).join(
        docs.select(F.col("doc_id").alias("orig_id"), "text"), "orig_id"
    )

    out = tmp_path / "shards"
    man = write_shards(
        stream, str(out), target_tokens=60,
        tokens_col="n_tok", keep_cols=("orig_id",),
    ).collect()

    # loader replay over the physical JSONL
    recs = []
    for d in Path(out).iterdir():
        if not d.name.startswith("shard_id="):
            continue
        sid = int(d.name.split("=")[1])
        for f_ in d.glob("*.txt"):
            for line in f_.read_text().splitlines():
                if line.strip():
                    r = json.loads(line)
                    r["shard_id"] = sid
                    recs.append(r)
    # every kept doc in exactly one shard
    assert sorted(r["orig_id"] for r in recs) == sorted(kept)
    # token conservation: manifest == loader == mix
    assert (
        sum(r.n_tokens for r in man)
        == sum(r["n_tokens"] for r in recs)
        == sum(kept.values())
    )
    # within-shard contiguity over the SHUFFLED positions
    by_shard: dict[int, list[int]] = {}
    for r in recs:
        by_shard.setdefault(r["shard_id"], []).append(r["doc_id"])
    ranges = sorted(
        (min(v), max(v), len(v)) for v in by_shard.values()
    )
    covered = []
    for lo, hi, n in ranges:
        assert hi - lo + 1 == n          # contiguous positions
        covered.extend(range(lo, hi + 1))
    assert covered == list(range(len(kept)))
