"""Composed web-curation pipeline (datapipe/webcurate.py): planted
end-to-end behavior (markup stripped, low-quality dropped, clean-text
dupes removed, card accounts for survivors) and the round-14 STAGED
driver pair gated locally against DuckDB (SURVEY §8 staging
protocol)."""

from __future__ import annotations

GOOD = "the quick brown foxes jumped over those lazy dogs near rivers"


def test_planted_pipeline(spark):
    from reflexiv_spark.datapipe.webcurate import web_curate

    rows = [
        # kept: good text wrapped in markup (strip must recover it)
        (1, "en", "s1", "<p>" + GOOD + "</p><script>var x=1;</script>"),
        # kept, but an exact dup of 1 AFTER stripping → deduped away
        (2, "en", "s2", GOOD),
        # dropped: too short for min_words
        (3, "en", "s1", "tiny text"),
        # dropped: NULL text
        (4, "en", "s1", None),
        # kept: distinct good text, other language
        (5, "de", "s3", "the " + GOOD + " again and again today"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    got = {
        r.lang: r.asDict()
        for r in web_curate(df, min_words=5, min_stop_hits=1).collect()
    }
    assert set(got) == {"en", "de"}
    en = got["en"]
    # docs 1+2 collapse to one (dedup on CLEAN text — only works if the
    # markup really was stripped), 3 and 4 fail the quality gate
    assert en["n_docs"] == 1
    assert en["n_dup_docs"] == 0 and en["n_distinct_texts"] == 1
    assert en["total_tokens"] == len(GOOD.split())
    assert en["n_empty"] == 0
    assert got["de"]["n_docs"] == 1


def test_quality_gate_uses_clean_text(spark):
    """A hash-spam <script> block must NOT fail the Gopher symbol rule
    — the quality stage sees the STRIPPED text (stage-order wiring)."""
    from reflexiv_spark.datapipe.webcurate import web_curate

    df = spark.createDataFrame(
        [(1, "en", "s1",
          GOOD + "<script>### ### ### ### ### ### ###</script>")],
        "doc_id long, lang string, source string, text string",
    )
    rep = web_curate(df, min_words=5, min_stop_hits=1).collect()
    assert len(rep) == 1 and rep[0].n_docs == 1


def test_staged_driver_pair_parity(spark):
    """The round-14 STAGED driver pair gated locally this round:
    q_web_curate vs _SQL_WEB_CURATE at sf0.01."""
    import duckdb

    import __spark_entry__ as ent

    sdf = ent.q_web_curate(spark, "/root/testdata/sf0.01")
    assert sdf.columns == [
        "lang", "n_docs", "n_empty", "total_tokens", "median_tokens",
        "n_dup_docs", "n_distinct_texts", "n_sources",
    ]
    got = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.execute(ent._SQL_WEB_CURATE).fetchall()
    )
    assert len(got) >= 2                    # several languages survive
    n_curated = sum(r[1] for r in got)
    assert 0 < n_curated < 500              # the gate+dedup really bit
    assert got == want
