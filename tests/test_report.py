"""Corpus report / data card (datapipe/report.py): literal expected
values on a planted corpus, NULL/empty and no-source edges, and the
round-13 STAGED driver pair gated locally against DuckDB."""

from __future__ import annotations


def test_planted_corpus_values(spark):
    from reflexiv_spark.datapipe.report import corpus_report

    rows = [
        # en: 5 docs — a dup pair, one empty, one NULL
        (1, "en", "s1", "alpha beta gamma"),          # 3 tokens
        (2, "en", "s1", "alpha  beta GAMMA "),        # dup of 1 normalized
        (3, "en", "s2", "one two three four five"),   # 5 tokens
        (4, "en", "s2", "   "),                       # empty, 0 tokens
        (5, "en", "s3", None),                        # NULL, 0 tokens
        # de: 2 docs, no dups
        (6, "de", "s1", "eins zwei"),
        (7, "de", "s9", "drei vier fuenf sechs"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    got = {r.lang: r.asDict() for r in corpus_report(df).collect()}
    en = got["en"]
    assert en["n_docs"] == 5 and en["n_empty"] == 2
    assert en["total_tokens"] == 3 + 3 + 5
    # ranks by (tokens, id): (0,4)(0,5)(3,1)(3,2)(5,3) → rank 3 → 3
    assert en["median_tokens"] == 3
    assert en["n_dup_docs"] == 2          # both members of the dup pair
    # distinct normalized texts among non-NULL: {alpha beta gamma,
    # one..five, ""} — the empty doc normalizes to '' (still a text)
    assert en["n_distinct_texts"] == 3
    assert en["n_sources"] == 3
    de = got["de"]
    assert de["n_docs"] == 2 and de["n_dup_docs"] == 0
    assert de["median_tokens"] == 2  # rank (2+1)//2 = 1 → smaller doc
    assert de["n_sources"] == 2


def test_null_lang_group_accounted(spark):
    """Round-13 ADVICE fix: NULL-lang documents must appear in their
    own output row (null-safe joins) — a data card accounts for every
    document; previously the inner equi-join on lang dropped them."""
    from reflexiv_spark.datapipe.report import corpus_report

    df = spark.createDataFrame(
        [
            (1, None, "s1", "a b"),
            (2, None, "s1", "a b"),
            (3, "en", "s2", "x"),
        ],
        "doc_id long, lang string, source string, text string",
    )
    got = {r.lang: r.asDict() for r in corpus_report(df).collect()}
    assert None in got and got[None]["n_docs"] == 2
    assert got[None]["n_dup_docs"] == 2
    assert got[None]["median_tokens"] == 2
    assert got["en"]["n_docs"] == 1
    assert sum(r["n_docs"] for r in got.values()) == 3


def test_missing_source_column(spark):
    from reflexiv_spark.datapipe.report import corpus_report

    df = spark.createDataFrame(
        [(1, "en", "a b c")], "doc_id long, lang string, text string"
    )
    r = corpus_report(df).collect()[0]
    assert r.n_sources == 0 and r.n_docs == 1 and r.total_tokens == 3


def test_staged_driver_pair_parity(spark):
    """The round-13 STAGED driver pair gated locally this round:
    q_corpus_report vs _SQL_CORPUS_REPORT at sf0.01."""
    import duckdb

    import __spark_entry__ as ent

    sdf = ent.q_corpus_report(spark, "/root/testdata/sf0.01")
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
        tuple(r) for r in con.execute(ent._SQL_CORPUS_REPORT).fetchall()
    )
    assert len(got) >= 2          # at least two languages in the corpus
    assert sum(r[1] for r in got) == 500
    assert got == want
