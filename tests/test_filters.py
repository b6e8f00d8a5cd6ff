"""Published quality-filter rule bundles (datapipe/filters.py):
Gopher and C4 semantics on planted rule-violating documents, NULL
edges, all-integer flag determinism, zero-shuffle plan shape, and the
round-11 staged driver pairs gated locally against DuckDB (SURVEY §8
staging protocol)."""

from __future__ import annotations


def test_gopher_rules_planted(spark):
    """Each Gopher rule rejects its planted violator; the well-formed
    doc passes; NULL text is keep=false with zero word counts."""
    from reflexiv_spark.datapipe.filters import gopher_rules

    good = (
        "This is a perfectly reasonable document that we have written "
        "with care. It talks about the weather and the sea and other "
        "things of note. " * 3
    )
    rows = [
        (1, good),
        (2, "too short to have fifty words in it"),
        (3, "#### " * 60),                      # symbol ratio + no stops
        (4, None),
        (5, "• b\n• b\n• b\n" + good),          # >90% bullet... 3/4 lines
        (6, ("a " * 60) + "the be to of"),      # mean word length < 3
        (7, good.replace(".", "...\n") ),       # ellipsis line endings
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r for r in gopher_rules(df).collect()}
    assert got[1].keep is True
    assert got[2].keep is False          # word count
    assert got[3].keep is False          # symbols + stop words
    assert got[4].keep is False and got[4].n_words == 0
    assert got[6].keep is False          # mean word length
    assert got[7].keep is False          # ellipsis-ending lines > 30%
    assert got[7].n_ellipsis_lines > 0
    # bullet rule: 3 of 4 lines are bullets -> 10*3 > 9*4 is false...
    # (30 <= 36 keeps it); plant a harder case: all-bullet doc
    allb = spark.createDataFrame(
        [(8, "• x\n" * 10)], "doc_id long, text string"
    )
    r8 = gopher_rules(allb).head()
    assert 10 * r8.n_bullet_lines > 9 * r8.n_lines and r8.keep is False


def test_c4_rules_planted(spark):
    """Line and page rules: terminal punctuation + min words kept,
    javascript lines dropped, lorem/brace pages rejected, sentence
    minimum enforced, clean_text is the kept lines re-joined."""
    from reflexiv_spark.datapipe.filters import c4_rules

    rows = [
        (1, "A full sentence here with words.\n"
            "Another proper sentence right there.\n"
            "And a third one finishes the doc.\n"
            "fragment without punctuation\n"
            "Enable javascript to view this page now."),
        (2, "lorem ipsum dolor sit amet and more. Good sentence here "
            "too. And another one right here."),
        (3, "Code page with brace {. One sentence here. Two more good "
            "ones follow here."),
        (4, "Only two sentences in this page now.\n"
            "Here is the second complete sentence."),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r for r in c4_rules(df).collect()}
    assert got[1].keep is True and got[1].n_kept_lines == 3
    assert "javascript" not in got[1].clean_text
    assert "fragment" not in got[1].clean_text
    assert got[2].keep is False and got[2].has_lorem is True
    assert got[3].keep is False and got[3].has_brace is True
    assert got[4].keep is False and got[4].n_sentences == 2
    assert got[5].keep is False and got[5].clean_text == ""


def test_zero_shuffle_plans(spark):
    """Both rule bundles are single-projection scans — no Exchange
    beyond the input fan-out on an already-spread input (the many-file
    100 TB scan shape passes `spread()` through untouched)."""
    from reflexiv_spark.datapipe.filters import c4_rules, gopher_rules

    df = spark.createDataFrame(
        [(1, "x. y.")], "doc_id long, text string"
    ).repartition(spark.sparkContext.defaultParallelism)
    for fn in (gopher_rules, c4_rules):
        plan = fn(df)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, (fn.__name__, plan)


def _duck(sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    return con.execute(sql).fetchall()


def test_staged_gopher_parity(spark):
    """The round-11 STAGED driver pair gated locally this round:
    q_gopher_rules vs _SQL_GOPHER_RULES at sf0.01 (SURVEY §8)."""
    import __spark_entry__ as ent

    sdf = ent.q_gopher_rules(spark, "/root/testdata/sf0.01")
    got = sorted(tuple(r) for r in sdf.collect())
    want = sorted(tuple(r) for r in _duck(ent._SQL_GOPHER_RULES))
    assert len(got) == 500
    assert any(r[-1] for r in got)       # the keep flag varies
    assert not all(r[-1] for r in got)
    assert got == want


def test_staged_c4_parity(spark):
    """q_c4_rules vs _SQL_C4_RULES at sf0.01 (SURVEY §8)."""
    import __spark_entry__ as ent

    sdf = ent.q_c4_rules(spark, "/root/testdata/sf0.01")
    got = sorted(tuple(r) for r in sdf.collect())
    want = sorted(tuple(r) for r in _duck(ent._SQL_C4_RULES))
    assert len(got) == 500
    assert any(r[3] > 0 for r in got)    # sentences exist post-rewrite
    assert got == want


def test_fineweb_rules_planted(spark):
    """Each FineWeb clause rejects its planted violator: low terminal-
    punctuation line density, duplicated-line characters >= 10%, short
    lines >= 67%; the well-formed doc keeps; NULL is keep=false."""
    from reflexiv_spark.datapipe.filters import fineweb_rules

    good = (
        "A first proper sentence that is long enough to pass checks.\n"
        "A second proper sentence that is also long enough to pass.\n"
        "A third distinct sentence that rounds out the document body."
    )
    rows = [
        (1, good),
        (2, "line without punctuation here\nanother unpunctuated line\n"
            "and one more plain line"),                     # punct density 0
        (3, good + "\n" + good.splitlines()[0] + "\n"
            + good.splitlines()[0]),                        # dup-line chars
        (4, "Tiny line one.\nTiny line two.\nTiny line 3.\n"
            "A single long line to avoid the punctuation trap here."),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r for r in fineweb_rules(df).collect()}
    assert got[1].keep is True and got[1].dup_chars == 0
    assert got[2].keep is False and got[2].n_punct_lines == 0
    assert got[3].keep is False and got[3].dup_chars > 0
    assert 10 * got[3].dup_chars >= got[3].total_chars
    assert got[4].keep is False            # 3 of 4 lines < 30 chars
    assert 100 * got[4].n_short_lines >= 67 * got[4].n_lines
    assert got[5].keep is False and got[5].total_chars == 0


def test_fineweb_zero_shuffle_plan(spark):
    from reflexiv_spark.datapipe.filters import fineweb_rules

    df = spark.createDataFrame(
        [(1, "x. y.")], "doc_id long, text string"
    ).repartition(spark.sparkContext.defaultParallelism)
    plan = fineweb_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_staged_fineweb_parity(spark):
    """The round-12 STAGED driver pair gated locally this round:
    q_fineweb_rules vs _SQL_FINEWEB_RULES at sf0.01."""
    import __spark_entry__ as ent

    sdf = ent.q_fineweb_rules(spark, "/root/testdata/sf0.01")
    got = sorted(tuple(r) for r in sdf.collect())
    want = sorted(tuple(r) for r in _duck(ent._SQL_FINEWEB_RULES))
    assert len(got) == 500
    assert any(r[-1] for r in got)
    assert not all(r[-1] for r in got)
    assert got == want
