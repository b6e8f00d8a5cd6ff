"""Declarative pipeline runner (datapipe/runner.py) — spec compilation,
stage-for-stage equivalence with manual composition, barrier resume."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from reflexiv_spark.datapipe.runner import pipeline_ops, run_pipeline

SPEC = {
    "stages": [
        {"op": "strip_markup"},
        {"op": "gopher_rules", "min_words": 5, "min_stop_hits": 1},
        {"op": "exact_dedup"},
        {"op": "hash_sample", "rate": 0.8, "salt": "t"},
    ]
}


def _docs(spark):
    base = (
        "the and of to a in that it was for on with as his they be at "
        "one have this from or had by word but what some we can out "
        "other were all there when up use your how said an each she"
    )
    rows = []
    for i in range(40):
        body = f"{base} doc {i} filler." if i % 7 else f"{base} dup body."
        rows.append((i, "src%d" % (i % 3), f"<p>{body}</p>"))
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_equivalent_to_manual_composition(spark):
    from reflexiv_spark.datapipe.dedup import exact_dedup
    from reflexiv_spark.datapipe.filters import gopher_rules
    from reflexiv_spark.datapipe.sampling import hash_sample
    from reflexiv_spark.datapipe.text import strip_markup

    docs = _docs(spark)
    got = sorted(map(tuple, run_pipeline(spark, docs, SPEC).collect()))

    stripped = (
        docs.join(
            strip_markup(docs).select("doc_id", F.col("text").alias("__t")),
            "doc_id",
        )
        .withColumn("text", F.col("__t"))
        .drop("__t")
    )
    kept = (
        gopher_rules(stripped, min_words=5, min_stop_hits=1)
        .where("keep")
        .select(F.col("id").alias("doc_id"))
    )
    manual = hash_sample(
        exact_dedup(stripped.join(kept, "doc_id", "left_semi")),
        0.8,
        salt="t",
    )
    want = sorted(map(tuple, manual.collect()))
    assert got == want
    # every stage was load-bearing on this corpus
    assert 0 < len(got) < 40
    # non-text columns survived the whole chain
    assert {len(t) for t in got} == {3}


def test_spec_accepts_json_string(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, run_pipeline(spark, docs, SPEC).collect()))
    b = sorted(
        map(tuple, run_pipeline(spark, docs, json.dumps(SPEC)).collect())
    )
    assert a == b


def test_compile_time_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="non-empty"):
        run_pipeline(spark, docs, {"stages": []})
    with pytest.raises(ValueError, match="unknown op 'nope'"):
        run_pipeline(spark, docs, {"stages": [{"op": "nope"}]})
    with pytest.raises(ValueError, match='"op" key'):
        run_pipeline(spark, docs, {"stages": ["strip_markup"]})
    assert "exact_dedup" in pipeline_ops()


def test_barrier_resume_skips_completed_stages(spark, tmp_path):
    docs = _docs(spark)
    wd = str(tmp_path / "wd")
    first = sorted(
        map(tuple, run_pipeline(spark, docs, SPEC, workdir=wd).collect())
    )
    # barrier dirs exist for every stage (suffixed with the spec-prefix
    # hash that invalidates them when the spec is edited)
    names = sorted(p.name for p in (tmp_path / "wd").iterdir())
    prefixes = [n.rsplit("_", 1)[0] for n in names]
    assert prefixes == [
        "00_strip_markup", "01_gopher_rules", "02_exact_dedup",
        "03_hash_sample",
    ]
    # poison the FINAL barrier's data but keep its _SUCCESS: a resumed
    # run must re-read the completed barrier, not rebuild it, so the
    # poison shows through
    import shutil

    poison = tmp_path / "wd" / names[3]
    shutil.rmtree(poison)
    empty = spark.createDataFrame(
        [], "doc_id long, source string, text string"
    )
    empty.write.parquet(str(poison))
    resumed = run_pipeline(spark, docs, SPEC, workdir=wd).collect()
    assert resumed == []  # stage 03 was NOT rebuilt: resume is real
    # a PARTIAL final barrier (no _SUCCESS) is rebuilt from stage 02's
    # barrier and recovers the true output
    (poison / "_SUCCESS").unlink()
    recovered = sorted(
        map(tuple, run_pipeline(spark, docs, SPEC, workdir=wd).collect())
    )
    assert recovered == first
    # resume=False rebuilds everything and agrees too
    rebuilt = sorted(
        map(
            tuple,
            run_pipeline(
                spark, docs, SPEC, workdir=wd, resume=False
            ).collect(),
        )
    )
    assert rebuilt == first
    # editing a MID-CHAIN stage's params changes the downstream barrier
    # names: the old barriers are ignored, the edited chain rebuilds,
    # and the output reflects the new params (no stale resume)
    edited = json.loads(json.dumps(SPEC))
    edited["stages"][1]["min_words"] = 10_000  # nothing passes
    assert run_pipeline(spark, docs, edited, workdir=wd).count() == 0
    # the original spec STILL resumes its own barriers correctly
    again = sorted(
        map(tuple, run_pipeline(spark, docs, SPEC, workdir=wd).collect())
    )
    assert again == first


def test_cli_pipeline(spark, tmp_path):
    from reflexiv_spark.__main__ import main

    inp = tmp_path / "docs.parquet"
    _docs(spark).write.parquet(str(inp))
    spec = tmp_path / "spec.json"
    spec.write_text(json.dumps(SPEC))
    out = tmp_path / "out"
    assert main([
        "pipeline", "-i", str(inp), "-o", str(out),
        "--spec", str(spec), "--workdir", str(tmp_path / "wd"),
    ]) == 0
    back = spark.read.parquet(str(out))
    assert back.columns == ["doc_id", "source", "text"]
    assert 0 < back.count() < 40


def test_staged_driver_pair_parity(spark):
    """The round-14 STAGED driver pair gated locally this round:
    q_pipeline_curate vs _SQL_PIPELINE_CURATE at sf0.01 — the runner's
    adapter wiring hash-verified against the chained stage-oracle CTEs
    (shared _SQL_WET_CURATE_PREFIX + md5 hash-gate tail)."""
    import duckdb

    import __spark_entry__ as ent

    sdf = ent.q_pipeline_curate(spark, "/root/testdata/sf0.01")
    assert sdf.columns == ["doc_id", "lang", "source", "text"]
    got = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(
        ent._SQL_PIPELINE_CURATE
    ).fetchall())
    assert 0 < len(got) < 500  # strip + rules + dedup + gate all bite
    assert got == want


def test_lang_filter_scalar_and_c4_clean_text(spark):
    """lang_filter coerces a scalar langs string (the natural JSON
    mistake) instead of silently matching single characters; c4_rules
    swaps the line-cleaned text in rather than admitting docs on text
    the pipeline then ignores."""
    en = (
        "The cat and the dog were there. It was a good day for all. "
        "They said this would be fine."
    )
    docs = spark.createDataFrame(
        [(1, en + "\nshort junk line\n" + en)],
        "doc_id long, text string",
    )
    out = run_pipeline(
        spark, docs,
        {"stages": [{"op": "lang_filter", "langs": "en"}]},
    )
    assert out.count() == 1  # scalar "en" behaves as ["en"]
    cleaned = run_pipeline(
        spark, docs,
        {"stages": [{"op": "c4_rules", "min_line_words": 4}]},
    ).collect()
    assert len(cleaned) == 1
    assert "short junk line" not in cleaned[0].text  # clean_text swapped


def test_custom_text_col_strip(spark):
    docs = spark.createDataFrame(
        [(1, "<p>hello world</p>")], "doc_id long, body string"
    )
    out = run_pipeline(
        spark, docs, {"stages": [{"op": "strip_markup"}]},
        text_col="body",
    ).collect()
    assert out[0].body == "hello world"
