"""Training-shard export (datapipe/shards.py) + temperature mixing
(sampling.temperature_mix) — the round-13 loader-facing export tier."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from reflexiv_spark.datapipe.sampling import temperature_mix
from reflexiv_spark.datapipe.shards import (
    plan_shards,
    shard_manifest,
    write_shards,
)

SF001 = "/root/testdata/sf0.01"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_plan_matches_sequential_reference(spark):
    rows = [(i, "w " * (3 + (i * 7) % 11)) for i in range(40)]
    got = {
        r.doc_id: (r.n_tokens, r.shard_id, r.shard_offset)
        for r in plan_shards(_docs(spark, rows), target_tokens=20).collect()
    }
    cum = 0
    first_start = {}
    for i, text in rows:
        n = len(text.split())
        sid = cum // 20
        first_start.setdefault(sid, cum)
        # shard_offset is the TRUE within-shard offset (shards do not
        # begin exactly at target boundaries under the atomic rule)
        assert got[i] == (n, sid, cum - first_start[sid]), i
        cum += n
    assert len(got) == 40
    # first doc of every shard sits at offset 0
    zero = {r[1] for r in got.values() if r[2] == 0}
    assert zero == set(first_start)


def test_plan_partitioning_invariance(spark):
    rows = [(i, "tok " * (1 + i % 9)) for i in range(60)]
    a = sorted(
        map(tuple, plan_shards(_docs(spark, rows), 25).collect())
    )
    b = sorted(
        map(
            tuple,
            plan_shards(_docs(spark, rows).repartition(13), 25).collect(),
        )
    )
    assert a == b


def test_manifest_conserves_and_balances(spark):
    rows = [(i, "x " * (5 + (i * 13) % 37)) for i in range(200)]
    plan = plan_shards(_docs(spark, rows), target_tokens=100)
    man = shard_manifest(plan).collect()
    total = sum(len(t.split()) for _, t in rows)
    assert sum(r.n_tokens for r in man) == total
    assert sum(r.n_docs for r in man) == 200
    max_doc = max(len(t.split()) for _, t in rows)
    # document-atomic floor rule: every shard carries target ± one doc
    for r in man:
        assert r.n_tokens < 100 + max_doc
    # contiguity: shard id ranges are disjoint and ordered
    by_id = sorted(man, key=lambda r: r.shard_id)
    for a, b in zip(by_id, by_id[1:]):
        assert a.last_id < b.first_id


def test_write_shards_jsonl_roundtrip(spark, tmp_path):
    rows = [(i, f"doc {i} body " + "w " * (i % 7)) for i in range(30)]
    out = tmp_path / "shards"
    man = write_shards(
        _docs(spark, rows), str(out), target_tokens=30
    ).collect()
    # directory layout: one shard_id=K dir per manifest row
    dirs = {p.name for p in out.iterdir() if p.name.startswith("shard_id=")}
    assert dirs == {f"shard_id={r.shard_id}" for r in man}
    # rows round-trip with their text and plan columns
    seen = {}
    for d in out.iterdir():
        if not d.name.startswith("shard_id="):
            continue
        sid = int(d.name.split("=")[1])
        for f_ in d.glob("*.txt"):
            for line in f_.read_text().splitlines():
                rec = json.loads(line)
                seen[rec["doc_id"]] = (sid, rec["text"], rec["n_tokens"])
    want = {
        r.doc_id: r.shard_id
        for r in plan_shards(_docs(spark, rows), 30).collect()
    }
    assert {k: v[0] for k, v in seen.items()} == want
    assert all(seen[i][1] == t for i, t in rows)


def test_write_shards_parquet(spark, tmp_path):
    rows = [(i, "a b c d") for i in range(20)]
    out = tmp_path / "pq"
    write_shards(
        _docs(spark, rows), str(out), target_tokens=10, fmt="parquet"
    ).collect()
    back = spark.read.parquet(str(out))
    assert back.count() == 20
    assert {r.shard_id for r in back.select("shard_id").collect()} == {
        0, 1, 2, 3, 4, 5, 6, 7,
    }


def _mix_docs(spark):
    # three sources with very different masses: 64 / 16 / 4 docs of 10
    # tokens each
    rows = []
    for i in range(84):
        src = "big" if i < 64 else ("mid" if i < 80 else "small")
        rows.append((i, src, "tok " * 10))
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_temperature_rates_monotone_and_budgeted(spark):
    df = _mix_docs(spark)
    # budget_frac low enough that no source clamps at rate 1 (a clamp
    # redistributes nothing — the budget identity only holds unclamped)
    out = temperature_mix(df, alpha=0.5, budget_frac=0.3)
    rates = {
        r.source: r.rate_ppm
        for r in out.select("source", "rate_ppm").distinct().collect()
    }
    # alpha<1 up-weights small sources: rate(small) > rate(mid) > rate(big)
    assert rates["small"] > rates["mid"] > rates["big"]
    assert max(rates.values()) < 1_000_000
    # expected kept tokens == budget_frac·total within quantization
    masses = {"big": 640, "mid": 160, "small": 40}
    expected = sum(masses[s] * rates[s] / 1e6 for s in masses)
    assert abs(expected - 0.3 * 840) < 840 * 0.01


def test_temperature_alpha_one_is_proportional(spark):
    out = temperature_mix(_mix_docs(spark), alpha=1.0, budget_frac=0.4)
    rates = {
        r.source: r.rate_ppm
        for r in out.select("source", "rate_ppm").distinct().collect()
    }
    # alpha=1: q_i ∝ t_i so every source keeps ~budget_frac (quantized)
    for v in rates.values():
        assert abs(v - 400_000) <= 1_000


def test_temperature_partitioning_invariance(spark):
    df = _mix_docs(spark)
    a = sorted(map(tuple, temperature_mix(df).collect()))
    b = sorted(map(tuple, temperature_mix(df.repartition(17)).collect()))
    assert a == b


def test_temperature_rate_caps_at_one(spark):
    # a tiny source under a big budget: rate must clamp at 1e6, never
    # oversample
    out = temperature_mix(_mix_docs(spark), alpha=0.0, budget_frac=1.0)
    rates = {
        r.source: r.rate_ppm
        for r in out.select("source", "rate_ppm").distinct().collect()
    }
    assert rates["small"] == 1_000_000


def _duck(sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF001}/documents.parquet')"
    )
    return con.execute(sql).fetchall()


def test_staged_shard_manifest_parity(spark):
    """The round-14 STAGED driver pair gated locally this round:
    q_shard_manifest vs _SQL_SHARD_MANIFEST at sf0.01."""
    import __spark_entry__ as ent

    sdf = ent.q_shard_manifest(spark, SF001)
    assert sdf.columns == [
        "shard_id", "n_docs", "n_tokens", "first_id", "last_id"
    ]
    got = sorted(tuple(r) for r in sdf.collect())
    want = sorted(tuple(r) for r in _duck(ent._SQL_SHARD_MANIFEST))
    assert len(got) > 5  # the 2000-token target discriminates
    assert got == want


def test_staged_temperature_mix_parity(spark):
    """The round-14 STAGED driver pair gated locally this round:
    q_temperature_mix vs _SQL_TEMPERATURE_MIX at sf0.01."""
    import __spark_entry__ as ent

    sdf = ent.q_temperature_mix(spark, SF001)
    assert sdf.columns == ["doc_id", "source", "n_tokens", "rate_ppm"]
    got = sorted(tuple(r) for r in sdf.collect())
    want = sorted(tuple(r) for r in _duck(ent._SQL_TEMPERATURE_MIX))
    assert 0 < len(got) < 500  # the gate discriminates
    assert len({r[3] for r in got}) > 1  # rates differ across sources
    assert got == want


def test_cli_export_shards_and_text_mix(spark, tmp_path):
    from reflexiv_spark.__main__ import main

    rows = [(i, "s%d" % (i % 2), "word " * (4 + i % 5)) for i in range(24)]
    inp = tmp_path / "docs.parquet"
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.parquet(str(inp))

    out = tmp_path / "shards"
    mf = tmp_path / "manifest"
    assert main([
        "export-shards", "-i", str(inp), "-o", str(out),
        "--target-tokens", "40", "--manifest", str(mf),
    ]) == 0
    man = spark.read.parquet(str(mf)).collect()
    assert sum(r.n_docs for r in man) == 24
    assert any(p.name.startswith("shard_id=") for p in out.iterdir())

    mixed = tmp_path / "mixed"
    assert main([
        "text-mix", "-i", str(inp), "-o", str(mixed),
        "--alpha", "0.5", "--budget-frac", "0.5",
    ]) == 0
    back = spark.read.parquet(str(mixed))
    assert back.columns == ["doc_id", "source", "n_tokens", "rate_ppm"]
    assert 0 < back.count() <= 24


def test_plan_guards(spark):
    """Plan pins for the round-13 operators on an already-spread input
    (the many-file 100 TB scan shape): temperature_mix never shuffles
    the corpus — its only exchanges are the dim-sized mass aggregate,
    the single-partition dim window, the rates broadcast, and the two
    corpus scans (model + gate, the ccnet shape); plan_shards is one
    range/hash shuffle of (id, n_tokens) plus the per-partition-offset
    broadcast."""
    import re

    docs = spark.createDataFrame(
        [(i, "s%d" % (i % 3), "w " * (3 + i % 5)) for i in range(50)],
        "doc_id long, source string, text string",
    ).repartition(spark.sparkContext.defaultParallelism)

    p1 = (
        temperature_mix(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    kinds = re.findall(
        r"Exchange (RoundRobinPartitioning|SinglePartition|"
        r"hashpartitioning|rangepartitioning|HashedRelation|Identity)",
        p1,
    )
    # corpus fan-outs (input repartition) appear once per scan: 2 scans
    assert kinds.count("RoundRobinPartitioning") == 2, p1
    # dim-sized: one mass aggregate + one global window + one broadcast
    assert kinds.count("hashpartitioning") == 1, p1
    assert kinds.count("SinglePartition") == 1, p1
    assert kinds.count("HashedRelation") + kinds.count("Identity") == 1, p1

    p2 = (
        plan_shards(docs, 20)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # localCheckpoint truncates the lineage, so what remains is the
    # prefix-sum's per-partition window shuffle + the offsets broadcast
    # + the shard_offset window's hash shuffle (which doubles as the
    # writer's layout — write_shards pays no further shuffle)
    assert p2.count("Exchange") == 3, p2
    assert "BroadcastExchange" in p2 or "HashedRelation" in p2, p2
    assert "hashpartitioning(shard_id" in p2, p2


def test_temperature_mix_null_source_and_null_tokens(spark):
    """Review regressions: (a) NULL-source docs join their NULL mass
    group via eqNullSafe instead of silently vanishing; (b) NULL
    precomputed token counts coalesce to 0 (never NULL n_tokens)."""
    from reflexiv_spark.datapipe.sampling import temperature_mix

    rows = [(i, None if i < 40 else "s1", "tok " * 10) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = temperature_mix(df, budget_frac=1.0).collect()
    # budget_frac=1 with two equal-mass groups keeps everything; every
    # NULL-source doc must appear, carrying its group's rate
    srcs = {r.source for r in out}
    assert None in srcs and "s1" in srcs
    assert len(out) == 80
    # token_col path with NULLs: kept rows never emit NULL n_tokens
    t = spark.createDataFrame(
        [(1, "a", 5), (2, "a", None), (3, "a", 7)],
        "doc_id long, source string, n_tok long",
    )
    got = temperature_mix(t, budget_frac=1.0, token_col="n_tok").collect()
    assert len(got) == 3
    assert all(r.n_tokens is not None for r in got)
    assert {r.doc_id: r.n_tokens for r in got}[2] == 0


def test_write_shards_jsonl_keeps_null_fields(spark, tmp_path):
    """Review regression: to_json must emit the text key (as null) for
    NULL-text docs — a loader reading rec['text'] relies on the full
    payload schema in every line."""
    import json
    from pathlib import Path

    from reflexiv_spark.datapipe.shards import write_shards

    docs = spark.createDataFrame(
        [(1, "tok tok"), (2, None), (3, "tok")],
        "doc_id long, text string",
    )
    out = tmp_path / "shards"
    write_shards(docs, str(out), target_tokens=100).collect()
    recs = []
    for f in Path(out).rglob("part-*"):
        if f.suffix == ".txt" or f.name.startswith("part-"):
            for line in f.read_text().splitlines():
                if line.strip():
                    recs.append(json.loads(line))
    by_id = {r["doc_id"]: r for r in recs}
    assert set(by_id) == {1, 2, 3}
    assert "text" in by_id[2] and by_id[2]["text"] is None
