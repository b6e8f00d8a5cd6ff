"""Winnow fingerprint store (datapipe/winnow_store.py): planted
cross-batch shared-passage detection, store round-trip/update
properties, and the round-13 STAGED driver pair gated locally against
DuckDB (SURVEY §8 staging protocol)."""

from __future__ import annotations


PASSAGE = "a long shared boilerplate passage repeated across batches"


def test_probe_flags_cross_batch_shared_passage(spark):
    from reflexiv_spark.datapipe.winnow_store import (
        probe_winnow_store,
        winnow_store,
    )

    corpus = spark.createDataFrame(
        [(1, "intro text " + PASSAGE + " outro text"),
         (2, "completely unrelated content zzz qqq vvv www")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, "fresh novel words then " + PASSAGE + " and more"),
         (11, "entirely new material nothing shared at all here"),
         (12, None),
         (13, "ab")],  # sub-k text: no fingerprints
        "doc_id long, text string",
    )
    store = winnow_store(corpus)
    got = {
        r.doc_id: (r.n_fps, r.n_hits, r.flagged)
        for r in probe_winnow_store(batch, store, min_shared=2).collect()
    }
    assert set(got) == {10, 11, 12, 13}
    # the shared passage is >= window + k - 1 chars, so the detection
    # guarantee fires: doc 10 shares fingerprints and flags
    assert got[10][1] >= 2 and got[10][2] is True
    assert got[11][2] is False
    assert got[12] == (0, 0, False)
    assert got[13] == (0, 0, False)


def test_store_update_round_trip(spark):
    """update_winnow_store is append-only union-distinct: probing the
    admitted batch against the UPDATED store flags it fully (every fp
    a hit), and updating twice is idempotent."""
    from reflexiv_spark.datapipe.winnow_store import (
        probe_winnow_store,
        update_winnow_store,
        winnow_store,
    )

    day1 = spark.createDataFrame(
        [(1, PASSAGE + " plus day one words")], "doc_id long, text string"
    )
    day2 = spark.createDataFrame(
        [(2, "day two says " + PASSAGE)], "doc_id long, text string"
    )
    store = winnow_store(day1)
    updated = update_winnow_store(store, winnow_store(day2))
    assert updated.count() >= store.count()
    again = update_winnow_store(updated, winnow_store(day2))
    assert again.count() == updated.count()  # idempotent
    rep = probe_winnow_store(day2, updated).collect()[0]
    assert rep.n_hits == rep.n_fps and rep.flagged


def test_parameter_mismatch_yields_no_hits(spark):
    """Fingerprints from different (k, window) parameters never match
    — the SAME-parameters contract in the probe docstring."""
    from reflexiv_spark.datapipe.winnow_store import (
        probe_winnow_store,
        winnow_store,
    )

    df = spark.createDataFrame(
        [(1, PASSAGE)], "doc_id long, text string"
    )
    store = winnow_store(df, k=12, window=6)
    rep = probe_winnow_store(df, store, k=8, window=4).collect()[0]
    assert rep.n_hits == 0 and not rep.flagged


def test_fingerprint_array_matches_exploded_kernel(spark):
    """The in-row kernel form (fingerprint_array, round-13 refactor)
    yields exactly the distinct fp VALUES winnow_fingerprints explodes
    — per document, over real corpus text, both hash families."""
    from pyspark.sql import functions as F

    from reflexiv_spark.datapipe.winnow import (
        fingerprint_array,
        winnow_fingerprints,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .limit(40)
    )
    for fam in ("xxhash64", "md5"):
        inrow = {
            r.doc_id: sorted(r.fps)
            for r in docs.select(
                "doc_id",
                fingerprint_array(
                    F.col("text"), k=8, window=4, hash_family=fam
                ).alias("fps"),
            ).collect()
        }
        exploded = {}
        for r in (
            winnow_fingerprints(docs, k=8, window=4, hash_family=fam)
            .select("id", "fp")
            .distinct()
            .collect()
        ):
            exploded.setdefault(r.id, []).append(r.fp)
        for did, fps in exploded.items():
            assert inrow[did] == sorted(fps), did
        # docs absent from the exploded form (NULL/sub-k) → empty array
        for did, fps in inrow.items():
            if did not in exploded:
                assert fps == []


def test_stream_probe_equals_batch_probe(spark, tmp_path):
    """probe_winnow_stream == probe_winnow_store == the same function
    run on a real stream, per document (the SURVEY §8 round-13
    pre-commit): file-source stream → in-row probe → append memory
    sink, no state, no watermark."""
    import json

    from reflexiv_spark.datapipe.winnow_store import (
        probe_winnow_store,
        probe_winnow_stream,
        store_fingerprint_list,
        winnow_store,
    )

    corpus = spark.createDataFrame(
        [(1, "intro text " + PASSAGE + " outro text"),
         (2, "unrelated reference material qqq vvv www zzz")],
        "doc_id long, text string",
    )
    batch_rows = [
        {"doc_id": 10, "text": "fresh novel words then " + PASSAGE},
        {"doc_id": 11, "text": "entirely new material nothing shared"},
        {"doc_id": 12, "text": None},
        {"doc_id": 13, "text": "ab"},
    ]
    batch = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in batch_rows],
        "doc_id long, text string",
    )
    store = winnow_store(corpus)
    fps = store_fingerprint_list(store)
    assert fps == sorted(set(fps))

    want = {
        r.doc_id: (r.n_fps, r.n_hits, r.flagged)
        for r in probe_winnow_store(batch, store, min_shared=2).collect()
    }
    got_batch = {
        r.doc_id: (r.n_fps, r.n_hits, r.flagged)
        for r in probe_winnow_stream(batch, fps, min_shared=2).collect()
    }
    assert got_batch == want

    d = tmp_path / "stream_in"
    d.mkdir()
    with open(d / "b1.json", "w") as f:
        for r in batch_rows:
            f.write(json.dumps(r) + "\n")
    from reflexiv_spark.streaming.windows import stream_from_files

    stream = stream_from_files(
        spark, str(d), "doc_id long, text string"
    )
    out = probe_winnow_stream(stream, fps, min_shared=2)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("winnow_probe_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_stream = {
        r.doc_id: (r.n_fps, r.n_hits, r.flagged)
        for r in spark.sql("SELECT * FROM winnow_probe_out").collect()
    }
    assert got_stream == want
    # empty store: nothing flags, n_fps still counted
    empty = {
        r.doc_id: (r.n_fps, r.n_hits, r.flagged)
        for r in probe_winnow_stream(batch, [], min_shared=2).collect()
    }
    assert all(h == 0 and not fl for _, h, fl in empty.values())
    assert empty[10][0] == want[10][0]


def test_staged_driver_pair_parity(spark):
    """The round-13 STAGED driver pair gated locally this round:
    q_winnow_store_probe vs _SQL_WINNOW_STORE_PROBE at sf0.01."""
    import duckdb

    import __spark_entry__ as ent

    sdf = ent.q_winnow_store_probe(spark, "/root/testdata/sf0.01")
    assert sdf.columns == ["doc_id", "n_fps", "n_hits", "flagged"]
    got = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.execute(ent._SQL_WINNOW_STORE_PROBE).fetchall()
    )
    assert len(got) == 450
    assert any(r[3] for r in got)       # some raw docs share passages
    assert not all(r[3] for r in got)   # and some don't
    assert got == want
