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
