"""Incremental dedup against a persisted fingerprint store
(datapipe/incremental.py): exact-store anti-join semantics, store
update round-trip, LSH candidate screening recall, and the round-11
staged driver pair gated locally against DuckDB (SURVEY §8 staging
protocol)."""

from __future__ import annotations


def test_incremental_dedup_exact_semantics(spark):
    """Batch rows fingerprint-equal to the store drop; batch-internal
    duplicates keep the smallest id; NULL-text rows always pass;
    normalization (case/whitespace) matches the exact_dedup device."""
    from reflexiv_spark.datapipe.incremental import (
        exact_fingerprints,
        incremental_dedup,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "hello world")],
        "doc_id long, text string",
    )
    seen = exact_fingerprints(corpus)
    batch = spark.createDataFrame(
        [
            (10, "The  Quick  Brown   Fox"),  # store dup (normalized)
            (11, "something new entirely"),
            (12, "SOMETHING NEW entirely"),   # batch-internal dup of 11
            (13, None),                       # NULL text passes
            (14, "another fresh document"),
        ],
        "doc_id long, text string",
    )
    fresh = incremental_dedup(batch, seen)
    assert sorted(r.doc_id for r in fresh.collect()) == [11, 13, 14]
    assert fresh.columns == ["doc_id", "text"]  # schema passes through

    # store update round-trip: after the union, re-running the batch
    # yields only the NULL-text row (never fingerprinted)
    updated = seen.unionByName(
        exact_fingerprints(fresh)
    ).distinct()
    again = incremental_dedup(batch, updated)
    assert sorted(r.doc_id for r in again.collect()) == [13]

    # layout invariance
    fresh2 = incremental_dedup(batch.repartition(7), seen)
    assert sorted(r.doc_id for r in fresh2.collect()) == [11, 13, 14]


def test_incremental_candidates_flags_near_dups(spark):
    """A batch doc that is a near-duplicate of a seen doc collides on
    at least one LSH band (the minhash_lsh_pairs banding semantics);
    an unrelated doc does not."""
    import random

    from reflexiv_spark.datapipe.incremental import (
        band_fingerprints,
        incremental_candidates,
    )

    rng = random.Random(3)
    words = "alpha bravo charlie delta echo foxtrot golf hotel".split()
    base = " ".join(rng.choice(words) for _ in range(60))
    edited = base.rsplit(" ", 1)[0] + " zulu"  # one-word edit
    corpus = spark.createDataFrame(
        [(1, base)], "doc_id long, text string"
    )
    seen = band_fingerprints(corpus, num_hashes=64, bands=16)
    batch = spark.createDataFrame(
        [(10, edited), (11, "totally different content here " * 5)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_band_hits
        for r in incremental_candidates(
            batch, seen, num_hashes=64, bands=16
        ).collect()
    }
    assert got.get(10, 0) >= 1, got
    assert 11 not in got, got


def test_staged_driver_pair_parity(spark):
    """The round-11 STAGED driver pair gated locally this round:
    q_incremental_dedup and _SQL_INCREMENTAL_DEDUP must agree on rows,
    schema, and values at sf0.01 (SURVEY §8 staging protocol)."""
    import duckdb

    import __spark_entry__ as ent

    sdf = ent.q_incremental_dedup(spark, "/root/testdata/sf0.01")
    srows = sorted(r.doc_id for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    cur = con.execute(ent._SQL_INCREMENTAL_DEDUP)
    assert [d[0] for d in cur.description] == ["doc_id"]
    orows = sorted(r[0] for r in cur.fetchall())
    assert len(srows) == len(orows) > 100
    assert srows == orows
    # the store split really filtered something: every kept id is from
    # the batch partition
    assert all(i % 3 != 0 for i in srows)


def test_staged_candidates_parity(spark):
    """The round-13 STAGED driver pair gated locally this round:
    q_incremental_candidates vs _SQL_INCREMENTAL_CANDIDATES at
    sf0.01 (md5 family — the minhash_near_dup oracle device)."""
    import duckdb

    import __spark_entry__ as ent

    sdf = ent.q_incremental_candidates(spark, "/root/testdata/sf0.01")
    assert sdf.columns == ["doc_id", "n_band_hits"]
    got = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(ent._SQL_INCREMENTAL_CANDIDATES).fetchall()
    )
    assert 0 < len(got) < 450       # some raw docs collide, not all
    assert all(1 <= r[1] <= 8 for r in got)  # at most bands=8 hits
    assert got == want
