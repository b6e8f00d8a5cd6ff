"""Semantic (embedding) incremental store (datapipe/semstore.py):
planted near-duplicate detection across batches, store round-trip +
append-only update, zero-norm/empty-cell accounting, blocked-GEMM
parity, and the round-13 staged driver pair gated locally against
DuckDB (SURVEY §8 staging protocol)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _unit(i, dim=8, scale=1.0):
    v = [0.0] * dim
    v[i % dim] = scale
    return v


def test_probe_flags_planted_near_dups(spark):
    """A batch vector nearly parallel to a store vector flags with the
    right best id; an orthogonal one does not; zero-norm and
    empty-cell batch rows appear with (0, NULL, false)."""
    from reflexiv_spark.datapipe.semstore import (
        embedding_store,
        probe_embedding_store,
    )

    dim = 8
    store_rows = [(100, _unit(0, dim)), (101, _unit(1, dim))]
    batch_rows = [
        (1, [0.95, 0.05] + [0.0] * (dim - 2)),   # near store 100
        (2, _unit(2, dim)),                        # orthogonal
        (3, [0.0] * dim),                          # zero-norm
    ]
    cents = np.array(
        [np.floor(np.array(_unit(i, dim)) * 1000) for i in range(4)],
        dtype=np.int64,
    )
    store = embedding_store(_emb(spark, store_rows), cents, dim=dim)
    got = {
        r.vec_id: (r.n_candidates, r.best_store_id, r.flagged)
        for r in probe_embedding_store(
            _emb(spark, batch_rows), store, cents, threshold=0.9, dim=dim
        ).collect()
    }
    assert got[1] == (1, 100, True)
    assert got[2] == (0, None, False)
    assert got[3] == (0, None, False)
    assert len(got) == 3                        # every batch row present


def test_store_roundtrip_and_update(spark):
    """The store persists thin rows (no raw vectors needed at probe
    time); update_embedding_store appends a new batch and keeps one
    row per id."""
    from reflexiv_spark.datapipe.semstore import (
        embedding_store,
        probe_embedding_store,
        update_embedding_store,
    )

    dim = 8
    cents = np.array(
        [np.floor(np.array(_unit(i, dim)) * 1000) for i in range(4)],
        dtype=np.int64,
    )
    s1 = embedding_store(_emb(spark, [(100, _unit(0, dim))]), cents, dim=dim)
    s2 = embedding_store(
        _emb(spark, [(100, _unit(0, dim)), (200, _unit(1, dim))]),
        cents,
        dim=dim,
    )
    merged = update_embedding_store(s1, s2)
    assert merged.count() == 2                 # id 100 deduplicated
    batch = _emb(spark, [(1, _unit(1, dim))])
    got = probe_embedding_store(
        batch, merged, cents, threshold=0.9, dim=dim
    ).head()
    assert got.flagged and got.best_store_id == 200


def test_probe_ties_break_to_lowest_store_id(spark):
    """Two identical store vectors: best_store_id is the smaller."""
    from reflexiv_spark.datapipe.semstore import (
        embedding_store,
        probe_embedding_store,
    )

    dim = 8
    cents = np.array(
        [np.floor(np.array(_unit(i, dim)) * 1000) for i in range(2)],
        dtype=np.int64,
    )
    store = embedding_store(
        _emb(spark, [(300, _unit(0, dim)), (200, _unit(0, dim))]),
        cents,
        dim=dim,
    )
    got = probe_embedding_store(
        _emb(spark, [(1, _unit(0, dim))]), store, cents,
        threshold=0.9, dim=dim,
    ).head()
    assert got.n_candidates == 2 and got.best_store_id == 200


def test_probe_blocked_gemm_parity(spark):
    """The block budget is purely an execution knob: a 1-row block
    yields bit-identical output to the default."""
    from reflexiv_spark.datapipe.semstore import (
        embedding_store,
        probe_embedding_store,
    )

    rng = np.random.default_rng(7)
    dim = 8
    rows = [
        (i, [float(x) for x in rng.normal(size=dim)]) for i in range(60)
    ]
    cents = np.array(
        [np.floor(np.array(r[1]) * 1000) for r in rows[:4]], dtype=np.int64
    )
    store = embedding_store(
        _emb(spark, [r for r in rows if r[0] % 3 == 0]), cents, dim=dim
    )
    batch = _emb(spark, [r for r in rows if r[0] % 3 != 0])
    a = sorted(
        map(
            tuple,
            probe_embedding_store(
                batch, store, cents, threshold=0.2, dim=dim
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            probe_embedding_store(
                batch, store, cents, threshold=0.2, dim=dim,
                gemm_block_doubles=1,
            ).collect(),
        )
    )
    assert a == b
    assert any(r[3] for r in a)                # something flags at 0.2


def _duck(sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/embeddings.parquet')"
    )
    return con.execute(sql).fetchall()


def test_staged_driver_pair_parity(spark):
    """The round-13 STAGED driver pair gated locally:
    q_embedding_store_probe vs _SQL_EMBEDDING_STORE_PROBE at sf0.01
    (SURVEY §8 staging protocol)."""
    import __spark_entry__ as ent

    sdf = ent.q_embedding_store_probe(spark, "/root/testdata/sf0.01")
    got = sorted(tuple(r) for r in sdf.collect())
    want = sorted(tuple(r) for r in _duck(ent._SQL_EMBEDDING_STORE_PROBE))
    assert len(got) == 450
    assert any(r[3] for r in got) and not all(r[3] for r in got)
    assert len({r[1] for r in got}) > 1        # n_candidates varies
    assert got == want


def test_probe_preserves_62bit_ids_and_null_embeddings(spark):
    """Review regressions: (a) ids beyond 2^53 survive the probe
    exactly (the cogrouped frames keep int64 end to end — a
    NULL-tagged union would round them through float64); (b) a NULL
    embedding neither crashes the GEMM nor vanishes — it reports
    (0, NULL, false)."""
    from reflexiv_spark.datapipe.semstore import (
        embedding_store,
        probe_embedding_store,
    )

    dim = 8
    big = (1 << 61) + 12345                      # far beyond 2^53
    big_s = (1 << 61) + 99991
    cents = np.array(
        [np.floor(np.array(_unit(i, dim)) * 1000) for i in range(2)],
        dtype=np.int64,
    )
    store = embedding_store(
        _emb(spark, [(big_s, _unit(0, dim))]), cents, dim=dim
    )
    batch = _emb(
        spark,
        [(big, [0.95, 0.05] + [0.0] * (dim - 2)), (7, None)],
    )
    got = {
        r.vec_id: (r.n_candidates, r.best_store_id, r.flagged)
        for r in probe_embedding_store(
            batch, store, cents, threshold=0.9, dim=dim
        ).collect()
    }
    assert got[big] == (1, big_s, True)          # exact, not rounded
    assert got[7] == (0, None, False)            # NULL vec accounted
