"""Cell-bounded kNN graph (datapipe/knn.py): planted-neighborhood
recall, determinism/layout invariance, blocked-GEMM parity, and the
staged round-10 driver pair gated locally against DuckDB (SURVEY §8
staging protocol)."""

from __future__ import annotations

import random


def _clustered_vectors(n_groups=4, per_group=12, dim=8, seed=11):
    """Groups on DISJOINT coordinate support (orthogonal centers) —
    cross-group cosine ≈ 0, so nearest neighbors are unambiguous."""
    rng = random.Random(seed)
    rows = []
    vid = 0
    span = dim // n_groups
    for g in range(n_groups):
        for _ in range(per_group):
            v = [0.0] * dim
            for i in range(g * span, (g + 1) * span):
                v[i] = rng.uniform(0.8, 1.0)
            rows.append((vid, g, v))
            vid += 1
    return rows


def test_knn_graph_planted_neighborhoods(spark):
    """With one cell (exact kNN), vectors in orthogonal planted groups
    pick exactly their own group; every vector emits exactly k edges;
    deterministic and layout-invariant. (Cell-BOUNDED recall with a
    trained model is covered end-to-end by the staged-pair parity test
    below — a stray vector assigned away from its group legitimately
    sees only its cell, so the strict all-same-group claim needs the
    single-cell setting.)"""
    from reflexiv_spark.datapipe.knn import knn_graph

    rows = _clustered_vectors()
    group = {vid: g for vid, g, _ in rows}
    df = spark.createDataFrame(
        [(vid, v) for vid, _, v in rows],
        "vec_id long, embedding array<float>",
    )
    edges = knn_graph(df, k=5, dim=8, n_centroids=1, id_col="vec_id")
    got = [(r.src, r.dst, r.cos) for r in edges.collect()]
    by_src: dict[int, list] = {}
    for s, d, c in got:
        by_src.setdefault(s, []).append((d, c))
        assert s != d
    assert len(by_src) == len(rows)
    for s, nbrs in by_src.items():
        assert len(nbrs) == 5
        assert all(group[d] == group[s] for d, _ in nbrs), (s, nbrs)
    # determinism + layout invariance
    got2 = sorted(
        (r.src, r.dst, r.cos)
        for r in knn_graph(
            df.repartition(7), k=5, dim=8, n_centroids=1
        ).collect()
    )
    assert got2 == sorted(got)


def test_knn_graph_blocked_gemm_parity(spark):
    """1-row GEMM blocks produce the identical edge set (same device as
    semantic_dedup's blocked kernel; budget is a closure-local)."""
    from reflexiv_spark.datapipe.knn import knn_graph

    rows = _clustered_vectors(n_groups=1, per_group=60, seed=3)
    df = spark.createDataFrame(
        [(vid, v) for vid, _, v in rows],
        "vec_id long, embedding array<float>",
    )
    a = sorted(
        (r.src, r.dst, r.cos)
        for r in knn_graph(
            df, k=7, dim=8, n_centroids=1, gemm_block_doubles=1 << 30
        ).collect()
    )
    b = sorted(
        (r.src, r.dst, r.cos)
        for r in knn_graph(
            df, k=7, dim=8, n_centroids=1, gemm_block_doubles=64
        ).collect()
    )
    assert a == b and len(a) == 60 * 7


def test_knn_graph_zero_norm_and_singleton(spark):
    """Zero-norm vectors emit and receive no edges; a vector alone in
    its cell emits none."""
    from reflexiv_spark.datapipe.knn import knn_graph

    df = spark.createDataFrame(
        [(1, [1.0, 0.5]), (2, [0.9, 0.55]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    edges = [(r.src, r.dst) for r in
             knn_graph(df, k=3, dim=2, n_centroids=1).collect()]
    assert sorted(edges) == [(1, 2), (2, 1)]


def test_knn_graph_oversized_cell_cap(spark):
    """The planted fat-cell case (VERDICT r9 #4): with max_cell_rows
    set far below the cell population, candidate generation splits the
    cell into id-mod sub-cells — every task holds a bounded shard, the
    graph stays deterministic/layout-invariant, and the recall trade is
    exactly the documented one (neighbors found within the shard only:
    in an orthogonal-group corpus, edges still never cross groups)."""
    from reflexiv_spark.datapipe.knn import knn_graph

    rows = _clustered_vectors(n_groups=2, per_group=40, seed=5)
    group = {vid: g for vid, g, _ in rows}
    df = spark.createDataFrame(
        [(vid, v) for vid, _, v in rows],
        "vec_id long, embedding array<float>",
    )
    capped = knn_graph(
        df, k=3, dim=8, n_centroids=1, max_cell_rows=16
    )
    got = [(r.src, r.dst, r.cos) for r in capped.collect()]
    # 80 rows in one cell, cap 16 → n_sub = 5; id-mod shards of the
    # planted interleaved groups hold 8 members of each group, so every
    # vector still finds k=3 same-group neighbors inside its shard
    by_src: dict[int, list] = {}
    for s, d, c in got:
        assert s != d
        assert group[s] == group[d], (s, d)
        # the shard invariant itself: an edge can only join vectors of
        # the same id-mod-5 residue class
        assert s % 5 == d % 5, (s, d)
        by_src.setdefault(s, []).append(d)
    assert len(by_src) == len(rows)
    assert all(len(v) == 3 for v in by_src.values())
    # deterministic + layout-invariant under the cap
    got2 = sorted(
        (r.src, r.dst, r.cos)
        for r in knn_graph(
            df.repartition(7), k=3, dim=8, n_centroids=1, max_cell_rows=16
        ).collect()
    )
    assert got2 == sorted(got)
    # cap >= cell size is a no-op: identical to the exact graph
    exact = sorted(
        (r.src, r.dst, r.cos)
        for r in knn_graph(df, k=3, dim=8, n_centroids=1).collect()
    )
    nocap = sorted(
        (r.src, r.dst, r.cos)
        for r in knn_graph(
            df, k=3, dim=8, n_centroids=1, max_cell_rows=80
        ).collect()
    )
    assert nocap == exact


def test_staged_driver_pair_parity(spark):
    """The round-10 driver pair gated LOCALLY this round: q_knn_graph
    and _SQL_KNN_GRAPH must agree on rows, schema, and values at
    sf0.01 — the comparison the driver runs when the pair registers."""
    import duckdb

    import __spark_entry__ as ent

    sdf = ent.q_knn_graph(spark, "/root/testdata/sf0.01")
    srows = sorted((r.src, r.dst, r.cos) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/embeddings.parquet')"
    )
    cur = con.execute(ent._SQL_KNN_GRAPH)
    assert [d[0] for d in cur.description] == ["src", "dst", "cos"]
    orows = sorted(tuple(r) for r in cur.fetchall())
    assert len(srows) == len(orows) > 1000
    assert srows == orows
