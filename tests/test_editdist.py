"""Edit-distance similarity join (datapipe/editdist.py): deletion-
neighborhood completeness, exact-threshold semantics vs a brute-force
Python Levenshtein, normalization/NULL handling, and the round-11
staged driver pair gated locally against DuckDB (SURVEY §8 staging
protocol)."""

from __future__ import annotations

import itertools
import random


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_deletion_neighborhood_contents(spark):
    """Depth 0/1/2 neighborhoods are exactly the distinct deletion
    variants (the FastSS candidate sets)."""
    import pyspark.sql.functions as F

    from reflexiv_spark.datapipe.editdist import deletion_neighborhood

    df = spark.createDataFrame([("abc",)], "s string")
    got = {
        d: sorted(
            df.select(
                deletion_neighborhood(F.col("s"), d).alias("v")
            ).head().v
        )
        for d in (0, 1, 2)
    }
    assert got[0] == ["abc"]
    assert got[1] == sorted({"abc", "bc", "ac", "ab"})
    assert got[2] == sorted({"abc", "bc", "ac", "ab", "a", "b", "c"})


def test_edit_join_matches_bruteforce(spark):
    """Randomized corpus of near-variants: edit_join == brute-force
    all-pairs Levenshtein at d=1 and d=2 (completeness AND exactness —
    the FastSS candidate set misses nothing, the verify drops every
    false candidate)."""
    from reflexiv_spark.datapipe.editdist import edit_join

    rng = random.Random(11)
    base = ["spark engine", "data pipeline", "quick brown fox"]
    rows = []
    for i in range(60):
        s = rng.choice(base)
        ops = rng.randrange(0, 4)
        for _ in range(ops):
            p = rng.randrange(0, max(len(s), 1))
            op = rng.choice("ids")
            if op == "i":
                s = s[:p] + rng.choice("abcxyz ") + s[p:]
            elif op == "d" and s:
                s = s[:p] + s[p + 1 :]
            elif s:
                s = s[:p] + rng.choice("abcxyz ") + s[p + 1 :]
        rows.append((i, s))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    keyed = {i: " ".join(s.lower().strip().split())[:16] for i, s in rows}
    for d in (1, 2):
        want = sorted(
            (a, b, _lev(keyed[a], keyed[b]))
            for a, b in itertools.combinations(sorted(keyed), 2)
            if _lev(keyed[a], keyed[b]) <= d
        )
        got = sorted(
            (r.id_a, r.id_b, r.dist)
            for r in edit_join(df, max_dist=d, key_len=16).collect()
        )
        assert got == want, f"d={d}"


def test_edit_join_null_and_normalization(spark):
    """NULL texts never pair; case/whitespace-variant identical keys
    pair at distance 0; layout invariance."""
    from reflexiv_spark.datapipe.editdist import edit_join

    df = spark.createDataFrame(
        [
            (1, "Hello   World example"),
            (2, "hello world EXAMPLE padded past the key"),
            (3, None),
            (4, "entirely different body"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in edit_join(df, max_dist=1, key_len=16).collect()
    )
    assert got == [(1, 2, 0)]
    got2 = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in edit_join(
            df.repartition(5), max_dist=1, key_len=16
        ).collect()
    )
    assert got2 == got


def test_staged_driver_pair_parity(spark):
    """The round-11 STAGED driver pair gated locally this round:
    q_edit_join and _SQL_EDIT_JOIN (brute-force ground truth) must
    agree on rows, schema, and values at sf0.01 (SURVEY §8 staging
    protocol)."""
    import duckdb

    import __spark_entry__ as ent

    sdf = ent.q_edit_join(spark, "/root/testdata/sf0.01")
    assert sdf.columns == ["id_a", "id_b", "dist"]
    got = sorted(tuple(r) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(ent._SQL_EDIT_JOIN).fetchall())
    assert len(got) > 0  # the gate row must be non-trivial
    assert got == want


def test_edit_join_clone_family_skew(spark):
    """A hot variant key (a 60-doc clone family with identical keys)
    must yield exactly C(60,2) distance-0 pairs plus the planted d=1
    satellites — the distinct-before-verify path under heavy key skew,
    the shape the scaled corpus stresses."""
    from reflexiv_spark.datapipe.editdist import edit_join

    rows = [(i, "identical prefix here padded long") for i in range(60)]
    rows += [(100, "identicaX prefix here different"), (101, "something else")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = edit_join(df, max_dist=1, key_len=16).collect()
    zero = [r for r in got if r.dist == 0]
    one = [r for r in got if r.dist == 1]
    assert len(zero) == 60 * 59 // 2
    # doc 100 is distance 1 from each clone, nothing pairs with 101
    assert len(one) == 60 and all(r.id_b == 100 for r in one)
    assert not any(101 in (r.id_a, r.id_b) for r in got)
