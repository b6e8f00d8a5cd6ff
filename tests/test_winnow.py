"""Winnowing fingerprints (datapipe/winnow.py): selection rule vs a
literal Python reference, the paper's detection guarantee on planted
shared passages, short-document and NULL edges, zero-shuffle plan
shape, and the round-11 staged driver pairs gated locally against
DuckDB (SURVEY §8 staging protocol)."""

from __future__ import annotations

import hashlib
import random

K, W = 8, 4
_POS_CAP = (1 << 20) - 1
_HASH_MOD = 1 << 40


def _md5_40(s: str) -> int:
    return (int(hashlib.md5(("w|" + s).encode()).hexdigest()[:15], 16)) % _HASH_MOD


def _ref_winnow(text: str, k: int = K, w: int = W) -> set[tuple[int, int]]:
    """Literal reference: normalized k-gram hashes, rightmost-min per
    window (one window over everything for short docs)."""
    t = " ".join(text.lower().strip().split())
    p = len(t) - k + 1
    if p < 1:
        return set()
    hs = [_md5_40(t[i : i + k]) for i in range(p)]
    out = set()
    for i in range(max(p - w + 1, 1)):
        win = hs[i : i + w]
        m = min(win)
        j = max(jj for jj, h in enumerate(win) if h == m)
        out.add((i + j + 1, m))  # 1-based position
    return out


def _fps(spark, rows):
    from reflexiv_spark.datapipe.winnow import winnow_fingerprints

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, hash_family="md5").collect():
        got.setdefault(r.id, set()).add((r.pos, r.fp))
    return got


def test_matches_python_reference(spark):
    """Randomized docs: the array-kernel selection equals the literal
    rightmost-min-per-window reference, including sub-window docs."""
    rng = random.Random(7)
    words = "alpha beta gamma delta epsilon zeta".split()
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randrange(1, 30))))
        for i in range(25)
    ]
    rows += [(100, "abcdefgh"), (101, "abcdefghi"), (102, "short")]
    got = _fps(spark, rows)
    for i, text in rows:
        assert got.get(i, set()) == _ref_winnow(text), (i, text)


def test_detection_guarantee_and_nulls(spark):
    """Any shared substring of length >= window + k - 1 yields a shared
    fingerprint VALUE (Theorem 1 of the paper) even at different
    offsets; NULL and too-short texts produce no rows."""
    shared = "the common stolen passage here"
    assert len(shared) >= W + K - 1
    rows = [
        (1, "zzz qqq " + shared + " tail one"),
        (2, shared + " completely different ending words"),
        (3, None),
        (4, "xy"),  # shorter than k
    ]
    got = _fps(spark, rows)
    fp1 = {fp for _, fp in got[1]}
    fp2 = {fp for _, fp in got[2]}
    assert fp1 & fp2, "detection guarantee violated"
    assert 3 not in got and 4 not in got


def test_zero_shuffle_plan(spark):
    """The fingerprint kernel is ONE projection — no Exchange anywhere
    in the physical plan once the input is already spread to the
    session's parallelism (the 100 TB many-file scan shape; on few-
    partition local inputs `spread()` legitimately adds one fan-out)."""
    from reflexiv_spark.datapipe.winnow import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, "abcdefghijkl")], "doc_id long, text string"
    ).repartition(spark.sparkContext.defaultParallelism)
    plan = (
        winnow_fingerprints(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan  # only the input repartition


def test_overlap_pairs(spark):
    """winnow_overlap finds the planted near-pair (shared passage) and
    not the unrelated doc; threshold respected."""
    from reflexiv_spark.datapipe.winnow import winnow_overlap

    passage = "a long shared boilerplate sentence that repeats verbatim"
    rows = [
        (1, "intro " + passage + " outro alpha"),
        (2, passage + " but with a different continuation"),
        (3, "nothing in common with the others at all zzz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnow_overlap(df, min_shared=2, hash_family="md5").collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 2
    assert all(3 not in pair for pair in got)


def test_staged_driver_pair_parity(spark):
    """The round-11 STAGED driver pair gated locally this round:
    q_winnow_fingerprint and _SQL_WINNOW_FINGERPRINT must agree on
    rows, schema, and values at sf0.01 (SURVEY §8 staging protocol)."""
    import duckdb

    import __spark_entry__ as ent

    sdf = ent.q_winnow_fingerprint(spark, "/root/testdata/sf0.01")
    assert sdf.columns == ["id", "pos", "fp"]
    got = sorted(tuple(r) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.execute(ent._SQL_WINNOW_FINGERPRINT).fetchall()
    )
    assert len(got) > 100
    assert got == want


def test_staged_overlap_parity(spark):
    """q_winnow_overlap vs _SQL_WINNOW_OVERLAP at sf0.01."""
    import duckdb

    import __spark_entry__ as ent

    sdf = ent.q_winnow_overlap(spark, "/root/testdata/sf0.01")
    assert sdf.columns == ["id_a", "id_b", "n_shared"]
    got = sorted(tuple(r) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.execute(ent._SQL_WINNOW_OVERLAP).fetchall()
    )
    assert len(got) > 0
    assert got == want


def test_overlap_max_df_cap(spark):
    """The max_df stop-gram cap: a passage shared by 2 docs survives;
    a gram present in ALL docs is dropped from pairing, so the
    boilerplate-only pair disappears while the passage pair stays."""
    from reflexiv_spark.datapipe.winnow import winnow_overlap

    boiler = "universal boilerplate header every doc carries"
    passage = "the rare shared sentence only two docs have"
    rows = [
        (1, boiler + " " + passage + " alpha tail"),
        (2, boiler + " " + passage + " beta ending"),
        (3, boiler + " solitary body zzz"),
        (4, boiler + " different tail qqq"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r.id_a, r.id_b)
        for r in winnow_overlap(df, min_shared=1, hash_family="md5").collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in winnow_overlap(
            df, min_shared=1, hash_family="md5", max_df=2
        ).collect()
    }
    # boilerplate pairs everything without the cap
    assert (3, 4) in uncapped
    # with the cap only the genuine passage pair remains
    assert (1, 2) in capped
    assert (3, 4) not in capped


def test_streaming_equals_batch(spark, tmp_path):
    """The fingerprint kernel is stateless, so readStream composes:
    streaming output over a file source equals the batch output on the
    same rows (the _spread_batch guard — spread() would throw on a
    streaming plan)."""
    from reflexiv_spark.datapipe.winnow import winnow_fingerprints

    rows = [
        (1, "a shared document body to fingerprint"),
        (2, "another rather different body of text"),
        (3, None),
    ]
    src = tmp_path / "docs"
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.parquet(str(src))
    batch = sorted(
        tuple(r)
        for r in winnow_fingerprints(
            spark.read.parquet(str(src)), hash_family="md5"
        ).collect()
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    q = (
        winnow_fingerprints(stream, hash_family="md5")
        .writeStream.format("memory")
        .queryName("wfp_eq")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            tuple(r) for r in spark.sql("select * from wfp_eq").collect()
        )
    finally:
        q.stop()
    assert got == batch and len(batch) > 0


def _ref_remove(rows, k=K, w=W):
    """Literal Python reference for remove_shared_spans: min-id
    ownership over the reference fingerprints, per-char excision."""
    fps = {}
    for i, text in rows:
        if text is None:
            continue
        fps[i] = _ref_winnow(text, k, w)
    owner = {}
    for i, s in fps.items():
        for _, h in s:
            owner[h] = min(owner.get(h, i), i)
    out = {}
    for i, text in rows:
        if text is None:
            out[i] = (0, 0, None)
            continue
        t = " ".join(text.lower().strip().split())
        rm = set()
        for pos, h in fps.get(i, set()):
            if owner[h] != i:
                rm |= set(range(pos, pos + k))  # 1-based chars
        clean = "".join(
            c for j, c in enumerate(t, start=1) if j not in rm
        )
        spans = sum(1 for j in sorted(rm) if j - 1 not in rm)
        out[i] = (spans, len(rm), clean)
    return out


def test_remove_shared_spans_reference(spark):
    """remove_shared_spans matches the literal per-char reference on a
    planted clone family + NULL/short/unique docs, and the excision
    guarantee holds: the cleaned non-owner shares no substring of
    length >= W + K - 1 with the owner."""
    from reflexiv_spark.datapipe.winnow import remove_shared_spans

    shared = "a long shared boilerplate passage that repeats verbatim"
    rows = [
        (1, f"first doc header {shared} first doc tail"),
        (2, f"second {shared} second tail differs completely"),
        (3, f"third intro {shared} third outro text"),
        (4, "wholly unrelated document body with its own words"),
        (5, None),
        (6, "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.id: (r.n_spans, r.chars_removed, r.clean_text)
        for r in remove_shared_spans(df, k=K, window=W,
                                     hash_family="md5").collect()
    }
    assert got == _ref_remove(rows)
    # owner keeps, non-owners excised
    assert shared in got[1][2]
    assert shared not in got[2][2] and shared not in got[3][2]
    # excision mirror of the detection guarantee
    t1 = got[1][2]
    for doc in (2, 3):
        t = got[doc][2]
        lim = W + K - 1
        for s in range(len(t) - lim + 1):
            assert t[s : s + lim] not in t1


def test_staged_span_removal_parity(spark):
    """The round-12 STAGED driver pair gated locally this round:
    q_winnow_span_removal vs _SQL_WINNOW_SPAN_REMOVAL at sf0.01
    (SURVEY §8 staging protocol)."""
    import duckdb

    import __spark_entry__ as ent

    sdf = ent.q_winnow_span_removal(spark, "/root/testdata/sf0.01")
    assert sdf.columns == ["id", "n_spans", "chars_removed", "clean_text"]
    got = sorted(
        tuple(r) for r in sdf.collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.execute(ent._SQL_WINNOW_SPAN_REMOVAL).fetchall()
    )
    assert len(got) == 500
    assert any(r[1] > 0 for r in got)      # the clone families excise
    assert any(r[1] == 0 for r in got)     # unique docs pass through
    assert got == want


def test_remove_reference_spans_planted(spark):
    """Cross-corpus excision: train docs lose exactly the passages that
    appear in the reference corpus; reference-only and train-only
    content is untouched; NULL passes through."""
    from reflexiv_spark.datapipe.winnow import remove_reference_spans

    leaked = "the exact benchmark question text appears here verbatim"
    train = spark.createDataFrame(
        [
            (1, f"intro {leaked} outro words"),
            (2, "zebra quokka wombat axolotl gecko iguana newt frog"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(100, f"benchmark item: {leaked}")], "doc_id long, text string"
    )
    got = {
        r.id: r
        for r in remove_reference_spans(
            train, ref, k=K, window=W, hash_family="md5"
        ).collect()
    }
    assert set(got) == {1, 2, 3}          # reference docs never output
    assert leaked not in got[1].clean_text
    assert got[1].n_spans > 0
    assert got[2].n_spans == 0
    assert got[2].clean_text == "zebra quokka wombat axolotl gecko iguana newt frog"
    assert got[3].clean_text is None
    # excision guarantee vs the reference text
    t1, tr = got[1].clean_text, " ".join(f"benchmark item: {leaked}".split())
    lim = W + K - 1
    for s in range(len(t1) - lim + 1):
        assert t1[s : s + lim] not in tr


def test_staged_ref_removal_parity(spark):
    """The round-12 STAGED driver pair gated locally this round:
    q_winnow_ref_removal vs _SQL_WINNOW_REF_REMOVAL at sf0.01."""
    import duckdb

    import __spark_entry__ as ent

    sdf = ent.q_winnow_ref_removal(spark, "/root/testdata/sf0.01")
    assert sdf.columns == ["id", "n_spans", "chars_removed", "clean_text"]
    got = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.execute(ent._SQL_WINNOW_REF_REMOVAL).fetchall()
    )
    assert len(got) == 450                 # raw shard only
    assert any(r[1] > 0 for r in got)
    # the ~20-word synthetic vocabulary makes every raw doc share SOME
    # 8-gram with the target shard, so n_spans is never 0 here; the
    # per-doc excision still varies and the planted test covers the
    # no-overlap case
    assert len({r[2] for r in got}) > 10   # chars_removed varies
    assert got == want


def test_remove_shared_spans_random_property(spark):
    """Randomized property vs the literal per-char reference: plant
    shared passages at random offsets inside random-word documents and
    require exact (n_spans, chars_removed, clean_text) agreement. One
    batched DataFrame (the repo's hypothesis-with-Spark pattern keeps
    per-example Spark jobs out of the loop)."""
    import random

    from reflexiv_spark.datapipe.winnow import remove_shared_spans

    rng = random.Random(1107)
    vocab = [
        "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
        "theta", "iota", "kappa", "lam", "mu",
    ]

    def words(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    shared = [words(8), words(12)]
    rows = []
    for i in range(40):
        body = words(rng.randint(0, 25))
        if rng.random() < 0.5:
            s = rng.choice(shared)
            cut = rng.randint(0, max(len(body) - 1, 0))
            body = body[:cut] + " " + s + " " + body[cut:]
        rows.append((i, body if rng.random() < 0.95 else None))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.id: (r.n_spans, r.chars_removed, r.clean_text)
        for r in remove_shared_spans(
            df, k=K, window=W, hash_family="md5"
        ).collect()
    }
    assert got == _ref_remove(rows)
