"""Structured Streaming tests: file source → windowed aggs / stateful
dedup → memory sink, with batch/stream result equivalence."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from reflexiv_spark.streaming.windows import (
    sessionize,
    stream_from_files,
    streaming_dedup,
    windowed_counts,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _write_batch(d, name, rows):
    with open(d / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


ROWS1 = [
    {"event_id": 1, "ts": "2026-01-01T10:05:00", "event_type": "a", "value": 1.0},
    {"event_id": 2, "ts": "2026-01-01T10:20:00", "event_type": "a", "value": 2.0},
    {"event_id": 3, "ts": "2026-01-01T10:40:00", "event_type": "b", "value": 3.0},
]
ROWS2 = [
    {"event_id": 4, "ts": "2026-01-01T11:10:00", "event_type": "a", "value": 4.0},
    {"event_id": 2, "ts": "2026-01-01T11:15:00", "event_type": "a", "value": 9.9},  # dup id
]


def _run_stream(df, name, output_mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _write_batch(d, "b1.json", ROWS1)
    _write_batch(d, "b2.json", ROWS2)

    stream = stream_from_files(spark, str(d), SCHEMA, max_files_per_trigger=1)
    out = windowed_counts(stream, window="1 hour", watermark="10 minutes")
    _run_stream(out, "win_counts", "complete")
    got = {
        (str(r.win_start), r.event_type, r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }

    batch = spark.read.schema(SCHEMA).json(str(d))
    expected = {
        (str(r.win_start), r.event_type, r.n, r.sum_value)
        for r in windowed_counts(batch, window="1 hour").collect()
    }
    assert got == expected  # same function, same answer, batch or stream
    assert ("2026-01-01 10:00:00", "a", 2, 3.0) in got


def test_sessionize_batch(spark, tmp_path):
    rows = [
        (1, "2026-01-01 09:00:00"),
        (1, "2026-01-01 09:10:00"),   # same session (gap 10m < 30m)
        (1, "2026-01-01 11:00:00"),   # new session
        (2, "2026-01-01 09:05:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = sessionize(df, key="user_id", gap="30 minutes").collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r.n_events)
    assert sorted(per_user[1]) == [1, 2]
    assert per_user[2] == [1]


def test_watermark_admits_late_drops_too_late(spark, tmp_path):
    """Watermark semantics proof: with a 10-minute watermark and append
    mode, a late row INSIDE the delay still lands in its (closed) window,
    while a row arriving after the watermark has passed its window end is
    dropped — bounded state with bounded lateness, the late-data contract.
    """
    import time

    d = tmp_path / "wm"
    d.mkdir()
    batches = [
        # b0: events up to 12:00 -> watermark advances to 11:50 after it
        [
            {"event_id": 1, "ts": "2026-01-01T10:05:00", "event_type": "a", "value": 1.0},
            {"event_id": 2, "ts": "2026-01-01T12:00:00", "event_type": "a", "value": 1.0},
        ],
        # b1: admissible late row (11:55 >= watermark 11:50)
        [{"event_id": 3, "ts": "2026-01-01T11:55:00", "event_type": "a", "value": 2.0}],
        # b2: too-late row — its [10:00,11:00) window end is far below the
        # 11:50 watermark in force, so the state operator must drop it
        [{"event_id": 4, "ts": "2026-01-01T10:30:00", "event_type": "a", "value": 9.0}],
        # b3: advance the watermark far enough to close every window
        [{"event_id": 5, "ts": "2026-01-01T15:00:00", "event_type": "z", "value": 0.0}],
    ]
    for i, rows in enumerate(batches):
        _write_batch(d, f"b{i}.json", rows)
        time.sleep(1.1)  # distinct mtimes keep per-file batch order stable

    stream = stream_from_files(spark, str(d), SCHEMA, max_files_per_trigger=1)
    out = windowed_counts(stream, window="1 hour", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("wm_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (str(r.win_start), r.event_type): (r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM wm_out").collect()
    }
    # 10:00 window: only the on-time event — the too-late 10:30 row (id 4)
    # was dropped; 11:00 window: the admissible late row (id 3) counted
    assert rows[("2026-01-01 10:00:00", "a")] == (1, 1.0)
    assert rows[("2026-01-01 11:00:00", "a")] == (1, 2.0)
    assert rows[("2026-01-01 12:00:00", "a")] == (1, 1.0)
    # and the drop is visible in the state-operator metrics
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1


def test_streaming_dedup_checkpoint_restart(spark, tmp_path):
    """Stateful dedup survives a full query shutdown + restart: the state
    store and source progress live in the checkpoint, so (1) already-read
    files are not reprocessed, and (2) a key first seen BEFORE the restart
    is still recognized as a duplicate AFTER it (VERDICT r4 stretch 8).

    foreachBatch + parquet because the file sink rejects update mode;
    this is the standard stateful-streaming sink shape.
    """
    src = tmp_path / "in3"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt3")
    out = str(tmp_path / "out3")
    _write_batch(src, "b1.json", ROWS1)

    def start():
        stream = stream_from_files(spark, str(src), SCHEMA)
        deduped = streaming_dedup(stream, key_col="event_id")
        return (
            deduped.writeStream.foreachBatch(
                lambda bdf, _bid: bdf.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )

    q1 = start()
    q1.awaitTermination(120)
    assert sorted(r.event_id for r in spark.read.parquet(out).collect()) == [1, 2, 3]

    # query is fully terminated; only the checkpoint remembers anything.
    # batch 2 carries a NEW id (4) and a cross-restart duplicate (id 2).
    _write_batch(src, "b2.json", ROWS2)
    q2 = start()
    q2.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    # no reprocessing of b1 (each id once) and the restarted state store
    # suppressed the duplicate: id 2 keeps its original value
    assert sorted(r.event_id for r in rows) == [1, 2, 3, 4]
    assert [r.value for r in rows if r.event_id == 2] == [2.0]


def test_clean_doc_stream_filters_and_dedups_across_batches(spark, tmp_path):
    """The streaming cleaning twin: quality/token filters apply per row,
    and the content-hash dedup suppresses a clone arriving in a LATER
    micro-batch than its original."""
    import json as _json
    import time

    from pyspark.sql.types import StringType

    from reflexiv_spark.streaming.windows import clean_doc_stream

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    good = (
        "the quick brown fox jumps over the lazy dog and that is the "
        "story of the morning in the field where everything is calm"
    )
    other = (
        "a completely different document about the sea and the wind that "
        "is long enough to pass the token floor and the quality gate "
        "because it is made of the usual words and of plain sentences"
    )
    d = tmp_path / "clean_in"
    d.mkdir()
    batches = [
        [{"doc_id": 1, "text": good}, {"doc_id": 2, "text": "too short"}],
        [{"doc_id": 3, "text": good}, {"doc_id": 4, "text": other}],
    ]
    for i, rows in enumerate(batches):
        with open(d / f"b{i}.json", "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        time.sleep(1.1)

    stream = stream_from_files(spark, str(d), schema, max_files_per_trigger=1)
    out = clean_doc_stream(stream, min_tokens=10)
    q = (
        out.writeStream.format("memory")
        .queryName("clean_stream_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM clean_stream_out").collect()
    # doc 2 failed the token floor; doc 3 (cross-batch clone of 1) was
    # suppressed by the state store; 1 and 4 survive with their scores
    assert sorted(r.doc_id for r in rows) == [1, 4]
    assert all(r.quality >= 0.6 and r.n_tokens >= 10 for r in rows)


def test_streaming_dedup_state_across_batches(spark, tmp_path):
    d = tmp_path / "in2"
    d.mkdir()
    _write_batch(d, "b1.json", ROWS1)
    _write_batch(d, "b2.json", ROWS2)
    stream = stream_from_files(spark, str(d), SCHEMA, max_files_per_trigger=1)
    deduped = streaming_dedup(stream, key_col="event_id")
    _run_stream(deduped, "dedup_out", "update")
    rows = spark.sql("SELECT * FROM dedup_out").collect()
    ids = [r.event_id for r in rows]
    assert sorted(ids) == [1, 2, 3, 4]  # event 2 emitted exactly once
    # the first occurrence (value 2.0), not the duplicate (9.9), survives
    assert [r.value for r in rows if r.event_id == 2] == [2.0]


def test_interval_join_streams_matches_batch(spark, tmp_path):
    """Stream-stream interval join: pairs match the batch range join and
    arrive in append mode with watermark-bounded state."""
    from reflexiv_spark.operators.temporal import range_join_pairs
    from reflexiv_spark.streaming.windows import interval_join_streams

    jschema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
        ]
    )
    ld = tmp_path / "left"; ld.mkdir()
    rd = tmp_path / "right"; rd.mkdir()
    _write_batch(ld, "l.json", [
        {"event_id": 1, "user_id": 7, "ts": "2026-01-01T10:30:00"},
        {"event_id": 2, "user_id": 7, "ts": "2026-01-01T12:00:00"},
        {"event_id": 3, "user_id": 8, "ts": "2026-01-01T10:00:00"},
    ])
    _write_batch(rd, "r.json", [
        {"event_id": 10, "user_id": 7, "ts": "2026-01-01T10:00:00"},
        {"event_id": 11, "user_id": 7, "ts": "2026-01-01T11:30:00"},
        {"event_id": 12, "user_id": 8, "ts": "2026-01-01T11:00:00"},  # after left 3
    ])

    lstream = stream_from_files(spark, str(ld), jschema)
    rstream = stream_from_files(spark, str(rd), jschema)
    out = interval_join_streams(lstream, rstream, tolerance="1 hour")
    _run_stream(out, "ivjoin", "append")
    got = {(r.lid, r.rid) for r in spark.sql("SELECT * FROM ivjoin").collect()}
    # left 1 ← right 10 (30 min); left 2 ← right 11 (30 min); left 3: none
    assert got == {(1, 10), (2, 11)}

    lb = spark.read.schema(jschema).json(str(ld))
    rb = spark.read.schema(jschema).json(str(rd))
    batch = {
        (r["lid"], r["rid"])
        for r in range_join_pairs(lb, rb, on="user_id", tolerance_s=3600).collect()
    }
    assert batch == got  # stream and batch twins agree


def test_streaming_hot_tokens_stream_matches_batch(spark, tmp_path):
    from reflexiv_spark.streaming.windows import streaming_hot_tokens

    d = tmp_path / "docs_in"
    d.mkdir()
    doc_rows1 = [
        {"ts": "2026-01-01T10:05:00", "text": "spark spark duck goose"},
        {"ts": "2026-01-01T10:20:00", "text": "spark goose goose"},
    ]
    doc_rows2 = [
        {"ts": "2026-01-01T11:10:00", "text": "duck duck duck spark"},
    ]
    _write_batch(d, "b1.json", doc_rows1)
    _write_batch(d, "b2.json", doc_rows2)
    schema = "ts timestamp, text string"

    stream = stream_from_files(spark, str(d), schema, max_files_per_trigger=1)
    out = streaming_hot_tokens(
        stream, window="1 hour", min_count=3, watermark="10 minutes"
    )
    _run_stream(out, "hot_toks", "complete")
    got = {
        (str(r.win_start), r.token, r.n)
        for r in spark.sql("SELECT * FROM hot_toks").collect()
    }
    assert got == {
        ("2026-01-01 10:00:00", "spark", 3),
        ("2026-01-01 10:00:00", "goose", 3),
        ("2026-01-01 11:00:00", "duck", 3),
    }

    # batch/stream equivalence: same callable on the batch read
    batch = spark.read.schema(schema).json(str(d))
    expected = {
        (str(r.win_start), r.token, r.n)
        for r in streaming_hot_tokens(
            batch, window="1 hour", min_count=3
        ).collect()
    }
    assert got == expected


def test_streaming_top_tokens_chained_aggs_append(spark, tmp_path):
    """Two chained stateful aggregations in append mode: per-window
    ranked top-k arrays emit once the watermark closes each window."""
    from reflexiv_spark.streaming.windows import streaming_top_tokens

    d = tmp_path / "docs_topk"
    d.mkdir()
    _write_batch(d, "b1.json", [
        {"ts": "2026-01-01T10:05:00", "text": "a a a b b c"},
        {"ts": "2026-01-01T10:45:00", "text": "b d"},
    ])
    # second file advances the watermark far enough to close window 10:00
    _write_batch(d, "b2.json", [
        {"ts": "2026-01-01T13:00:00", "text": "zzz"},
    ])
    schema = "ts timestamp, text string"
    stream = stream_from_files(spark, str(d), schema, max_files_per_trigger=1)
    out = streaming_top_tokens(
        stream, window="1 hour", k=2, watermark="10 minutes"
    )
    _run_stream(out, "top_toks", "append")
    rows = {
        str(r.win_start): [(t["n"], t["token"]) for t in r.top]
        for r in spark.sql("SELECT * FROM top_toks").collect()
    }
    # 10:00 window closed by the 13:00 row: a=3, b=3 ranked by struct
    # order (count desc, token desc on ties)
    assert rows.get("2026-01-01 10:00:00") == [(3, "b"), (3, "a")]
    # 13:00 window not closed (no later watermark) -> not emitted in append
    assert "2026-01-01 13:00:00" not in rows


def test_strip_and_classify_compose_on_streams(spark, tmp_path):
    """strip_markup is a stateless Catalyst chain — it runs on a
    readStream unchanged in append mode. classifier_score re-aggregates
    exploded features per doc (a stateful shape on an unbounded stream),
    so it rides foreachBatch — the canonical micro-batch pattern for
    per-batch-complete operators; inside the batch it is the SAME
    operator, bit-identical to the batch path."""
    import json as _json

    from pyspark.sql.types import StringType

    from reflexiv_spark.datapipe.text import classifier_score, strip_markup

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    d = tmp_path / "strip_in"
    d.mkdir()
    rows = [
        {"doc_id": 1, "text": "<p>alpha beta&nbsp;gamma</p>"},
        {"doc_id": 2, "text": "plain delta epsilon"},
    ]
    with open(d / "b0.json", "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")

    stream = stream_from_files(spark, str(d), schema)
    stripped = strip_markup(stream)  # stateless: valid streaming plan

    got = {}

    def score_batch(batch_df, _bid):
        for r in classifier_score(batch_df.select("doc_id", "text")).collect():
            got[r.doc_id] = r

    q = (
        stripped.writeStream.foreachBatch(score_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert set(got) == {1, 2}
    batch_in = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "plain delta epsilon")],
        "doc_id long, text string",
    )
    batch = {r.doc_id: r for r in classifier_score(batch_in).collect()}
    for i in (1, 2):
        assert got[i].logit == batch[i].logit
        assert got[i].n_feats == batch[i].n_feats


def test_streaming_quantile_summary_matches_batch_and_sketch(spark, tmp_path):
    """Per-window rank-grid summaries over a file stream equal (a) the
    same callable on the batch read AND (b) the batch quantile_sketch
    run per window group — the sketch is a pure function of each
    window's value multiset, so all three agree exactly."""
    from reflexiv_spark.datapipe.quantile import quantile_sketch
    from reflexiv_spark.streaming.windows import (
        stream_from_files,
        streaming_quantile_summary,
    )

    d = tmp_path / "q_in"
    d.mkdir()
    # window 10:00 gets values 1..25 (n=25, cap 4 -> step 7: ranks
    # 1,8,15,22,25); window 11:00 gets 100,100,200 (n=3, step 1: every
    # rank). Split across files so the stream sees multiple batches.
    rows1 = [
        {"ts": f"2026-01-01T10:{m:02d}:00", "v": i + 1}
        for m, i in zip(range(0, 50, 2), range(25))
    ]
    rows2 = [
        {"ts": "2026-01-01T11:05:00", "v": 100},
        {"ts": "2026-01-01T11:10:00", "v": 100},
        {"ts": "2026-01-01T11:20:00", "v": 200},
    ]
    _write_batch(d, "b1.json", rows1[:13])
    _write_batch(d, "b2.json", rows1[13:] + rows2)
    # chained stateful aggregations only run in APPEND mode (Spark's
    # global-watermark correctness check rejects complete) — a late
    # sentinel advances the watermark past both asserted windows; its
    # own still-open window must NOT emit
    _write_batch(d, "b3.json", [{"ts": "2026-01-01T13:30:00", "v": 42}])
    # FileStreamSource orders micro-batches by modification time: three
    # files written back-to-back can collide on mtime and replay out of
    # order, which would advance the watermark past b2 and late-drop it
    # — pin strictly increasing mtimes
    import os
    import time as _time

    now = _time.time()
    for i, name in enumerate(("b1.json", "b2.json", "b3.json")):
        os.utime(d / name, (now + i, now + i))
    schema = "ts timestamp, v long"

    stream = stream_from_files(spark, str(d), schema, max_files_per_trigger=1)
    out = streaming_quantile_summary(
        stream, value_col="v", window="1 hour", capacity=4,
        watermark="10 minutes",
    )
    _run_stream(out, "q_summ", "append")
    got = {
        (str(r.win_start), r.rank, r.value)
        for r in spark.sql("SELECT * FROM q_summ").collect()
    }
    assert not any(w.startswith("2026-01-01 13") for w, _, _ in got), got
    assert {(w, r, v) for w, r, v in got if w.startswith("2026-01-01 10")} == {
        ("2026-01-01 10:00:00", 1, 1),
        ("2026-01-01 10:00:00", 8, 8),
        ("2026-01-01 10:00:00", 15, 15),
        ("2026-01-01 10:00:00", 22, 22),
        ("2026-01-01 10:00:00", 25, 25),
    }
    assert {(w, r, v) for w, r, v in got if w.startswith("2026-01-01 11")} == {
        ("2026-01-01 11:00:00", 1, 100),
        ("2026-01-01 11:00:00", 2, 100),
        ("2026-01-01 11:00:00", 3, 200),
    }

    # (a) batch/stream equivalence: same callable on the batch read —
    # the batch pass also reports the sentinel's (open-on-the-stream)
    # window, which append mode correctly withheld
    batch = spark.read.schema(schema).json(str(d))
    expected = {
        (str(r.win_start), r.rank, r.value)
        for r in streaming_quantile_summary(
            batch, value_col="v", window="1 hour", capacity=4
        ).collect()
    }
    assert got == {
        (w, r, v) for w, r, v in expected
        if not w.startswith("2026-01-01 13")
    }

    # (b) the batch sketch per window group agrees value-for-value
    from pyspark.sql import functions as F

    for win, pred in (
        ("2026-01-01 10", F.hour("ts") == 10),
        ("2026-01-01 11", F.hour("ts") == 11),
    ):
        sk = {
            (r.rank, r.value)
            for r in quantile_sketch(
                batch.where(pred).select(F.col("v")), "v", capacity=4
            ).collect()
        }
        assert sk == {(r, v) for w, r, v in got if w.startswith(win)}


def test_streaming_quantile_summary_append_mode_closed_windows(spark, tmp_path):
    """Append mode emits each window exactly once after the watermark
    closes it — the earlier window's summary appears; the still-open
    final window does not."""
    from reflexiv_spark.streaming.windows import (
        stream_from_files,
        streaming_quantile_summary,
    )

    d = tmp_path / "q_app"
    d.mkdir()
    _write_batch(d, "b1.json", [
        {"ts": "2026-01-01T10:05:00", "v": 5},
        {"ts": "2026-01-01T10:25:00", "v": 7},
    ])
    _write_batch(d, "b2.json", [
        {"ts": "2026-01-01T12:30:00", "v": 9},  # advances watermark past 10:00
    ])
    schema = "ts timestamp, v long"
    stream = stream_from_files(spark, str(d), schema, max_files_per_trigger=1)
    out = streaming_quantile_summary(
        stream, value_col="v", window="1 hour", capacity=4,
        watermark="10 minutes",
    )
    _run_stream(out, "q_app", "append")
    got = {
        (str(r.win_start), r.rank, r.value)
        for r in spark.sql("SELECT * FROM q_app").collect()
    }
    assert got == {
        ("2026-01-01 10:00:00", 1, 5),
        ("2026-01-01 10:00:00", 2, 7),
    }
