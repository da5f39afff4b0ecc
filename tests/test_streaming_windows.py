"""Watermarked windows + custom stateful sessionization (event-time)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from informationretrieval_en_people_cn_spark.streaming.windows import (
    EVENTS_SCHEMA,
    sessionize,
    windowed_event_counts,
)

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, minutes, user=1, etype="click", value=1.0):
    return (eid, BASE + dt.timedelta(minutes=minutes), user, etype, value, "{}")


def _run_stream(spark, in_dir, ckpt, make_sink, updates, mode="update"):
    """One availableNow pass collecting foreachBatch updates."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(in_dir)

    def handle(batch_df, batch_id):
        updates.extend(batch_df.collect())

    q = (
        make_sink(stream)
        .writeStream.foreachBatch(handle)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_watermarked_window_drops_too_late_events(spark, tmp_path):
    """Within-watermark late events update their window; events later
    than the watermark are dropped (bounded state — the 100 TB/day
    requirement)."""
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    updates: list = []

    def sink(stream):
        return windowed_event_counts(stream, window="1 hour", watermark="2 hours")

    # batch 1: events in hours 0..11 (watermark advances to 11:xx - 2h)
    rows = [_ev(i, i * 60 + 5, etype="view", value=2.0) for i in range(12)]
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.mode("append").parquet(in_dir)
    _run_stream(spark, in_dir, ckpt, sink, updates)

    # batch 2: one late-but-inside-watermark event (hour 10) and one
    # too-late event (hour 2, far beyond the 2h watermark)
    rows2 = [
        _ev(100, 10 * 60 + 20, etype="view", value=2.0),  # inside watermark
        _ev(101, 2 * 60 + 20, etype="view", value=2.0),   # too late: dropped
    ]
    spark.createDataFrame(rows2, EVENTS_SCHEMA).write.mode("append").parquet(in_dir)
    _run_stream(spark, in_dir, ckpt, sink, updates)

    # last update per window wins
    final = {}
    for r in updates:
        final[r.win_start] = (r.n_events, r.sum_value)
    h10 = BASE + dt.timedelta(hours=10)
    h2 = BASE + dt.timedelta(hours=2)
    assert final[h10] == (2, 4.0)  # late-inside-watermark event counted
    assert final[h2] == (1, 2.0)   # too-late event dropped


def test_sessionize_gap_close_and_timeout(spark, tmp_path):
    """Sessions close on gap > 30m (emitted in-batch) and open sessions
    are evicted by the event-time timeout once the watermark passes."""
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    updates: list = []

    def sink(stream):
        return sessionize(stream, gap="30 minutes", watermark="2 hours")

    # batch 1, user 1: t=0, 10 (one session), t=50 (gap 40m > 30m)
    rows = [_ev(1, 0, value=1.5), _ev(2, 10, value=2.5), _ev(3, 50, value=4.0)]
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.mode("append").parquet(in_dir)
    _run_stream(spark, in_dir, ckpt, sink, updates, mode="append")

    # batch 2, user 1 again at t=400 (closes the t=50 session by gap);
    # user 99 at t=600 pushes the watermark to 480m
    rows2 = [_ev(4, 400, value=8.0), _ev(5, 600, user=99)]
    spark.createDataFrame(rows2, EVENTS_SCHEMA).write.mode("append").parquet(in_dir)
    _run_stream(spark, in_dir, ckpt, sink, updates, mode="append")

    # batch 3: watermark (480m) now exceeds 400+30m -> user 1's open
    # session times out and is emitted without any new user-1 event
    rows3 = [_ev(6, 1200, user=99)]
    spark.createDataFrame(rows3, EVENTS_SCHEMA).write.mode("append").parquet(in_dir)
    _run_stream(spark, in_dir, ckpt, sink, updates, mode="append")

    sessions = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.sum_value)
        for r in updates
    }
    m = lambda mins: BASE + dt.timedelta(minutes=mins)  # noqa: E731
    # gap-closed: [0, 10] with 2 events
    assert sessions[(1, m(0))] == (m(10), 2, 4.0)
    # gap-closed by the t=400 event: singleton [50, 50]
    assert sessions[(1, m(50))] == (m(50), 1, 4.0)
    # timeout-closed: singleton [400, 400]
    assert sessions[(1, m(400))] == (m(400), 1, 8.0)


def test_streaming_sessionize_equals_batch(spark, tmp_path):
    """The stateful streaming sessionizer must produce exactly the
    batch gaps-and-islands sessions once every session is flushed
    (sentinel batches advance the watermark past all timeouts)."""
    import random

    from informationretrieval_en_people_cn_spark.streaming.windows import (
        sessionize_batch,
    )

    rng = random.Random(7)
    rows, eid, t = [], 0, 0
    for user in (1, 2, 3):
        t = rng.randint(0, 60)
        for _ in range(rng.randint(5, 9)):
            t += rng.choice([1, 5, 20, 45, 90])  # minutes; >30 starts a session
            rows.append(_ev(eid, t, user=user, value=float(rng.randint(1, 9))))
            eid += 1
    # deliver in event-time order: the watermark contract only admits
    # bounded out-of-orderness, and this test targets session algebra
    rows.sort(key=lambda r: r[1])
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    updates: list = []

    def sink(stream):
        return sessionize(stream, gap="30 minutes", watermark="10 minutes")

    half = len(rows) // 2
    for chunk in (rows[:half], rows[half:]):
        spark.createDataFrame(chunk, EVENTS_SCHEMA).write.mode("append").parquet(in_dir)
        _run_stream(spark, in_dir, ckpt, sink, updates, mode="append")
    # two sentinel flush batches: the first advances the watermark past
    # every open session's timeout, the second fires the timeouts
    for i, flush_min in enumerate((10_000, 20_000)):
        spark.createDataFrame(
            [_ev(9000 + i, flush_min, user=999)], EVENTS_SCHEMA
        ).write.mode("append").parquet(in_dir)
        _run_stream(spark, in_dir, ckpt, sink, updates, mode="append")

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.sum_value, 4))
        for r in updates
        if r.user_id != 999
    }
    batch = sessionize_batch(
        spark.createDataFrame(rows, EVENTS_SCHEMA), gap="30 minutes"
    )
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value_r)
        for r in batch.collect()
    }
    assert got == want


def test_dedup_stream_emits_first_seen_per_content(spark, tmp_path):
    from informationretrieval_en_people_cn_spark.streaming.windows import dedup_stream

    in_dir, ckpt = str(tmp_path / "docs_in"), str(tmp_path / "ckpt_dd")
    schema = "doc_id long, ts timestamp, text string"

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(in_dir)

    t0 = BASE
    # batch 1: A twice (same micro-batch), B once
    write([
        (1, t0, "content A"),
        (2, t0 + dt.timedelta(minutes=1), "content A"),
        (3, t0 + dt.timedelta(minutes=2), "content B"),
    ])
    stream = spark.readStream.schema(schema).parquet(in_dir)
    updates = []

    def handle(batch_df, batch_id):
        updates.extend(batch_df.collect())

    q = (
        dedup_stream(stream, watermark="30 minutes")
        .writeStream.foreachBatch(handle)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r.text for r in updates) == ["content A", "content B"]

    # batch 2 (same checkpoint → same state): A again inside the
    # horizon (suppressed) + new C (emitted)
    write([
        (4, t0 + dt.timedelta(minutes=5), "content A"),
        (5, t0 + dt.timedelta(minutes=6), "content C"),
    ])
    stream2 = spark.readStream.schema(schema).parquet(in_dir)
    updates2 = []

    def handle2(batch_df, batch_id):
        updates2.extend(batch_df.collect())

    q2 = (
        dedup_stream(stream2, watermark="30 minutes")
        .writeStream.foreachBatch(handle2)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert sorted(r.text for r in updates2) == ["content C"]

    # streamed result ≡ the batch twin's content set
    from informationretrieval_en_people_cn_spark.operators.pipeline import exact_dedup

    batch = exact_dedup(spark.read.parquet(in_dir))
    assert {r.content_sha256 for r in batch.collect()} == {
        r.content_sha256 for r in updates + updates2
    }
