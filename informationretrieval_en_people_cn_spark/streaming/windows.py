"""Event-time streaming operators: watermarked windows + custom state.

The reference is batch-only; these are the Structured-Streaming
operators a continuously-fed corpus/event pipeline needs on top of the
incremental index (:mod:`incremental`):

* :func:`windowed_event_counts` — tumbling event-time windows with a
  watermark: late events inside the watermark still update their
  window; events later than the watermark are dropped and the window
  state is evicted (bounded state at 100 TB/day event volumes).
* :func:`sessionize` — gap-based session windows per user, implemented
  with ``applyInPandasWithState`` (the custom-stateful-operator
  surface): state = the open session (start, last_ts, n_events,
  sum_value); a session closes when the gap exceeds ``gap`` or the
  event-time timeout fires.

Both run identically under ``Trigger.AvailableNow`` (batch-incremental)
and continuous micro-batches; outputs are plain DataFrames/sinks.

Scale notes: the windowed aggregate is a streaming partial-agg whose
state is (window × event_type) rows — thousands, not billions; the
session state is one row per ACTIVE user, evicted by timeout, so state
size tracks concurrent users, never event history.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_event_counts(
    stream: DataFrame, *, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream.

    Identical logical agg to the batch ``events_window`` query (the
    driver-oracle-checked shape): count + sum(value) per (window,
    event_type).  The watermark bounds state: a window is finalized and
    evicted once the event-time high-water mark passes window_end +
    watermark, and later-than-watermark events are dropped.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_batch(df: DataFrame, *, gap: str = "30 minutes") -> DataFrame:
    """Batch twin of :func:`sessionize`: gaps-and-islands with window
    functions — pure Catalyst, SQL-replicable (the driver oracle), and
    the ground truth the streaming operator is tested against.
    """
    from pyspark.sql import Window

    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # cast NTZ -> TZ for unix_micros: an absolute shift, exact for the
    # DIFFERENCES the gap rule compares
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(us).over(w)
    new_sess = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    sid = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value_r"),
        )
        .drop("sid")
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), False),
        T.StructField("last_us", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), False),
    ]
)


def _session_fn(gap_us: int):
    """State + emitted timestamps carried in MICROSECONDS — the same
    resolution sessionize_batch's unix_micros arithmetic compares, so
    sub-millisecond events make identical gap decisions on both paths
    (ADVICE r2: the old millisecond truncation diverged from the twin).

    Late events (t <= last seen) arriving in a later micro-batch but
    inside the watermark fold into the OPEN session when they lie within
    ``gap`` of its start (extending session_start backward); a late
    event older than start - gap emits immediately as its own closed
    session.  Events late enough to belong to an ALREADY-EMITTED session
    cannot be merged retroactively (append mode) — exact parity with the
    batch twin therefore assumes per-user in-order arrival across
    micro-batches, which the parity test (and Trigger.AvailableNow
    ingestion of time-ordered sources) satisfies; within a micro-batch
    any order is handled (events are sorted here).
    """

    def fn(key, pdfs, state: GroupState):
        user_id = key[0]
        if state.hasTimedOut:
            (start_us, last_us, n, sv) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "sum_value": [sv],
                }
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        ts_us = (rows["ts"].astype("int64") // 1_000).to_numpy()
        vals = rows["value"].to_numpy()
        out = []
        if state.exists:
            start_us, last_us, n, sv = state.get
        else:
            start_us, last_us, n, sv = int(ts_us[0]), int(ts_us[0]) - 1, 0, 0.0
            # last < first so the first event never closes the fresh state
        for t, v in zip(ts_us, vals):
            t = int(t)
            if n and t < start_us:  # late event from a previous batch
                if start_us - t <= gap_us:
                    # inside the open session's reach: extend it backward
                    start_us, n, sv = t, n + 1, sv + float(v)
                else:
                    # predates the open session by more than the gap: a
                    # session of its own, closed immediately
                    out.append((t, t, 1, float(v)))
                continue
            if n and t - last_us > gap_us:  # gap exceeded: close session
                out.append((start_us, last_us, n, sv))
                start_us, n, sv = t, 0, 0.0
            last_us = max(last_us, t)  # never regress on late arrivals
            n, sv = n + 1, sv + float(v)
        state.update((start_us, last_us, n, sv))
        # evict via event-time timeout once the watermark passes the gap
        # (timeout API is millisecond-granular: round UP so the timeout
        # never fires before last_us + gap_us)
        state.setTimeoutTimestamp(-((last_us + gap_us) // -1_000))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out),
                    "session_start": [pd.Timestamp(o[0], unit="us") for o in out],
                    "session_end": [pd.Timestamp(o[1], unit="us") for o in out],
                    "n_events": [o[2] for o in out],
                    "sum_value": [o[3] for o in out],
                }
            )

    return fn


def sessionize(
    stream: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session windows per user via ``applyInPandasWithState``.

    A session is a maximal run of a user's events with inter-event gaps
    <= ``gap``; closed sessions are emitted (append mode), the open one
    lives in state until the gap passes (event-time timeout driven by
    the watermark).  This is the custom-stateful-operator shape —
    anything Spark's built-in windows can't express (per-key FSMs,
    CDC-style upserts, online dedup) slots into the same skeleton.
    """
    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_us),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_stream(
    stream: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming ingestion dedup: emit only the first-seen document per
    content sha256 within the watermark horizon — the streaming twin of
    :func:`..operators.pipeline.exact_dedup` for a continuously-fed
    corpus (the reference's crawler dedups by post id in a driver dict,
    people_spider.py:58,68 — unbounded state).

    Built on ``dropDuplicatesWithinWatermark``: state is one row per
    DISTINCT content seen inside the horizon and is evicted as the
    watermark advances, so state size tracks the dedup horizon, never
    ingest history — the property that keeps a 100 TB/day feed
    bounded.  (Plain ``dropDuplicates`` on a stream never evicts.)
    Which duplicate is emitted follows arrival order, the streaming
    contract; downstream exact parity is on the content set, not ids.
    """
    hashed = stream.withColumn(
        "content_sha256", F.sha2(F.col(text_col).cast("string"), 256)
    )
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_sha256"]
    )
