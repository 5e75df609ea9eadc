"""Streaming analytics operators over the record stream (driver-mandated
extensions, streaming form; SURVEY.md §2 "Streaming-semantics summary").

The reference has no watermarks — a late record extends its (older) encoded
partition's file via an R3 rotation (TopicPartitionWriter.java:345-346).
These operators add the Structured-Streaming-native late-data story a
training-data pipeline needs on top of the ingest path:

  windowed_rollup            watermark + event-time window aggregation; the
                             streaming form of events_hourly_rollup. State
                             is bounded by the watermark horizon.
  streaming_exact_dedup      dropDuplicatesWithinWatermark on the content
                             hash — the streaming form of dedup_exact; state
                             expires with the watermark instead of growing
                             with the corpus.
  sessionize                 custom stateful operator via
                             applyInPandasWithState: per-user session
                             windows with a gap timeout — the pattern to
                             copy for any operator whose state Spark lacks
                             (the reference's per-writer state tuple,
                             TopicPartitionWriter.java:63-87, is exactly
                             this shape).

All three scale the same way: state lives in the state store, keyed by
group, partitioned by the shuffle — no driver-side state, no unbounded
growth (watermark/timeout bounds every map).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField, StructType,
                               TimestampType)


def windowed_rollup(records: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Event-time windowed counts/sums per event_type with late-data bound.

    Append-mode compatible: a window closes (emits) once the watermark
    passes its end; records later than `watermark` are dropped — the
    documented deviation from the reference, which instead reopens old
    partitions (no bound on state, impossible at 100 TB).
    """
    return (records
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 3).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "sum_value"))


def streaming_exact_dedup(records: DataFrame, key_cols: Iterable[str] = ("key",),
                          watermark: str = "2 hours") -> DataFrame:
    """Exact dedup with bounded state: duplicates arriving within the
    watermark horizon are dropped; state for older keys is evicted.

    The batch form (operators/dedup.exact_dedup) sees the whole corpus; this
    form trades completeness-beyond-the-horizon for O(horizon) state — the
    only dedup shape that runs forever on an unbounded stream.
    """
    return (records
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(list(key_cols)))


def streaming_range_join(left: DataFrame, right: DataFrame, on: list[str],
                         lower_ms: int, upper_ms: int,
                         watermark: str = "2 hours",
                         left_ts: str = "ts", right_ts: str = "ts",
                         right_prefix: str = "r_") -> DataFrame:
    """Streaming form of operators/asof.range_join: pairs with
    right_ts - left_ts in [lower_ms, upper_ms] per key, as a native
    stream-stream inner join with an event-time range constraint.

    Spark-first: both sides carry watermarks and the join condition bounds
    the event-time distance, so the state store holds only rows inside
    the watermark + interval horizon — the documented requirement for
    state cleanup in stream-stream joins. No custom state code: the
    built-in join IS the operator; at 100 TB state is partitioned by the
    join key shuffle like any stateful op.

    Emits the same columns as the batch operator (left columns + prefixed
    right payload), so the two forms golden-check against each other
    (test_streaming_analytics.test_streaming_range_join_matches_batch).
    """
    from functools import reduce

    l_w = left.withWatermark(left_ts, watermark).alias("l")
    rpayload = [c for c in right.columns if c not in on]
    r_w = (right.select(*on, *[F.col(c).alias(f"{right_prefix}{c}")
                               for c in rpayload])
           .withWatermark(f"{right_prefix}{right_ts}", watermark)
           .alias("r"))
    key_eq = reduce(lambda a, b: a & b,
                    [F.col(f"l.{c}") == F.col(f"r.{c}") for c in on])
    rts, lts = F.col(f"r.{right_prefix}{right_ts}"), F.col(f"l.{left_ts}")
    cond = (key_eq
            & (rts >= lts + F.expr(f"INTERVAL {lower_ms} MILLISECOND"))
            & (rts <= lts + F.expr(f"INTERVAL {upper_ms} MILLISECOND")))
    joined = l_w.join(r_w, cond)
    return joined.select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{right_prefix}{c}") for c in rpayload])


SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
])

_SESSION_STATE = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n_events", LongType()),
])


def _session_func(gap_ms: int):
    gap_us = gap_ms * 1000

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
            })
            return

        ts_us: list[int] = []
        for pdf in pdfs:
            # normalize to ns: Arrow may hand back datetime64[us]
            ts_us.extend(int(v) // 1000
                         for v in pdf["ts"].astype("datetime64[ns]")
                         .astype("int64"))
        ts_us.sort()

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = ts_us[0], ts_us[0] - gap_us - 1, 0

        closed: list[tuple[int, int, int]] = []
        for t in ts_us:
            if n and t - last_us > gap_us:
                closed.append((start_us, last_us, n))
                start_us, n = t, 0
            last_us = t
            n += 1
        state.update((start_us, last_us, n))
        # close the open session `gap` after the last event (event time)
        state.setTimeoutTimestamp(last_us // 1000 + gap_ms)

        if closed:
            yield pd.DataFrame({
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [c for _, _, c in closed],
            })

    return fn


def sessionize(records: DataFrame, gap_ms: int = 30 * 60 * 1000,
               watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows (gap timeout) as a custom stateful operator.

    State per user = (session start, last event, count); a session closes
    when the event-time watermark passes last event + gap. This is the
    applyInPandasWithState template for operators Spark lacks: the
    reference's per-writer state machine (TopicPartitionWriter.java:179-212)
    maps onto the same (key -> state row, timeout) shape with
    (topic, partition) keys.
    """
    return (records
            .select("user_id", "ts")
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _session_func(gap_ms), SESSION_SCHEMA, _SESSION_STATE,
                "append", GroupStateTimeout.EventTimeTimeout))
