"""Event sessionization with gap-based session windows.

A training-data pipeline that ingests interaction or telemetry events
needs sessions — contiguous bursts of activity per key separated by idle
gaps — for per-user dedup horizons, rate caps, and engagement-weighted
sampling.  The reference engine has no windowing at all (SURVEY.md §2.6:
"no streaming watermarks/sessionization"); this operator exists for the
pipeline story the engine serves.

Spark-first design: `F.session_window` is a native Catalyst operator
(whole-stage-codegen'd, usable in batch AND streaming).  The plan is one
shuffle on the session key followed by a partition-local sort + window
merge — exactly the shape a 1000-executor cluster wants: no driver
collection, no Python in the hot path, and per-key state independent of
total volume.  Skewed keys (one bot user with millions of events) are the
only hazard; `sessionize` exposes `max_events_per_key` to cap and count
them, mirroring the MaximumRowSize drop-and-account discipline
(reference: zebra-core/src/Zebra/Merge/Table.hs:37-44).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    max_events_per_key: int | None = None,
    with_metrics: bool = False,
):
    """Group `events` into per-key sessions separated by >= `gap` idle time.

    Returns one row per (key, session): session_start = first event ts,
    session_end = last event ts + gap (Spark's session_window convention),
    n_events, and the active span in seconds.

    ``max_events_per_key``: hot-key guard.  All events of one key land in
    ONE task's session-window sort, so a single bot user with millions of
    events is a straggler/OOM hazard at scale.  Keys whose event count
    exceeds the cap are DROPPED ENTIRELY and counted — the MaximumRowSize
    drop-and-account discipline (Merge/Table.hs:157-163): a truncated
    session would be silently WRONG (start/end/n_events all change), so
    like zebra's oversized-row drop the whole key is excluded and
    accounted.  The pre-count is one map-side-combinable aggregation on the
    same key the session shuffle needs.  ``with_metrics=True`` also returns
    the dropped-keys frame (key, n_events).

    Works on batch frames and on streams (with a watermark upstream).
    Events exactly `gap` apart MERGE into one session (Spark merges when
    the new event's start <= current window end = last+gap); a new session
    starts only when the idle gap strictly exceeds `gap` — matched by the
    strict `>` in the driver oracle and pinned by tests/test_sessions.py.
    """
    dropped = None
    if max_events_per_key is not None:
        counts = events.groupBy(key_col).agg(F.count("*").alias("n_events"))
        dropped = counts.filter(F.col("n_events") > max_events_per_key)
        keep = counts.filter(F.col("n_events") <= max_events_per_key).select(key_col)
        events = events.join(keep, key_col)
    w = F.session_window(F.col(ts_col), gap)
    out = (
        events.groupBy(F.col(key_col), w)
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            # timestampdiff works on both TIMESTAMP and TIMESTAMP_NTZ
            # (unix_micros rejects NTZ, which parquet event times often are)
            F.expr(
                "timestampdiff(MICROSECOND, session_window.start,"
                " session_window.end)"
            ).alias("span_micros"),
        )
    )
    if with_metrics:
        return out, dropped
    return out


def session_stats(sessions: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key rollup over `sessionize` output: session count, event count,
    longest session.  Pure JVM aggregates, map-side combinable."""
    return sessions.groupBy(key_col).agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("span_micros").alias("max_span_micros"),
    )
