"""Gap-based sessionization: session_window semantics pinned.

Events exactly `gap` apart MERGE into one session (Spark merges a new
event whose start <= current window end = last+gap); only a strictly
larger idle gap starts a new session.  The driver oracle (lag-gap islands
with `> gap`) encodes the same rule — this test pins it independently of
DuckDB.
"""

from __future__ import annotations

import datetime as dt

from zebra_spark.functions.sessions import session_stats, sessionize


def test_sessionize_gap_semantics(spark):
    t0 = dt.datetime(2026, 1, 1, 9, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: burst of 3, 40-min hole, burst of 2
        (1, t0), (1, t0 + 5 * m), (1, t0 + 20 * m),
        (1, t0 + 60 * m), (1, t0 + 75 * m),
        # user 2: second event EXACTLY 30 min later -> merges (<= end)
        (2, t0), (2, t0 + 30 * m),
        # user 3: 29m59s later -> same session
        (3, t0), (3, t0 + 30 * m - dt.timedelta(seconds=1)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.span_micros)
        for r in sessionize(df, gap="30 minutes").collect()
    }
    g = dt.timedelta(minutes=30)
    want = {
        (1, t0, t0 + 20 * m + g, 3, int((20 * m + g).total_seconds() * 1e6)),
        (1, t0 + 60 * m, t0 + 75 * m + g, 2, int((15 * m + g).total_seconds() * 1e6)),
        (2, t0, t0 + 30 * m + g, 2, int((30 * m + g).total_seconds() * 1e6)),
        (3, t0, t0 + 30 * m - dt.timedelta(seconds=1) + g, 2,
         int((g + 30 * m - dt.timedelta(seconds=1)).total_seconds() * 1e6)),
    }
    assert got == want

    stats = {
        (r.user_id, r.n_sessions, r.n_events, r.max_span_micros)
        for r in session_stats(sessionize(df, gap="30 minutes")).collect()
    }
    assert stats == {
        (1, 2, 5, int((20 * m + g).total_seconds() * 1e6)),
        (2, 1, 2, int((30 * m + g).total_seconds() * 1e6)),
        (3, 1, 2, int((g + 30 * m - dt.timedelta(seconds=1)).total_seconds() * 1e6)),
    }


def test_sessionize_hot_key_cap(spark):
    """max_events_per_key: a bot key above the cap is dropped ENTIRELY and
    counted (MaximumRowSize drop-and-account, Merge/Table.hs:157-163);
    normal keys are untouched."""
    t0 = dt.datetime(2026, 1, 1, 9, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [(99, t0 + i * s) for i in range(500)]  # bot: 500 events
    rows += [(1, t0), (1, t0 + 5 * s), (2, t0)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    sess, dropped = sessionize(
        df, gap="30 minutes", max_events_per_key=100, with_metrics=True
    )
    got = {(r.user_id, r.n_events) for r in sess.collect()}
    assert got == {(1, 2), (2, 1)}  # bot user fully excluded
    d = dropped.collect()
    assert [(r.user_id, r.n_events) for r in d] == [(99, 500)]
    # uncapped: everything sessionizes
    assert sessionize(df, gap="30 minutes").count() == 3
