"""Stateful streaming dedup: emit each document digest's first occurrence.

A training-data ingestion pipeline dedups continuously: documents arrive in
micro-batches and only first-seen content may flow to the encoder.  This is
Spark's custom-stateful-operator shape — ``applyInPandasWithState`` keyed by
content digest, with GroupState carrying "seen" across micro-batches and
a processing-time timeout to bound state (forgotten digests may re-emit —
the downstream exact dedup compacts those; state stays bounded either way).

Scale: state is partitioned by digest hash across executors; each key holds
one boolean + timestamp, so state size is O(distinct docs in the retention
window), the standard design for web-scale streaming dedup.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_DDL = "digest string, doc_id string, n_seen_in_batch int"
STATE_DDL = "seen boolean"


_EMPTY_OUT = {
    "digest": pd.Series([], dtype=str),
    "doc_id": pd.Series([], dtype=str),
    "n_seen_in_batch": pd.Series([], dtype="int32"),
}


def _dedup_fn(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # retention expired: forget the digest (bounds state size; a
        # re-arrival re-emits and downstream exact dedup compacts it) and
        # do NOT re-arm the timeout — that would leak state forever
        state.remove()
        yield pd.DataFrame(_EMPTY_OUT)
        return
    frames = [p for p in pdfs]
    rows = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame({"digest": [], "doc_id": []})
    )
    n = len(rows)
    if state.exists:
        seen = True
    else:
        seen = False
        state.update((True,))
    state.setTimeoutDuration(24 * 3600 * 1000)  # retain a day of digests
    if seen or n == 0:
        yield pd.DataFrame(_EMPTY_OUT)
    else:
        first = rows.sort_values("doc_id").iloc[0]
        yield pd.DataFrame(
            {
                "digest": [key[0]],
                "doc_id": [first["doc_id"]],
                "n_seen_in_batch": [n],
            }
        ).astype({"n_seen_in_batch": "int32"})


def streaming_dedup(docs_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame of (doc_id, text) -> first-seen rows per digest.

    The operator runs in append output mode (each digest's first-seen row
    is emitted exactly once, so appends are final).
    """
    keyed = docs_stream.select(
        F.md5("text").alias("digest"), "doc_id"
    ).groupBy("digest")
    return keyed.applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
