"""Event-time windowed ingest metrics with watermark-bounded late data.

A training-data ingestion pipeline needs continuous per-source throughput
and quality stats: documents arrive with event timestamps, possibly late
and out of order.  This is Spark's canonical watermark + windowed
aggregation shape — state is bounded because the watermark closes windows
older than the allowed lateness, and in append mode each (window, source)
row is emitted exactly once when its window finalizes.

The reference has no streaming aggregation at all (SURVEY §2.6); this
operator exists for the pipeline story the engine serves: windowed counts
feed compaction decisions (rechunk small streaming blocks) and lineage
dashboards (north-rule metrics over time instead of per run).

Scale: state is hash-partitioned by (window, source); per-key state is a
few counters, so state size is O(active windows x sources), independent
of row volume.  All aggregates are JVM-side codegen (no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_ingest_stats(
    docs_stream: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "event_time",
    source_col: str = "source",
    size_col: str = "n_chars",
    id_col: str | None = "doc_id",
) -> DataFrame:
    """(event_time, source, n_chars, ...) stream -> per-window per-source
    ingest stats, closed exactly once per window in append mode.

    ``watermark``: maximum tolerated lateness; rows older than
    (max event time seen - watermark) are dropped by the engine and their
    windows finalized — the streaming analogue of MaximumRowSize's
    "bound memory by dropping, and account for it" discipline.

    ``id_col=None`` drops the approx-distinct sketch, leaving only exact
    aggregates (count/sum/max) so the output is oracle-checkable
    bit-for-bit against a batch groupBy.
    """
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum(F.col(size_col).cast("long")).alias("total_chars"),
        F.max(size_col).alias("max_chars"),
    ]
    if id_col is not None:
        aggs.append(F.approx_count_distinct(id_col).alias("approx_distinct_docs"))
    return (
        docs_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col(source_col))
        .agg(*aggs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col(source_col),
            "n_docs",
            "total_chars",
            "max_chars",
            *(["approx_distinct_docs"] if id_col is not None else []),
        )
    )
