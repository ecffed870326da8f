"""Structured Streaming encode: continuous ingestion -> encoded blocks.

The reference's notion of streaming is incremental file IO on a single
node (zebra-core/src/Zebra/Serial/Binary/File.hs:94-165 — 1 MiB chunked
reads, blocks decoded as they arrive).  The Spark-native generalization:
a Structured Streaming job whose micro-batches run the SAME encode
operator (zebra_spark.operators.encode.encode_df) and append block rows
to a sink, with checkpointing/exactly-once handled by the streaming
engine instead of our manual unit commits.

``foreachBatch`` is used (rather than a plain streaming transform)
because the blocks sink benefits from per-batch atomic parquet commits,
and it keeps one code path for batch + streaming encode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.encode import encode_df


def encode_stream(
    source: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    rows_per_block: int = 1 << 16,
    trigger_available_now: bool = True,
    key_col: str | None = None,
    key_bloom: bool = False,
) -> StreamingQuery:
    """Start a streaming encode of ``source`` (a streaming DataFrame).

    Returns the StreamingQuery; callers await/stop it.  Exactly-once:
    the streaming checkpoint tracks source offsets, and each micro-batch
    appends its blocks in one parquet job.

    ``key_col``/``key_bloom``: emit zone maps (and optionally Bloom
    filters) on the streamed blocks so keyed reads of the landing table
    skip — streaming micro-batch blocks are exactly the small-and-many
    blocks where per-block skipping pays most (rechunk_blocks keeps the
    structures when compacting them later).
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        blocks = encode_df(
            batch_df,
            rows_per_block=rows_per_block,
            key_col=key_col,
            key_bloom=key_bloom,
        )
        blocks.write.mode("append").parquet(out_dir)

    writer = (
        source.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
