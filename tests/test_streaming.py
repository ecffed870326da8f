"""Streaming encode: micro-batched file ingestion round-trips exactly."""

from __future__ import annotations

from zebra_spark.operators.decode import decode_df
from zebra_spark.sources.synth import f1_table
from zebra_spark.streaming.encode_stream import encode_stream


def test_stream_encode_roundtrip(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    out_dir = str(tmp_path / "blocks")
    ckpt = str(tmp_path / "ckpt")

    df = f1_table(spark, 800, partitions=2, rows_per_batch=256).cache()
    df.write.parquet(src_dir)

    stream = spark.readStream.schema(df.schema).parquet(src_dir)
    q = encode_stream(stream, out_dir, ckpt, rows_per_block=256)
    q.awaitTermination(120)

    blocks = spark.read.parquet(out_dir)
    dec = decode_df(blocks, schema=df.schema)
    assert dec.count() == 800
    assert df.exceptAll(dec).count() == 0 and dec.exceptAll(df).count() == 0

    # restart with no new data: checkpoint prevents re-encoding
    q2 = encode_stream(
        spark.readStream.schema(df.schema).parquet(src_dir), out_dir, ckpt,
        rows_per_block=256,
    )
    q2.awaitTermination(60)
    assert decode_df(spark.read.parquet(out_dir), schema=df.schema).count() == 800


def test_windowed_ingest_stats_with_watermark(spark, tmp_path):
    """Watermarked event-time windows: per-(window, source) stats emitted
    exactly once in append mode; aggregates match a batch groupBy oracle."""
    import datetime as dt

    from pyspark.sql import functions as F

    from zebra_spark.streaming.window_stats import windowed_ingest_stats

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for i in range(120):
        rows.append(
            (
                f"d{i}",
                t0 + dt.timedelta(seconds=i),  # two 1-minute windows
                ["web", "code", "books"][i % 3],
                10 + (i % 7),
            )
        )
    df = spark.createDataFrame(
        rows, "doc_id string, event_time timestamp, source string, n_chars int"
    )
    src_dir = str(tmp_path / "wsrc")
    df.write.parquet(src_dir)

    stream = spark.readStream.schema(df.schema).parquet(src_dir)
    stats = windowed_ingest_stats(stream, "1 minute", "30 seconds")
    out_dir = str(tmp_path / "wout")
    q = (
        stats.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    # append mode: only windows CLOSED by the watermark are emitted; with
    # a single micro-batch the last window is still open
    oracle = (
        df.groupBy(F.window("event_time", "1 minute"), "source")
        .agg(F.count("*").alias("n_docs"), F.sum(F.col("n_chars").cast("long")).alias("total_chars"))
        .select(F.col("window.start").alias("window_start"), "source", "n_docs", "total_chars")
    )
    joined = got.join(oracle, ["window_start", "source"], "inner")
    assert got.count() > 0
    mismatches = joined.filter(
        (got["n_docs"] != oracle["n_docs"])
        | (got["total_chars"] != oracle["total_chars"])
    )
    assert mismatches.count() == 0


def test_streaming_encode_emits_skip_structures(spark, tmp_path):
    """Streaming blocks carry zone maps + Bloom filters when asked; a
    point lookup over the landed blocks table skips."""
    from pyspark.sql import functions as F

    from zebra_spark.operators.decode import bloom_filter_blocks, decode_df
    from zebra_spark.sources.synth import f1_table

    src_dir = str(tmp_path / "src")
    f1_table(spark, 600, partitions=2, rows_per_batch=128).write.parquet(src_dir)
    stream = spark.readStream.schema(
        spark.read.parquet(src_dir).schema
    ).parquet(src_dir)
    out = str(tmp_path / "blocks")
    ckpt = str(tmp_path / "ckpt")
    from zebra_spark.streaming.encode_stream import encode_stream

    q = encode_stream(
        stream, out, ckpt, rows_per_block=64, key_col="doc_id", key_bloom=True
    )
    q.awaitTermination()
    blocks = spark.read.parquet(out)
    assert blocks.filter(F.col("key_min").isNull()).count() == 0
    assert blocks.filter(F.col("key_bloom").isNull()).count() == 0
    df = spark.read.parquet(src_dir)
    target = df.select("doc_id").head()[0]
    assert 0 < bloom_filter_blocks(blocks, target).count() < blocks.count()
    got = decode_df(blocks, schema=df.schema, key_equals=target).filter(
        F.col("doc_id") == target
    )
    assert got.count() == df.filter(F.col("doc_id") == target).count()
