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
