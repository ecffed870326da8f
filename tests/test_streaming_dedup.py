"""Stateful streaming dedup: first occurrence wins across micro-batches."""

from __future__ import annotations

import time

from zebra_spark.streaming.dedup_stream import streaming_dedup


def _write_batch(spark, path, rows, schema="doc_id string, text string"):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: two copies of A, one B
    _write_batch(spark, src, [("d1", "AAA"), ("d2", "AAA"), ("d3", "BBB")])

    stream = spark.readStream.schema("doc_id string, text string").parquet(src)
    q = (
        streaming_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    first = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(first) == {"d1", "d3"}  # min doc_id per digest, one per content
    assert first["d1"]["n_seen_in_batch"] == 2

    # batch 2: A again (must NOT re-emit; state remembers) + new C
    _write_batch(spark, src, [("d4", "AAA"), ("d5", "CCC")])
    q2 = (
        streaming_dedup(
            spark.readStream.schema("doc_id string, text string").parquet(src)
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)

    rows = spark.read.parquet(out).collect()
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == ["d1", "d3", "d5"]  # d4 suppressed by cross-batch state


def test_dedup_fn_timeout_path_removes_state():
    """ProcessingTimeTimeout fires with an EMPTY iterator: the function must
    not crash on pd.concat([]), must drop the state (bounded state), and
    must NOT re-arm the timeout."""
    from zebra_spark.streaming.dedup_stream import _dedup_fn

    class FakeState:
        hasTimedOut = True
        exists = True

        def __init__(self):
            self.removed = False
            self.rearmed = False

        def remove(self):
            self.removed = True

        def setTimeoutDuration(self, ms):
            self.rearmed = True

        def update(self, v):
            raise AssertionError("must not update on timeout")

    st = FakeState()
    out = list(_dedup_fn(("digest",), iter([]), st))
    assert st.removed and not st.rearmed
    assert len(out) == 1 and len(out[0]) == 0
    assert list(out[0].columns) == ["digest", "doc_id", "n_seen_in_batch"]
