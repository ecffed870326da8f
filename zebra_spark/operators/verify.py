"""Distributed block verification: audit an encoded dataset in place.

The operational complement of the round-trip law: at 100 TB you cannot
diff decoded output against the source every day, but you CAN stream an
audit pass that, per block, (a) checks the stored crc32, (b) decodes the
payload, (c) re-encodes the decoded batch HINT-FREE and PROBE-FREE (the
production selector's per-column hint cache and timed FSST/ZLIB probes
make live encodes depend on preceding blocks and wall-clock; the audit
re-encode runs under the ``speed`` policy so it is a deterministic
function of the block values) and confirms the re-encode decodes
BIT-identically — compared via IPC bytes, so NaN payload bits and signed
zeros are held to the same bit-exact standard as the round-trip tests.
Byte equality of the payloads is kept as the cheap fast path.

Scope (what the law can and cannot catch): crc_ok catches storage
corruption; decode_ok catches payloads the current decoder rejects;
reencode_ok catches ENCODE-side regressions and encode/decode
inconsistency on live data.  A decode-side regression that is
self-consistent (wrong values that re-encode back to themselves) is
invisible here by construction — that class is covered by the
source-diff round-trip tests and tools/check_correctness.py, not by an
in-place audit.  One row out per block; no shuffle.

Reference analogue: `zebra consistency` / the round-trip laws of
Test.Zebra.Serial.Binary run as a batch job instead of a test suite.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame

from ..codec import codecs as _codecs
from ..codec.blocks import decode_batch, encode_batch
from ..codec.warmup import warm_codec


def _ipc_bytes(rb: pa.RecordBatch) -> bytes:
    """Canonical IPC serialization for bit-exact batch comparison.

    Both sides come from ``decode_batch`` (same construction path, zero
    buffer offsets), so equal IPC bytes <=> bit-identical content —
    unlike ``RecordBatch.equals``, which treats NaN != NaN and would
    false-alarm on any NaN-bearing float block whose re-encode differs
    bytewise from the stored payload."""
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, rb.schema) as writer:
        writer.write_batch(rb)
    return sink.getvalue().to_pybytes()

VERIFY_DDL = (
    "block_id string, n_rows long, crc_ok boolean, decode_ok boolean, "
    "reencode_ok boolean, error string"
)


def verify_blocks(blocks: DataFrame, check_reencode: bool = True) -> DataFrame:
    """Audit every block; returns one status row per block.

    A fully healthy dataset returns all-true flags and null errors;
    ``filter(~crc_ok | ~decode_ok)`` is the operational alarm query.
    """

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        warm_codec()
        parsed: dict[str, pa.Schema] = {}
        for rb in batches:
            out = {k: [] for k in (
                "block_id", "n_rows", "crc_ok", "decode_ok",
                "reencode_ok", "error",
            )}
            for i in range(rb.num_rows):
                bid = rb.column("block_id")[i].as_py()
                payload = rb.column("payload")[i].as_py()
                crc = rb.column("crc32")[i].as_py()
                n_rows = rb.column("n_rows")[i].as_py()
                crc_ok = crc is None or zlib.crc32(payload) == crc
                decode_ok = False
                reenc = None
                err = None
                # record schema bytes regardless of this block's health —
                # later blocks of the task reference them by schema_id
                sid = rb.column("schema_id")[i].as_py()
                if sid not in parsed:
                    raw = rb.column("schema")[i].as_py()
                    if raw is not None:
                        try:
                            parsed[sid] = pa.ipc.read_schema(pa.py_buffer(raw))
                        except Exception:
                            pass
                if crc_ok:
                    try:
                        schema = parsed.get(sid)
                        if schema is None:
                            raise ValueError(f"schema bytes for {sid} unavailable")
                        decoded = decode_batch(payload, schema)
                        decode_ok = decoded.num_rows == n_rows
                        if check_reencode:
                            with _codecs.codec_policy("speed"):
                                re_payload, _ = encode_batch(
                                    decoded, use_hints=False
                                )
                            # byte equality = fast path; otherwise the
                            # re-encode must decode bit-identically
                            reenc = re_payload == payload or _ipc_bytes(
                                decode_batch(re_payload, schema)
                            ) == _ipc_bytes(decoded)
                    except Exception as e:  # audit job must not die per block
                        err = f"{type(e).__name__}: {e}"[:300]
                out["block_id"].append(bid)
                out["n_rows"].append(n_rows)
                out["crc_ok"].append(crc_ok)
                out["decode_ok"].append(decode_ok)
                out["reencode_ok"].append(reenc)
                out["error"].append(err)
            yield pa.RecordBatch.from_pydict(
                out,
                schema=pa.schema(
                    [
                        ("block_id", pa.string()),
                        ("n_rows", pa.int64()),
                        ("crc_ok", pa.bool_()),
                        ("decode_ok", pa.bool_()),
                        ("reencode_ok", pa.bool_()),
                        ("error", pa.string()),
                    ]
                ),
            )

    return blocks.mapInArrow(run, schema=VERIFY_DDL)
