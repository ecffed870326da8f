"""Checkpointed encode with resume-from-committed-snapshot.

North rule: "every partition emits lineage + codec-choice metrics to a
checkpoint table, and failed runs resume from the last committed snapshot."

Without an Iceberg catalog in this sandbox we model the same contract on
parquet-directory commits, which is the part that transfers: work is split
into deterministic UNITS (stable hash buckets of the input), each unit's
blocks land in its own output subdirectory with an atomic _SUCCESS marker,
and a resumed run anti-joins the committed unit list to encode only the
missing units.  On Iceberg the mechanism is snapshot IDs + an anti-join
against the committed block manifest — same plan shape, stronger commit
atomicity.

A re-run after partial failure ends bit-identical to a clean full run
(unit assignment is a pure function of the rows, not of task scheduling) —
FIXTURES.md F5 requirement.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from .encode import encode_df


def unit_of(df: DataFrame, unit_cols: Sequence[str], n_units: int) -> DataFrame:
    """Assign every row a deterministic work-unit id from a stable hash."""
    return df.withColumn(
        "__unit", F.pmod(F.xxhash64(*unit_cols), F.lit(n_units)).cast("int")
    )


def committed_units(out_dir: str) -> list[int]:
    if not os.path.isdir(out_dir):
        return []
    units = []
    for d in os.listdir(out_dir):
        if d.startswith("unit="):
            if os.path.exists(os.path.join(out_dir, d, "_SUCCESS")):
                units.append(int(d.split("=", 1)[1]))
    return sorted(units)


def checkpointed_encode(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    unit_cols: Sequence[str],
    n_units: int = 16,
    rows_per_block: int = 1 << 16,
    units_per_commit: int | None = None,
    fail_after_units: int | None = None,
    key_col: str | None = None,
    key_bloom: bool = False,
) -> list[int]:
    """Encode all missing units, committing in bounded batches.

    Plan shape per batch (scale-safe): filter-to-missing-units (the
    anti-join against the committed manifest) -> one shuffle keyed by
    ``__unit`` -> grouped encode (no block spans units) ->
    ``write.partitionBy("unit")`` with dynamic partition overwrite ->
    per-unit commit markers.

    COMMIT GRANULARITY: the commit unit is a BATCH of ``units_per_commit``
    units (one Spark write job per batch, markers written after that job
    succeeds) — a mid-run crash preserves every completed batch and the
    resume anti-joins the committed manifest.  The default
    ``units_per_commit=None`` writes ALL missing units in one job (one input
    scan, fastest clean run, but a crash commits nothing from that
    invocation).  Each batch costs one pass over the input, so incremental
    durability trades scans for resumability: ``ceil(missing /
    units_per_commit)`` scans per run.  Pick batch size so one batch is
    ~10-30 min of cluster work.

    Parallelism note: rows of a unit land in one task, so pick
    ``n_units >> executor count`` in production (units are resume
    granularity, not a parallelism cap).

    Returns the list of units committed by THIS run.  ``fail_after_units``
    injects a crash once that many units have committed (tests); it
    defaults ``units_per_commit`` to the same value so the injected state
    is exactly the organic crash-between-batches state.  Resume = call
    again with the same arguments; committed units are skipped.
    """
    done = set(committed_units(out_dir))
    todo = [u for u in range(n_units) if u not in done]
    if units_per_commit is None:
        units_per_commit = fail_after_units if fail_after_units else len(todo)
    units_per_commit = max(1, units_per_commit)
    committed_now: list[int] = []
    tagged = unit_of(df, unit_cols, n_units)
    for start in range(0, len(todo), units_per_commit):
        if fail_after_units is not None and len(committed_now) >= fail_after_units:
            raise RuntimeError(
                f"injected failure after {len(committed_now)} of {len(todo)} units"
            )
        batch = todo[start : start + units_per_commit]
        part = tagged.filter(F.col("__unit").isin(batch))
        part = part.repartition(F.col("__unit"))
        # key_col/key_bloom: production blocks should carry the zone maps
        # (and optionally Bloom filters) the read path skips on
        blocks = encode_df(
            part,
            rows_per_block=rows_per_block,
            group_col="__unit",
            key_col=key_col,
            key_bloom=key_bloom,
        )
        (
            blocks.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("unit")
            .parquet(out_dir)
        )
        # the job succeeded atomically for everything it wrote; mark each
        # unit committed (on Iceberg this is the snapshot commit instead)
        for u in batch:
            unit_dir = os.path.join(out_dir, f"unit={u}")
            os.makedirs(unit_dir, exist_ok=True)  # empty unit: marker only
            open(os.path.join(unit_dir, "_SUCCESS"), "w").close()
        committed_now.extend(batch)
    if fail_after_units is not None and len(committed_now) < len(todo):
        raise RuntimeError(
            f"injected failure after {len(committed_now)} of {len(todo)} units"
        )
    return committed_now


def read_checkpointed_blocks(spark: SparkSession, out_dir: str) -> DataFrame:
    paths = [
        p
        for u in committed_units(out_dir)
        for p in [os.path.join(out_dir, f"unit={u}")]
        if any(f.endswith(".parquet") for f in os.listdir(p))
    ]
    if not paths:
        raise ValueError(f"no committed units under {out_dir}")
    return spark.read.parquet(*paths)
