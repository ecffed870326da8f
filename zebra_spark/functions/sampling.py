"""Deterministic sampling for training-data pipelines.

`F.rand()` samples are irreproducible across retries, partitionings, and
engines — poison for a pipeline that must be re-runnable bit-for-bit and
auditable.  These operators instead hash a stable key and keep a row iff
the hash falls under the rate threshold:

    keep(row)  <=>  first8(md5(key || ':' || seed)) < rate * 2^32

Properties that matter at 100 TB:
* embarrassingly parallel — a pure per-row predicate, no shuffle, no
  state, survives any re-partitioning or speculative re-execution;
* consistent — the same key draws the same verdict in every run, every
  engine (md5 is engine-portable, unlike xxhash64), so incremental loads
  sample consistently with historical ones;
* exactly verifiable — the driver's DuckDB oracle reproduces the
  predicate byte-for-byte.

Stratified sampling takes per-stratum rates (e.g. downsample web text,
keep all code) as a plain dict compiled into a CASE expression — still a
scan-level predicate, still no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SCALE = 1 << 32


def _hash_unit(key: Column, seed: int) -> Column:
    """Uniform-ish value in [0, 2^32) from the md5 of key and seed.

    First 8 hex chars of md5 -> integer.  md5 (not xxhash64) because every
    engine computes the same digest — the sample is portable and
    oracle-checkable.
    """
    h = F.substring(F.md5(F.concat_ws(":", key.cast("string"), F.lit(str(seed)))), 1, 8)
    return F.conv(h, 16, 10).cast("long")


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str, seed: int = 42
) -> DataFrame:
    """Keep ~`rate` of rows, chosen by key hash (stable across runs/engines)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    thresh = int(rate * _SCALE)
    return df.filter(_hash_unit(F.col(key_col), seed) < F.lit(thresh))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: int = 42,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (strata without a rate get
    `default_rate`).  Compiles to one scan-level CASE predicate."""
    for s, r in fractions.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1], got {r}")
    thresh = F.lit(int(default_rate * _SCALE))
    for s, r in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == s, F.lit(int(r * _SCALE))).otherwise(
            thresh
        )
    return df.filter(_hash_unit(F.col(key_col), seed) < thresh)
