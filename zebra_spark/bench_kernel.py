"""Grant-gate work kernel for bench.py (importable module so that
multiprocessing spawn workers can unpickle it regardless of which script
is __main__)."""

from __future__ import annotations


def grant_work(n_passes: int) -> float:
    """Fixed vectorized work unit: multiply-add passes over a 16 MB int64
    array — same memory+SIMD profile as the encode's numpy passes, no
    Spark, no IO.  Wall time of N concurrent units vs one unit measures
    the host's INSTANTANEOUS effective-core grant."""
    import numpy as np

    a = np.arange(1 << 21, dtype=np.int64)
    for _ in range(n_passes):
        a = a * 0x5851F42D4C957F2D + 1
        a &= 0x7FFFFFFFFFFFFFF
    return float(a[0])
