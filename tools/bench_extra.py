"""Per-query isolation bench (optimization guide §1.4/§1.5) — NOT the
driver's bench.py (frozen); numbers cited in OPTIMIZATION_r07.md.

Times each declared query (or a --names subset) with the noop sink so the
computation is measured, not the sink, labelled via setJobDescription.
Reps are INTERLEAVED round-robin (rep-major, query-minor) so the host's
multi-minute budget windows hit all queries alike (BENCH/BASELINE.md §3:
never conclude from one run); the reported number is the per-query MIN.

Usage:
  python tools/bench_extra.py                      # all queries, 3 reps
  python tools/bench_extra.py --names a,b --reps 5
  python tools/bench_extra.py --plans plans/r07 --suffix before
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default=None, help="comma list; default = all")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir to dump explain() files")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-time", action="store_true", help="plans only")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from zebra_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", app_name="zs-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = args.names.split(",") if args.names else list(qs)

    def fn(name):
        f = qs.get(name) or getattr(entry, f"_q_{name}")
        return f

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan_of(fn(name)(spark, SF_DIR)))
        print(f"wrote {len(names)} plans to {args.plans}", file=sys.stderr)
    if args.no_time:
        spark.stop()
        return

    # warm-up (python workers + numpy JIT), excluded — same as bench.py
    qs["roundtrip_lineitem"](spark, SF_DIR).count()
    samples: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(args.reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}#{rep}")
            t0 = time.perf_counter()
            fn(name)(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[name].append(round(time.perf_counter() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    out = {
        "sf": SF_DIR,
        "cpus": CPUS,
        "reps": args.reps,
        "queries_min": {n: min(s) for n, s in samples.items()},
        "samples": samples,
        "total_min": round(sum(min(s) for s in samples.values()), 3),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
