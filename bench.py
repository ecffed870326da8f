"""Benchmark driver: prints ONE JSON line with headline timings.

Protocol (BASELINE.md): deterministic F1 input (FIXTURES.md, seed 42),
cached to parquet once; encode throughput measured at two parallelism
levels on the SAME files, one warm-up run excluded per level, best-of-R
timed runs; scaling efficiency = (thr_hi / thr_lo) / (cpus_hi / cpus_lo).

The two levels run in PALINDROME order (hi, lo, hi per iteration)
because this sandbox's CPU budget varies on multi-minute timescales —
the palindrome cancels linear drift to first order, so the per-iteration
ratio mean(lo)/mean(hi) sees the same average budget on both sides.  The encode uses the direct-read path
(zebra_spark.sources.parquet_direct) — workers read their parquet splits
with pyarrow instead of shipping every row JVM->Python, which is also the
right layout at cluster scale.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), ZS_BENCH_ROWS (default 1_000_000),
ZS_BENCH_ITERS (default 3, palindrome iterations), ZS_BENCH_LO /
ZS_BENCH_HI (parallelism pair, default 1 and 4 — N vs 4N inside the
host's sustained-core grant), ZS_BENCH_SKIP_SCALING=1 to skip scaling,
ZS_BENCH_MAX_ATTEMPTS / ZS_BENCH_RETRY_SLEEP / ZS_BENCH_MIN_DECODE_RATE
(throttle-validity retry: each lane re-runs up to MAX_ATTEMPTS spaced
retries when its validity signal fails, then the flags stand),
ZS_GRANT_GATE_BAR / ZS_GRANT_GATE_MAX_SKIPS / ZS_GRANT_GATE_SLEEP /
ZS_GRANT_GATE_PASSES (the scaling sweep's grant gate: iterations run
only in windows where a Spark-free kernel shows the host granting ~HI
effective cores; skipped windows are recorded).  r6: the two level
sessions are PERSISTENT subprocesses (tools/bench_worker.py), so the
legs of a palindrome iteration run back-to-back in one window.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 250k rows (~124M tokens) keeps a full scaling run near ~10 min on this
# host; its throttle windows shift on multi-minute scales, so shorter runs
# interleave the two levels more fairly.  ZS_BENCH_ROWS=1000000 for the
# big input (also cached).
BENCH_ROWS = int(os.environ.get("ZS_BENCH_ROWS", "250000"))
# scaling legs use their own input size: efficiency is a ratio, so the
# input must be big enough that compute dominates the ~0.3 s of fixed
# per-job overhead, yet small enough that a throttled lo=1 sweep stays
# bounded.  r4 chose 100k rows; after the r5 engine got ~6.7x faster the
# lo leg fell to ~0.16 s of compute and the wall ratio measured only
# scheduling (pairs ~0.3 while the Spark-free probe read 0.88) — ~500k
# rows (~250 M tokens) restores a ~9 s lo leg.  r6: 524288 = 64 x 8192
# batches over exactly 32 uniform parquet splits, so the HI leg's task
# split is PERFECTLY balanced (the old 45-split input gave 12-vs-11
# splits per task — a structural 6.7% tail penalty on every hi leg).
SCALING_ROWS = int(os.environ.get("ZS_BENCH_SCALING_ROWS", "524288"))
SCALING_PARTS = 32
# 3 palindrome iterations (hi,lo,hi each): drift-canceling pairs are
# far more robust than plain interleaved pairs on this host's
# multi-minute throttle windows; the median over 3 tolerates one
# contaminated iteration
ITERS = int(os.environ.get("ZS_BENCH_ITERS", "3"))
# Default scaling pair is 1 -> 4 (N and 4N).  The host grants only ~3-4
# cores' worth of SUSTAINED vectorized compute in throttled windows
# (BENCH/BASELINE.md sections 3 and 9.6: a Spark-free 4-process run hits
# 13.4 M tok/s — the same ceiling an 8-thread run hits), so a 2->8 pair
# measures the host's core grant, not the engine; 1->4 fits inside the
# grant and the spark-free probe (tools/mp_scaling.py) corroborates it.
# Override with ZS_BENCH_LO / ZS_BENCH_HI (e.g. 2 and 8).
LO = int(os.environ.get("ZS_BENCH_LO", "1"))
HI = int(os.environ.get("ZS_BENCH_HI", "4"))
F1_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench", f"f1_{BENCH_ROWS}.parquet"
)
F1_SCALING_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    ".bench",
    f"f1_scaling_{SCALING_ROWS}x{SCALING_PARTS}.parquet",
)
# the Spark-free engine probe keeps a SHORT input (~5 M tokens): its legs
# measure a pure ratio with ~no fixed overhead, and short bursts are far
# more likely to land inside one of the host's full-grant windows — the
# 25 M-token Spark scaling legs need the size for overhead amortization,
# the probe does not
PROBE_ROWS = int(os.environ.get("ZS_BENCH_PROBE_ROWS", "100000"))
F1_PROBE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench", f"f1_{PROBE_ROWS}.parquet"
)


def ensure_f1_input():
    todo = [
        (p, n)
        for p, n in (
            (F1_PATH, BENCH_ROWS),
            (F1_SCALING_PATH, SCALING_ROWS),
            (F1_PROBE_PATH, PROBE_ROWS),
        )
        if not os.path.exists(os.path.join(p, "_SUCCESS"))
    ]
    if not todo:
        return
    from zebra_spark.session import get_spark
    from zebra_spark.sources.synth import f1_table

    spark = get_spark(master=f"local[{CPUS}]", app_name="zs-bench-gen")
    spark.sparkContext.setLogLevel("ERROR")
    for p, n in todo:
        # the scaling input is written as exactly SCALING_PARTS uniform
        # splits (exact_partitions: contiguous equal batch runs, not
        # round-robin) so the HI leg's split->task assignment balances
        # perfectly — per-split encode cost is ~proportional to rows
        parts = SCALING_PARTS if p == F1_SCALING_PATH else 4 * CPUS
        df = f1_table(
            spark,
            n,
            partitions=parts,
            rows_per_batch=1 << 13,
            exact_partitions=p == F1_SCALING_PATH,
        )
        df.write.mode("overwrite").parquet(p)
    spark.stop()


def encode_once(spark, path=None):
    from zebra_spark.sources.parquet_direct import encode_parquet_direct

    t0 = time.perf_counter()
    row = (
        encode_parquet_direct(spark, path or F1_PATH)
        .groupBy()
        .agg(
            F.sum("n_rows").alias("rows"),
            F.sum("raw_bytes").alias("raw"),
            F.sum("enc_bytes").alias("enc"),
            F.sum("zebra_bytes").alias("zebra"),
        )
        .collect()[0]
    )
    return time.perf_counter() - t0, row


# bounded retry-until-valid (r4 verdict #1): the host sometimes grants
# <1/3 core for a whole bench window, and a throttled artifact undersells
# the engine 7-11x.  Each lane re-runs up to MAX_ATTEMPTS spaced retries
# when its own validity signal fails; attempts are recorded so retries
# stay auditable.  After the last attempt the flags stand — the artifact
# documents the window honestly rather than fabricating a number.
MAX_ATTEMPTS = int(os.environ.get("ZS_BENCH_MAX_ATTEMPTS", "3"))
RETRY_SLEEP = float(os.environ.get("ZS_BENCH_RETRY_SLEEP", "60"))
# quiet-window decode is 40-80 M tok/s (BENCH/BASELINE.md 9.4); below a
# third of the conservative end the lane is throttle-contaminated
MIN_DECODE_RATE = float(os.environ.get("ZS_BENCH_MIN_DECODE_RATE", "13e6"))


def _retry_lane(run, is_valid, better):
    """Run `run()` up to MAX_ATTEMPTS times, stopping at the first valid
    result; keeps the best invalid one otherwise.  Returns (result,
    attempts_used)."""
    best = None
    for attempt in range(1, MAX_ATTEMPTS + 1):
        res = run()
        if best is None or better(res, best):
            best = res
        if is_valid(res):
            return best, attempt
        if attempt < MAX_ATTEMPTS:
            time.sleep(RETRY_SLEEP)  # spaced: throttle windows shift on minutes
    return best, MAX_ATTEMPTS


from zebra_spark.bench_kernel import grant_work as _grant_work

GATE_BAR = float(os.environ.get("ZS_GRANT_GATE_BAR", "0.92"))
GATE_MAX_SKIPS = int(os.environ.get("ZS_GRANT_GATE_MAX_SKIPS", "16"))
GATE_SLEEP = float(os.environ.get("ZS_GRANT_GATE_SLEEP", "25"))
GATE_PASSES = int(os.environ.get("ZS_GRANT_GATE_PASSES", "150"))
# iteration validity: lo-leg absolute rate (unthrottled single-core encode
# is ~8 M tok/s, BENCH/BASELINE.md 9.2; bar = a third of the conservative
# end) + intra-iteration HI-leg spread (the palindrome's linear-drift
# assumption is falsified when the two HI legs disagree by >25%).  The
# sweep keeps running iterations until ITERS are valid, up to MAX_ITERS.
MIN_LO_RATE = float(os.environ.get("ZS_BENCH_MIN_LO_RATE", "2.5e6"))
HI_SPREAD_MAX = float(os.environ.get("ZS_BENCH_HI_SPREAD_MAX", "0.25"))
MAX_ITERS = int(os.environ.get("ZS_BENCH_MAX_ITERS", "7"))
# post-iteration grant reading must still clear ~the gate (slightly
# relaxed for the ~1 s reading's own noise): a window that decays
# smoothly mid-iteration passes the spread check but caps the HI legs
GATE_POST_BAR = float(os.environ.get("ZS_GRANT_GATE_POST_BAR", "0.85"))


class GrantGate:
    """Spark-free instantaneous core-grant meter (persistent pools, so the
    per-process numpy JIT cost is paid once at startup, not per reading).

    The sandbox caps sustained vectorized load at a time-varying 2-4-core
    aggregate budget on multi-minute windows (BENCH/BASELINE.md §3); in a
    capped window the HI Spark leg physically cannot run HI/LO times
    faster, so its wall ratio measures the grant, not the engine.  The
    gate runs LO then HI concurrent copies of the same fixed kernel
    (~0.5 s each) and returns t_lo/t_hi: ~1.0 means the host is granting
    >= HI effective cores RIGHT NOW and a scaling measurement is
    physically meaningful; measurements are taken only in such windows
    (every reading and skip is recorded in the artifact)."""

    def __init__(self, lo: int, hi: int):
        import multiprocessing as mp

        ctx = mp.get_context("spawn")  # never fork a JVM-bearing parent
        self.lo, self.hi = lo, hi
        self.pool_lo = ctx.Pool(lo)
        self.pool_hi = ctx.Pool(hi)
        self.pool_lo.map(_grant_work, [2] * lo)  # JIT warm-up (excluded)
        self.pool_hi.map(_grant_work, [2] * hi)

    def reading(self) -> dict:
        t0 = time.perf_counter()
        self.pool_lo.map(_grant_work, [GATE_PASSES] * self.lo)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        self.pool_hi.map(_grant_work, [GATE_PASSES] * self.hi)
        t_hi = time.perf_counter() - t0
        return {
            "efficiency": round(t_lo / t_hi, 3),
            "lo_sec": round(t_lo, 3),
            "hi_sec": round(t_hi, 3),
        }

    def close(self) -> None:
        for p in (self.pool_lo, self.pool_hi):
            p.terminate()


class BenchWorker:
    """Client for a persistent tools/bench_worker.py subprocess: one
    resident local[N] SparkSession serving timed encode legs on demand.
    Keeping both level JVMs alive puts the (hi, lo, hi) legs of a
    palindrome iteration back-to-back inside one host-budget window (the
    old session-per-leg protocol paid ~10-20 s of untimed JVM startup
    between legs, letting the window shift mid-iteration)."""

    def __init__(self, cpus: int, path: str):
        import subprocess

        here = os.path.dirname(os.path.abspath(__file__))
        os.makedirs(os.path.join(here, ".bench"), exist_ok=True)
        self.cpus = cpus
        self.errlog = open(
            os.path.join(here, ".bench", f"worker_{cpus}.stderr"), "w"
        )
        self.proc = subprocess.Popen(
            [
                sys.executable,
                os.path.join(here, "tools", "bench_worker.py"),
                str(cpus),
                path,
            ],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=self.errlog,
            text=True,
            bufsize=1,
        )

    def _read_json(self) -> dict:
        for line in self.proc.stdout:
            if line.startswith("{"):
                return json.loads(line)
        raise RuntimeError(
            f"bench worker local[{self.cpus}] died "
            f"(see .bench/worker_{self.cpus}.stderr)"
        )

    def wait_ready(self) -> None:
        assert self._read_json().get("ready")

    def run(self) -> dict:
        self.proc.stdin.write("RUN\n")
        self.proc.stdin.flush()
        return self._read_json()

    def close(self) -> None:
        try:
            self.proc.stdin.write("EXIT\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=30)
        except Exception:
            self.proc.kill()
        self.errlog.close()


def scaling_sweep():
    import pyarrow.parquet as pq

    n_tokens = int(
        pq.read_table(F1_SCALING_PATH, columns=["n_tok"])["n_tok"]
        .to_numpy()
        .sum()
    )
    best = {LO: None, HI: None}
    totals = {LO: None, HI: None}
    samples = {LO: [], HI: []}
    pal_pairs = []  # per-iteration palindrome (lo_mean, hi_mean)
    gate_log, gate_post, skips = [], [], 0
    # start both level workers first (their warm-ups run concurrently,
    # excluded per protocol), then the grant gate
    workers = {n: BenchWorker(n, F1_SCALING_PATH) for n in (LO, HI)}
    for w in workers.values():
        w.wait_ready()
    gate = GrantGate(LO, HI)
    hi_spreads = []
    try:
        iters_done = 0
        valid_done = 0
        while valid_done < ITERS and iters_done < MAX_ITERS:
            # GRANT GATE: measure only in windows where the host grants
            # ~HI effective cores (r5 verdict #2: "skip the window") — a
            # capped window measures the sandbox budget, not the engine.
            # After GATE_MAX_SKIPS the remaining iterations run ungated so
            # the artifact always carries >= ITERS honest iterations.
            g = gate.reading()
            gate_log.append(g["efficiency"])
            if g["efficiency"] < GATE_BAR and skips < GATE_MAX_SKIPS:
                skips += 1
                time.sleep(GATE_SLEEP)
                continue
            # PALINDROME order (hi, lo, hi): symmetric around the LO leg,
            # so linear budget drift cancels to first order; the
            # grant-sensitive HI legs sit closest to the just-passed gate
            # reading, and the whole iteration stays ~16 s — short enough
            # to fit inside one grant window
            it_times = {LO: [], HI: []}
            for cpus in (HI, LO, HI):
                res = workers[cpus].run()
                dt = res["sec"]
                samples[cpus].append(dt)
                it_times[cpus].append(dt)
                if best[cpus] is None or dt < best[cpus]:
                    best[cpus], totals[cpus] = dt, res
            # normalized per-level mean seconds, so the pair math is
            # independent of how many legs each level ran this iteration
            pal_pairs.append(
                (
                    sum(it_times[LO]) / len(it_times[LO]),
                    sum(it_times[HI]) / len(it_times[HI]),
                )
            )
            # intra-iteration drift check: the palindrome cancels LINEAR
            # drift, so the two HI legs bracketing the LO leg must agree —
            # a large spread means the grant window SHIFTED mid-iteration
            # (nonlinear drift) and the pair is contaminated in an unknown
            # direction.  Direction-blind validity signal, like lo_rate.
            h1, h2 = it_times[HI]
            hi_spreads.append(abs(h1 - h2) / min(h1, h2))
            # POST-gate: the measurement's precondition (host grants ~HI
            # cores) must hold for the WHOLE iteration — a window that
            # decays smoothly after the pre-gate passes the spread check
            # yet caps the HI legs (observed: spreads 0.05-0.06 with
            # pairs ~0.70 in decayed windows).  Re-read the grant after
            # the legs; direction-blind like the other signals.
            g2 = gate.reading()
            gate_post.append(g2["efficiency"])
            iters_done += 1
            if (
                hi_spreads[-1] <= HI_SPREAD_MAX
                and g2["efficiency"] >= GATE_POST_BAR
                and n_tokens / pal_pairs[-1][0] >= MIN_LO_RATE
            ):
                valid_done += 1
    finally:
        gate.close()
        for w in workers.values():
            w.close()

    def level(cpus):
        return {
            "cpus": cpus,
            "sec": round(best[cpus], 3),
            "tokens_per_sec": round(n_tokens / best[cpus]),
            "n_tokens": n_tokens,
            "enc_bytes": totals[cpus]["enc"],
            "zebra_bytes": totals[cpus]["zebra"],
            "raw_bytes": totals[cpus]["raw"],
            "bytes_per_token": round(totals[cpus]["enc"] / n_tokens, 4),
        }

    lo, hi = level(LO), level(HI)
    eff_bestof = (hi["tokens_per_sec"] / lo["tokens_per_sec"]) / (HI / LO)
    # drift-canceling estimator: one efficiency per palindrome iteration
    # pal_pairs carry per-level MEAN seconds per iteration
    eff_pairs = [(lmean / hmean) / (HI / LO) for lmean, hmean in pal_pairs]
    # VALIDITY filter on an INDEPENDENT signal: when the host grants less
    # than ~a third of one core to the lo=1 leg (absolute rate, nothing to
    # do with the ratio), the HI leg physically cannot use its cores and
    # the ratio measures the grant, not the engine.  Unthrottled
    # single-core encode is ~8 M tok/s (BENCH/BASELINE.md 9.2); default
    # bar 2.5 M tok/s.  Iterations below the bar are excluded from the
    # headline median; if ALL are below, the run is flagged throttled and
    # the median falls back to every iteration.
    lo_rates = [n_tokens / lmean for lmean, _ in pal_pairs]
    valid = [
        i
        for i, r in enumerate(lo_rates)
        if r >= MIN_LO_RATE
        and hi_spreads[i] <= HI_SPREAD_MAX
        and gate_post[i] >= GATE_POST_BAR
    ]
    throttled_run = not valid
    use = valid if valid else list(range(len(eff_pairs)))
    # headline = MEDIAN of the pair ratios: a pair ratio > 1.0 is physically
    # impossible (host-throttle contamination — the shared-window assumption
    # failed for that pair), so max() would select exactly the most
    # contaminated sample.  Clamp such pairs to 1.0 before taking the median
    # and report how many were clamped; keep raw pairs + best-of as
    # diagnostics.
    clamped = [min(eff_pairs[i], 1.0) for i in use]
    n_throttle_artifacts = sum(1 for e in eff_pairs if e > 1.0)
    med = sorted(clamped)[len(clamped) // 2] if len(clamped) % 2 else (
        sum(sorted(clamped)[len(clamped) // 2 - 1 : len(clamped) // 2 + 1]) / 2
    )
    return {
        "low": lo,
        "high": hi,
        "scaling_efficiency": round(med, 3),
        # diagnostics: max clamped pair = cleanest-window estimate (biased
        # up when a lo leg was throttled without pushing the pair over 1.0,
        # so it is NOT the headline); bestof pairs best lo vs best hi
        # across iterations (can cross windows, also not the headline)
        "scaling_efficiency_max_clamped": round(max(clamped), 3),
        "scaling_efficiency_bestof": round(eff_bestof, 3),
        "scaling_pairs": [round(e, 3) for e in eff_pairs],
        "scaling_lo_rates_mtoks": [round(r / 1e6, 2) for r in lo_rates],
        "scaling_valid_iterations": len(valid),
        "scaling_hi_spreads": [round(s, 3) for s in hi_spreads],
        "scaling_throttled_run": throttled_run,
        "scaling_pairs_throttle_artifacts": n_throttle_artifacts,
        "scaling_leg_order": "hi,lo,hi (persistent sessions)",
        "grant_gate": {
            "bar": GATE_BAR,
            "readings": gate_log,
            "post_bar": GATE_POST_BAR,
            "post_readings": gate_post,
            "windows_skipped": skips,
        },
        "compression_vs_zebra": round(hi["enc_bytes"] / hi["zebra_bytes"], 4),
    }


def encode_lanes():
    """decode lane FIRST (single fragile measurement gets the freshest
    host budget), then the scaling sweep, then the size-policy subprocess;
    decode and scaling each retry on their own validity signal."""
    decode, decode_attempts = _retry_lane(
        lambda: decode_run(None),
        is_valid=lambda d: d["tokens_per_sec"] >= MIN_DECODE_RATE,
        better=lambda a, b: a["tokens_per_sec"] > b["tokens_per_sec"],
    )
    decode["attempts"] = decode_attempts
    decode["throttled"] = decode["tokens_per_sec"] < MIN_DECODE_RATE

    def sweep_better(a, b):
        if a["scaling_valid_iterations"] != b["scaling_valid_iterations"]:
            return a["scaling_valid_iterations"] > b["scaling_valid_iterations"]
        # both invalid: prefer the less-throttled window (higher lo rate)
        return max(a["scaling_lo_rates_mtoks"]) > max(b["scaling_lo_rates_mtoks"])

    sweep, sweep_attempts = _retry_lane(
        scaling_sweep,
        is_valid=lambda s: s["scaling_valid_iterations"] > 0,
        better=sweep_better,
    )
    sweep["scaling_attempts"] = sweep_attempts
    sweep["size_policy"] = size_policy_run()
    sweep["decode"] = decode
    # the probe is the north-rule scaling evidence, so it gets the same
    # retry-until-valid discipline as the other lanes: a hi leg whose
    # CPU-second efficiency collapses means the host granted fewer cores
    # than the leg used (oversubscription thrash), not engine overhead —
    # quiet-window values are 0.88-0.98 (BENCH/BASELINE.md 10.7)
    probe, probe_attempts = _retry_lane(
        engine_probe_run,
        is_valid=lambda p: p.get("cpu_second_efficiency", 0) >= MIN_PROBE_CPU_EFF,
        better=lambda a, b: a.get("cpu_second_efficiency", 0)
        > b.get("cpu_second_efficiency", 0),
    )
    probe["attempts"] = probe_attempts
    probe["grant_starved"] = (
        probe.get("cpu_second_efficiency", 0) < MIN_PROBE_CPU_EFF
    )
    sweep["engine_probe"] = probe
    return sweep


MIN_PROBE_CPU_EFF = float(os.environ.get("ZS_PROBE_MIN_CPU_EFF", "0.7"))


def engine_probe_run():
    """Spark-free multiprocessing scaling probe (tools/mp_scaling.py) on
    its own short F1_PROBE_PATH input (ZS_BENCH_PROBE_ROWS, independent
    of the Spark sweep's SCALING_ROWS).  Reports wall AND CPU-second
    efficiency: process
    CPU time excludes host steal, so cpu_second_efficiency measures the
    engine's own coordination overhead independently of the sandbox's
    time-varying core grant — the wall ratio structurally cannot once
    single-core throughput saturates the host's aggregate budget
    (BENCH/BASELINE.md sections 3 and 10.7)."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        out = subprocess.run(
            [
                sys.executable,
                os.path.join(here, "tools", "mp_scaling.py"),
                str(LO), str(HI), "2", F1_PROBE_PATH,
            ],
            capture_output=True, text=True, timeout=900,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            return {"error": (out.stderr or out.stdout)[-300:]}
        return json.loads(lines[-1])
    except Exception as e:
        return {"error": f"{type(e).__name__}: {e}"[:300]}


def size_policy_run():
    """One encode pass under ZS_CODEC_POLICY=size in a FRESH process —
    workers read the policy at module import, so it must be in the process
    env before the JVM starts.  Proves the size-only selector still holds
    the <= zebra bound with margin (r3 verdict: the balanced policy's
    decode-cost gates traded 3.5% size; this lane pins what the format can
    do when size is the only objective)."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    code = (
        "import os, sys, json\n"
        f"sys.path.insert(0, {here!r})\n"
        "from zebra_spark.session import get_spark\n"
        "from zebra_spark.sources.parquet_direct import encode_parquet_direct\n"
        "from pyspark.sql import functions as F\n"
        f"spark = get_spark(master='local[{HI}]', app_name='zs-bench-size')\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        f"r = (encode_parquet_direct(spark, {F1_PATH!r}).groupBy()\n"
        "     .agg(F.sum('enc_bytes').alias('enc'),\n"
        "          F.sum('zebra_bytes').alias('zebra')).collect()[0])\n"
        "print(json.dumps({'enc': r['enc'], 'zebra': r['zebra']}))\n"
    )
    env = dict(os.environ, ZS_CODEC_POLICY="size")
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        return {"error": (out.stderr or out.stdout)[-300:]}
    d = json.loads(lines[-1])
    return {
        "enc_bytes": d["enc"],
        "zebra_bytes": d["zebra"],
        "compression_vs_zebra": round(d["enc"] / d["zebra"], 4),
    }


def decode_run(n_tokens: int | None):
    """One timed decode pass (encode -> blocks cached -> decode) at HI."""
    from zebra_spark.session import get_spark
    from zebra_spark.operators.decode import decode_df
    from zebra_spark.sources.parquet_direct import encode_parquet_direct

    spark = get_spark(master=f"local[{HI}]", app_name="zs-bench-decode")
    spark.sparkContext.setLogLevel("ERROR")
    if n_tokens is None:  # decode now runs before the scaling legs
        n_tokens = int(
            spark.read.parquet(F1_PATH).agg(F.sum("n_tok")).collect()[0][0]
        )
    blocks = encode_parquet_direct(spark, F1_PATH).cache()
    blocks.count()
    decode_df(blocks).count()  # warm-up
    best = None
    for _ in range(max(1, ITERS - 1)):
        t0 = time.perf_counter()
        decode_df(blocks).count()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    spark.stop()
    return {"sec": round(best, 3), "tokens_per_sec": round(n_tokens / best)}


HEADLINE = [
    "roundtrip_lineitem",
    "roundtrip_documents",
    "token_count",
    "dedup_exact",
    "ann_topk",
    "encode_summary",
]


def headline_queries():
    import __spark_entry__ as entry
    from zebra_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", app_name="zs-bench-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    qs["roundtrip_lineitem"](spark, SF_DIR).count()  # warm workers
    out = {}
    for name in HEADLINE:
        # retired-from-contract queries (e.g. encode_summary) keep their
        # private _q_* functions; the HEADLINE set stays comparable
        fn = qs.get(name) or getattr(entry, f"_q_{name}")
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
    tables = per_table_compression(spark)
    spark.stop()
    return out, tables


def per_table_compression(spark):
    """ours/zebra per driver table — a cheap per-round drift guard for the
    compression margin (r4 verdict #6): a codec change that erodes the F1
    0.99 bound or regresses a non-token table shows up here immediately.
    Sizes are deterministic (unlike wall-clock), so one pass suffices."""
    from zebra_spark.operators.encode import encode_df

    out = {}
    for t in ("documents", "lineitem", "events", "embeddings"):
        df = spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet"))
        r = (
            encode_df(df, rows_per_block=1 << 16)
            .groupBy()
            .agg(
                F.sum("enc_bytes").alias("enc"),
                F.sum("zebra_bytes").alias("zebra"),
            )
            .collect()[0]
        )
        out[t] = round(r["enc"] / r["zebra"], 4)
    # --sort-by layout lever drift guard (r6): source-sorted rows make
    # per-block FSE/dict tables single-source (measured ~5% on the token
    # column, BENCH/BASELINE.md §11).  Ratio of sorted to unsorted enc
    # bytes on the cached 100k-row F1 probe input; < 1.0 means the flag
    # still pays.
    fdf = spark.read.parquet(F1_PROBE_PATH)

    def tot(frame):
        return (
            encode_df(frame, rows_per_block=1 << 16)
            .groupBy()
            .agg(F.sum("enc_bytes").alias("e"))
            .collect()[0]["e"]
        )

    out["f1_sorted_by_source_vs_unsorted"] = round(
        tot(fdf.sortWithinPartitions("source")) / tot(fdf), 4
    )
    return out


def main():
    ensure_f1_input()
    queries, tables = headline_queries()
    result = {
        "metric": "encode_throughput_and_headline_queries",
        "unit": "sec",
        "sf": SF_DIR,
        "queries": queries,
        "per_table_compression_vs_zebra": tables,
        "value": round(sum(queries.values()), 3),
    }
    if os.environ.get("ZS_BENCH_SKIP_SCALING") != "1":
        result["encode"] = encode_lanes()
        result["value"] = round(
            result["value"]
            + result["encode"]["low"]["sec"]
            + result["encode"]["high"]["sec"],
            3,
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
