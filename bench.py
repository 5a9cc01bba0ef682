"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: candidate moves evaluated per second on nqueens-1000 with a
vmapped trajectory population on one TPU chip (BASELINE.json config[1]+[3]).
Also measures (stderr): time-to-zero-violations on nqueens-1000 and the
solution quality gate.

vs_baseline: the reference publishes no numbers and no Rust toolchain exists
here (BASELINE.md), so the baseline is a faithful C++ -O3 stand-in for the
reference's hot loop — full O(n^2) rescore per candidate clone (reference
local_search.rs:315-323 + nqueens lib.rs:74-87) — compiled and measured on
this host at bench time (bench/baseline_nqueens.cc).  Falls back to a
recorded constant if g++ is unavailable.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N = int(os.environ.get("BENCH_N", 1000))
# P=256 is the measured single-chip sweet spot (near-linear moves/s scaling
# 16->64->256 with flat time-to-zero; P>=1024 risks overrunning the axon
# relay's per-dispatch execution window).
POP = int(os.environ.get("BENCH_POP", 256))
CHUNK = int(os.environ.get("BENCH_CHUNK", 2))
# Inner-descent cap: vmapped lanes run lockstep until every lane bails, so a
# large cap lets one straggler lane idle the rest (productive fraction ~26%
# at 2000 vs ~90% at 250; BENCH_NOTES.md sweep). 250 minimizes measured
# time-to-zero.
LS_MAX = int(os.environ.get("BENCH_LS_MAX", 250))
FALLBACK_BASELINE = 7370.0  # measured 2026-08-17 on this host (see bench/)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def measure_baseline() -> float:
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bench", "baseline_nqueens.cc")
    exe = "/tmp/baseline_nqueens"
    try:
        if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-o", exe, src],
                check=True, capture_output=True, timeout=120,
            )
        out = subprocess.run(
            [exe, str(N), "4"], check=True, capture_output=True, timeout=60
        )
        return float(out.stdout.strip())
    except Exception as e:  # noqa: BLE001
        log(f"baseline measurement failed ({e}); using recorded {FALLBACK_BASELINE}")
        return FALLBACK_BASELINE


SCHED_FALLBACK_BASELINE = 4295.0  # measured 2026-08-19 on this host (see bench/)


def measure_scheduling_baseline(days: int, emps: int) -> float:
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bench", "baseline_scheduling.cc")
    exe = "/tmp/baseline_scheduling"
    try:
        if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-o", exe, src],
                check=True, capture_output=True, timeout=120,
            )
        out = subprocess.run(
            [exe, str(days), str(emps), "4"],
            check=True, capture_output=True, timeout=60,
        )
        return float(out.stdout.strip())
    except Exception as e:  # noqa: BLE001
        log(f"scheduling baseline failed ({e}); using recorded "
            f"{SCHED_FALLBACK_BASELINE}")
        return SCHED_FALLBACK_BASELINE


def main() -> None:
    baseline = measure_baseline()
    log(f"reference-style CPU baseline: {baseline:.0f} moves/s")

    import jax

    from constraint_solver_tpu.core.ils import SolverConfig
    from constraint_solver_tpu.models.nqueens import make_nqueens_problem
    from constraint_solver_tpu.parallel.population import PopulationSolver

    log(f"devices: {jax.devices()}")
    on_tpu = jax.devices()[0].platform != "cpu"
    # BENCH_SAMPLING=approx swaps the exact Gumbel top-k column sample for
    # approx_max_k (A/B knob; documented divergence in models/nqueens.py).
    problem = make_nqueens_problem(
        N, use_pallas=on_tpu,
        col_sampling=os.environ.get("BENCH_SAMPLING", "exact"),
    )
    moves_per_ls_iter = problem.width
    config = SolverConfig(
        seed="bench",
        local_search_max_iterations=LS_MAX,
        all_solutions_capacity=256,
        best_solutions_capacity=8,
        iterated_local_search_max_iterations=10_000,
        max_allow_no_improvement_for=5,
    )

    # --- warm-up: compile every program shape used below ------------------
    solver = PopulationSolver(problem, config, population=POP, exchange_every=CHUNK)
    t0 = time.time()
    solver.run(max_rounds=CHUNK, chunk=CHUNK)
    log(f"warm-up (compile) {time.time() - t0:.1f}s")

    # --- timed solve from a fresh state -----------------------------------
    # Throughput is measured over the productive portion of an actual solve
    # (converged trajectories gate their inner search off, so counted
    # iterations are real work), and the same run yields
    # time-to-zero-violations.
    solver2 = PopulationSolver(problem, config, population=POP, exchange_every=CHUNK)
    t0 = time.time()
    solver2.run(chunk=CHUNK)  # stops at hard == 0 via the convergence probe
    ttz = time.time() - t0
    (hard, _), _ = solver2.get_best_solution()
    iters = solver2.stats()["ls_iterations"]
    moves = iters * moves_per_ls_iter
    throughput = moves / ttz
    log(f"time-to-zero-violations nqueens-{N} (P={POP}): {ttz:.2f}s best={hard}")
    log(
        f"throughput: {iters} LS iterations x {moves_per_ls_iter} moves "
        f"in {ttz:.2f}s = {throughput:.3g} moves/s"
    )

    # --- extra: parallel min-conflicts time-to-zero (beyond-parity mode) --
    from constraint_solver_tpu.models.nqueens_parallel import pmc_solve

    out = pmc_solve(N, jax.random.key(0), max_steps=5000)  # compile
    jax.block_until_ready(out)
    t0 = time.time()
    out = pmc_solve(N, jax.random.key(1), max_steps=5000)
    pmc_score = float(out.score)
    pmc_ttz = time.time() - t0
    log(
        f"parallel-min-conflicts nqueens-{N}: score={pmc_score} "
        f"steps={int(out.steps)} time-to-zero={pmc_ttz:.2f}s"
    )

    # --- extra: employee-scheduling 365d x 20e (the second north-star
    # domain, BASELINE.json) — dense-block delta scoring, time-to-hard-zero
    # + moves/s vs the reference-style C++ scheduling baseline. -----------
    sched_extras = {}
    try:
        import datetime

        from constraint_solver_tpu.models.scheduling import (
            ScheduleSpec,
            make_scheduling_problem,
        )

        s_days, s_emps, s_pop = 365, 20, 64
        sched_baseline = measure_scheduling_baseline(s_days, s_emps)
        log(f"reference-style scheduling baseline: {sched_baseline:.0f} moves/s")
        d0 = datetime.date(2024, 1, 1)
        spec = ScheduleSpec.from_dates(
            d0, d0 + datetime.timedelta(days=s_days - 1), s_emps,
            {e: [d0 + datetime.timedelta(days=(17 * e + 11 * k) % s_days)
                 for k in range(10)] for e in range(s_emps)},
        )
        sched_p = make_scheduling_problem(spec, proposer="dense")
        sched_cfg = SolverConfig(
            seed="bench",
            local_search_max_iterations=200,
            best_solutions_capacity=16,
            all_solutions_capacity=256,
            all_solution_iteration_expiry=1_000,
            iterated_local_search_max_iterations=10_000,
            max_allow_no_improvement_for=20,
        )
        sp = PopulationSolver(sched_p, sched_cfg, population=s_pop)
        sp.run(max_rounds=2, chunk=2)  # compile warm-up
        sp = PopulationSolver(sched_p, sched_cfg, population=s_pop)
        t0 = time.time()
        sp.run(max_rounds=40, chunk=2)  # stops early at (hard, soft) == 0
        s_wall = time.time() - t0
        (s_hard, s_soft), _ = sp.get_best_solution()
        s_moves = sp.stats()["moves_evaluated"]
        s_tput = s_moves / s_wall
        log(
            f"scheduling-{s_days}d-{s_emps}e (P={s_pop}): best=({s_hard}, "
            f"{s_soft}) in {s_wall:.2f}s, {s_tput:.3g} moves/s "
            f"({s_tput / sched_baseline:.0f}x baseline)"
        )
        sched_extras = {
            "scheduling365_moves_per_sec": round(s_tput),
            "scheduling365_best_hard": s_hard,
            "scheduling365_best_soft": s_soft,
            "scheduling365_wall_s": round(s_wall, 2),
            "scheduling365_vs_baseline": round(s_tput / sched_baseline, 1),
        }
    except Exception as e:  # noqa: BLE001
        log(f"scheduling extra failed: {e}")

    print(
        json.dumps(
            {
                "metric": f"nqueens{N}_moves_evaluated_per_sec",
                "value": round(throughput),
                "unit": "moves/s",
                "vs_baseline": round(throughput / baseline, 1),
                **sched_extras,
            }
        )
    )


if __name__ == "__main__":
    main()
