"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: candidate moves evaluated per second on nqueens-1000 with a
vmapped trajectory population on one TPU chip (BASELINE.json config[1]+[3]),
reported as the MEDIAN of BENCH_REPEATS fresh-state solves with min/max
spread (single-sample walls through the axon tunnel drift ~10-15% across
days; the spread distinguishes regression from noise).

Quality-at-wall (the north star's actual contract, BASELINE.md): best score
at fixed wall budgets (BENCH_BUDGETS, default 2.3/10/60 s) measured on BOTH
sides — the complete reference algorithm in C++ (bench/baseline_full.cc: LS
window truncation, tabu History, 1:5:1 acceptance, restart-every-50, full
rescores; round budget uncapped so the wall is the binding limit) and the
TPU population solver probed at the same walls.  The JSON line carries the
{baseline, tpu} pairs for nqueens-1000 and scheduling-365d-20e.

vs_baseline: the reference publishes no numbers and no Rust toolchain exists
here (BASELINE.md), so baselines are faithful C++ -O3 stand-ins measured on
this host at bench time.  Falls back to recorded constants if g++ is
unavailable.
"""

from __future__ import annotations

import dataclasses
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
REPEATS = int(os.environ.get("BENCH_REPEATS", 3))
BUDGETS = [float(b) for b in os.environ.get("BENCH_BUDGETS", "2.3,10,60").split(",")]
FALLBACK_BASELINE = 7370.0  # measured 2026-08-17 on this host (see bench/)
SCHED_FALLBACK_BASELINE = 4295.0  # measured 2026-08-19 on this host

_DIR = os.path.dirname(os.path.abspath(__file__))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _build(src_name: str, exe: str) -> bool:
    src = os.path.join(_DIR, "bench", src_name)
    try:
        if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-o", exe, src],
                check=True, capture_output=True, timeout=180,
            )
        return True
    except Exception as e:  # noqa: BLE001
        log(f"build {src_name} failed ({e})")
        return False


def measure_baseline() -> float:
    exe = "/tmp/baseline_nqueens"
    if not _build("baseline_nqueens.cc", exe):
        return FALLBACK_BASELINE
    try:
        out = subprocess.run(
            [exe, str(N), "4"], check=True, capture_output=True, timeout=60
        )
        return float(out.stdout.strip())
    except Exception as e:  # noqa: BLE001
        log(f"baseline measurement failed ({e}); using recorded {FALLBACK_BASELINE}")
        return FALLBACK_BASELINE


def measure_scheduling_baseline(days: int, emps: int) -> float:
    exe = "/tmp/baseline_scheduling"
    if not _build("baseline_scheduling.cc", exe):
        return SCHED_FALLBACK_BASELINE
    try:
        out = subprocess.run(
            [exe, str(days), str(emps), "4"],
            check=True, capture_output=True, timeout=60,
        )
        return float(out.stdout.strip())
    except Exception as e:  # noqa: BLE001
        log(f"scheduling baseline failed ({e}); using recorded "
            f"{SCHED_FALLBACK_BASELINE}")
        return SCHED_FALLBACK_BASELINE


def run_full_baseline(args: list[str], budgets: list[float], seed: int,
                      with_holidays: int = 1) -> dict | None:
    """Complete reference-algorithm C++ baseline (bench/baseline_full.cc):
    best score at each wall budget.  Round budget 0 = uncapped (the wall is
    the binding limit — strictly stronger than the reference CLI config).
    ``with_holidays`` (scheduling only): 1 = the synthetic (17e+11k)%D
    pattern shared with the TPU-side spec builder, 0 = no holidays."""
    exe = "/tmp/baseline_full"
    if not _build("baseline_full.cc", exe):
        return None
    budget_str = ",".join(str(b) for b in budgets)
    try:
        out = subprocess.run(
            [exe, *args, budget_str]
            + ([str(seed), str(with_holidays), "0"]
               if args[0] == "scheduling" else [str(seed), "0"]),
            check=True, capture_output=True, timeout=max(budgets) + 120,
        )
        return json.loads(out.stdout.strip())
    except Exception as e:  # noqa: BLE001
        log(f"full baseline {args} failed ({e})")
        return None


def lex_median_worst(runs: list[list[tuple]]) -> tuple[list, list]:
    """Per-budget lexicographic [median, worst] over fresh-state repeats
    (quality variance discipline: single-run scores carry ~1 soft point of
    noise at these walls — BENCH_NOTES.md round 4)."""
    med, worst = [], []
    for i in range(len(runs[0])):
        s = sorted(r[i] for r in runs)
        med.append(s[len(s) // 2])
        worst.append(s[-1])
    return med, worst


def baseline_quality(args: list[str], budgets: list[float],
                     seeds=(42, 43, 44),
                     with_holidays: int = 1) -> tuple[list, list] | None:
    runs = []
    for seed in seeds:
        r = run_full_baseline(args, budgets, seed, with_holidays)
        if r is None:
            return None
        runs.append(list(zip(r["best_hard"], r["best_soft"])))
    return lex_median_worst(runs)


def tpu_best_at_walls(make_solver, budgets: list[float], chunk: int) -> list:
    """Best score at each wall budget from the ON-DEVICE per-round best
    trace (VERDICT r4 directive 5): every chunk dispatch returns a
    [chunk, 3] (round, best-hard, best-soft) array appended by the device
    after each round; the host timestamps chunk boundaries and assigns
    each round a wall time by linear interpolation inside its chunk.
    Best-at-budget is then read off the per-round history — symmetric
    with the C++ baseline's continuous best-held probe, with no
    chunk-boundary lag and no altered exchange cadence (the round-4 fine
    probe dispatched 1-round chunks whose end-of-chunk exchange fired
    every round).  Interpolation error is bounded by one round's
    in-chunk timing jitter, vs up to a whole chunk of under-credit for
    the old boundary probe.  Assumes programs are already compiled
    (warm-up done by the caller)."""
    solver = make_solver()
    hist: list = []  # (est_wall_s, (hard, soft)) per round, monotone
    t_prev = 0.0
    t0 = time.time()
    while True:
        tr = solver.execute_chunk_traced(chunk)  # the read = the sync
        t_now = time.time() - t0
        for i in range(chunk):
            t_est = t_prev + (i + 1) / chunk * (t_now - t_prev)
            hist.append((t_est, (float(tr[i, 1]), float(tr[i, 2]))))
        t_prev = t_now
        if hist[-1][1] == (0.0, 0.0) or t_now >= budgets[-1]:
            break
    out = []
    for b in budgets:
        at = [s for t, s in hist if t <= b]
        # Solved-early runs stop dispatching: later budgets inherit the
        # final (un-regressable) best.  A first chunk outlasting the
        # smallest budget would leave no entries; credit the first round.
        out.append(at[-1] if at else hist[0][1])
    return out


def tpu_quality(make_solver, budgets: list[float], chunk: int,
                reps: int) -> tuple[list, list]:
    """>= reps fresh-state quality runs (per-rep seeds differ via
    make_solver(rep)); per-budget lexicographic [median, worst]."""
    runs = [tpu_best_at_walls(lambda: make_solver(rep), budgets, chunk)
            for rep in range(reps)]
    for rep, r in enumerate(runs):
        log(f"  tpu quality rep={rep}: {r}")
    return lex_median_worst(runs)


def main() -> None:
    baseline = measure_baseline()
    log(f"reference-style CPU baseline: {baseline:.0f} moves/s")

    import jax

    # BENCH_PLATFORM=cpu forces the CPU backend for harness smoke tests
    # (the env var JAX_PLATFORMS alone is ignored here — the axon
    # sitecustomize overrides the config; docs/DESIGN.md).
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

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
    solver.execute_chunk_traced(CHUNK)  # quality-probe program shape
    log(f"warm-up (compile) {time.time() - t0:.1f}s")

    # --- timed solves from fresh state, REPEATS times ---------------------
    # Throughput is measured over the productive portion of an actual solve
    # (converged trajectories gate their inner search off, so counted
    # iterations are real work); the same runs yield time-to-zero.  Median
    # + spread across fresh-state repeats (same process, same compiled
    # programs) separates real regressions from tunnel noise.
    runs = []
    for rep in range(max(1, REPEATS)):
        s = PopulationSolver(problem, config, population=POP, exchange_every=CHUNK)
        t0 = time.time()
        s.run(chunk=CHUNK)  # stops at hard == 0 via the convergence probe
        ttz = time.time() - t0
        (hard, _), _ = s.get_best_solution()
        iters = s.stats()["ls_iterations"]
        moves = iters * moves_per_ls_iter
        runs.append({"ttz": ttz, "tput": moves / ttz, "hard": hard})
        log(f"run {rep}: ttz={ttz:.2f}s best={hard} "
            f"throughput={moves / ttz:.3g} moves/s")
    runs.sort(key=lambda r: r["tput"])
    med = runs[len(runs) // 2]
    throughput, ttz, hard = med["tput"], med["ttz"], max(r["hard"] for r in runs)
    tputs = [r["tput"] for r in runs]
    ttzs = sorted(r["ttz"] for r in runs)
    log(f"median: ttz={ttz:.2f}s throughput={throughput:.3g} moves/s "
        f"(spread {min(tputs):.3g}..{max(tputs):.3g})")

    # --- quality-at-wall: nqueens-1000, both sides, 3 repeats each ---------
    nq_quality = {}
    base_nq = baseline_quality(["nqueens", str(N)], BUDGETS)
    if base_nq:
        base_med, base_worst = base_nq
        log(f"baseline nqueens best-at-wall median={base_med} worst={base_worst}")
        tpu_med, tpu_worst = tpu_quality(
            lambda rep: PopulationSolver(
                problem,
                dataclasses.replace(config, seed=f"bench{rep}"),
                population=POP, exchange_every=CHUNK,
            ),
            BUDGETS, CHUNK, REPEATS,
        )
        log(f"tpu nqueens best-at-wall median={tpu_med} worst={tpu_worst}")
        ok = all(t <= b for t, b in zip(tpu_med, base_med))
        nq_quality = {
            "quality_budgets_s": BUDGETS,
            "quality_repeats": REPEATS,
            "nqueens_baseline_best_at": [list(b) for b in base_med],
            "nqueens_baseline_best_at_worst": [list(b) for b in base_worst],
            "nqueens_tpu_best_at": [list(t) for t in tpu_med],
            "nqueens_tpu_best_at_worst": [list(t) for t in tpu_worst],
            "nqueens_quality_ok": ok,
        }

    # --- quality-at-wall where the baseline actually SOLVES: nqueens-128.
    # At n=1000 the baseline barely moves off a random start, so the n=1000
    # gate proves speed, not search quality; n=128 races both sides to a
    # solved board (the reference solves small boards reliably,
    # ref examples/nqueens/src/main.rs:152-201). ---------------------------
    try:
        n128 = 128
        p128 = make_nqueens_problem(n128, use_pallas=on_tpu)
        b128 = baseline_quality(["nqueens", str(n128)], BUDGETS)
        if b128:
            b128_med, b128_worst = b128
            w = PopulationSolver(p128, config, population=64,
                                 exchange_every=CHUNK)
            w.execute_chunk_traced(CHUNK)  # compile warm-up
            t128_med, t128_worst = tpu_quality(
                lambda rep: PopulationSolver(
                    p128, dataclasses.replace(config, seed=f"bench{rep}"),
                    population=64, exchange_every=CHUNK,
                ),
                BUDGETS, CHUNK, REPEATS,
            )
            ok128 = all(t <= b for t, b in zip(t128_med, b128_med))
            log(f"nqueens-128 baseline median={b128_med} tpu median={t128_med}")
            nq_quality.update({
                "nqueens128_baseline_best_at": [list(b) for b in b128_med],
                "nqueens128_tpu_best_at": [list(t) for t in t128_med],
                "nqueens128_quality_ok": ok128,
            })
    except Exception as e:  # noqa: BLE001
        log(f"nqueens-128 quality failed: {e}")

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

    # --- large boards via the ILS flagship path (not PMC): sampled-column
    # dense block at board sizes the reference's O(n^2)-rescore-per-move
    # loop cannot touch (~100 ms/move at n=4096).  Boards past the int32
    # key-packing bound (~13k) take the kernel's two-pass row-min path
    # (ops/nqueens_pallas.py); BENCH_NQ_XLA=1 forces the XLA neighborhood
    # for an A/B — VERDICT r4 directive 6. ---------------------------------
    nq4096 = {}
    for n_big in [int(v) for v in
                  os.environ.get("BENCH_NQ_BIG", "4096,8192,16384").split(",")]:
        try:
            p_big_pop = int(os.environ.get("BENCH_NQ_BIG_POP", 16))
            pallas_ok = on_tpu and not os.environ.get("BENCH_NQ_XLA")
            p_big = make_nqueens_problem(
                n_big, sample_cols=64, use_pallas=pallas_ok
            )
            cfg_big = dataclasses.replace(config, seed="bench-big")
            wb = PopulationSolver(p_big, cfg_big, population=p_big_pop,
                                  exchange_every=CHUNK)
            wb.run(max_rounds=CHUNK, chunk=CHUNK)  # compile warm-up
            sb = PopulationSolver(p_big, cfg_big, population=p_big_pop,
                                  exchange_every=CHUNK)
            t0 = time.time()
            sb.run(max_rounds=int(os.environ.get("BENCH_NQ_BIG_ROUNDS", 300)),
                   chunk=CHUNK)
            big_ttz = time.time() - t0
            (big_hard, _), _ = sb.get_best_solution()
            big_tput = sb.stats()["ls_iterations"] * p_big.width / big_ttz
            log(f"nqueens-{n_big} ILS (P={p_big_pop}, A=64, "
                f"{'pallas' if pallas_ok else 'xla'}): best={big_hard} "
                f"ttz={big_ttz:.1f}s {big_tput:.3g} moves/s")
            nq4096.update({
                f"nqueens{n_big}_ils_ttz_s": round(big_ttz, 2),
                f"nqueens{n_big}_ils_best_hard": big_hard,
                f"nqueens{n_big}_ils_moves_per_sec": round(big_tput),
            })
        except Exception as e:  # noqa: BLE001
            log(f"nqueens-{n_big} ILS failed: {e}")

    # --- employee-scheduling 365d x 20e (the second north-star domain,
    # BASELINE.json) — dense-block delta scoring: throughput vs the
    # reference-style C++ hot-loop baseline PLUS quality-at-wall vs the
    # complete reference algorithm. -----------------------------------------
    sched_extras = {}
    try:
        import datetime

        from constraint_solver_tpu.models.scheduling import (
            ScheduleSpec,
            make_scheduling_problem,
        )
        def make_sched_quality_solver(spec, seed, pop):
            """The measured quality-at-wall WINNER (round-4 sweep,
            bench/sched_quality_r4.py + BENCH_NOTES.md): a population of
            trajectories each running the REFERENCE-shaped engine — the
            W=100 random ChangeDay/SwapDays window (ref employee-scheduling
            lib.rs:422-491) with the reference CLI constants (ls_max 1000,
            bail 20) — with elite exchange every 2 rounds.  The dense
            argmin block is the throughput champion but diffuses poorly on
            the soft plateau; the random-window noisy descent crosses it,
            and the lockstep lanes run it at a multiple of the baseline's
            iteration rate — plus rank-based CULLING: each exchange, the
            worst 25% of lanes restart from their (post-exchange) archive
            best, concentrating lanes on the best basins.  Sweep medians
            (bench/sched_quality_r4c.py, P=128): culling reaches (0,7) by
            0.4-2.3 s and holds (0,7)/(0,7)/(0,7) across all three
            budgets — 2-4 soft points ahead of the baseline's
            (0,10-11)/(0,9)/(0,8) — where base is (0,8)/(0,8)/(0,7).
            Score integrity is independently verified (recorded best ==
            full rescore of the returned state).  P=128 is safe for THIS
            small program (the dense 365d program hangs the worker's
            compiler at P>=128 — BENCH_NOTES round 4)."""
            q_problem = make_scheduling_problem(
                spec, proposer="random", window_size=100
            )
            q_cfg = SolverConfig(
                seed=seed,
                local_search_max_iterations=1_000,
                best_solutions_capacity=16,
                all_solutions_capacity=256,
                all_solution_iteration_expiry=1_000,
                iterated_local_search_max_iterations=100_000,
                max_allow_no_improvement_for=20,
            )
            return PopulationSolver(q_problem, q_cfg, population=pop,
                                    exchange_every=2, cull_frac=0.25)

        s_days, s_emps, s_pop = 365, 20, int(os.environ.get("BENCH_SPOP", 64))
        # Quality-race population: the random-window program is ~40x
        # smaller than the dense block, so P=128 compiles and runs fine
        # (and wins bigger + rounds 2x faster than P=256 — BENCH_NOTES r4).
        q_pop = int(os.environ.get("BENCH_QPOP", 128))
        sched_baseline = measure_scheduling_baseline(s_days, s_emps)
        log(f"reference-style scheduling baseline: {sched_baseline:.0f} moves/s")

        def sched_spec(days, emps, holidays=True):
            """The bench instance family: employee e's 10 holidays fall on
            days (17e + 11k) % D — the SAME closed form
            bench/baseline_full.cc hard-codes for its with_holidays=1 mode,
            so both sides of every quality race score the identical
            instance."""
            d0 = datetime.date(2024, 1, 1)
            hols = {
                e: [d0 + datetime.timedelta(days=(17 * e + 11 * k) % days)
                    for k in range(10)] for e in range(emps)
            } if holidays else {}
            return ScheduleSpec.from_dates(
                d0, d0 + datetime.timedelta(days=days - 1), emps, hols
            )

        spec = sched_spec(s_days, s_emps)
        # n_rand_swaps=256 widens the unrestricted-swap section of the
        # dense block (close-pair swaps the >= 14-day diagonals cannot
        # express).  NOTE: this dense run is the THROUGHPUT measurement
        # only — the round-4 sweeps showed the quality-at-wall race is won
        # by the random-window population mode below, not by any dense
        # configuration (BENCH_NOTES.md round 4).
        sched_p = make_scheduling_problem(
            spec, proposer="dense",
            n_rand_swaps=int(os.environ.get("BENCH_RAND_SWAPS", 256)),
        )
        # Round-4 overhead decomposition (bench/sched_round_overhead.py +
        # sched_isolation.py): ls_max=50 trims the lockstep straggler tail
        # (bail=20 binds first, equal 40-round quality), chunk/exchange=4
        # halve the per-chunk probe RTT + exchange costs, ring=64 shrinks
        # the [W, T] tabu-filter matrix (the top engine-residual item) —
        # 1.04e8 -> 1.64e8 moves/s measured at equal 40-round best.
        sched_cfg = SolverConfig(
            seed="bench",
            local_search_max_iterations=50,
            best_solutions_capacity=16,
            all_solutions_capacity=64,
            all_solution_iteration_expiry=1_000,
            iterated_local_search_max_iterations=10_000,
            max_allow_no_improvement_for=20,
        )
        sp = PopulationSolver(sched_p, sched_cfg, population=s_pop,
                              exchange_every=4)
        sp.run(max_rounds=4, chunk=4)  # compile warm-up
        sp = PopulationSolver(sched_p, sched_cfg, population=s_pop,
                              exchange_every=4)
        t0 = time.time()
        sp.run(max_rounds=40, chunk=4)  # stops early at (hard, soft) == 0
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

        # --- quality-at-wall MATRIX over instance shapes (VERDICT r4
        # directive 1): the production quality mode (random-window
        # population + elite exchange + lex culling) must beat the
        # complete reference algorithm on instances it was never tuned
        # on — varying D, E, and holiday density.  Every instance races
        # 3 fresh-state repeats per side and gates on per-budget medians.
        instances = [
            i for i in os.environ.get(
                "BENCH_QUALITY_INSTANCES", "365x20,180x10,365x20nohol,730x40"
            ).split(",") if i
        ]
        matrix = {}
        all_ok = []
        for inst in instances:
            shape, hol = (inst[:-5], False) if inst.endswith("nohol") \
                else (inst, True)
            days, emps = (int(v) for v in shape.split("x"))
            base_q = baseline_quality(
                ["scheduling", str(days), str(emps)], BUDGETS,
                with_holidays=int(hol),
            )
            if not base_q:
                continue
            qb_med, qb_worst = base_q
            q_spec = spec if (days, emps, hol) == (365, 20, True) \
                else sched_spec(days, emps, hol)
            warm = make_sched_quality_solver(q_spec, "warm", q_pop)
            warm.execute_chunk_traced(2)  # compile warm-up
            qt_med, qt_worst = tpu_quality(
                lambda rep: make_sched_quality_solver(q_spec, f"bench{rep}",
                                                      q_pop),
                BUDGETS, 2, REPEATS,
            )
            ok = all(t <= b for t, b in zip(qt_med, qb_med))
            all_ok.append(ok)
            log(f"quality[{inst}] baseline={qb_med} tpu={qt_med} "
                f"gate={'WIN' if ok else 'LOSE'}")
            matrix[inst] = {
                "baseline_best_at": [list(b) for b in qb_med],
                "baseline_best_at_worst": [list(b) for b in qb_worst],
                "tpu_best_at": [list(t) for t in qt_med],
                "tpu_best_at_worst": [list(t) for t in qt_worst],
                "quality_ok": ok,
            }
            if inst == "365x20":
                # Headline keys, same names as rounds 3-4.
                sched_extras.update({
                    "scheduling365_baseline_best_at":
                        [list(b) for b in qb_med],
                    "scheduling365_baseline_best_at_worst":
                        [list(b) for b in qb_worst],
                    "scheduling365_tpu_best_at": [list(t) for t in qt_med],
                    "scheduling365_tpu_best_at_worst":
                        [list(t) for t in qt_worst],
                    "scheduling365_quality_ok": ok,
                })
        if matrix:
            sched_extras["scheduling_quality_matrix"] = matrix
            sched_extras["scheduling_quality_ok_all"] = all(all_ok)

        # --- optional long-wall arm (VERDICT r4 directive 8): one repeat
        # per side at BENCH_LONG_S seconds on 365x20, checking the
        # baseline never crosses late. ---------------------------------
        long_s = float(os.environ.get("BENCH_LONG_S", 0))
        if long_s > 0:
            lb = run_full_baseline(
                ["scheduling", str(s_days), str(s_emps)], [long_s], 42
            )
            warm = make_sched_quality_solver(spec, "warm-long", q_pop)
            warm.execute_chunk_traced(2)
            lt = tpu_best_at_walls(
                lambda: make_sched_quality_solver(spec, "bench-long", q_pop),
                [long_s], 2,
            )
            if lb:
                lb_score = [lb["best_hard"][0], lb["best_soft"][0]]
                log(f"long-wall {long_s}s: baseline={lb_score} tpu={lt[0]}")
                sched_extras["scheduling365_long_wall"] = {
                    "budget_s": long_s,
                    "baseline_best": lb_score,
                    "tpu_best": list(lt[0]),
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
                "value_min": round(min(tputs)),
                "value_max": round(max(tputs)),
                "repeats": len(runs),
                "ttz_median_s": round(ttz, 2),
                "ttz_min_s": round(ttzs[0], 2),
                "ttz_max_s": round(ttzs[-1], 2),
                **nq_quality,
                **nq4096,
                **sched_extras,
            }
        )
    )


if __name__ == "__main__":
    main()
