"""PhasedPopulationSolver: phase handoff correctness.

The phased solver's contract (parallel/phased.py): the IlsState pytree is
program-independent, so a phase schedule whose phases are all identical
must be TRAJECTORY-IDENTICAL to a plain PopulationSolver, phase boundaries
must be exact round counts, and checkpoint/resume must re-enter the correct
phase.  The reference has no analog (engine params are fixed per run,
reference local-search/src/iterated_local_search.rs:96-155); these tests
pin the divergence's safety, not reference parity.
"""

import datetime

import numpy as np
import pytest

from constraint_solver_tpu.core.ils import SolverConfig
from constraint_solver_tpu.models.scheduling import (
    ScheduleSpec,
    make_scheduling_problem,
)
from constraint_solver_tpu.parallel.phased import Phase, PhasedPopulationSolver
from constraint_solver_tpu.parallel.population import PopulationSolver


def _spec(days=21, emps=5):
    d0 = datetime.date(2024, 1, 1)
    return ScheduleSpec.from_dates(
        d0, d0 + datetime.timedelta(days=days - 1), emps,
        {e: [d0 + datetime.timedelta(days=(3 * e + k) % days)]
         for e in range(emps) for k in range(1)},
    )


def _cfg(ls=30, bail=5, rounds=12, seed="ph"):
    return SolverConfig(
        seed=seed,
        local_search_max_iterations=ls,
        best_solutions_capacity=8,
        all_solutions_capacity=64,
        all_solution_iteration_expiry=200,
        iterated_local_search_max_iterations=rounds,
        max_allow_no_improvement_for=bail,
    )


def test_identical_phases_match_plain_population():
    """Two phases with the SAME problem+config == plain PopulationSolver,
    bit-for-bit (same seed, same rounds; the handoff must be a no-op)."""
    spec = _spec()
    problem = make_scheduling_problem(spec, proposer="dense", n_rand_swaps=8)
    plain = PopulationSolver(problem, _cfg(), population=4, exchange_every=2)
    plain.run(chunk=2)
    phased = PhasedPopulationSolver(
        [Phase(problem, _cfg(), until_round=6), Phase(problem, _cfg())],
        population=4, exchange_every=2,
    )
    phased.run(chunk=2)
    assert plain.get_best_score() == phased.get_best_score()
    np.testing.assert_array_equal(
        np.asarray(plain.state.current_state), np.asarray(phased.state.current_state)
    )
    np.testing.assert_array_equal(
        np.asarray(jax_key_data(plain.state.key)),
        np.asarray(jax_key_data(phased.state.key)),
    )


def jax_key_data(k):
    import jax

    return jax.random.key_data(k)


def test_phase_switch_changes_program_at_exact_round():
    """Distinct phases: the run completes, the round counter hits the total,
    the final phase is active, and move accounting uses per-phase widths."""
    spec = _spec()
    pa = make_scheduling_problem(spec, proposer="dense", n_rand_swaps=4)
    pb = make_scheduling_problem(spec, proposer="dense", n_rand_swaps=16)
    assert pa.width != pb.width
    phased = PhasedPopulationSolver(
        [Phase(pa, _cfg(ls=20, rounds=12), until_round=4),
         Phase(pb, _cfg(ls=20, rounds=12))],
        population=4, exchange_every=2,
    )
    # Chunks larger than the phase remainder must clip at the boundary.
    phased.run(max_rounds=3, chunk=8)
    st = phased.stats()
    assert st["rounds"] == 3
    assert st["phase"] == 0
    phased.run(chunk=8)
    st = phased.stats()
    assert st["phase"] == 1
    assert (st["rounds"] == 12
            or phased.get_best_score() == (0.0, 0.0))
    # Moves: phase-0 iterations at width_a + phase-1 iterations at width_b.
    assert st["moves_evaluated"] <= st["ls_iterations"] * max(pa.width, pb.width)
    assert st["moves_evaluated"] >= st["ls_iterations"] * min(pa.width, pb.width)


def test_phased_checkpoint_resume_enters_correct_phase(tmp_path):
    """Mid-phase save -> fresh solver -> load resumes the same trajectory
    (same final best score as an uninterrupted run)."""
    spec = _spec()
    pa = make_scheduling_problem(spec, proposer="dense", n_rand_swaps=4)
    pb = make_scheduling_problem(spec, proposer="dense", n_rand_swaps=16)

    def build():
        return PhasedPopulationSolver(
            [Phase(pa, _cfg(ls=20, rounds=10, seed="ck"), until_round=4),
             Phase(pb, _cfg(ls=20, rounds=10, seed="ck"))],
            population=4, exchange_every=2,
        )

    full = build()
    full.run(chunk=2)
    want = full.get_best_score()
    want_moves = full.stats()["moves_evaluated"]

    part = build()
    part.run(max_rounds=6, chunk=2)
    ckpt = str(tmp_path / "phased_ck")
    part.save(ckpt)

    resumed = build()
    resumed.load(ckpt)
    assert resumed.stats()["phase"] == 1
    resumed.run(chunk=2)
    assert resumed.get_best_score() == want
    assert resumed.stats()["moves_evaluated"] == want_moves


def test_phase_validation():
    spec = _spec()
    p = make_scheduling_problem(spec, proposer="dense", n_rand_swaps=4)
    with pytest.raises(ValueError, match="at least one"):
        PhasedPopulationSolver([], population=2)
    bad_caps = SolverConfig(seed="x", best_solutions_capacity=4,
                            all_solutions_capacity=64,
                            all_solution_iteration_expiry=200)
    with pytest.raises(ValueError, match="capacities"):
        PhasedPopulationSolver(
            [Phase(p, _cfg(), until_round=4), Phase(p, bad_caps)],
            population=2,
        )
    with pytest.raises(ValueError, match="until_round"):
        PhasedPopulationSolver(
            [Phase(p, _cfg()), Phase(p, _cfg())], population=2
        )
    with pytest.raises(ValueError, match="increase"):
        PhasedPopulationSolver(
            [Phase(p, _cfg(), until_round=8), Phase(p, _cfg(), until_round=4),
             Phase(p, _cfg())],
            population=2,
        )


def test_execute_round_banks_moves_at_phase_boundary():
    """Driving the solver purely via execute_round() across a phase
    boundary must account moves exactly like run(chunk=1): completed-phase
    iterations priced at THAT phase's width (ADVICE r4, finding 4)."""
    spec = _spec()
    pa = make_scheduling_problem(spec, proposer="dense", n_rand_swaps=4)
    pb = make_scheduling_problem(spec, proposer="dense", n_rand_swaps=16)

    def make():
        return PhasedPopulationSolver(
            [Phase(pa, _cfg(ls=20, rounds=8), until_round=3),
             Phase(pb, _cfg(ls=20, rounds=8))],
            population=4, exchange_every=2,
        )

    stepped = make()
    for _ in range(6):
        stepped.execute_round()
    chunked = make()
    chunked.run(max_rounds=6, chunk=1)
    ss, sc = stepped.stats(), chunked.stats()
    assert ss["rounds"] == sc["rounds"] == 6
    assert ss["ls_iterations"] == sc["ls_iterations"]
    assert ss["moves_evaluated"] == sc["moves_evaluated"]
    # And the banked split really uses both widths (not all one width).
    assert ss["moves_evaluated"] != ss["ls_iterations"] * pa.width
    assert ss["moves_evaluated"] != ss["ls_iterations"] * pb.width
