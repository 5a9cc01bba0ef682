"""QAP domain tests: MXU all-pairs swap deltas vs naive rescoring, engine
integration, brute-force optimality on a tiny instance."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from constraint_solver_tpu.core.ils import Solver, SolverConfig
from constraint_solver_tpu.models.qap import (
    QAPSpec,
    make_qap_problem,
    qap_cost_naive,
)


def test_score_matches_naive():
    spec = QAPSpec.random(12, seed=1)
    flow, dist = spec.arrays()
    problem = make_qap_problem(spec)
    rng = np.random.default_rng(2)
    for _ in range(5):
        p = rng.permutation(12)
        got = float(np.asarray(problem.score(jnp.asarray(p, jnp.int32)))[0])
        assert got == qap_cost_naive(flow, dist, p)


def test_all_pairs_swap_deltas_match_full_rescore():
    spec = QAPSpec.random(10, seed=3)
    flow, dist = spec.arrays()
    problem = make_qap_problem(spec)
    rng = np.random.default_rng(4)
    p = rng.permutation(10)
    pj = jnp.asarray(p, jnp.int32)
    nb = problem.neighborhood(pj, problem.score(pj), jax.random.key(0))
    scores = np.asarray(nb.scores)[:, 0]
    a_idx, b_idx = np.asarray(nb.moves[0]), np.asarray(nb.moves[1])
    valid = np.asarray(nb.valid)
    assert valid.sum() == 10 * 9 // 2
    for i in np.flatnonzero(valid):
        q = p.copy()
        q[a_idx[i]], q[b_idx[i]] = q[b_idx[i]], q[a_idx[i]]
        assert scores[i] == qap_cost_naive(flow, dist, q), (
            f"swap ({a_idx[i]}, {b_idx[i]})"
        )


def test_move_fp_and_apply():
    spec = QAPSpec.random(8, seed=5)
    problem = make_qap_problem(spec)
    p = jnp.asarray(np.random.default_rng(6).permutation(8), jnp.int32)
    nb = problem.neighborhood(p, problem.score(p), jax.random.key(0))
    fp0 = problem.fingerprint(p)
    for i in np.flatnonzero(np.asarray(nb.valid))[::7]:
        applied = problem.apply_move(p, nb.moves, int(i))
        assert sorted(np.asarray(applied).tolist()) == list(range(8))
        np.testing.assert_array_equal(
            np.asarray(problem.fingerprint(applied)),
            np.asarray(problem.move_fp(p, fp0, nb.moves, int(i))),
        )


def test_perturb_preserves_permutation():
    spec = QAPSpec.random(16, seed=7)
    problem = make_qap_problem(spec)
    p = jnp.asarray(np.random.default_rng(8).permutation(16), jnp.int32)
    for s in range(8):
        q = problem.perturb(p, jnp.asarray(s % 2 == 0), jax.random.key(s))
        assert sorted(np.asarray(q).tolist()) == list(range(16))


def test_ils_finds_brute_force_optimum_n7():
    spec = QAPSpec.random(7, seed=9)
    flow, dist = spec.arrays()
    best = min(
        qap_cost_naive(flow, dist, np.asarray(perm))
        for perm in itertools.permutations(range(7))
    )
    problem = make_qap_problem(spec)
    solver = Solver(
        problem,
        SolverConfig(
            seed="q",
            local_search_max_iterations=200,
            best_solutions_capacity=8,
            all_solutions_capacity=64,
            all_solution_iteration_expiry=200,
            iterated_local_search_max_iterations=60,
            max_allow_no_improvement_for=5,
        ),
    )
    solver.run(chunk=20)
    (cost, _), p = solver.get_best_solution()
    assert cost == best, f"ILS found {cost}, brute force optimum {best}"
    assert sorted(p.tolist()) == list(range(7))


def test_cli_smoke(capsys):
    from constraint_solver_tpu.cli import qap as cli

    rc = cli.main(["--platform", "cpu", "--size", "12", "--rounds", "10",
                   "--quiet"])
    out = capsys.readouterr().out
    assert rc == 0 and "result.cost" in out
