"""Pallas kernel equivalence tests (interpret mode on the CPU backend):
kernel output == naive full rescore (SURVEY.md §4 kernel-vs-reference)."""

import jax
import jax.numpy as jnp
import numpy as np

from constraint_solver_tpu.models.nqueens import (
    build_state,
    make_nqueens_problem,
    total_conflicts,
)
from constraint_solver_tpu.ops.nqueens_pallas import nqueens_neighborhood_scores


def test_kernel_matches_full_rescore():
    rng = np.random.default_rng(0)
    for n, a in ((16, 3), (32, 5)):
        rows = jnp.asarray(rng.integers(0, n, size=n), jnp.int32)
        st = build_state(rows)
        c = jnp.asarray(rng.choice(n, size=a, replace=False), jnp.int32)
        r = st.rows[c]
        d = r - c + (n - 1)
        aa = r + c
        removed = (st.rc[r] - 1) + (st.dc[d] - 1) + (st.ac[aa] - 1)
        cur = jnp.float32(int(total_conflicts(rows)))
        scores, row_min, row_arg = nqueens_neighborhood_scores(
            st.rows, st.rc, st.dc, st.ac, c, r, removed, cur, interpret=True
        )
        assert scores.shape == (a, n)
        for j in range(a):
            for rp in range(n):
                applied = rows.at[int(c[j])].set(rp)
                assert float(scores[j, rp]) == int(total_conflicts(applied)), (
                    f"n={n} col {int(c[j])} row {rp}"
                )
        # Row min/argmin byproducts: exact, first-index tie-break.
        np.testing.assert_array_equal(
            np.asarray(row_min), np.asarray(scores).min(axis=1)
        )
        np.testing.assert_array_equal(
            np.asarray(row_arg), np.asarray(scores).argmin(axis=1)
        )


def test_problem_with_pallas_neighborhood_matches_xla():
    n = 24
    p_xla = make_nqueens_problem(n)
    p_pls = make_nqueens_problem(n, use_pallas="interpret")
    rows = jnp.asarray(
        np.random.default_rng(1).integers(0, n, size=n), jnp.int32
    )
    st = build_state(rows)
    cur = p_xla.score(st)
    nb_x = p_xla.neighborhood(st, cur, jax.random.key(5))
    nb_p = p_pls.neighborhood(st, cur, jax.random.key(5))
    np.testing.assert_array_equal(np.asarray(nb_x.scores), np.asarray(nb_p.scores))
    np.testing.assert_array_equal(np.asarray(nb_x.valid), np.asarray(nb_p.valid))
    for mx, mp in zip(nb_x.moves, nb_p.moves):
        np.testing.assert_array_equal(np.asarray(mx), np.asarray(mp))
    # hint_idx must be the exact flat lex_argmin (same on both paths).
    from constraint_solver_tpu.ops.lex import lex_argmin

    want = int(lex_argmin(nb_x.scores, nb_x.valid))
    assert int(nb_x.hint_idx) == want
    assert int(nb_p.hint_idx) == want


def test_hint_matches_argmin_over_random_states():
    n = 20
    p = make_nqueens_problem(n)
    from constraint_solver_tpu.ops.lex import lex_argmin

    rng = np.random.default_rng(7)
    for trial in range(20):
        rows = jnp.asarray(rng.integers(0, n, size=n), jnp.int32)
        st = build_state(rows)
        nb = p.neighborhood(st, p.score(st), jax.random.key(trial))
        if not bool(nb.valid.any()):
            continue
        assert int(nb.hint_idx) == int(lex_argmin(nb.scores, nb.valid)), trial


def test_kernel_two_pass_row_min_past_packing_bound():
    """n past the int32 key-packing bound (~13k) takes the two-pass
    row-min path (ops/nqueens_pallas.py phase 2); min/argmin must stay
    exact with first-index tie-break, same as the packed path.  Spot
    checks a handful of candidate scores against full rescores (the O(n)
    interpret-mode full sweep is too slow at this size)."""
    rng = np.random.default_rng(7)
    n, a = 14000, 3
    assert 12 * n * ((((n + 127) // 128) * 128) + 1) >= 2**31 - 1
    rows = jnp.asarray(rng.integers(0, n, size=n), jnp.int32)
    st = build_state(rows)
    c = jnp.asarray(rng.choice(n, size=a, replace=False), jnp.int32)
    r = st.rows[c]
    d = r - c + (n - 1)
    aa = r + c
    removed = (st.rc[r] - 1) + (st.dc[d] - 1) + (st.ac[aa] - 1)
    cur = jnp.float32(int(total_conflicts(rows)))
    scores, row_min, row_arg = nqueens_neighborhood_scores(
        st.rows, st.rc, st.dc, st.ac, c, r, removed, cur, interpret=True
    )
    s = np.asarray(scores)
    np.testing.assert_array_equal(np.asarray(row_min), s.min(axis=1))
    np.testing.assert_array_equal(np.asarray(row_arg), s.argmin(axis=1))
    for j in range(a):
        for rp in (0, int(row_arg[j]), n // 2, n - 1):
            applied = rows.at[int(c[j])].set(rp)
            assert float(s[j, rp]) == int(total_conflicts(applied))
