"""Employee-scheduling scorer tests.

An independent, date-based Python oracle transcribes the reference's
8-constraint semantics (examples/employee-scheduling/src/lib.rs:265-374,
weekday-consistency :194-218), and the dense jnp scorer is property-tested
against it over random assignments, calendars, and holiday sets.
"""

import datetime
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np

from constraint_solver_tpu.models.scheduling import (
    ScheduleSpec,
    make_scheduling_problem,
)


def oracle_score(start_date, assign, holidays_by_emp):
    """(hard, soft) per the reference scorer, built from dates like the
    original (kept deliberately different in structure from the jnp path)."""
    days = [start_date + datetime.timedelta(days=i) for i in range(len(assign))]
    is_weekend = [d.weekday() >= 5 for d in days]
    hard = 0.0
    soft = 0.0

    # H1 holidays
    for emp, hols in holidays_by_emp.items():
        for hol in hols:
            idx = (hol - start_date).days
            if 0 <= idx < len(assign) and assign[idx] == emp:
                hard += 1

    # H2 consecutive days
    for i in range(len(assign) - 1):
        if assign[i] == assign[i + 1]:
            hard += 1

    # H3 consecutive weekends (windows of 9)
    for i in range(len(assign) - 8):
        if not (is_weekend[i] and is_weekend[i + 1]):
            continue
        for a in (i, i + 1):
            for b in (i + 7, i + 8):
                if assign[a] == assign[b]:
                    hard += 1

    # H4 > 3 per 14-day window
    for i in range(len(assign) - 13):
        counts = Counter(assign[i : i + 14])
        hard += sum(1 for c in counts.values() if c > 3)

    # S1 > 2 per 7-day window
    for i in range(len(assign) - 6):
        counts = Counter(assign[i : i + 7])
        soft += sum(1 for c in counts.values() if c > 2)

    # S2 weekday consistency (Mon-Fri)
    day_counts = {}
    for d, emp in zip(days, assign):
        if d.weekday() >= 5:
            continue
        day_counts.setdefault(d.weekday(), Counter())[emp] += 1
    for counts in day_counts.values():
        if len(counts) > 1:
            soft += min(counts.values())

    # S3/S4 spreads over employees with >= 1 day
    emp_days = {}
    for d, emp in zip(days, assign):
        emp_days.setdefault(emp, []).append(d)
    if len(emp_days) >= 2:
        totals = [len(v) for v in emp_days.values()]
        soft += max(totals) - min(totals)
        weekends = [sum(1 for d in v if d.weekday() >= 5) for v in emp_days.values()]
        soft += max(weekends) - min(weekends)

    return hard, soft


def _random_case(rng, num_days, num_emp, with_holidays):
    start = datetime.date(2022, 5, 1) + datetime.timedelta(days=int(rng.integers(0, 14)))
    holidays = {}
    if with_holidays:
        for emp in range(num_emp):
            n_h = int(rng.integers(0, 3))
            holidays[emp] = [
                start + datetime.timedelta(days=int(rng.integers(0, num_days)))
                for _ in range(n_h)
            ]
    spec = ScheduleSpec.from_dates(
        start, start + datetime.timedelta(days=num_days - 1), num_emp, holidays
    )
    assign = rng.integers(0, num_emp, size=num_days)
    return start, spec, assign, holidays


def test_score_matches_oracle():
    rng = np.random.default_rng(9)
    for num_days, num_emp in [(31, 7), (14, 3), (9, 2), (60, 5), (7, 4)]:
        for with_holidays in (False, True):
            for _ in range(3):
                start, spec, assign, holidays = _random_case(
                    rng, num_days, num_emp, with_holidays
                )
                problem = make_scheduling_problem(spec)
                got = np.asarray(problem.score(jnp.asarray(assign, jnp.int32)))
                want = oracle_score(start, list(assign), holidays)
                assert got[0] == want[0], f"hard mismatch: {got[0]} != {want[0]}"
                assert got[1] == want[1], f"soft mismatch: {got[1]} != {want[1]}"


def test_reference_cli_instance_shape():
    """The reference CLI instance: 7 employees, 2022-05-09 + 30 days
    (examples/employee-scheduling/src/main.rs:11-21)."""
    start = datetime.date(2022, 5, 9)
    spec = ScheduleSpec.from_dates(start, start + datetime.timedelta(days=30), 7)
    assert spec.num_days == 31
    assert spec.start_weekday == 0  # Monday
    problem = make_scheduling_problem(spec)
    assign = jnp.zeros((31,), jnp.int32)  # employee 0 every day
    hard, soft = np.asarray(problem.score(assign))
    want = oracle_score(start, [0] * 31, {})
    assert (hard, soft) == want
    assert hard > 0  # 30 consecutive-day violations at minimum


def test_neighborhood_scores_match_oracle():
    rng = np.random.default_rng(10)
    start = datetime.date(2022, 5, 9)
    spec = ScheduleSpec.from_dates(start, start + datetime.timedelta(days=30), 7)
    problem = make_scheduling_problem(spec, window_size=16)
    assign = jnp.asarray(rng.integers(0, 7, size=31), jnp.int32)
    nb = problem.neighborhood(assign, problem.score(assign), jax.random.key(2))
    for i in range(16):
        # Moves are compact (is_swap, d1, d2, new_emp) tuples; materialize
        # candidate i via apply_move, then oracle-check its delta score.
        cand_state = problem.apply_move(assign, nb.moves, jnp.int32(i))
        cand = list(np.asarray(cand_state))
        want = oracle_score(start, cand, {})
        got = np.asarray(nb.scores[i])
        assert (got[0], got[1]) == want
        # Moves must be ChangeDay (1 day differs) or SwapDays (2 days swap).
        diff = np.flatnonzero(np.asarray(cand_state) != np.asarray(assign))
        assert len(diff) <= 2
