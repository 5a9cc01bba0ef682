"""Employee-scheduling domain: 4 hard + 4 soft constraints, dense scoring.

Reference semantics (reference examples/employee-scheduling/src/lib.rs):

- solution: one employee per day, ``assign[day] = employee`` (ref lib.rs:129-146;
  identity/hash derive only from the assignment vector);
- score: lexicographic ``(hard, soft)`` float pair (ref lib.rs:239-249);
- constraints (ref ScheduleSolutionScoreCalculator, lib.rs:265-374):
  - H1 employee works own holiday: +1 each (ref :272-280)
  - H2 same employee two consecutive days: +1 per adjacent pair (ref :285-292)
  - H3 consecutive weekends: windows(9) starting on a weekend pair compare
    positions {0,1} x {7,8}: +1 per equal pair (ref :294-315)
  - H4 > 3 shifts in any 14-day window: +1 per (window, employee) (ref :317-327)
  - S1 > 2 shifts in any 7-day window: +1 per (window, employee) (ref :329-339)
  - S2 weekday-consistency: per weekday Mon-Fri with >1 distinct employee,
    add the minimum per-employee count among employees appearing on that
    weekday (ref get_weekday_to_employee_counts_score, :194-218)
  - S3 max-min spread of total days over employees with >= 1 day (ref :344-351)
  - S4 max-min spread of weekend days over employees with >= 1 day (ref :353-365)
- neighborhood: an *infinite random* move stream, weights
  {ChangeDay: 1, SwapDays: 4}, truncated by the engine window (ref
  ScheduleRandomMoveProposer, lib.rs:428-491 + window take at
  local_search.rs:321) — here a fixed batch of W random moves;
- perturbation: {ChangeDaysSubsetRandomly: 100, DoNothing: 10}, altering
  ``U[1, D/20]`` days near elites else ``U[1, D/2]`` (ref lib.rs:567-613).

All eight constraints are one fused tensor pass: one-hot day x employee
matrix, prefix-sum window counters for the 7/14-day windows, shifted
comparisons for adjacency/weekend patterns — no per-window HashMap counting
(ref lib.rs:317-339) anywhere.

Divergence note: the reference's initial generator materializes one phantom
extra day past ``end_date`` (ref lib.rs:404-419 pushes then breaks) which is
never scored and only perturbs tabu identity; we use exactly D days.
"""

from __future__ import annotations

from functools import lru_cache

import dataclasses
import datetime

import jax
import jax.numpy as jnp
import numpy as np

from constraint_solver_tpu.core.problem import Neighborhood, Problem
from constraint_solver_tpu.ops.fingerprint import fingerprint_i32
from constraint_solver_tpu.ops.lex import make_score


@dataclasses.dataclass(frozen=True)
class ScheduleSpec:
    """Static problem data: day count, employee count, calendar layout, and
    a dense employee x day holiday mask (the reference's
    ``employee_to_holidays`` map, ref lib.rs:251-259)."""

    num_days: int
    num_employees: int
    start_weekday: int  # 0 = Monday (chrono Weekday::Mon == date.weekday())
    holiday_mask: tuple = ()  # hashable; use holiday_array() for the ndarray

    @staticmethod
    def from_dates(
        start_date: datetime.date,
        end_date: datetime.date,
        num_employees: int,
        employee_holidays: dict[int, list[datetime.date]] | None = None,
    ) -> "ScheduleSpec":
        num_days = (end_date - start_date).days + 1
        mask = np.zeros((num_employees, num_days), bool)
        for emp, days in (employee_holidays or {}).items():
            for day in days:
                idx = (day - start_date).days
                if 0 <= idx < num_days:
                    mask[emp, idx] = True
        return ScheduleSpec(
            num_days=num_days,
            num_employees=num_employees,
            start_weekday=start_date.weekday(),
            holiday_mask=tuple(map(tuple, mask.tolist())),
        )

    def holiday_array(self) -> np.ndarray:
        if not self.holiday_mask:
            return np.zeros((self.num_employees, self.num_days), bool)
        return np.asarray(self.holiday_mask, bool)

    def weekdays(self) -> np.ndarray:
        return (self.start_weekday + np.arange(self.num_days)) % 7

    def is_weekend(self) -> np.ndarray:
        return self.weekdays() >= 5  # Sat=5, Sun=6


@lru_cache(maxsize=32)
def make_scheduling_problem(
    spec: ScheduleSpec, window_size: int = 100, proposer: str = "random"
) -> Problem:
    """``proposer``:

    - "random": the reference's used proposer — an infinite random
      ChangeDay/SwapDays stream truncated to ``window_size``
      (ref ScheduleRandomMoveProposer, lib.rs:428-491);
    - "systematic": the reference's deterministic rotate-each-day-through-
      all-successor-employees neighborhood (ref ScheduleMoveProposer,
      lib.rs:493-559 — constructed but commented out at lib.rs:59-60);
      employees are ordered by id, successor = (e + 1) mod E, yielding
      D x (E-1) candidates.
    """
    d_days = spec.num_days
    n_emp = spec.num_employees
    w_size = window_size
    holiday = jnp.asarray(spec.holiday_array())          # bool[E, D]
    weekend = jnp.asarray(spec.is_weekend())             # bool[D]
    weekday = jnp.asarray(spec.weekdays(), jnp.int32)    # int32[D]
    # weekday one-hot for Mon..Fri rows: [5, D]
    wd_onehot = jnp.asarray(
        (spec.weekdays()[None, :] == np.arange(5)[:, None]), jnp.float32
    )
    del weekday

    def score(assign: jax.Array) -> jax.Array:
        f32 = jnp.float32
        oh = jax.nn.one_hot(assign, n_emp, dtype=f32)  # [D, E]

        # H1 — holidays (ref :272-280); one-hot contraction, not a gather.
        h1 = jnp.sum(oh * holiday.T.astype(f32))

        # H2 — consecutive days (ref :285-292).
        h2 = jnp.sum(assign[:-1] == assign[1:]) if d_days >= 2 else 0

        # H3 — consecutive weekends, windows(9) (ref :294-315).
        if d_days >= 9:
            a = assign
            cond = weekend[: d_days - 8] & weekend[1 : d_days - 7]
            e17 = a[: d_days - 8] == a[7 : d_days - 1]
            e18 = a[: d_days - 8] == a[8:d_days]
            e27 = a[1 : d_days - 7] == a[7 : d_days - 1]
            e28 = a[1 : d_days - 7] == a[8:d_days]
            h3 = jnp.sum(
                jnp.where(cond, e17.astype(f32) + e18 + e27 + e28, 0.0)
            )
        else:
            h3 = 0.0

        # Prefix sums for windowed counts (H4/S1): C[i] = counts in days [0, i).
        csum = jnp.concatenate(
            [jnp.zeros((1, n_emp), f32), jnp.cumsum(oh, axis=0)], axis=0
        )  # [D+1, E]

        # H4 — > 3 shifts per 14-day window (ref :317-327).
        if d_days >= 14:
            win14 = csum[14:] - csum[:-14]  # [D-13, E]
            h4 = jnp.sum(win14 > 3)
        else:
            h4 = 0

        # S1 — > 2 shifts per 7-day window (ref :329-339).
        if d_days >= 7:
            win7 = csum[7:] - csum[:-7]
            s1 = jnp.sum(win7 > 2)
        else:
            s1 = 0

        # S2 — weekday consistency Mon-Fri (ref :194-218, :341-342).
        wd_counts = wd_onehot @ oh  # [5, E]
        wd_present = wd_counts > 0
        n_present = jnp.sum(wd_present, axis=1)  # [5]
        min_present = jnp.min(
            jnp.where(wd_present, wd_counts, jnp.inf), axis=1
        )
        s2 = jnp.sum(jnp.where(n_present > 1, min_present, 0.0))

        # S3/S4 — max-min spreads over employees with >= 1 total day
        # (ref :344-365; the min/max iterate the employees_to_days map keys).
        tot = jnp.sum(oh, axis=0)  # [E]
        present = tot > 0
        n_pres = jnp.sum(present)
        spread = lambda v: jnp.where(
            n_pres >= 2,
            jnp.max(jnp.where(present, v, -jnp.inf))
            - jnp.min(jnp.where(present, v, jnp.inf)),
            0.0,
        )
        s3 = spread(tot)
        wk = jnp.sum(oh * weekend[:, None], axis=0)
        s4 = spread(wk)

        hard = h1 + h2 + h3 + h4
        soft = s1 + s2 + s3 + s4
        return make_score(hard.astype(f32), soft.astype(f32))

    def init(key):
        # Uniform random employee per day (ref :404-419).
        return jax.random.randint(key, (d_days,), 0, n_emp, jnp.int32)

    def is_best(s):
        return (s[0] == 0) & (s[1] == 0)

    def fingerprint(assign):
        return fingerprint_i32(assign)

    def neighborhood_systematic(assign, _cur_score, _key):
        # Every day rotated through its E-1 successor employees.
        offs = jnp.arange(1, n_emp, dtype=jnp.int32)  # [E-1]
        day_idx = jnp.arange(d_days, dtype=jnp.int32)  # [D]
        new_vals = (assign[:, None] + offs[None, :]) % n_emp  # [D, E-1]
        day_onehot = day_idx[:, None, None] == day_idx[None, None, :]  # [D,1,D]
        cands = jnp.where(
            day_onehot, new_vals[:, :, None], assign[None, None, :]
        )  # [D, E-1, D]
        cands = cands.reshape(-1, d_days)
        scores = jax.vmap(score)(cands)
        valid = jnp.ones((cands.shape[0],), bool)
        return Neighborhood(scores=scores, moves=cands, valid=valid)

    def neighborhood(assign, _cur_score, key):
        k_type, k_d1, k_off, k_emp = jax.random.split(key, 4)
        # Move types ~ {ChangeDay: 1, SwapDays: 4} (ref lib.rs:435).
        is_swap = jax.random.uniform(k_type, (w_size,)) < 0.8
        d1 = jax.random.randint(k_d1, (w_size,), 0, d_days, jnp.int32)
        # Second swap day: d1 + U[1, D) mod D => uniform over distinct pairs
        # (ref choose_multiple(2), lib.rs:472-477).
        off = jax.random.randint(k_off, (w_size,), 1, d_days, jnp.int32)
        d2 = (d1 + off) % d_days
        new_emp = jax.random.randint(k_emp, (w_size,), 0, n_emp, jnp.int32)

        # Scatter/gather-free candidate materialization: [W, D] via masks.
        iota = jnp.arange(d_days, dtype=jnp.int32)[None, :]
        at_d1 = iota == d1[:, None]
        at_d2 = iota == d2[:, None]
        a1 = jnp.sum(jnp.where(at_d1, assign[None, :], 0), axis=1, keepdims=True)
        a2 = jnp.sum(jnp.where(at_d2, assign[None, :], 0), axis=1, keepdims=True)
        chg = jnp.where(at_d1, new_emp[:, None], assign[None, :])
        swp = jnp.where(at_d1, a2, jnp.where(at_d2, a1, assign[None, :]))
        cands = jnp.where(is_swap[:, None], swp, chg)  # [W, D]
        scores = jax.vmap(score)(cands)                    # [W, 2]
        valid = jnp.ones((w_size,), bool)
        return Neighborhood(scores=scores, moves=cands, valid=valid)

    def move_fp(_assign, _cur_fp, moves, idx):
        return fingerprint_i32(moves[idx])

    def apply_move(assign, moves, idx):
        return moves[idx]

    def perturb(assign, is_elite, key):
        # {ChangeDaysSubsetRandomly: 100, DoNothing: 10} (ref :572-579);
        # k ~ U[1, D/20] near elites else U[1, D/2] (ref :600-603).
        k_strat, k_n, k_u, k_emp = jax.random.split(key, 4)
        do_change = jax.random.uniform(k_strat) < (100.0 / 110.0)
        hi = jnp.where(is_elite, max(1, d_days // 20), max(1, d_days // 2))
        n_alter = jax.random.randint(k_n, (), 1, hi + 1)
        u = jax.random.uniform(k_u, (d_days,))
        kth = jax.lax.dynamic_index_in_dim(jnp.sort(u), n_alter - 1, keepdims=False)
        alter = u <= kth
        new_emp = jax.random.randint(k_emp, (d_days,), 0, n_emp, jnp.int32)
        return jnp.where(do_change & alter, new_emp, assign)

    return Problem(
        name=f"scheduling-{d_days}d-{n_emp}e",
        init=init,
        score=score,
        is_best=is_best,
        fingerprint=fingerprint,
        neighborhood=(
            neighborhood if proposer == "random" else neighborhood_systematic
        ),
        move_fp=move_fp,
        apply_move=apply_move,
        perturb=perturb,
        width=(w_size if proposer == "random" else d_days * (n_emp - 1)),
    )
