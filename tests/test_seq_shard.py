"""Date-axis sharded schedule scoring == dense one-pass scorer.

The context-parallelism analog of SURVEY.md §5: windows 2/7/9/14 scored
with a 13-day halo exchange over a ``seq`` mesh axis must reproduce the
dense scorer exactly for every constraint."""

import datetime

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from constraint_solver_tpu.models.scheduling import (
    ScheduleSpec,
    make_scheduling_problem,
)
from constraint_solver_tpu.parallel.seq_shard import make_sharded_schedule_score


def _mesh(n):
    return jax.make_mesh(
        (n,), ("seq",),
        axis_types=(jax.sharding.AxisType.Auto,),
    )


@pytest.mark.parametrize("n_shards", [2, 8])
def test_sharded_score_matches_dense(n_shards):
    spec = ScheduleSpec.from_dates(
        datetime.date(2022, 5, 9),
        datetime.date(2022, 5, 9) + datetime.timedelta(days=364),
        num_employees=12,
        employee_holidays={0: [datetime.date(2022, 6, 1)],
                           3: [datetime.date(2022, 12, 25),
                               datetime.date(2022, 12, 26)]},
    )
    dense = make_scheduling_problem(spec).score
    sharded = make_sharded_schedule_score(spec, _mesh(n_shards))
    for seed in range(6):
        assign = jax.random.randint(
            jax.random.key(seed), (spec.num_days,), 0, 12, jnp.int32
        )
        want = np.asarray(dense(assign))
        got = np.asarray(sharded(assign))
        assert np.allclose(got, want, atol=1e-3), (seed, got, want)


def test_sharded_score_uneven_days():
    # D not divisible by shards: padding days must not contribute.
    spec = ScheduleSpec.from_dates(
        datetime.date(2022, 5, 9),
        datetime.date(2022, 5, 9) + datetime.timedelta(days=199),  # 200 days
        num_employees=7,
    )
    dense = make_scheduling_problem(spec).score
    sharded = make_sharded_schedule_score(spec, _mesh(8))
    for seed in range(4):
        assign = jax.random.randint(
            jax.random.key(seed), (spec.num_days,), 0, 7, jnp.int32
        )
        assert np.allclose(
            np.asarray(sharded(assign)), np.asarray(dense(assign)), atol=1e-3
        )


def test_too_small_shards_rejected():
    spec = ScheduleSpec.from_dates(
        datetime.date(2022, 5, 9), datetime.date(2022, 7, 9), 5
    )  # 62 days over 8 shards -> 8-day shards < 13-day halo
    with pytest.raises(ValueError, match="needs >= 13 days"):
        make_sharded_schedule_score(spec, _mesh(8))
