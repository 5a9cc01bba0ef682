"""Golden-value tests for the Ackley function.

Constants derived from the SFU MATLAB reference via Octave, as recorded in
the reference (math-util/src/ackley.rs:44-53 and tests :54-102).
"""

import numpy as np

from constraint_solver_tpu.models.ackley import ackley, ackley_np

GOLDEN_20D = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0] * 2


def test_ackley_zero():
    assert abs(ackley_np(np.array([0.0, 0.0]))) < 1e-12


def test_ackley_2d_golden():
    assert abs(ackley_np(np.array([1.0, 1.0])) - 3.625384938440363) < 1e-12


def test_ackley_20d_golden():
    assert abs(ackley_np(np.array(GOLDEN_20D)) - 13.12408690638194) < 1e-12


def test_device_ackley_matches_host():
    rng = np.random.default_rng(0)
    for d in (2, 10, 20):
        xs = rng.uniform(-32.768, 32.768, size=(16, d)).astype(np.float32)
        host = np.array([ackley_np(x) for x in xs])
        dev = np.asarray(ackley(xs))
        np.testing.assert_allclose(dev, host, rtol=2e-5, atol=2e-5)
