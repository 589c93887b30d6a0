"""Netlib-scale validation (25fv47-like dimensions) — slow, CPU.

Run explicitly with:  pytest tests/test_large.py -m slow --run-slow
(kept out of the default gate; the driver's bench covers scale on TPU).
"""

import numpy as np
import pytest

from .oracle import random_problem, solve_with_oracle

pytestmark = pytest.mark.slow


@pytest.mark.skipif("not config.getoption('--run-slow', default=False)")
def test_800x1500_sparse_boxed():
    rng = np.random.default_rng(777)
    prob = random_problem(
        rng, nv=1500, m=800, density=0.01,
        frac_free=0.0, frac_boxed=1.0, frac_fixed=0.0,
    )
    outcome, obj, _ = solve_with_oracle(prob)
    assert outcome == "optimal"
    sol = prob.solve()
    assert abs(sol.objective() - obj) <= 1e-6 * (1 + abs(obj))
