"""Batched simplex megakernel gate (interpret mode on CPU; the real-TPU path
is exercised by bench.py).  Oracle: scipy-HiGHS per instance."""

import numpy as np
import pytest
import jax

from minilp_tpu.ops.kernels.batched_simplex import solve_batch_pallas
from minilp_tpu.parallel.batched import make_random_batch
from minilp_tpu.status import Status


@pytest.mark.parametrize("seed,B,m,nv", [(0, 8, 8, 16), (1, 4, 16, 24)])
def test_megakernel_matches_oracle(seed, B, m, nv):
    from scipy.optimize import linprog

    key = jax.random.PRNGKey(seed)
    A, b, c, lo, hi, _, _ = make_random_batch(key, B, m, nv)
    res = solve_batch_pallas(A, b, c, lo, hi, interpret=True)
    status = np.asarray(res.status)
    verified = np.asarray(res.verified)
    assert (status == int(Status.OPTIMAL)).all()
    assert verified.all()
    An, bn, cn, lon, hin = map(np.asarray, (A, b, c, lo, hi))
    for i in range(B):
        bounds = [
            (lon[i, j] if np.isfinite(lon[i, j]) else None,
             hin[i, j] if np.isfinite(hin[i, j]) else None)
            for j in range(cn.shape[1])
        ]
        r = linprog(cn[i], A_eq=An[i], b_eq=bn[i], bounds=bounds, method="highs")
        assert r.status == 0
        assert abs(float(res.obj[i]) - r.fun) <= 1e-9 * (1 + abs(r.fun)), i


def test_megakernel_agrees_with_xla_engine():
    from minilp_tpu.options import SolverOptions
    from minilp_tpu.parallel.batched import solve_batch

    key = jax.random.PRNGKey(7)
    args = make_random_batch(key, 6, 8, 12)
    A, b, c, lo, hi, vstat0, basis0 = args
    res = solve_batch_pallas(A, b, c, lo, hi, interpret=True)
    ref = solve_batch(*args, opts=SolverOptions())
    np.testing.assert_allclose(
        np.asarray(res.obj), np.asarray(ref.obj), rtol=1e-9, atol=1e-9
    )


def test_megakernel_envelope_64x256():
    # the full "m, n <= 256" envelope of BASELINE config 3
    from scipy.optimize import linprog

    key = jax.random.PRNGKey(5)
    A, b, c, lo, hi, _, _ = make_random_batch(key, 4, 64, 192)  # n = 256
    res = solve_batch_pallas(A, b, c, lo, hi, interpret=True, max_iter=4000)
    assert np.asarray(res.verified).all()
    An, bn, cn, lon, hin = map(np.asarray, (A, b, c, lo, hi))
    for i in range(4):
        bounds = [
            (lon[i, j] if np.isfinite(lon[i, j]) else None,
             hin[i, j] if np.isfinite(hin[i, j]) else None)
            for j in range(cn.shape[1])
        ]
        r = linprog(cn[i], A_eq=An[i], b_eq=bn[i], bounds=bounds, method="highs")
        assert abs(float(res.obj[i]) - r.fun) <= 1e-8 * (1 + abs(r.fun))
