"""Pack-k megakernel gate (interpret mode on CPU): parity with the one-LP
megakernel and the scipy-HiGHS oracle, plus the canonical layout."""

import numpy as np
import pytest
import jax

from minilp_tpu.ops.kernels.packed_simplex import solve_batch_packed
from minilp_tpu.parallel.batched import make_random_batch
from minilp_tpu.status import Status


@pytest.mark.parametrize("seed,B,m,nv,pack", [(0, 8, 8, 16, 4), (1, 8, 16, 24, 8)])
def test_packed_matches_oracle(seed, B, m, nv, pack):
    from scipy.optimize import linprog

    key = jax.random.PRNGKey(seed)
    A, b, c, lo, hi, _, _ = make_random_batch(key, B, m, nv)
    res = solve_batch_packed(A, b, c, lo, hi, pack=pack, interpret=True)
    status = np.asarray(res.status)
    assert (status == int(Status.OPTIMAL)).all(), status
    assert np.asarray(res.verified).all()
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


def test_packed_agrees_with_unpacked():
    from minilp_tpu.ops.kernels.batched_simplex import solve_batch_pallas

    key = jax.random.PRNGKey(3)
    A, b, c, lo, hi, _, _ = make_random_batch(key, 8, 8, 12)
    packed = solve_batch_packed(A, b, c, lo, hi, pack=4, interpret=True)
    ref = solve_batch_pallas(A, b, c, lo, hi, interpret=True)
    np.testing.assert_allclose(
        np.asarray(packed.obj), np.asarray(ref.obj), rtol=1e-9, atol=1e-9
    )


def test_pipelined_batches():
    """solve_batches_pipelined: host-resident data, overlap-friendly loop,
    all lanes certified, objectives match the oracle."""
    from scipy.optimize import linprog

    from minilp_tpu.parallel.batched import (
        make_random_batch_host, solve_batches_pipelined,
    )

    batches = [make_random_batch_host(100 + k, batch=8, m=8, nv=16)
               for k in range(3)]
    results = solve_batches_pipelined(batches, pack=4, max_iter=2000)
    assert len(results) == 3
    # structural-upload variant (identity slack assembled on device) must
    # produce identical certified objectives
    results_s = solve_batches_pipelined(
        batches, pack=4, max_iter=2000, structural_cols=16
    )
    for r, rs in zip(results, results_s):
        np.testing.assert_allclose(
            np.asarray(r.obj), np.asarray(rs.obj), rtol=1e-12, atol=1e-12
        )
    for (A, b, c, lo, hi), res in zip(batches, results):
        assert np.asarray(res.verified).all()
        for i in range(2):  # spot-check two lanes per batch
            bounds = [
                (lo[i, j] if np.isfinite(lo[i, j]) else None,
                 hi[i, j] if np.isfinite(hi[i, j]) else None)
                for j in range(c.shape[1])
            ]
            r = linprog(c[i], A_eq=A[i], b_eq=b[i], bounds=bounds, method="highs")
            assert r.status == 0
            assert abs(float(res.obj[i]) - r.fun) <= 1e-9 * (1 + abs(r.fun))


@pytest.mark.parametrize("seed", range(2))
def test_packed_canonical_layout(seed):
    """Canonical-form problems (slack0=nv, free vars, Eq/Ge rows) through the
    packed kernel, one problem replicated across a pack."""
    from minilp_tpu.canonical import canonicalize
    from .oracle import random_problem, solve_with_oracle

    rng = np.random.default_rng(8800 + seed)
    prob = random_problem(
        rng, nv=int(rng.integers(4, 8)), m=int(rng.integers(2, 6))
    )
    outcome, obj, _x = solve_with_oracle(prob)
    if outcome != "optimal":
        pytest.skip("instance not optimal")
    can = canonicalize(prob, dtype=np.float64)
    pack = 4
    tile = lambda x: np.broadcast_to(x, (pack,) + x.shape).copy()
    res = solve_batch_packed(
        tile(can.A), tile(can.b), tile(can.c), tile(can.lo), tile(can.hi),
        slack0=can.nv, pack=pack, interpret=True, max_iter=4000,
    )
    if not np.asarray(res.verified).all():
        pytest.skip("f32 kernel basis unverified on this instance")
    got = can.obj_sign * np.asarray(res.obj)
    np.testing.assert_allclose(got, obj, rtol=1e-7, atol=1e-7)
