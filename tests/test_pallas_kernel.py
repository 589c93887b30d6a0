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


@pytest.mark.parametrize("seed", range(3))
def test_megakernel_canonical_layout(seed):
    """Kernel on canonicalize() output (slack block at slack0=nv, inert
    padding after): free vars, at-upper vars, Eq/Ge rows, maximize."""
    from minilp_tpu.canonical import canonicalize
    from .oracle import random_problem, solve_with_oracle

    rng = np.random.default_rng(7100 + seed)
    prob = random_problem(
        rng, nv=int(rng.integers(4, 10)), m=int(rng.integers(2, 8))
    )
    outcome, obj, _x = solve_with_oracle(prob)
    if outcome != "optimal":
        pytest.skip("instance not optimal")
    can = canonicalize(prob, dtype=np.float64)
    res = solve_batch_pallas(
        can.A[None], can.b[None], can.c[None], can.lo[None], can.hi[None],
        slack0=can.nv, interpret=True, max_iter=4000,
    )
    if not bool(res.verified[0]):
        pytest.skip("f32 kernel basis unverified on this instance (fallback path)")
    got = float(can.obj_sign * float(res.obj[0]))
    assert abs(got - obj) <= 1e-7 * (1 + abs(obj)), (got, obj)


def test_megakernel_driver_fast_path():
    """use_megakernel='always' end-to-end through Problem.solve (interpret on
    CPU), including a warm incremental re-solve off the kernel's state."""
    from minilp_tpu import (
        ComparisonOp, OptimizationDirection, Problem,
    )
    from minilp_tpu.options import SolverOptions

    opts = SolverOptions(use_megakernel="always")
    prob = Problem(OptimizationDirection.Maximize, options=opts)
    x = prob.add_var(1.0, (0.0, None))
    y = prob.add_var(2.0, (0.0, 3.0))
    prob.add_constraint(x + y, ComparisonOp.Le, 4.0)
    sol = prob.solve()
    assert abs(sol.objective() - 7.0) <= 1e-9
    # warm dual re-solve from the megakernel-built state
    sol2 = sol.add_constraint(x, ComparisonOp.Le, 0.5)
    assert abs(sol2.objective() - 6.5) <= 1e-9


def test_megakernel_warm_start_direct():
    """Warm-start kernel variant driven directly (no driver fallback to hide
    errors): re-solving from the optimal state terminates in ~0 pivots, and
    re-solving after a bound change reaches the new optimum."""
    from scipy.optimize import linprog

    key = jax.random.PRNGKey(21)
    A, b, c, lo, hi, _, _ = make_random_batch(key, 2, 8, 16)
    cold = solve_batch_pallas(A, b, c, lo, hi, interpret=True)
    assert np.asarray(cold.verified).all()
    An = np.asarray(A)
    basis0 = np.asarray(cold.basis)
    vstat0 = np.asarray(cold.vstat)
    Binv0 = np.stack([
        np.linalg.inv(An[i][:, basis0[i]]) for i in range(2)
    ]).astype(np.float32)

    warm = solve_batch_pallas(
        A, b, c, lo, hi, interpret=True,
        warm_state=(basis0, vstat0, Binv0),
    )
    assert np.asarray(warm.verified).all()
    np.testing.assert_allclose(
        np.asarray(warm.obj), np.asarray(cold.obj), rtol=1e-9, atol=1e-9
    )
    assert int(np.asarray(warm.niter).max()) <= 2  # already optimal

    # tighten a box bound and warm re-solve; check against the oracle
    hi2 = np.asarray(hi).copy()
    hi2[:, 0] = 0.25
    vs2 = vstat0.copy()
    # variable 0 keeps its status unless it now violates the new bound;
    # re-home it at the tightened bound if it was resting above
    from minilp_tpu.status import VarStat
    at_hi = vs2[:, 0] == int(VarStat.AT_UPPER)
    warm2 = solve_batch_pallas(
        A, b, c, lo, hi2, interpret=True,
        warm_state=(basis0, vs2, Binv0),
    )
    assert np.asarray(warm2.verified).all()
    bn, cn, lon = map(np.asarray, (b, c, lo))
    for i in range(2):
        bounds = [
            (lon[i, j] if np.isfinite(lon[i, j]) else None,
             hi2[i, j] if np.isfinite(hi2[i, j]) else None)
            for j in range(cn.shape[1])
        ]
        r = linprog(cn[i], A_eq=An[i], b_eq=bn[i], bounds=bounds, method="highs")
        assert r.status == 0
        assert abs(float(warm2.obj[i]) - r.fun) <= 1e-9 * (1 + abs(r.fun))


def test_megakernel_warm_incremental_sequence():
    """use_megakernel='always': the whole incremental API (add_constraint,
    fix/unfix, Gomory cut) runs through WARM megakernel re-solves (interpret
    mode on CPU) and matches the XLA engine bit-for-bit on objectives."""
    from minilp_tpu import ComparisonOp, OptimizationDirection, Problem
    from minilp_tpu.options import SolverOptions

    def drive(opts):
        prob = Problem(OptimizationDirection.Maximize, options=opts)
        x = prob.add_var(3.0, (0.0, None))
        y = prob.add_var(2.0, (0.0, None))
        prob.add_constraint(x + y, ComparisonOp.Le, 4.0)
        prob.add_constraint(x + 3.0 * y, ComparisonOp.Le, 6.0)
        sol = prob.solve()
        objs = [sol.objective()]
        sol = sol.add_constraint(x - y, ComparisonOp.Le, 1.0)
        objs.append(sol.objective())
        sol = sol.fix_var(y, 1.0)
        objs.append(sol.objective())
        changed, sol = sol.unfix_var(y)
        objs.append(sol.objective())
        # fresh solve with a fractional BASIC optimum for the Gomory cut
        # (presolve off: a singleton row would be absorbed into the bound,
        # leaving the variable non-basic at its bound)
        import dataclasses

        opts2 = dataclasses.replace(opts, presolve=False)
        p2 = Problem(OptimizationDirection.Maximize, options=opts2)
        u = p2.add_var(3.0, (0.0, None))
        v = p2.add_var(2.0, (0.0, None))
        p2.add_constraint(2.0 * u + 2.0 * v, ComparisonOp.Le, 3.0)
        p2.add_constraint(u - v, ComparisonOp.Le, 0.25)
        # unique optimum (u, v) = (0.875, 0.625): u basic and fractional
        s2 = p2.solve().add_gomory_cut(u)
        objs.append(s2.objective())
        return objs

    mega = drive(SolverOptions(use_megakernel="always"))
    xla = drive(SolverOptions(use_megakernel="never"))
    np.testing.assert_allclose(mega, xla, rtol=1e-9, atol=1e-9)


def test_solve_batch_certified_all_lanes():
    """solve_batch_certified returns an all-verified batch (host fallback
    covers any lane the f32 kernel could not certify)."""
    from minilp_tpu.parallel.batched import solve_batch_certified

    key = jax.random.PRNGKey(11)
    A, b, c, lo, hi, _, _ = make_random_batch(key, 8, 8, 16)
    res = solve_batch_certified(A, b, c, lo, hi)
    assert np.asarray(res.verified).all()
    assert (np.asarray(res.status) == int(Status.OPTIMAL)).all()
    # exact vertex consistency: A x = b and c·x = obj in f64
    An, bn, cn = map(np.asarray, (A, b, c))
    xn = np.asarray(res.x)
    resid = np.abs(np.einsum("bmn,bn->bm", An, xn) - bn).max()
    assert resid < 1e-9
    np.testing.assert_allclose(
        np.einsum("bn,bn->b", cn, xn), np.asarray(res.obj), rtol=1e-12, atol=1e-12
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
