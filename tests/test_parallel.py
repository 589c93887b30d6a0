"""Parallel-path gates on the faked 8-device CPU mesh (SURVEY.md §5 (d)/(e)):
batched DP solves vs oracle, sharded-batch equivalence, and determinism of the
column-sharded pricing reduction."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from minilp_tpu import DEFAULT_OPTIONS, Status, VarStat
from minilp_tpu.ops.pricing import choose_entering
from minilp_tpu.parallel import batched, mesh as mesh_mod, pricing


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return mesh_mod.make_mesh(n_data=4, n_model=2)


def _oracle_solve_canonical(A, b, c, lo, hi):
    """linprog on one canonical LP (equality form with slack bounds)."""
    from scipy.optimize import linprog

    n = c.shape[0]
    bounds = [
        (None if not np.isfinite(lo[j]) else lo[j],
         None if not np.isfinite(hi[j]) else hi[j])
        for j in range(n)
    ]
    res = linprog(c, A_eq=A, b_eq=b, bounds=bounds, method="highs")
    return res


def test_batched_solves_match_oracle():
    key = jax.random.PRNGKey(0)
    B, m, nv = 16, 6, 10
    args = batched.make_random_batch(key, B, m, nv)
    state = batched.solve_batch(*args, opts=DEFAULT_OPTIONS)
    A, b, c, lo, hi, _, _ = [np.asarray(x) for x in args]
    assert (np.asarray(state.status) == int(Status.OPTIMAL)).all()
    for i in range(B):
        res = _oracle_solve_canonical(A[i], b[i], c[i], lo[i], hi[i])
        assert res.status == 0
        got = float(state.obj[i])
        assert abs(got - res.fun) <= 1e-6 * (1 + abs(res.fun)), i


def test_batched_sharded_equals_unsharded(mesh8):
    key = jax.random.PRNGKey(1)
    B, m, nv = 32, 5, 7
    args = batched.make_random_batch(key, B, m, nv)
    plain = batched.solve_batch(*args, opts=DEFAULT_OPTIONS)
    sharded = batched.solve_batch_sharded(mesh8, *args, opts=DEFAULT_OPTIONS)
    # bit-identical results lane by lane (same program, partitioned data)
    np.testing.assert_array_equal(np.asarray(plain.obj), np.asarray(sharded.obj))
    np.testing.assert_array_equal(
        np.asarray(plain.niter), np.asarray(sharded.niter)
    )
    np.testing.assert_array_equal(
        np.asarray(plain.basis), np.asarray(sharded.basis)
    )


@pytest.mark.parametrize("seed", range(6))
def test_sharded_pricing_matches_single_device(mesh8, seed):
    rng = np.random.default_rng(seed)
    n = 256  # divisible by the 2-wide model axis
    d = jnp.asarray(rng.normal(size=n))
    vstat = jnp.asarray(
        rng.choice(
            [int(VarStat.AT_LOWER), int(VarStat.AT_UPPER), int(VarStat.FREE),
             int(VarStat.FIXED), int(VarStat.BASIC)],
            size=n,
        ).astype(np.int8)
    )
    ref = choose_entering(d, vstat, 1e-8, jnp.bool_(False))
    got = pricing.choose_entering_sharded(mesh8, d, vstat, 1e-8, bland=False)
    assert bool(ref.found) == bool(got.found)
    if bool(ref.found):
        assert int(ref.q) == int(got.q)
        assert float(ref.direction) == float(got.direction)


def test_sharded_pricing_bland_matches(mesh8):
    rng = np.random.default_rng(99)
    n = 128
    d = jnp.asarray(rng.normal(size=n))
    vstat = jnp.asarray(
        rng.choice([0, 1, 2, 3, 4], size=n).astype(np.int8)
    )
    ref = choose_entering(d, vstat, 1e-8, jnp.bool_(True))
    got = pricing.choose_entering_sharded(mesh8, d, vstat, 1e-8, bland=True)
    if bool(ref.found):
        assert int(ref.q) == int(got.q)


def test_pricing_tie_break_is_lowest_index(mesh8):
    # identical scores on two shards → the lower global index must win
    n = 128
    d = np.zeros(n)
    d[10] = -5.0
    d[100] = -5.0  # same |d|, other shard
    vstat = np.full(n, int(VarStat.AT_LOWER), dtype=np.int8)
    got = pricing.choose_entering_sharded(
        mesh8, jnp.asarray(d), jnp.asarray(vstat), 1e-8
    )
    assert int(got.q) == 10


def test_scaling_harness_smoke(mesh8):
    # numbers are meaningless on a shared-core virtual mesh; assert structure
    from minilp_tpu.parallel.distributed import measure_scaling

    r = measure_scaling(2, batch_per_device=8, m=6, nv=8)
    assert r["n_devices"] == 2
    assert r["lps_per_sec_1dev"] > 0 and r["lps_per_sec_ndev"] > 0
    assert 0 < r["efficiency"] < 4


@pytest.mark.parametrize("seed", range(3))
def test_sharded_warm_state_and_dual_resolve(mesh8, seed):
    # SURVEY.md §4.2 distributed: cold sharded solve returns the maintained
    # inverse; add_constraint (host row activation) then re-solves through the
    # column-sharded DUAL simplex and must match the single-device engine.
    from minilp_tpu import ComparisonOp
    from minilp_tpu.engine import incremental
    from minilp_tpu.engine.driver import EngineHandle
    from minilp_tpu.engine.dual import resolve_dual
    from minilp_tpu.engine.primal import solve_canonical
    from minilp_tpu.canonical import canonicalize
    from minilp_tpu.options import SolverOptions
    from minilp_tpu.parallel import mesh as mesh_mod
    from minilp_tpu.parallel.sharded_engine import (
        resolve_dual_sharded, solve_canonical_sharded,
    )
    from .oracle import random_problem

    mesh = mesh_mod.make_mesh(n_data=2, n_model=4)
    rng = np.random.default_rng(7100 + seed)
    prob = random_problem(rng, nv=12, m=6, frac_free=0.0, frac_boxed=1.0,
                          frac_fixed=0.0)
    opts = SolverOptions(presolve=False, max_iter=2000)
    can = canonicalize(prob, extra_row_capacity=4, dtype=np.float64)
    args = (jnp.asarray(can.A), jnp.asarray(can.b), jnp.asarray(can.c),
            jnp.asarray(can.lo), jnp.asarray(can.hi))
    state = solve_canonical(*args, jnp.asarray(can.vstat0),
                            jnp.asarray(can.basis0), opts)
    if int(state.status) != int(Status.OPTIMAL):
        pytest.skip("instance not optimal")

    # cold sharded solve returns a usable warm state
    out = solve_canonical_sharded(mesh, *args, jnp.asarray(can.vstat0),
                                  jnp.asarray(can.basis0), opts)
    assert int(out["status"]) == int(Status.OPTIMAL)
    assert out["Binv"].shape == (can.M, can.M)
    np.testing.assert_allclose(np.asarray(out["xB"]), np.asarray(state.xB),
                               rtol=1e-9, atol=1e-9)

    # host edit: cut off the current optimum with a new <= row
    handle = EngineHandle(can, state, prob, opts)
    x_opt = handle._x_full()[: can.nv]
    coeffs = rng.normal(size=can.nv)
    val = float(coeffs @ x_opt)
    incremental._append_row(handle, coeffs, ComparisonOp.Le, val - 0.25)
    can2 = handle.can
    args2 = (jnp.asarray(can2.A), jnp.asarray(can2.b), jnp.asarray(can2.c),
             jnp.asarray(can2.lo), jnp.asarray(can2.hi))
    ref = resolve_dual(*args2, handle.state.basis, handle.state.vstat,
                       handle.state.Binv, opts)
    got = resolve_dual_sharded(mesh, *args2, handle.state.basis,
                               handle.state.vstat, handle.state.Binv, opts)
    assert int(got["status"]) == int(ref.status)
    if int(ref.status) == int(Status.OPTIMAL):
        assert int(got["niter"]) == int(ref.niter)
        np.testing.assert_array_equal(
            np.sort(np.asarray(ref.basis)), np.sort(np.asarray(got["basis"]))
        )
        np.testing.assert_allclose(float(got["obj"]), float(ref.obj),
                                   rtol=1e-9, atol=1e-9)


def test_sharded_dual_resolve_detects_infeasible(mesh8):
    # a contradictory added row must come back INFEASIBLE from the sharded
    # dual exactly as from the single-device engine
    from minilp_tpu import ComparisonOp
    from minilp_tpu.engine import incremental
    from minilp_tpu.engine.driver import EngineHandle
    from minilp_tpu.engine.dual import resolve_dual
    from minilp_tpu.engine.primal import solve_canonical
    from minilp_tpu.canonical import canonicalize
    from minilp_tpu.options import SolverOptions
    from minilp_tpu.parallel import mesh as mesh_mod
    from minilp_tpu.parallel.sharded_engine import resolve_dual_sharded
    from minilp_tpu import OptimizationDirection, Problem

    mesh = mesh_mod.make_mesh(n_data=2, n_model=4)
    opts = SolverOptions(presolve=False)
    prob = Problem(OptimizationDirection.Maximize, options=opts)
    x = prob.add_var(1.0, (0.0, 5.0))
    y = prob.add_var(1.0, (0.0, 5.0))
    from minilp_tpu import ComparisonOp as Op
    prob.add_constraint(x + y, Op.Ge, 2.0)
    can = canonicalize(prob, extra_row_capacity=4, dtype=np.float64)
    args = (jnp.asarray(can.A), jnp.asarray(can.b), jnp.asarray(can.c),
            jnp.asarray(can.lo), jnp.asarray(can.hi))
    state = solve_canonical(*args, jnp.asarray(can.vstat0),
                            jnp.asarray(can.basis0), SolverOptions())
    handle = EngineHandle(can, state, prob, opts)
    # x + y <= -1 contradicts x,y >= 0
    incremental._append_row(
        handle, np.array([1.0, 1.0]), ComparisonOp.Le, -1.0
    )
    can2 = handle.can
    args2 = (jnp.asarray(can2.A), jnp.asarray(can2.b), jnp.asarray(can2.c),
             jnp.asarray(can2.lo), jnp.asarray(can2.hi))
    ref = resolve_dual(*args2, handle.state.basis, handle.state.vstat,
                       handle.state.Binv, opts)
    got = resolve_dual_sharded(mesh, *args2, handle.state.basis,
                               handle.state.vstat, handle.state.Binv, opts)
    assert int(ref.status) == int(Status.INFEASIBLE)
    assert int(got["status"]) == int(Status.INFEASIBLE)


def test_column_sharded_degenerate_ties_deterministic(mesh8):
    # SURVEY.md §5(e): a deliberately degenerate instance (identical columns,
    # equal ratios everywhere) must still produce the single-device pivot
    # sequence — all tie-breaks are lowest-index and the only inexact sharded
    # reduction (refactorize's psum of A·x_N) is exactly zero here (all
    # nonbasic at lower bound 0), so the comparison is exact, not just close.
    from minilp_tpu.engine.primal import solve_canonical
    from minilp_tpu.options import SolverOptions
    from minilp_tpu.parallel import mesh as mesh_mod
    from minilp_tpu.parallel.sharded_engine import solve_canonical_sharded

    mesh = mesh_mod.make_mesh(n_data=2, n_model=4)
    m, nv = 8, 24
    n = nv + m
    A_s = np.zeros((m, nv))
    # three identical copies of each of 8 base columns → massive pricing ties
    base = np.eye(m)
    for k in range(3):
        A_s[:, 8 * k : 8 * (k + 1)] = base
    A = np.concatenate([A_s, np.eye(m)], axis=1)
    b = np.ones(m)                      # equal ratios on every row
    c = np.concatenate([-np.ones(nv), np.zeros(m)])
    lo = np.zeros(n)
    hi = np.concatenate([np.full(nv, 2.0), np.full(m, np.inf)])
    vstat0 = np.concatenate([
        np.full(nv, int(VarStat.AT_LOWER), dtype=np.int8),
        np.full(m, int(VarStat.BASIC), dtype=np.int8),
    ])
    basis0 = np.arange(nv, nv + m, dtype=np.int32)
    opts = SolverOptions(max_iter=200)
    args = tuple(jnp.asarray(v) for v in (A, b, c, lo, hi))
    ref = solve_canonical(*args, jnp.asarray(vstat0), jnp.asarray(basis0),
                          opts)
    out = solve_canonical_sharded(mesh, *args, jnp.asarray(vstat0),
                                  jnp.asarray(basis0), opts)
    assert int(out["status"]) == int(ref.status) == int(Status.OPTIMAL)
    assert int(out["niter"]) == int(ref.niter)
    np.testing.assert_array_equal(np.asarray(ref.basis),
                                  np.asarray(out["basis"]))
    assert float(out["obj"]) == float(ref.obj)


@pytest.mark.parametrize("seed", range(3))
def test_row_sharded_pdhg_matches_unsharded(mesh8, seed):
    # SP/CP analog (SURVEY.md §6.7): PDHG with the rows of A sharded over the
    # 'model' axis must reproduce the single-device engine's status and
    # solution.  M=11 is NOT divisible by the 2-wide axis → exercises the
    # inert zero-row padding.
    from minilp_tpu.engine.pdhg import solve_pdhg
    from minilp_tpu.options import SolverOptions
    from minilp_tpu.parallel.pdhg_sharded import solve_pdhg_sharded

    opts = SolverOptions(engine="pdhg", feas_tol=1e-7)
    args = batched.make_random_batch(jax.random.PRNGKey(500 + seed), 1, 11, 20)
    A, b, c, lo, hi, _, _ = [x[0] for x in args]
    ref = solve_pdhg(A, b, c, lo, hi, opts=opts)
    got = solve_pdhg_sharded(A, b, c, lo, hi, opts, mesh8)
    assert int(ref.status) == int(Status.OPTIMAL)
    assert int(got.status) == int(Status.OPTIMAL)
    # identical math, different reduction ORDER (psum vs single sum) — bound
    # the float-non-associativity drift, not bitwise equality
    obj_ref = float(np.asarray(c) @ np.asarray(ref.x))
    obj_got = float(np.asarray(c) @ np.asarray(got.x))
    assert abs(obj_got - obj_ref) <= 1e-6 * (1 + abs(obj_ref))
    np.testing.assert_allclose(
        np.asarray(got.x), np.asarray(ref.x), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.y), np.asarray(ref.y), rtol=1e-4, atol=1e-6
    )


def test_row_sharded_pdhg_deterministic(mesh8):
    # fixed compilation ⇒ fixed psum order ⇒ bit-identical repeat runs
    from minilp_tpu.options import SolverOptions
    from minilp_tpu.parallel.pdhg_sharded import solve_pdhg_sharded

    opts = SolverOptions(engine="pdhg", feas_tol=1e-7)
    args = batched.make_random_batch(jax.random.PRNGKey(900), 1, 12, 16)
    A, b, c, lo, hi, _, _ = [x[0] for x in args]
    a_ = solve_pdhg_sharded(A, b, c, lo, hi, opts, mesh8)
    b_ = solve_pdhg_sharded(A, b, c, lo, hi, opts, mesh8)
    np.testing.assert_array_equal(np.asarray(a_.x), np.asarray(b_.x))
    np.testing.assert_array_equal(np.asarray(a_.y), np.asarray(b_.y))
    assert int(a_.niter) == int(b_.niter)


def test_row_sharded_pdhg_detects_infeasible(mesh8):
    # the Farkas-certificate path reduces through the same psum machinery:
    # x >= 0 (bound) vs x + s = -1, s >= 0 (row) has no feasible point
    from minilp_tpu.options import SolverOptions
    from minilp_tpu.parallel.pdhg_sharded import solve_pdhg_sharded

    opts = SolverOptions(engine="pdhg", feas_tol=1e-7)
    A = jnp.asarray([[1.0, 1.0], [0.0, 1.0]])  # second row keeps M=2 honest
    b = jnp.asarray([-1.0, 5.0])
    c = jnp.asarray([1.0, 0.0])
    lo = jnp.zeros(2)
    hi = jnp.asarray([jnp.inf, jnp.inf])
    st = solve_pdhg_sharded(A, b, c, lo, hi, opts, mesh8)
    assert int(st.status) == int(Status.INFEASIBLE)


@pytest.mark.parametrize("seed", range(4))
def test_column_sharded_full_solve_matches_engine(mesh8, seed):
    # The full TP solve loop (pricing + FTRAN + pivot work column-sharded)
    # reproduces the single-device engine's pivot count, basis, and objective.
    from minilp_tpu.engine.primal import solve_canonical
    from minilp_tpu.options import SolverOptions
    from minilp_tpu.parallel import mesh as mesh_mod
    from minilp_tpu.parallel.sharded_engine import solve_canonical_sharded

    mesh = mesh_mod.make_mesh(n_data=2, n_model=4)
    opts = SolverOptions(max_iter=2000)
    args = batched.make_random_batch(jax.random.PRNGKey(100 + seed), 1, 16, 48)
    A, b, c, lo, hi, vstat0, basis0 = [x[0] for x in args]
    ref = solve_canonical(A, b, c, lo, hi, vstat0, basis0, opts)
    out = solve_canonical_sharded(mesh, A, b, c, lo, hi, vstat0, basis0, opts)
    assert int(out["status"]) == int(ref.status)
    assert int(out["niter"]) == int(ref.niter)
    np.testing.assert_array_equal(
        np.sort(np.asarray(ref.basis)), np.sort(np.asarray(out["basis"]))
    )
    np.testing.assert_allclose(
        float(out["obj"]), float(ref.obj), rtol=1e-9, atol=1e-9
    )
