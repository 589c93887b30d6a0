"""Real-TPU hardware gates (VERDICT r2 ask #6: committed chip-suite evidence).

Runs ONLY under ``MINILP_TPU_TEST_TPU=1`` (tests/conftest.py then leaves the
axon TPU as the default backend).  Each test drives a real compiled kernel on
the chip — no interpret mode — at small shapes so the whole file stays in
chip-watchdog-safe territory (every kernel execution well under a minute;
compiles are cached in .jax_cache).  The driver records the pass/fail log as
``TPU_SUITE_r03.txt``.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("MINILP_TPU_TEST_TPU"),
    reason="hardware gate: set MINILP_TPU_TEST_TPU=1 on a machine with the chip",
)


def _require_tpu():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")


def test_megakernel_solve_certified_on_chip():
    _require_tpu()
    from minilp_tpu.options import SolverOptions
    from minilp_tpu.utils.synth import netlib_shaped_problem

    from .oracle import solve_with_oracle

    prob = netlib_shaped_problem(60, 150, 0.1, seed=21)
    outcome, obj, _ = solve_with_oracle(prob)
    assert outcome == "optimal"
    prob.options = SolverOptions(use_megakernel="always")
    sol = prob.solve()
    assert sol._engine.certified is True
    assert abs(sol.objective() - obj) <= 1e-9 * (1 + abs(obj))


def test_streaming_kernel_on_chip():
    """Hardware (non-interpret) run of the HBM-streaming kernel: certified
    exact optimum on a 128-row instance through chunked warm relaunches."""
    _require_tpu()
    from minilp_tpu.canonical import canonicalize
    from minilp_tpu.ops.kernels.streaming_simplex import solve_streaming_pallas
    from minilp_tpu.utils.synth import netlib_shaped_problem

    from .oracle import solve_with_oracle

    prob = netlib_shaped_problem(120, 360, 0.05, seed=9)
    outcome, obj, _ = solve_with_oracle(prob)
    assert outcome == "optimal"
    can = canonicalize(prob, dtype=np.float64)
    M, nv = can.M, can.nv
    M2 = -(-M // 128) * 128
    n2 = nv + M2
    A2 = np.zeros((M2, n2))
    A2[:M, : nv + M] = can.A[:, : nv + M]
    A2[np.arange(M, M2), nv + M + np.arange(M2 - M)] = 1.0
    b = np.concatenate([can.b, np.zeros(M2 - M)])
    c = np.concatenate([can.c[: nv + M], np.zeros(M2 - M)])
    lo = np.concatenate([can.lo[: nv + M], np.zeros(M2 - M)])
    hi = np.concatenate([can.hi[: nv + M], np.zeros(M2 - M)])
    res = solve_streaming_pallas(
        A2, b, c, lo, hi, slack0=nv, max_iter=50_000, chunk_iters=2000,
    )
    assert int(res.status) == 1 and bool(res.verified)
    got = can.obj_sign * float(res.obj)
    assert abs(got - obj) <= 1e-7 * (1 + abs(obj))


def test_packed_kernel_batch_on_chip():
    _require_tpu()
    import jax

    from minilp_tpu.parallel.batched import (
        make_random_batch_host, solve_batch_certified,
    )

    batch = make_random_batch_host(3, batch=64, m=16, nv=48)
    res = solve_batch_certified(*batch, slack0=48, max_iter=2000)
    verified = np.asarray(res.verified)
    assert verified.all(), f"{int(verified.sum())}/64 certified"


def test_incremental_warm_loop_on_chip():
    """Branch-and-cut-style warm loop through the device fast paths."""
    _require_tpu()
    from minilp_tpu.api import ComparisonOp, LinearExpr, Variable
    from minilp_tpu.utils.synth import netlib_shaped_problem

    prob = netlib_shaped_problem(60, 150, 0.1, seed=22)
    sol = prob.solve()
    assert sol._engine.certified is True
    rng = np.random.default_rng(0)
    for _ in range(3):
        js = rng.choice(150, size=6, replace=False)
        cf = rng.normal(size=6)
        val = sum(float(co) * sol[Variable(int(j))] for co, j in zip(cf, js))
        expr = LinearExpr((float(co), Variable(int(j))) for co, j in zip(cf, js))
        sol = sol.add_constraint(expr, ComparisonOp.Le, val + 0.5)
        assert sol._engine.certified is True


def test_streaming_single_launch_on_chip():
    """Round-4 auto chunking: at mid sizes the whole solve must complete in
    ONE kernel launch (no warm-restart executable load — the chunk-boundary
    overhead cost ~0.45 s per solve and the warm executable's one-time
    cached-binary load ~15 s of cold wall)."""
    _require_tpu()
    from minilp_tpu.canonical import canonicalize
    from minilp_tpu.ops.kernels.streaming_simplex import solve_streaming_pallas
    from minilp_tpu.utils import profiling
    from minilp_tpu.utils.synth import netlib_shaped_problem

    prob = netlib_shaped_problem(120, 360, 0.05, seed=9)
    can = canonicalize(prob, dtype=np.float64)
    M, nv = can.M, can.nv
    M2 = -(-M // 128) * 128
    n2 = nv + M2
    A2 = np.zeros((M2, n2))
    A2[:M, : nv + M] = can.A[:, : nv + M]
    A2[np.arange(M, M2), nv + M + np.arange(M2 - M)] = 1.0
    b = np.concatenate([can.b, np.zeros(M2 - M)])
    c = np.concatenate([can.c[: nv + M], np.zeros(M2 - M)])
    lo = np.concatenate([can.lo[: nv + M], np.zeros(M2 - M)])
    hi = np.concatenate([can.hi[: nv + M], np.zeros(M2 - M)])
    profiling.reset_stages()
    res = solve_streaming_pallas(A2, b, c, lo, hi, slack0=nv, max_iter=30_000)
    assert int(res.status) == 1 and bool(res.verified)
    assert profiling.stages().get("stream_n_chunks") == 1


def test_device_pdhg_stage_on_chip():
    """The crossover's TPU stage (VERDICT r4 #1): dense f32 PDHG chunks on
    the chip must reach a host-f64-verified KKT neighborhood on a mid-size
    feasible instance."""
    _require_tpu()
    from minilp_tpu.canonical import canonicalize
    from minilp_tpu.engine.crossover import _device_pdhg_stage, kkt_error_f64
    from minilp_tpu.options import SolverOptions
    from minilp_tpu.utils.synth import netlib_shaped_problem

    prob = netlib_shaped_problem(120, 360, 0.05, seed=9)
    can = canonicalize(prob, dtype=np.float64)
    opts = SolverOptions()
    tol = max(opts.crossover_tol, opts.feas_tol)
    out = _device_pdhg_stage(can, opts, tol, progress=False)
    assert out is not None
    x, y, niter, err, _omega = out
    assert niter > 0
    # the returned err must BE the exact f64 KKT of the returned iterate
    err2 = kkt_error_f64(can.A, can.b, can.c, can.lo, can.hi, x, y, tol)
    assert abs(err - err2) <= 1e-12 * (1 + err2)
    assert err <= 1e-2  # at worst the f32 floor; typically <= tol


def test_streaming_refresh_paths_agree_on_chip():
    """Resident-BT fused refresh vs HBM-staged refresh: identical pivots on
    REAL hardware (the interpret gate cannot see Mosaic lowering bugs)."""
    _require_tpu()
    from minilp_tpu.canonical import canonicalize
    from minilp_tpu.ops.kernels.streaming_simplex import solve_streaming_pallas
    from minilp_tpu.utils.synth import netlib_shaped_problem

    prob = netlib_shaped_problem(120, 360, 0.05, seed=9)
    can = canonicalize(prob, dtype=np.float64)
    M, nv = can.M, can.nv
    M2 = -(-M // 128) * 128
    n2 = nv + M2
    A2 = np.zeros((M2, n2))
    A2[:M, : nv + M] = can.A[:, : nv + M]
    A2[np.arange(M, M2), nv + M + np.arange(M2 - M)] = 1.0
    b = np.concatenate([can.b, np.zeros(M2 - M)])
    c = np.concatenate([can.c[: nv + M], np.zeros(M2 - M)])
    lo = np.concatenate([can.lo[: nv + M], np.zeros(M2 - M)])
    hi = np.concatenate([can.hi[: nv + M], np.zeros(M2 - M)])
    outs = [
        solve_streaming_pallas(
            A2, b, c, lo, hi, slack0=nv, max_iter=50_000,
            b_resident=br, refactor_period=64,
        )
        for br in (False, True)
    ]
    assert int(outs[0].status) == int(outs[1].status) == 1
    assert int(outs[0].niter) == int(outs[1].niter)
    np.testing.assert_array_equal(
        np.asarray(outs[0].basis), np.asarray(outs[1].basis)
    )
    assert bool(outs[0].verified) and bool(outs[1].verified)
