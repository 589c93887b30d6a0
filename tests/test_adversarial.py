"""Adversarial synthetic gates (VERDICT r3 #5 / weak #4).

The plain Netlib-shaped generator plants boxed, interior-feasible,
non-degenerate instances — structurally kinder than real Netlib, so the
anti-cycling and drift machinery (Bland, Harris ties, phase regression,
chunk surrender) is rarely exercised by the default suite.  These gates
solve instances from utils/synth.py's adversarial generators — planted
degeneracy (zero slackness, duplicate rows/columns, zero costs),
ill-conditioning (column scales 10^±6, near-parallel rows), and free/fixed
bound mixes — against the scipy-HiGHS oracle, on the host sparse engine,
the XLA driver path, and the streaming kernel (interpreter mode).

The reference's equivalent stress comes from the real Netlib degenerate
instances (degen2/degen3, maros-grade conditioning) in its vendored suite
(`tests/` + `*.mps.gz` [CODE]); until that data lands these are the stand-in.
"""

import numpy as np
import pytest

from minilp_tpu import api
from minilp_tpu.canonical import canonicalize
from minilp_tpu.engine import hostlp
from minilp_tpu.options import SolverOptions
from minilp_tpu.status import Status
from minilp_tpu.utils.synth import (
    degenerate_problem,
    ill_conditioned_problem,
    mixed_bounds_problem,
    network_flow_problem,
    staircase_problem,
)

from .oracle import solve_with_oracle


def _oracle(prob):
    """Oracle outcome, or skip when HiGHS itself fails on the instance (the
    ill-conditioned generator can exceed even the oracle's tolerance)."""
    try:
        return solve_with_oracle(prob)
    except RuntimeError as e:
        pytest.skip(f"oracle failed on this instance: {e}")


def _staircase(m, nv, _density, seed=0):
    """Adapter: 5-stage staircase at roughly (m, nv) total size."""
    return staircase_problem(5, max(m // 5, 2), max(nv // 5, 4), seed=seed)


def _network(m, nv, _density, seed=0):
    """Adapter: min-cost flow with m nodes / nv arcs (totally unimodular,
    massively degenerate — VERDICT r4 weak #7's missing structure class)."""
    return network_flow_problem(m, nv, seed=seed)


GENS = {
    "degenerate": degenerate_problem,
    "ill_conditioned": ill_conditioned_problem,
    "mixed_bounds": mixed_bounds_problem,
    "staircase": _staircase,
    "network_flow": _network,
}

_STATUS_NAME = {
    int(Status.OPTIMAL): "optimal",
    int(Status.INFEASIBLE): "infeasible",
    int(Status.UNBOUNDED): "unbounded",
}


def _solve_api(prob):
    """(outcome, objective) through the public driver path."""
    try:
        sol = prob.solve()
        return "optimal", sol.objective()
    except api.Infeasible:
        return "infeasible", None
    except api.Unbounded:
        return "unbounded", None


@pytest.mark.parametrize("gen", list(GENS))
@pytest.mark.parametrize("seed", range(4))
def test_adversarial_hostlp_matches_oracle(gen, seed):
    prob = GENS[gen](40, 90, 0.15, seed=seed)
    outcome, obj, _ = _oracle(prob)
    can = canonicalize(prob, dtype=np.float64)
    res = hostlp.solve_host_sparse(
        can.A, can.b, can.c, can.lo, can.hi, can.basis0, can.vstat0,
        opts=SolverOptions(),
    )
    assert res is not None
    assert _STATUS_NAME.get(res.status) == outcome
    if outcome == "optimal":
        got = can.obj_sign * res.obj
        assert abs(got - obj) <= 1e-7 * (1 + abs(obj))


@pytest.mark.parametrize("gen", list(GENS))
@pytest.mark.parametrize("seed", range(3))
def test_adversarial_driver_matches_oracle(gen, seed):
    """Full public path (canonicalize → presolve → engine routing) on the
    adversarial classes."""
    prob = GENS[gen](30, 70, 0.18, seed=10 + seed)
    outcome, obj, _ = _oracle(prob)
    got_outcome, got_obj = _solve_api(prob)
    assert got_outcome == outcome
    if outcome == "optimal":
        assert abs(got_obj - obj) <= 1e-7 * (1 + abs(obj))


@pytest.mark.parametrize("seed", range(3))
def test_degenerate_xla_f32_certified(seed):
    """The f32-iterate + f64-certify mid-size route survives planted
    degeneracy (ratio-test ties everywhere) and still adopts an exact
    vertex."""
    prob = degenerate_problem(48, 120, 0.12, seed=20 + seed)
    outcome, obj, _ = _oracle(prob)
    if outcome != "optimal":
        pytest.skip("instance not optimal")
    prob.options = SolverOptions(f32_midsize="always", use_megakernel="never")
    sol = prob.solve()
    assert sol._engine.certified is True
    assert abs(sol.objective() - obj) <= 1e-9 * (1 + abs(obj))


@pytest.mark.parametrize("seed", range(2))
def test_ill_conditioned_exact_path(seed):
    """Column scales spanning 1e±6: the exact-f64 host engine must stay
    numerically sound (terminal status matches oracle; objective to 1e-6
    relative — the instance itself is genuinely harder to certify
    tightly)."""
    prob = ill_conditioned_problem(36, 80, 0.18, seed=30 + seed,
                                   scale_span=6.0)
    outcome, obj, _ = _oracle(prob)
    can = canonicalize(prob, dtype=np.float64)
    res = hostlp.solve_host_sparse(
        can.A, can.b, can.c, can.lo, can.hi, can.basis0, can.vstat0,
        opts=SolverOptions(),
    )
    assert res is not None
    assert _STATUS_NAME.get(res.status) == outcome
    if outcome == "optimal":
        got = can.obj_sign * res.obj
        assert abs(got - obj) <= 1e-6 * (1 + abs(obj))


def test_bland_path_fires_on_degenerate():
    """The Bland anti-cycling fallback must actually engage on planted
    degeneracy (VERDICT r3: 'assert the Bland path actually fires in at
    least one') — and the result must still match the oracle."""
    fired = 0
    for seed in range(6):
        # OVERDETERMINED (m > nv) with every rhs tight at the planted point:
        # more active rows than dimensions forces degenerate vertices and
        # zero-progress pivots — measured: the square-ish variant never
        # stalls (Devex+Harris make progress every pivot)
        prob = degenerate_problem(100, 40, 0.3, seed=seed,
                                  frac_eq=0.5, frac_zero_obj=0.5)
        outcome, obj, _ = _oracle(prob)
        can = canonicalize(prob, dtype=np.float64)
        # tiny patience forces the stall counter over the Bland threshold
        # as soon as degenerate (zero-step) pivots appear
        res = hostlp.solve_host_sparse(
            can.A, can.b, can.c, can.lo, can.hi, can.basis0, can.vstat0,
            opts=SolverOptions(bland_after=3),
        )
        assert res is not None
        assert _STATUS_NAME.get(res.status) == outcome
        if outcome == "optimal":
            got = can.obj_sign * res.obj
            assert abs(got - obj) <= 1e-7 * (1 + abs(obj))
        fired += res.bland_iters > 0
    assert fired > 0, "no instance engaged the Bland rule — generator too kind"


@pytest.mark.parametrize("seed", range(2))
def test_degenerate_streaming_kernel_interpret(seed):
    """The streaming kernel (interpreter mode) on a small planted-degenerate
    instance: terminal claim certified or correctly handed off."""
    from minilp_tpu.ops.kernels.streaming_simplex import solve_streaming_pallas

    prob = degenerate_problem(24, 56, 0.25, seed=50 + seed)
    outcome, obj, _ = _oracle(prob)
    if outcome != "optimal":
        pytest.skip("instance not optimal")
    can = canonicalize(prob, dtype=np.float64)
    res = solve_streaming_pallas(
        can.A, can.b, can.c, can.lo, can.hi, slack0=can.nv,
        max_iter=5000, tile_n=64, interpret=True,
    )
    st = int(res.status)
    assert st in (int(Status.OPTIMAL), int(Status.NUMERICAL))
    if st == int(Status.OPTIMAL) and bool(res.verified):
        got = can.obj_sign * float(res.obj)
        assert abs(got - obj) <= 1e-6 * (1 + abs(obj))


# ---------------------------------------------------------------------------
# Chunk-surrender policy (VERDICT r3 weak #6): the joint
# infeasibility+objective stagnation tracker, unit-level and end-to-end
# against a monkeypatched chunk launcher.
# ---------------------------------------------------------------------------


def test_surrender_tracker_fires_on_joint_stagnation():
    from minilp_tpu.ops.kernels.streaming_simplex import SurrenderTracker

    t = SurrenderTracker(feas_tol=1e-5, patience=4)
    fired = [t.update(2, 1.0, 5.0) for _ in range(5)]
    # chunk 1 establishes the baseline (obj None→moving); 4 stalled chunks
    # after it trip the patience
    assert fired == [False, False, False, False, True]


def test_surrender_tracker_held_by_moving_objective():
    """An objective still in motion must hold surrender off even with flat
    infeasibility (the round-2 post-mortem case)."""
    from minilp_tpu.ops.kernels.streaming_simplex import SurrenderTracker

    t = SurrenderTracker(feas_tol=1e-5, patience=4)
    obj = 100.0
    for _ in range(20):
        assert t.update(2, 1.0, obj) is False
        obj -= 1.0  # keeps moving ⇒ never stalls
    assert t.stalled == 0


def test_surrender_tracker_reset_by_improving_infeasibility():
    from minilp_tpu.ops.kernels.streaming_simplex import SurrenderTracker

    t = SurrenderTracker(feas_tol=1e-5, patience=4)
    inf = 1.0
    for _ in range(20):
        assert t.update(2, inf, 5.0) is False
        inf *= 0.4  # keeps halving ⇒ stall counter stays 0
    # once it flattens, patience counts from zero
    fired = [t.update(2, max(inf, 1e-1), 5.0) for _ in range(4)]
    assert fired == [False, False, False, True]


def test_surrender_tracker_ignores_small_infeas():
    from minilp_tpu.ops.kernels.streaming_simplex import SurrenderTracker

    t = SurrenderTracker(feas_tol=1e-5, patience=4)
    for _ in range(10):
        assert t.update(2, 1e-4, 5.0) is False      # below 1e3·tol: never
    assert t.stalled == 0


def test_surrender_tracker_fires_on_phase1_freeze():
    """The round-4 chip post-mortem case: phase 1 frozen at constant
    infeasibility with a flat objective must surrender (the phase-2-only
    tracker let a maros run burn 345 s of device time to MAX_ITER)."""
    from minilp_tpu.ops.kernels.streaming_simplex import SurrenderTracker

    t = SurrenderTracker(feas_tol=1e-5, patience=4)
    fired = [t.update(1, 8.0e3, -34.28) for _ in range(5)]
    assert fired == [False, False, False, False, True]


def test_forced_stall_surrenders_and_driver_recovers(monkeypatch):
    """End-to-end forced stall: every chunk launch exits MAX_ITER in phase 2
    with flat infeasibility and a flat objective.  solve_streaming_pallas
    must surrender after exactly patience+1 further launches and report
    NUMERICAL with verified=False — the driver's host-polish handoff state.
    """
    from minilp_tpu.ops.kernels import streaming_simplex as ss

    prob = degenerate_problem(24, 56, 0.25, seed=99)
    can = canonicalize(prob, dtype=np.float64)
    m, n = can.M, can.N

    calls = {"n": 0}

    def fake_call(AT, b, c, lo, hi, *warm, **kw):
        calls["n"] += 1
        npad = AT.shape[0]
        basis = np.arange(can.nv + 0, can.nv + m, dtype=np.int32)[None]
        # a CONSISTENT slack-basis state (verification must evaluate it
        # NaN-free and fail it honestly, not crash on -inf bounds)
        lo_p = np.asarray(lo)[0].astype(np.float64)
        hi_p = np.asarray(hi)[0].astype(np.float64)
        vs = np.where(np.isfinite(lo_p), 0, np.where(np.isfinite(hi_p), 1, 2))
        vs[n:] = 3  # inert tile padding: FIXED
        vs[basis[0]] = 4  # BASIC
        vstat = vs.astype(np.int32)[None]
        return (
            np.asarray(basis),                          # 0 basis
            np.asarray(vstat),                          # 1 vstat
            np.full((1, 1), int(Status.MAX_ITER), np.int32),  # 2 status
            np.full((1, 1), kw.get("max_iter", 1), np.int32),  # 3 niter
            np.zeros((1, 1), np.float32),               # 4 obj f32
            np.eye(m, dtype=np.float32),                # 5 Binv
            np.full((1, 1), 2, np.int32),               # 6 phase
            np.full((1, 1), 0.5, np.float32),           # 7 infeas (flat)
            np.full((1, 1), 7.0, np.float32),           # 8 obj claim (flat)
        )

    monkeypatch.setattr(ss, "stream_kernel_call", fake_call)
    res = ss.solve_streaming_pallas(
        can.A, can.b, can.c, can.lo, can.hi, slack0=can.nv,
        max_iter=10_000_000, tile_n=64, interpret=True, chunk_iters=64,
    )
    assert int(res.status) == int(Status.NUMERICAL)
    assert not bool(res.verified)
    # chunk 1 establishes the objective baseline (obj None → "moving");
    # chunks 2-5 are the 4 stalled chunks that trip the patience
    assert calls["n"] == 5
