"""Host-CPU f64 polish gate: an uncertified near-optimal f32 basis is
finished exactly by warm-starting the XLA engine on the CPU backend."""

import dataclasses

import numpy as np

from minilp_tpu.canonical import CanonicalLP
from minilp_tpu.engine.driver import _host_polish_from_basis
from minilp_tpu.options import SolverOptions
from minilp_tpu.parallel.batched import make_random_batch_host
from minilp_tpu.status import Status, VarStat


def _canonical_from_random(seed: int, m: int, nv: int):
    A, b, c, lo, hi = make_random_batch_host(seed, batch=1, m=m, nv=nv)
    A, b, c, lo, hi = A[0], b[0], c[0], lo[0], hi[0]
    n = nv + m
    vstat0 = np.concatenate([
        np.full(nv, int(VarStat.AT_LOWER), dtype=np.int8),
        np.full(m, int(VarStat.BASIC), dtype=np.int8),
    ])
    basis0 = np.arange(nv, nv + m, dtype=np.int32)
    can = CanonicalLP(
        A=A, b=b, c=c, lo=lo, hi=hi, vstat0=vstat0, basis0=basis0,
        m=m, nv=nv, M=m, N=n, obj_sign=1.0,
    )
    return can


def _oracle_obj(can):
    from scipy.optimize import linprog

    bounds = [
        (can.lo[j] if np.isfinite(can.lo[j]) else None,
         can.hi[j] if np.isfinite(can.hi[j]) else None)
        for j in range(can.c.size)
    ]
    r = linprog(can.c, A_eq=can.A, b_eq=can.b, bounds=bounds, method="highs")
    assert r.status == 0
    return r.fun


def test_polish_reaches_optimum_from_suboptimal_basis():
    """Worst case for the polish — the start basis is the ALL-SLACK basis
    (maximally far from optimal), standing in for a drifted f32 basis."""
    can = _canonical_from_random(17, m=8, nv=16)
    opts = SolverOptions()
    state = _host_polish_from_basis(can, can.basis0, can.vstat0, opts)
    assert state is not None
    assert int(state.status) == int(Status.OPTIMAL)
    ref = _oracle_obj(can)
    assert abs(float(state.obj) - ref) <= 1e-9 * (1 + abs(ref))


def test_polish_declines_f32_options():
    can = _canonical_from_random(18, m=6, nv=10)
    opts = dataclasses.replace(SolverOptions(), dtype="float32")
    assert _host_polish_from_basis(can, can.basis0, can.vstat0, opts) is None


def test_polish_declines_singular_basis():
    can = _canonical_from_random(19, m=6, nv=10)
    bad = np.zeros(6, dtype=np.int32)  # repeated column: singular basis
    opts = SolverOptions()
    assert _host_polish_from_basis(can, bad, can.vstat0, opts) is None
