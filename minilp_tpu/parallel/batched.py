"""Batched scenario engine: vmapped solves of many independent LPs, sharded
across chips.

This is the TPU build's data parallelism (SURVEY.md §3.3 DP row; BASELINE
config 3): the whole dense simplex solver is `vmap`ped over a leading batch
axis of 1k–64k independent LPs and the batch is sharded over the mesh's
'data' axis — no cross-LP communication, XLA runs every lane in lockstep
(`lax.while_loop` under vmap iterates until all lanes terminate, masking
finished lanes via `select`).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..engine.primal import solve_canonical
from ..engine.state import SimplexState
from ..options import SolverOptions
from ..status import VarStat
from .mesh import batch_sharding


@partial(jax.jit, static_argnames=("opts",))
def solve_batch(
    A: jnp.ndarray,      # (B, M, N)
    b: jnp.ndarray,      # (B, M)
    c: jnp.ndarray,      # (B, N)
    lo: jnp.ndarray,     # (B, N)
    hi: jnp.ndarray,     # (B, N)
    vstat0: jnp.ndarray,  # (B, N) int8
    basis0: jnp.ndarray,  # (B, M) int32
    opts: SolverOptions,
) -> SimplexState:
    """Solve B independent canonical LPs; returns a batched SimplexState."""
    return jax.vmap(
        lambda *args: solve_canonical(*args, opts)
    )(A, b, c, lo, hi, vstat0, basis0)


def solve_batch_sharded(mesh, A, b, c, lo, hi, vstat0, basis0, opts) -> SimplexState:
    """Same, with the batch axis sharded over the mesh's 'data' axis (pure DP).

    XLA inserts no collectives at all here — each chip solves its slice of the
    batch; only the caller's reductions (e.g. throughput metrics) communicate.
    """
    sh = batch_sharding(mesh)
    args = [jax.device_put(x, sh) for x in (A, b, c, lo, hi, vstat0, basis0)]
    return solve_batch(*args, opts=opts)


def solve_batch_certified(A, b, c, lo, hi, *, slack0=None, max_iter: int = 2000):
    """Batched solve where EVERY lane's answer is exact and certified.

    Primary path: the Pallas f32 megakernel (one grid program per LP, VMEM
    resident) + exact f64 host recompute of each discovered basis.  The rare
    lanes whose f32 basis fails f64 certification (typically <0.1%) are
    re-solved exactly on the host (scipy-HiGHS — the same independent oracle
    the test suite gates on), so the returned `verified` mask is all-True
    unless a lane is genuinely pathological.  This is the TPU-safe batched
    entry point: it never touches the device's emulated-f64 arithmetic.
    """
    import numpy as np
    from scipy.optimize import linprog

    from ..ops.kernels.batched_simplex import solve_batch_pallas
    from ..status import Status

    interpret = jax.default_backend() != "tpu"
    res = solve_batch_pallas(
        A, b, c, lo, hi, slack0=slack0, max_iter=max_iter, interpret=interpret
    )
    verified = np.asarray(res.verified).copy()
    if verified.all():
        return res
    obj = np.asarray(res.obj).copy()
    x = np.asarray(res.x).copy()
    status = np.asarray(res.status).copy()
    An, bn, cn, lon, hin = [np.asarray(v, dtype=np.float64) for v in (A, b, c, lo, hi)]
    for i in np.flatnonzero(~verified):
        bounds = [
            (lon[i, j] if np.isfinite(lon[i, j]) else None,
             hin[i, j] if np.isfinite(hin[i, j]) else None)
            for j in range(cn.shape[1])
        ]
        r = linprog(cn[i], A_eq=An[i], b_eq=bn[i], bounds=bounds, method="highs")
        if r.status == 0:
            obj[i], x[i] = r.fun, r.x
            status[i], verified[i] = int(Status.OPTIMAL), True
        elif r.status == 2:
            status[i], verified[i] = int(Status.INFEASIBLE), True
        elif r.status == 3:
            status[i], verified[i] = int(Status.UNBOUNDED), True
    return res._replace(
        obj=jnp.asarray(obj), x=jnp.asarray(x),
        status=jnp.asarray(status), verified=jnp.asarray(verified),
    )


def make_random_batch(
    key: jax.Array, batch: int, m: int, nv: int, dtype=jnp.float64
) -> Tuple[jnp.ndarray, ...]:
    """A batch of random dense canonical LPs, guaranteed feasible and bounded.

    Structure: minimize c·x s.t. A_s·x + s = b, 0 ≤ x ≤ 1 (boxed structural
    vars ⇒ bounded), s ≥ 0 with b = A_s·x₀ + u for an interior x₀ and u > 0
    (⇒ x₀ strictly feasible).  Matches BASELINE config 3's "independent random
    dense LPs (m, n ≤ 256)".
    """
    kA, kc, kx, ku = jax.random.split(key, 4)
    n = nv + m
    A_s = jax.random.normal(kA, (batch, m, nv), dtype=dtype)
    c_s = jax.random.normal(kc, (batch, nv), dtype=dtype)
    x0 = jax.random.uniform(kx, (batch, nv), dtype=dtype, minval=0.2, maxval=0.8)
    u = jax.random.uniform(ku, (batch, m), dtype=dtype, minval=0.1, maxval=1.0)
    b = jnp.einsum("bmn,bn->bm", A_s, x0) + u

    eye = jnp.broadcast_to(jnp.eye(m, dtype=dtype), (batch, m, m))
    A = jnp.concatenate([A_s, eye], axis=2)          # (B, m, n)
    c = jnp.concatenate([c_s, jnp.zeros((batch, m), dtype=dtype)], axis=1)
    lo = jnp.zeros((batch, n), dtype=dtype)
    hi = jnp.concatenate(
        [jnp.ones((batch, nv), dtype=dtype),
         jnp.full((batch, m), jnp.inf, dtype=dtype)],
        axis=1,
    )
    vstat0 = jnp.concatenate(
        [jnp.full((batch, nv), int(VarStat.AT_LOWER), dtype=jnp.int8),
         jnp.full((batch, m), int(VarStat.BASIC), dtype=jnp.int8)],
        axis=1,
    )
    basis0 = jnp.broadcast_to(
        jnp.arange(nv, nv + m, dtype=jnp.int32), (batch, m)
    )
    return A, b, c, lo, hi, vstat0, basis0
