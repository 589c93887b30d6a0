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


def resolve_unverified_host(res, A, b, c, lo, hi):
    """Exact scipy-HiGHS host re-solve of every lane whose f32 basis failed
    f64 certification — the shared tail of all certified batched entry points.

    Returns `res` with the uncertified lanes replaced by the oracle's exact
    answers (host numpy arrays), so the `verified` mask is all-True unless a
    lane is genuinely pathological for HiGHS too.
    """
    import numpy as np
    from scipy.optimize import linprog

    from ..status import Status

    verified = np.asarray(res.verified).copy()
    if verified.all():
        return res
    obj = np.array(res.obj)
    x = np.array(res.x)
    status = np.array(res.status)
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
    # host numpy (not device arrays): these are final host-side answers
    return res._replace(obj=obj, x=x, status=status, verified=verified)


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
    from ..ops.kernels.batched_simplex import solve_batch_pallas

    interpret = jax.default_backend() != "tpu"
    res = solve_batch_pallas(
        A, b, c, lo, hi, slack0=slack0, max_iter=max_iter, interpret=interpret
    )
    return resolve_unverified_host(res, A, b, c, lo, hi)


def solve_batches_pipelined(
    batches,
    *,
    pack: int = 8,
    slack0=None,
    max_iter: int = 2000,
    structural_cols: int | None = None,
    sort_packs: bool = False,
):
    """Solve a sequence of host-resident LP batches, overlapping device solve
    of batch k+1 with host f64 certification of batch k.

    `batches` is a list of (A, b, c, lo, hi) numpy tuples.  The device only
    ever sees f32 copies (upload is f32 — half the tunnel bytes) and only the
    combinatorial outputs (basis/vstat/status) come back; the f64 data stays
    on the host where the exact certification runs.  Uploads of batch k+1 run
    on a prefetch thread while batch k solves, so steady-state throughput ≈
    1/max(t_upload, t_kernel, t_certify) instead of their sum.

    `structural_cols=nv` declares that columns [nv, nv+m) of A are the
    identity slack block (true of every canonicalized LP and of
    `make_random_batch_host`): then only the structural block A[:, :, :nv]
    is uploaded and the identity is assembled on device — the host→device
    link is usually the bottleneck, and the slack block is pure structure.

    `sort_packs=True` orders each batch by the a-priori difficulty proxy
    (`parallel.scheduling.difficulty_scores`) before packing, so lockstep
    packs don't idle on stragglers (~3–4% fewer device iterations on random
    dense batches); results are un-permuted before returning.  Only worth it
    when the DEVICE is the bottleneck: the permuted host copy lengthens the
    upload stage, so on link-bound setups (e.g. a tunneled chip — this
    machine) it measurably loses more than it saves.  Default off.
    """
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    from ..ops.kernels import packed_simplex as ps
    from ..ops.kernels.batched_simplex import _verify_f64

    interpret = jax.default_backend() != "tpu"

    def prep(batch):
        """Host f32 cast + device upload (runs on the prefetch thread so the
        next batch's H2D overlaps the current batch's solve/certify)."""
        A, b, c, lo, hi = batch
        B, m, n = A.shape
        P = B // pack
        if sort_packs:
            from .scheduling import difficulty_scores, sort_for_packing

            order = sort_for_packing(
                difficulty_scores(A, b, c, lo, hi, slack0=slack0)
            )
            A, b, c, lo, hi = A[order], b[order], c[order], lo[order], hi[order]
        else:
            order = None
        up = lambda x, shape: jnp.asarray(
            np.ascontiguousarray(x, dtype=np.float32).reshape(shape)
        )
        if structural_cols is not None:
            A_dev = up(A[:, :, :structural_cols], (B, m, structural_cols))
        else:
            A_dev = up(A, (P, pack * m, n))
        return (
            order,
            A_dev,
            up(b, (P, pack, m)),
            up(c, (P, pack, n)),
            up(lo, (P, pack, n)),
            up(hi, (P, pack, n)),
        )

    def launch(dev_args, batch):
        A, b, c, lo, hi = batch
        B, m, n = A.shape
        s0 = (n - m) if slack0 is None else slack0
        _order, A_dev, *vecs = dev_args
        with jax.enable_x64(False), jax.default_matmul_precision("highest"):
            if structural_cols is not None:
                A_dev = _assemble_packed(
                    A_dev, pack=pack, slack0=s0, n=n
                )
            out = ps.packed_kernel_call(
                A_dev, *vecs,
                pack=pack, slack0=s0, max_iter=max_iter,
                refactor_period=32, feas_tol=1e-5, opt_tol=1e-6,
                pivot_tol=1e-6, bland_after=200, interpret=interpret,
            )
        return out

    def finalize(batch, out, order):
        A, b, c, lo, hi = batch
        B, m, n = A.shape
        basis = np.asarray(out[0]).reshape(B, m)
        vstat = np.asarray(out[1]).reshape(B, n)
        # np.array (copy): device-backed numpy views are read-only, and the
        # fallback below writes into status
        status = np.array(out[2]).reshape(B)
        niter = np.asarray(out[3]).reshape(B)
        if order is not None:
            # un-permute the sorted-pack outputs back to the caller's order
            inv = np.empty_like(order)
            inv[order] = np.arange(order.size)
            basis, vstat = basis[inv], vstat[inv]
            status, niter = status[inv], niter[inv]
        obj, verified, x = _verify_f64(A, b, c, lo, hi, basis, vstat, status)
        from ..ops.kernels.batched_simplex import PallasBatchResult

        res = PallasBatchResult(
            basis=basis, vstat=vstat, status=status, niter=niter,
            obj=obj, verified=verified, x=x,
        )
        # rare uncertified lanes (<0.1%): exact host re-solve, so callers get
        # an all-verified batch (same guarantee as solve_batch_certified)
        return resolve_unverified_host(res, A, b, c, lo, hi)

    results = []
    prev = None
    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(prep, batches[0])
        for k, batch in enumerate(batches):
            dev_args = fut.result()
            if k + 1 < len(batches):
                fut = pool.submit(prep, batches[k + 1])  # overlap next upload
            out = launch(dev_args, batch)  # async dispatch
            if prev is not None:
                results.append(finalize(*prev))  # host certify overlaps solve
            prev = (batch, out, dev_args[0])
        results.append(finalize(*prev))
    return results


@partial(jax.jit, static_argnames=("pack", "slack0", "n"))
def _assemble_packed(A_s32, *, pack: int, slack0: int, n: int):
    """Device-side assembly of [structural | identity-slack | padding] from
    the uploaded structural block (B, m, nv) → packed (B/pack, pack·m, n)."""
    B, m, nv = A_s32.shape
    assert slack0 == nv, "identity slack block must follow the structural cols"
    eye = jnp.broadcast_to(jnp.eye(m, dtype=A_s32.dtype), (B, m, m))
    parts = [A_s32, eye]
    padding = n - nv - m
    if padding:
        parts.append(jnp.zeros((B, m, padding), dtype=A_s32.dtype))
    A = jnp.concatenate(parts, axis=2)
    return A.reshape(B // pack, pack * m, n)


def make_random_batch_host(
    seed: int, batch: int, m: int, nv: int
) -> Tuple["np.ndarray", ...]:
    """Host (numpy, f64) twin of `make_random_batch` — same LP structure.

    Generating on the host keeps the f64 problem data host-resident for the
    exact certification step: the device only receives the f32 copies.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    n = nv + m
    A_s = rng.normal(size=(batch, m, nv))
    c_s = rng.normal(size=(batch, nv))
    x0 = rng.uniform(0.2, 0.8, size=(batch, nv))
    u = rng.uniform(0.1, 1.0, size=(batch, m))
    b = np.einsum("bmn,bn->bm", A_s, x0) + u

    eye = np.broadcast_to(np.eye(m), (batch, m, m))
    A = np.concatenate([A_s, eye], axis=2)
    c = np.concatenate([c_s, np.zeros((batch, m))], axis=1)
    lo = np.zeros((batch, n))
    hi = np.concatenate([np.ones((batch, nv)), np.full((batch, m), np.inf)], axis=1)
    return A, b, c, lo, hi


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
