"""PDHG (PDLP-style) first-order engine for large sparse instances.

No reference counterpart — this is the build-only engine mandated by BASELINE
(SURVEY.md §3.3: "restarted average-iterate primal-dual hybrid gradient …
residual-norm convergence checks"; PAPERS.md: "GPU-based First-Order Methods
for LP", "Batched First-Order Methods for Parallel LP Solving in MIP").

Operates directly on the canonical equality form  min c·x  s.t.  Ax = b,
lo ≤ x ≤ hi  (free equality duals y):

    x⁺ = Π_[lo,hi](x − τ (c − Aᵀy))
    y⁺ = y + σ (b − A(2x⁺ − x))

with τ = ω/‖A‖₂, σ = 1/(ω‖A‖₂) (‖A‖₂ from power iteration) — every operation
is a dense matvec or elementwise pass, i.e. pure MXU/VPU work that XLA fuses;
the same code vmaps over scenario batches and row-shards over a mesh with a
psum on the matvec partials (SURVEY.md §6.7).

Averaging + restarts: running ergodic averages (x̄, ȳ) are kept since the last
restart; every `check_every` iterations the KKT error of both the current and
the averaged iterate is measured, and the better one becomes the restart point
when it has improved enough (β-factor rule à la PDLP).  Termination is by
relative KKT error (primal residual, dual residual, duality gap) ≤ tol.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..options import SolverOptions
from ..status import Status


class PdhgState(NamedTuple):
    x: jnp.ndarray        # (N,) primal iterate
    y: jnp.ndarray        # (M,) dual iterate (equality rows, free)
    x_sum: jnp.ndarray    # (N,) running sum since last restart
    y_sum: jnp.ndarray    # (M,)
    inner: jnp.ndarray    # () f  — iterations since last restart
    last_err: jnp.ndarray  # () f — KKT error at last restart
    niter: jnp.ndarray    # () int32
    status: jnp.ndarray   # () int32
    err: jnp.ndarray      # () f — latest KKT error (of the returned iterate)


def _spectral_norm(A: jnp.ndarray, iters: int = 30) -> jnp.ndarray:
    """‖A‖₂ by power iteration on AᵀA (deterministic start)."""
    n = A.shape[1]
    v = jnp.ones((n,), dtype=A.dtype) / jnp.sqrt(jnp.asarray(n, dtype=A.dtype))

    def body(_, v):
        w = A.T @ (A @ v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = lax.fori_loop(0, iters, body, v)
    return jnp.sqrt(jnp.maximum(jnp.linalg.norm(A.T @ (A @ v)), 1e-30))


def _kkt_error(A, b, c, lo, hi, x, y, scale_b, scale_c, feas_tol):
    """Relative KKT error: max(primal residual, dual residual, duality gap)."""
    r_p = jnp.linalg.norm(A @ x - b) / scale_b
    red = c - A.T @ y
    # dual residual: distance of the reduced cost from the box's normal cone
    at_lo = x <= lo + feas_tol
    at_hi = x >= hi - feas_tol
    viol = jnp.where(at_lo, jnp.minimum(red, 0.0), red)
    viol = jnp.where(at_hi & ~at_lo, jnp.maximum(red, 0.0), viol)
    viol = jnp.where(at_lo & at_hi, 0.0, viol)  # fixed vars: any sign ok
    r_d = jnp.linalg.norm(viol) / scale_c
    # duality gap: dual objective b·y + Σ_j inf over box of red_j·x_j, taking
    # the attained bound per reduced-cost sign (0 contribution when the sign
    # disagrees with an infinite bound — that part is already in r_d).
    lo_f = jnp.where(jnp.isfinite(lo), lo, 0.0)
    hi_f = jnp.where(jnp.isfinite(hi), hi, 0.0)
    contrib = jnp.where(red > 0, red * lo_f, red * hi_f)
    dobj = b @ y + jnp.sum(contrib)
    pobj = c @ x
    gap = jnp.abs(pobj - dobj) / (1.0 + jnp.abs(pobj) + jnp.abs(dobj))
    return jnp.maximum(jnp.maximum(r_p, r_d), gap), pobj


@partial(jax.jit, static_argnames=("opts",))
def solve_pdhg(
    A: jnp.ndarray,
    b: jnp.ndarray,
    c: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    opts: SolverOptions,
    omega: float = 1.0,
) -> PdhgState:
    """Run restarted-average PDHG until relative KKT error ≤ opts.feas_tol."""
    M, N = A.shape
    dtype = A.dtype
    norm_a = _spectral_norm(A)
    tau = omega / norm_a
    sigma = 1.0 / (omega * norm_a)
    scale_b = 1.0 + jnp.linalg.norm(b)
    scale_c = 1.0 + jnp.linalg.norm(c)
    tol = opts.feas_tol

    lo_c = jnp.where(jnp.isfinite(lo), lo, -1e30)
    hi_c = jnp.where(jnp.isfinite(hi), hi, 1e30)
    x0 = jnp.clip(jnp.zeros((N,), dtype=dtype), lo_c, hi_c)
    y0 = jnp.zeros((M,), dtype=dtype)

    def one_iter(x, y):
        x_new = jnp.clip(x - tau * (c - A.T @ y), lo_c, hi_c)
        y_new = y + sigma * (b - A @ (2.0 * x_new - x))
        return x_new, y_new

    def body(st: PdhgState) -> PdhgState:
        # -- check_every inner iterations (unrolled scan keeps the graph small)
        def inner(carry, _):
            x, y, xs, ys = carry
            x, y = one_iter(x, y)
            return (x, y, xs + x, ys + y), None

        (x, y, xs, ys), _ = lax.scan(
            inner, (st.x, st.y, st.x_sum, st.y_sum), None,
            length=opts.pdhg_check_every,
        )
        inner_cnt = st.inner + opts.pdhg_check_every
        niter = st.niter + opts.pdhg_check_every

        # -- candidate iterates: current vs running average -------------------
        x_avg = xs / inner_cnt
        y_avg = ys / inner_cnt
        err_cur, _ = _kkt_error(A, b, c, lo, hi, x, y, scale_b, scale_c, tol)
        err_avg, _ = _kkt_error(A, b, c, lo, hi, x_avg, y_avg, scale_b, scale_c, tol)
        use_avg = err_avg < err_cur
        err_best = jnp.minimum(err_avg, err_cur)
        x_best = jnp.where(use_avg, x_avg, x)
        y_best = jnp.where(use_avg, y_avg, y)

        done = err_best <= tol
        # -- β-factor restart: adopt the best candidate when it improved enough
        restart = done | (err_best <= opts.pdhg_restart_beta * st.last_err)
        x_n = jnp.where(restart, x_best, x)
        y_n = jnp.where(restart, y_best, y)
        xs_n = jnp.where(restart, jnp.zeros_like(xs), xs)
        ys_n = jnp.where(restart, jnp.zeros_like(ys), ys)
        inner_n = jnp.where(restart, 0.0, inner_cnt)
        last_n = jnp.where(restart, err_best, st.last_err)

        status = jnp.where(done, jnp.int32(Status.OPTIMAL), st.status)
        return PdhgState(
            x=x_n, y=y_n, x_sum=xs_n, y_sum=ys_n,
            inner=inner_n.astype(dtype), last_err=last_n,
            niter=niter, status=status, err=err_best,
        )

    st0 = PdhgState(
        x=x0, y=y0, x_sum=jnp.zeros_like(x0), y_sum=jnp.zeros_like(y0),
        inner=jnp.array(0.0, dtype=dtype),
        last_err=jnp.array(jnp.inf, dtype=dtype),
        niter=jnp.int32(0), status=jnp.int32(Status.RUNNING),
        err=jnp.array(jnp.inf, dtype=dtype),
    )

    def cond(st: PdhgState):
        return (st.status == Status.RUNNING) & (st.niter < opts.pdhg_max_iter)

    st = lax.while_loop(cond, body, st0)
    return st._replace(
        status=jnp.where(
            st.status == Status.RUNNING, jnp.int32(Status.MAX_ITER), st.status
        )
    )
