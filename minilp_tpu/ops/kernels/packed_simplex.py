"""Pack-k batched simplex megakernel: k LPs per grid program.

The one-LP-per-program megakernel (batched_simplex.py) under-utilizes the
VPU/MXU for small LPs: its per-iteration work is dominated by the *issue
latency* of ~35 tiny vector ops on (1, n)/(1, m)/(m, m) operands, so the
8-sublane × 128-lane vector units run nearly empty.  This kernel packs k LPs
into one program and amortizes every one of those ops across the pack:

* **Column state is (k, n), basic-row state is (k, m).**  Pricing, the ratio
  test, status machinery — every elementwise pass and every per-LP reduction
  (row-wise min/argmax with the deterministic lowest-index tie-break) serves
  k LPs at the same op cost as one.
* **The k basis inverses live in ONE block-diagonal (km, km) matrix.**  All
  per-LP matvecs collapse into single MXU matmuls:
    FTRAN for all k LPs      = BD @ acol            (km,km)@(km,1)
    BTRAN pivot rows         = BDᵀ @ onehot_rows    (km,km)@(km,1)
    phase-1 duals            = BDᵀ @ sigma          (km,km)@(km,1)
    pivot rows × A           = PrMat @ A_pack       (k,km)@(km,n)
  The PFI pivot update is one masked rank-k outer product (every LP's rank-1
  update lands in its own diagonal block), and the periodic Newton refresh is
  three block-diagonal matmuls — block-diagonality is preserved exactly
  because zero blocks propagate exactly through products and sums.
* **No dynamic indexing anywhere** (Mosaic): per-LP scalars are (k, 1)
  vectors, all gathers/scatters are one-hot masks, layout conversions between
  (k, m) and (km, 1) are fixed 0/1 matmuls (`G`, `blockmask`), and transposes
  appear only as matmul operands (the pattern the one-LP kernel already
  lowers).

Lockstep cost: a pack runs until its slowest member finishes (finished LPs
are inert: all writes are gated on per-LP `running`).  With iteration counts
concentrated around their mean, E[max of k] / E[iter] ≈ 1.3–1.6 — far less
than the ~k× issue-latency win.

Precision contract is identical to batched_simplex.py: f32 iterate, exact
f64 host certification of every discovered basis (shared `_verify_f64`).
"""

from __future__ import annotations

import functools
import sys
from typing import NamedTuple

if sys.getrecursionlimit() < 10_000:
    sys.setrecursionlimit(10_000)

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...status import Status, VarStat
from .batched_simplex import PallasBatchResult, _verify_f64

F32 = jnp.float32
NEG_INF = float("-inf")


def _packed_kernel(
    # inputs (one pack per grid program)
    A_ref,      # (km, n)
    b_ref,      # (k, m)
    c_ref, lo_ref, hi_ref,   # (k, n)
    # outputs
    basis_out,  # (km, 1) int32 — local column index per global basic row
    vstat_out,  # (k, n) int32
    status_out, niter_out,   # (k, 1) int32
    # scratch
    BD,         # (km, km) f32 — block-diagonal basis inverse
    xB, loB, hiB, cB,        # (k, m) f32
    d, wts,                  # (k, n) f32
    *, k: int, m: int, n: int, slack0: int, max_iter: int,
    refactor_period: int, feas_tol: float, opt_tol: float, pivot_tol: float,
    bland_after: int,
):
    km = k * m
    A = A_ref[...]
    b = b_ref[...]
    c = c_ref[...]
    lo = lo_ref[...]
    hi = hi_ref[...]

    ZERO = jnp.float32(0.0)
    ONE = jnp.float32(1.0)
    INF = jnp.float32(jnp.inf)
    neg_inf = jnp.float32(NEG_INF)

    # ---- fixed index machinery (all compile-time iota compares) -------------
    col_n = lax.broadcasted_iota(jnp.int32, (k, n), 1)      # column ids per row
    col_m = lax.broadcasted_iota(jnp.int32, (k, m), 1)      # basic-row ids
    g_row = lax.broadcasted_iota(jnp.int32, (km, 1), 0)     # global row id
    g_lp = g_row // m                                        # owning LP
    g_loc = g_row - g_lp * m                                 # local row id
    col_gn = lax.broadcasted_iota(jnp.int32, (km, n), 1)
    # blockmask (k, km): [i, g] = 1 iff global row g belongs to LP i
    bm_i = lax.broadcasted_iota(jnp.int32, (k, km), 0)
    bm_g = lax.broadcasted_iota(jnp.int32, (k, km), 1)
    blockmask = (bm_g // m == bm_i).astype(F32)              # (k, km)
    # G (km, m): [g, j] = 1 iff g % m == j   (layout conversion)
    G = (
        (lax.broadcasted_iota(jnp.int32, (km, m), 0)
         % m) == lax.broadcasted_iota(jnp.int32, (km, m), 1)
    ).astype(F32)
    # M_bd (km, km): block-diagonal mask
    md_r = lax.broadcasted_iota(jnp.int32, (km, km), 0)
    md_c = lax.broadcasted_iota(jnp.int32, (km, km), 1)
    M_bd = (md_r // m == md_c // m).astype(F32)
    eye_km = (md_r == md_c).astype(F32)
    ones_k1 = jnp.ones((k, 1), dtype=F32)

    def rep_col(v_k1):
        """(k, 1) → (km, 1): replicate per-LP scalar to its global rows."""
        return blockmask.T @ v_k1.astype(F32)

    def pack_col(X_km):
        """(k, m) → (km, 1) column layout."""
        t = G @ X_km.astype(F32).T                            # (km, k)
        return jnp.sum(blockmask.T * t, axis=1, keepdims=True)

    def unpack_col(v):
        """(km, 1) → (k, m)."""
        t1 = blockmask * (ones_k1 @ v.T)                      # (k, km)
        return t1 @ G                                          # (k, m)

    def sel_n(X, q_k1):
        """Per-row selection X[i, q_i] for (k, n) X → (k, 1)."""
        mask = col_n == q_k1
        if X.dtype == jnp.int32:
            return jnp.sum(jnp.where(mask, X, jnp.int32(0)), axis=1, keepdims=True)
        return jnp.sum(jnp.where(mask, X, ZERO), axis=1, keepdims=True)

    def sel_m(X, r_k1):
        mask = col_m == r_k1
        if X.dtype == jnp.int32:
            return jnp.sum(jnp.where(mask, X, jnp.int32(0)), axis=1, keepdims=True)
        return jnp.sum(jnp.where(mask, X, ZERO), axis=1, keepdims=True)

    def row_argmax(score):
        """Per-row argmax with lowest-index ties for (k, ·) score → (k, 1)."""
        width = score.shape[1]
        ids = col_n if width == n else col_m
        mx = jnp.max(score, axis=1, keepdims=True)
        return jnp.min(
            jnp.where(score == mx, ids, jnp.int32(width)), axis=1, keepdims=True
        )

    # ---- initial state -------------------------------------------------------
    BD[...] = eye_km
    basis_out[...] = slack0 + g_loc                           # slack basis
    vstat0 = jnp.where(
        jnp.isfinite(lo), jnp.int32(VarStat.AT_LOWER),
        jnp.where(jnp.isfinite(hi), jnp.int32(VarStat.AT_UPPER),
                  jnp.int32(VarStat.FREE)),
    )
    vstat0 = jnp.where(lo == hi, jnp.int32(VarStat.FIXED), vstat0)
    is_slack = (col_n >= slack0) & (col_n < slack0 + m)
    vstat0 = jnp.where(is_slack, jnp.int32(VarStat.BASIC), vstat0)
    vstat_out[...] = vstat0
    loB[...] = lo[:, slack0:slack0 + m]
    hiB[...] = hi[:, slack0:slack0 + m]
    cB[...] = c[:, slack0:slack0 + m]
    wts[...] = jnp.ones_like(c)

    def nonbasic_x(vstat):
        x = jnp.where(vstat == VarStat.AT_LOWER, lo, ZERO)
        x = jnp.where(vstat == VarStat.AT_UPPER, hi, x)
        x = jnp.where(vstat == VarStat.FIXED, lo, x)
        return x                                              # (k, n)

    def recompute_into_refs():
        vstat = vstat_out[...]
        xN = nonbasic_x(vstat)
        # per-LP A_i @ xN_i via replicated elementwise + row reduce
        xN_exp = blockmask.T @ xN                             # (km, n)
        Ax = jnp.sum(A * xN_exp, axis=1, keepdims=True)       # (km, 1)
        rhs_col = pack_col(b) - Ax
        xB[...] = unpack_col(BD[...] @ rhs_col)
        y_col = BD[...].T @ pack_col(cB[...])                 # (km, 1)
        YMat = blockmask * (ones_k1 @ y_col.T)                # (k, km)
        d_new = c - YMat @ A
        d[...] = jnp.where(vstat == VarStat.BASIC, ZERO, d_new)

    recompute_into_refs()

    RUN = jnp.int32(Status.RUNNING)

    def cond(carry):
        status, niter, phase, noimp, best, fresh, force = carry
        alive = (status == RUN) & (niter < max_iter)
        return jnp.sum(alive.astype(F32)) > ZERO

    def body(carry):
        status, niter, phase, noimp, best, fresh, force = carry
        running = status == RUN                                # (k, 1)

        # ---- refresh decision (per-pack; refresh is harmless for inert LPs)
        xB_pre = xB[...]
        loBv = loB[...]
        hiBv = hiB[...]
        below_pre = xB_pre < loBv - feas_tol
        above_pre = xB_pre > hiBv + feas_tol
        feasible = jnp.sum(
            (below_pre | above_pre).astype(F32), axis=1, keepdims=True
        ) == ZERO                                              # (k, 1)
        transition = (phase == 1) & feasible & running
        phase = jnp.where(transition, jnp.int32(2), phase)
        any_transition = jnp.sum(transition.astype(F32)) > ZERO
        any_force = jnp.sum((force & running).astype(F32)) > ZERO
        max_niter = jnp.max(niter)
        do_refresh = (
            any_transition | any_force
            | ((max_niter > jnp.int32(0))
               & (max_niter % jnp.int32(refactor_period) == jnp.int32(0)))
        )

        @pl.when(do_refresh)
        def _():
            # Newton refresh of all k inverses at once: Bmat assembled
            # block-diagonally by one masked matmul, then X += X(I − BX).
            OH = (col_gn == basis_out[...]).astype(F32)        # (km, n)
            Bmat = M_bd * (A @ OH.T)                           # (km, km) BD
            X = BD[...]
            for _ in range(2):
                X = X + X @ (eye_km - Bmat @ X)
            BD[...] = X
            recompute_into_refs()

        vstat = vstat_out[...]
        xBv = xB[...]
        below = xBv < loBv - feas_tol
        above = xBv > hiBv + feas_tol
        ones_km = jnp.ones_like(xBv)
        sigma = jnp.where(below, -ones_km, jnp.where(above, ones_km, ZERO * ones_km))
        viol = jnp.maximum(loBv - xBv, ZERO) + jnp.maximum(xBv - hiBv, ZERO)
        infeas = jnp.sum(viol, axis=1, keepdims=True)          # (k, 1)
        p1 = phase == 1                                        # (k, 1)

        # ---- phase-1 composite reduced costs (all LPs at once) --------------
        y1_col = BD[...].T @ pack_col(sigma)                   # (km, 1)
        Y1 = blockmask * (ones_k1 @ y1_col.T)                  # (k, km)
        d1 = -(Y1 @ A)                                         # (k, n)
        d1 = jnp.where(vstat == VarStat.BASIC, ZERO, d1)
        dcur = jnp.where(p1, d1, d[...])

        # ---- pricing ---------------------------------------------------------
        bland = noimp >= bland_after                           # (k, 1)
        can_up = (vstat == VarStat.AT_LOWER) | (vstat == VarStat.FREE)
        can_dn = (vstat == VarStat.AT_UPPER) | (vstat == VarStat.FREE)
        elig = (can_up & (dcur < -opt_tol)) | (can_dn & (dcur > opt_tol))
        gam = jnp.where(p1, jnp.ones_like(wts[...]), wts[...])
        score = jnp.where(elig, dcur * dcur / jnp.maximum(gam, ONE * 1e-3), neg_inf)
        q_d = row_argmax(score)                                # (k, 1)
        q_b = jnp.min(jnp.where(elig, col_n, jnp.int32(n)), axis=1, keepdims=True)
        q = jnp.where(bland, q_b, q_d)                         # (k, 1)
        found = (jnp.sum(elig.astype(F32), axis=1, keepdims=True) > ZERO) & running
        dq = sel_n(dcur, q)                                    # (k, 1)
        s = jnp.where(dq < ZERO, ONE, -ONE)                    # (k, 1)

        # ---- FTRAN for all k LPs: one masked reduce + one BD matvec ----------
        q_rep = rep_col(q).astype(jnp.int32)                   # (km, 1)
        onehot_q_exp = (col_gn == q_rep).astype(F32)           # (km, n)
        acol = jnp.sum(A * onehot_q_exp, axis=1, keepdims=True)  # (km, 1)
        w_col = BD[...] @ acol                                 # (km, 1)
        w = unpack_col(w_col)                                  # (k, m)

        # ---- ratio test (row-wise, unified phase rule) -----------------------
        delta = -s * w
        up = delta > pivot_tol
        dn = delta < -pivot_tol
        up_tgt = jnp.where(below, loBv, hiBv)
        dn_tgt = jnp.where(above, hiBv, loBv)
        up_ok = ~above
        dn_ok = ~below
        tgt = jnp.where(up, up_tgt, jnp.where(dn, dn_tgt, ZERO))
        blockable = ((up & up_ok) | (dn & dn_ok)) & jnp.isfinite(tgt)
        ratio = jnp.where(
            blockable, (tgt - xBv) / jnp.where(up | dn, delta, ONE), INF
        )
        ratio = jnp.maximum(ratio, ZERO)
        t_rows = jnp.min(ratio, axis=1, keepdims=True)         # (k, 1)
        tie = ratio <= t_rows * jnp.float32(1.0001) + jnp.float32(1e-6)
        r = row_argmax(jnp.where(tie, jnp.abs(w), neg_inf))    # (k, 1) local
        lo_q = sel_n(lo, q)
        hi_q = sel_n(hi, q)
        rng_q = hi_q - lo_q
        flip = rng_q <= t_rows
        unbounded = ~jnp.isfinite(jnp.minimum(t_rows, rng_q))
        t = jnp.where(flip, rng_q, sel_m(ratio, r))            # (k, 1)

        do_pivot = found & ~flip & ~unbounded
        do_flip = found & flip & ~unbounded

        # ---- entering/leaving bookkeeping ------------------------------------
        vq = sel_n(vstat, q)
        enter_base = jnp.where(
            (vq == VarStat.AT_LOWER) | (vq == VarStat.FIXED), lo_q,
            jnp.where(vq == VarStat.AT_UPPER, hi_q, ZERO),
        )
        basis_km = unpack_col(basis_out[...].astype(F32)).astype(jnp.int32)  # (k, m)
        lv = sel_m(basis_km, r)                                # (k, 1) leaving col
        loB_r = sel_m(loBv, r)
        hiB_r = sel_m(hiBv, r)
        lv_fixed = loB_r == hiB_r
        tgt_r = sel_m(tgt, r)
        lstat = jnp.where(
            lv_fixed, jnp.int32(VarStat.FIXED),
            jnp.where(tgt_r == hiB_r, jnp.int32(VarStat.AT_UPPER),
                      jnp.int32(VarStat.AT_LOWER)),
        )

        # bound flip
        xB_flip = xBv + t * delta
        vstat_flip = jnp.where(
            (col_n == q) & do_flip,
            jnp.where(vstat == VarStat.AT_LOWER, jnp.int32(VarStat.AT_UPPER),
                      jnp.int32(VarStat.AT_LOWER)),
            vstat,
        )

        # ---- PFI: one masked rank-k outer product ----------------------------
        onehot_R = (g_loc == rep_col(r.astype(F32)).astype(jnp.int32)).astype(F32)
        # gate per-LP: only pivoting LPs contribute to the update
        pivot_gate = rep_col(jnp.where(do_pivot, ONE, ZERO))   # (km, 1)
        onehot_Rg = onehot_R * pivot_gate
        pr_col = BD[...].T @ onehot_Rg                         # (km, 1)
        w_r = sel_m(w, r)                                      # (k, 1)
        w_r_safe = jnp.where(do_pivot, w_r, ONE)
        pr_scaled = pr_col / rep_col(w_r_safe)                 # (km, 1)
        upd = M_bd * ((w_col * pivot_gate - onehot_Rg) @ pr_scaled.T)
        BD_piv = BD[...] - upd

        x_enter = enter_base + s * t
        xB_piv = jnp.where(col_m == r, x_enter, xBv + t * delta)
        basis_piv_km = jnp.where(col_m == r, q, basis_km)      # (k, m)
        vstat_piv = jnp.where(col_n == lv, lstat, vstat)
        vstat_piv = jnp.where(col_n == q, jnp.int32(VarStat.BASIC), vstat_piv)
        loB_piv = jnp.where(col_m == r, lo_q, loBv)
        hiB_piv = jnp.where(col_m == r, hi_q, hiBv)
        cB_piv = jnp.where(col_m == r, sel_n(c, q), cB[...])

        # pivot rows for all k LPs: alpha_i = Binv_i[r_i,:] @ A_i  (one matmul)
        PrMat = blockmask * (ones_k1 @ pr_scaled.T)            # (k, km)
        alpha = (PrMat @ A) * w_r_safe                         # (k, n)
        rd = dq / w_r_safe
        d_piv = d[...] - rd * alpha
        d_piv = jnp.where(col_n == q, ZERO, d_piv)
        d_piv = jnp.where(col_n == lv, -rd, d_piv)
        d_piv = jnp.where(vstat_piv == VarStat.BASIC, ZERO, d_piv)

        # Devex weights
        gq = jnp.maximum(sel_n(wts[...], q), ONE)
        tcol = alpha / w_r_safe
        w_cand = jnp.maximum(wts[...], (tcol * tcol) * gq)
        w_cand = jnp.where(col_n == lv, jnp.maximum(gq / (w_r_safe * w_r_safe), ONE),
                           w_cand)
        w_cand = jnp.where(col_n == q, ONE, w_cand)
        w_cand = jnp.where(gq > jnp.float32(1e6), jnp.ones_like(w_cand), w_cand)

        # ---- select + write back (everything gated per LP) -------------------
        wts[...] = jnp.where(do_pivot & ~p1, w_cand, wts[...])
        BD[...] = BD_piv                                       # gated via pivot_gate
        xB[...] = jnp.where(do_pivot, xB_piv, jnp.where(do_flip, xB_flip, xBv))
        basis_new_km = jnp.where(do_pivot, basis_piv_km, basis_km)
        basis_out[...] = pack_col(basis_new_km.astype(F32)).astype(jnp.int32)
        vstat_out[...] = jnp.where(
            do_pivot, vstat_piv, jnp.where(do_flip, vstat_flip, vstat)
        )
        loB[...] = jnp.where(do_pivot, loB_piv, loBv)
        hiB[...] = jnp.where(do_pivot, hiB_piv, hiBv)
        cB[...] = jnp.where(do_pivot, cB_piv, cB[...])
        d[...] = jnp.where(do_pivot & ~p1, d_piv, d[...])

        # ---- status transitions (terminal only from a fresh state) ----------
        fresh_now = jnp.where(jnp.bool_(do_refresh), jnp.int32(1), fresh)
        wants_exit = running & ((~found & running) | (found & unbounded))
        believe = fresh_now == 1
        status = jnp.where(
            running & found & unbounded & believe,
            jnp.where(p1, jnp.int32(Status.NUMERICAL), jnp.int32(Status.UNBOUNDED)),
            status,
        )
        status = jnp.where(
            running & ~found & believe,
            jnp.where(p1, jnp.int32(Status.INFEASIBLE), jnp.int32(Status.OPTIMAL)),
            status,
        )
        force = jnp.where(
            wants_exit & ~believe & (status == RUN), jnp.int32(1), jnp.int32(0)
        )
        applied = do_pivot | do_flip
        fresh = jnp.where(applied, jnp.int32(0), fresh_now)
        niter = niter + jnp.where(applied, jnp.int32(1), jnp.int32(0))
        # cap enforcement per LP
        status = jnp.where(
            (status == RUN) & (niter >= max_iter), jnp.int32(Status.MAX_ITER),
            status,
        )

        # ---- phase-1 stall counter -------------------------------------------
        improved = infeas < best - jnp.float32(1e-6)
        noimp = jnp.where(
            p1 & running,
            jnp.where(improved, jnp.int32(0), noimp + 1),
            jnp.int32(0),
        )
        best = jnp.where(p1, jnp.minimum(best, infeas), best)

        return (status, niter, phase, noimp, best, fresh, force)

    zero_k1 = jnp.zeros((k, 1), dtype=jnp.int32)
    init = (
        jnp.full((k, 1), int(Status.RUNNING), dtype=jnp.int32),  # status
        zero_k1,                                                 # niter
        jnp.ones((k, 1), dtype=jnp.int32),                       # phase
        zero_k1,                                                 # noimprove
        jnp.full((k, 1), jnp.inf, dtype=F32),                    # best
        jnp.ones((k, 1), dtype=jnp.int32),                       # fresh
        zero_k1,                                                 # force
    )
    status, niter, phase, noimp, best, _fresh, _force = lax.while_loop(
        cond, body, init
    )
    status = jnp.where(status == RUN, jnp.int32(Status.MAX_ITER), status)
    status_out[...] = status
    niter_out[...] = niter


@functools.partial(
    jax.jit,
    static_argnames=(
        "pack", "slack0", "max_iter", "refactor_period", "feas_tol",
        "opt_tol", "pivot_tol", "bland_after", "interpret",
    ),
)
def packed_kernel_call(
    A32, b32, c32, lo32, hi32, *,
    pack, slack0, max_iter, refactor_period, feas_tol, opt_tol, pivot_tol,
    bland_after, interpret,
):
    """A32: (P, km, n); b32: (P, k, m); c/lo/hi32: (P, k, n); P = B/pack."""
    P, km, n = A32.shape
    k = pack
    m = km // k
    kern = functools.partial(
        _packed_kernel, k=k, m=m, n=n, slack0=slack0, max_iter=max_iter,
        refactor_period=refactor_period, feas_tol=feas_tol, opt_tol=opt_tol,
        pivot_tol=pivot_tol, bland_after=bland_after,
    )
    spec = lambda r, c_: pl.BlockSpec(
        (1, r, c_), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        lambda A_ref, b_ref, c_ref, lo_ref, hi_ref, bo, vo, so, no, *scr: kern(
            A_ref.at[0], b_ref.at[0], c_ref.at[0], lo_ref.at[0], hi_ref.at[0],
            bo.at[0], vo.at[0], so.at[0], no.at[0], *scr,
        ),
        grid=(P,),
        in_specs=[spec(km, n), spec(k, m), spec(k, n), spec(k, n), spec(k, n)],
        out_specs=[spec(km, 1), spec(k, n), spec(k, 1), spec(k, 1)],
        out_shape=[
            jax.ShapeDtypeStruct((P, km, 1), jnp.int32),
            jax.ShapeDtypeStruct((P, k, n), jnp.int32),
            jax.ShapeDtypeStruct((P, k, 1), jnp.int32),
            jax.ShapeDtypeStruct((P, k, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((km, km), F32),  # BD
            pltpu.VMEM((k, m), F32),    # xB
            pltpu.VMEM((k, m), F32),    # loB
            pltpu.VMEM((k, m), F32),    # hiB
            pltpu.VMEM((k, m), F32),    # cB
            pltpu.VMEM((k, n), F32),    # d
            pltpu.VMEM((k, n), F32),    # wts
        ],
        # larger packs hold several (km, km) temporaries live at once; the
        # default 16 MB scoped-VMEM budget is too tight for pack ≥ 16
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(A32, b32, c32, lo32, hi32)


def solve_batch_packed(
    A, b, c, lo, hi,
    *,
    pack: int = 8,
    slack0: int | None = None,
    max_iter: int = 2000,
    refactor_period: int = 32,
    feas_tol: float = 1e-5,
    opt_tol: float = 1e-6,
    pivot_tol: float = 1e-6,
    bland_after: int = 200,
    interpret: bool = False,
) -> PallasBatchResult:
    """Pack-k batched solve; same contract as `solve_batch_pallas`.

    B must be divisible by `pack` (callers pad or pick pack accordingly).
    """
    B, m, n = A.shape
    if B % pack != 0:
        raise ValueError(f"batch {B} not divisible by pack {pack}")
    if slack0 is None:
        slack0 = n - m
    P = B // pack
    f32 = lambda x: jnp.asarray(x, dtype=F32)
    A32 = f32(A).reshape(P, pack * m, n)
    b32 = f32(b).reshape(P, pack, m)
    c32 = f32(c).reshape(P, pack, n)
    lo32 = f32(lo).reshape(P, pack, n)
    hi32 = f32(hi).reshape(P, pack, n)

    with jax.enable_x64(False), jax.default_matmul_precision("highest"):
        out = packed_kernel_call(
            A32, b32, c32, lo32, hi32,
            pack=pack, slack0=slack0, max_iter=max_iter,
            refactor_period=refactor_period, feas_tol=feas_tol,
            opt_tol=opt_tol, pivot_tol=pivot_tol, bland_after=bland_after,
            interpret=interpret,
        )
    basis = out[0].reshape(B, m)
    vstat = out[1].reshape(B, n)
    status = out[2].reshape(B)
    niter = out[3].reshape(B)

    obj, verified, x = _verify_f64(A, b, c, lo, hi, basis, vstat, status)
    return PallasBatchResult(
        basis=basis, vstat=vstat, status=status, niter=niter,
        obj=obj, verified=verified, x=x,
    )
