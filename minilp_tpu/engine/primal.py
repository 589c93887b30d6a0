"""Two-phase bounded-variable primal revised simplex as jitted `lax.while_loop`s.

Reference analog: `Solver::optimize` / `find_initial_bfs` and the pivot machinery
(`src/solver.rs` [CODE]; SURVEY.md §4.1 call stack).  Differences are exactly the
TPU-first redesign mandated by SURVEY.md §8 Phase 1:

* The whole solve is one traced computation: unknown iteration count lives in
  `lax.while_loop`, terminal conditions are status flags (no exceptions), every
  shape is static (padding is inert by construction — see `minilp_tpu.canonical`).
* Per-iteration hot ops are dense masked vector ops and mat-vecs (pricing scan,
  FTRAN, ratio test, rank-1 PFI inverse update, pivot-row vec-mat) — no scalar
  loops, no data-dependent shapes.
* Phase 1 minimizes total bound infeasibility of the basic set with per-iteration
  composite costs σ; phase 2 runs with incrementally maintained reduced costs,
  periodically re-derived at refactorization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.pricing import choose_entering, phase1_reduced_costs, phase1_sigma
from ..ops.ratio import ratio_test
from ..options import SolverOptions
from ..status import Status, VarStat
from .basis import ftran, nonbasic_values, pfi_update, refactorize
from .state import SimplexState


def _entering_value(vstat_q, lo_q, hi_q):
    """Current value of the (non-basic) entering variable."""
    v = jnp.where(
        (vstat_q == VarStat.AT_LOWER) | (vstat_q == VarStat.FIXED), lo_q,
        jnp.where(vstat_q == VarStat.AT_UPPER, hi_q, 0.0),
    )
    return v


def make_step(A, b, c, lo, hi, opts: SolverOptions, phase1: bool):
    """Build the body of one simplex iteration for the given phase.

    Returns a function SimplexState -> SimplexState.  `phase1` is a Python-level
    static flag: the two phases trace to two specializations sharing this code.
    """
    dtype = A.dtype

    def step(state: SimplexState) -> SimplexState:
        (basis, vstat, xB, d, Binv, obj, niter, status, noimprove, best,
         weights) = state
        loB = jnp.take(lo, basis)
        hiB = jnp.take(hi, basis)
        bland = noimprove >= opts.bland_after

        if phase1:
            sigma, infeas = phase1_sigma(xB, loB, hiB, opts.feas_tol)
            dcur = phase1_reduced_costs(A, Binv, sigma, vstat)
            metric = infeas
        else:
            dcur = d
            metric = obj

        use_devex = (not phase1) and opts.pricing == "devex"
        ch = choose_entering(
            dcur, vstat, opts.opt_tol, bland,
            weights=weights if use_devex else None,
        )

        # -- no entering column: phase-1 ⇒ infeasibility is minimal and positive
        #    (the loop condition guarantees we're still infeasible) ⇒ INFEASIBLE;
        #    phase-2 ⇒ OPTIMAL.
        finished_status = jnp.int32(Status.INFEASIBLE if phase1 else Status.OPTIMAL)

        def no_entering(st: SimplexState) -> SimplexState:
            return st._replace(status=finished_status)

        def do_iteration(st: SimplexState) -> SimplexState:
            q, s = ch.q, ch.direction
            w = ftran(Binv, A[:, q])  # FTRAN: entering column in basis coords
            rng_q = hi[q] - lo[q]
            rt = ratio_test(
                w, s, xB, loB, hiB, rng_q, basis, bland,
                phase1=phase1,
                pivot_tol=opts.pivot_tol,
                feas_tol=opts.feas_tol,
                tie_rel=opts.ratio_tie_rel,
                tie_abs=opts.ratio_tie_abs,
            )
            # A genuinely unblocked ray in phase 1 cannot happen with exact
            # arithmetic (see ops/ratio.py); classify it as NUMERICAL there.
            ub_status = jnp.int32(Status.NUMERICAL if phase1 else Status.UNBOUNDED)

            def unbounded_case(s2: SimplexState) -> SimplexState:
                return s2._replace(status=ub_status)

            def flip_case(s2: SimplexState) -> SimplexState:
                # Bound flip: entering variable traverses to its opposite bound,
                # basis unchanged (`PivotInfo` with no pivot element [CODE]).
                t = rt.t
                xB2 = xB + t * (-s * w)
                new_stat = jnp.where(
                    vstat[q] == VarStat.AT_LOWER,
                    jnp.int8(VarStat.AT_UPPER),
                    jnp.int8(VarStat.AT_LOWER),
                )
                vstat2 = vstat.at[q].set(new_stat)
                obj2 = obj if phase1 else obj + dcur[q] * s * t
                return s2._replace(vstat=vstat2, xB=xB2, obj=obj2)

            def pivot_case(s2: SimplexState) -> SimplexState:
                r, t = rt.r, rt.t
                lv = basis[r]
                if not phase1:
                    # Pivot row (BTRAN of e_r against old basis, times A): needed
                    # for the incremental reduced-cost update.  With the explicit
                    # inverse, BTRAN is a row read (`calc_row_coeffs` [CODE]).
                    alpha = Binv[r] @ A
                enter_val = _entering_value(vstat[q], lo[q], hi[q]) + s * t
                xB2 = (xB + t * (-s * w)).at[r].set(enter_val)
                lstat = jnp.where(
                    loB[r] == hiB[r],
                    jnp.int8(VarStat.FIXED),
                    jnp.where(
                        rt.tgt_r == hiB[r],
                        jnp.int8(VarStat.AT_UPPER),
                        jnp.int8(VarStat.AT_LOWER),
                    ),
                )
                vstat2 = vstat.at[lv].set(lstat).at[q].set(jnp.int8(VarStat.BASIC))
                basis2 = basis.at[r].set(q)
                Binv2 = pfi_update(Binv, w, r)
                if phase1:
                    d2, obj2, weights2 = d, obj, weights
                else:
                    rd = dcur[q] / w[r]
                    d2 = dcur - rd * alpha
                    d2 = d2.at[q].set(0.0).at[lv].set(-rd)
                    d2 = jnp.where(vstat2 == VarStat.BASIC, 0.0, d2)
                    obj2 = obj + dcur[q] * s * t
                    if use_devex:
                        # Devex reference-weight update (approximate steepest
                        # edge, SURVEY.md §3.2 "Pricing"): the pivot row α is
                        # already in hand from the reduced-cost update, so the
                        # weight maintenance is one fused vector pass.
                        gq = jnp.maximum(weights[q], 1.0)
                        tcol = alpha / w[r]
                        cand = (tcol * tcol) * gq
                        w_new = jnp.maximum(weights, cand)
                        w_new = w_new.at[lv].set(
                            jnp.maximum(gq / (w[r] * w[r]), 1.0)
                        )
                        w_new = w_new.at[q].set(1.0)
                        # reference framework degraded → fresh (Dantzig-like)
                        weights2 = jnp.where(
                            gq > opts.devex_reset,
                            jnp.ones_like(w_new),
                            w_new,
                        )
                    else:
                        weights2 = weights
                return s2._replace(
                    basis=basis2, vstat=vstat2, xB=xB2, d=d2, Binv=Binv2,
                    obj=obj2, weights=weights2,
                )

            return lax.cond(
                rt.unbounded,
                unbounded_case,
                lambda st2: lax.cond(rt.flip, flip_case, pivot_case, st2),
                st,
            )

        s2 = lax.cond(ch.found, do_iteration, no_entering, state)

        # -- progress accounting (anti-cycling trigger); hoisted out of the
        #    cond branches (benign when the loop is about to exit) -------------
        eps = 1e-10 * (1.0 + jnp.where(jnp.isfinite(best), jnp.abs(best), 0.0))
        improved = metric < best - eps
        noimp2 = jnp.where(improved, 0, noimprove + 1).astype(jnp.int32)
        best2 = jnp.minimum(best, metric)
        niter2 = niter + jnp.where(ch.found, 1, 0).astype(jnp.int32)

        # -- periodic refactorization (drift cleanup) --------------------------
        do_refac = (
            ch.found
            & (niter2 % opts.refactor_period == 0)
            & (s2.status == Status.RUNNING)
        )

        def refac(s3: SimplexState) -> SimplexState:
            Binv3, xB3, d3, obj3 = refactorize(
                A, b, c, lo, hi, s3.basis, s3.vstat,
                newton_iters=opts.newton_refine_iters,
            )
            return s3._replace(Binv=Binv3, xB=xB3, d=d3, obj=obj3)

        s2 = lax.cond(do_refac, refac, lambda s3: s3, s2)
        return s2._replace(niter=niter2, noimprove=noimp2, best=best2)

    return step


def _is_feasible(xB, lo, hi, basis, feas_tol):
    loB = jnp.take(lo, basis)
    hiB = jnp.take(hi, basis)
    return jnp.all((xB >= loB - feas_tol) & (xB <= hiB + feas_tol))


def run_phase1(A, b, c, lo, hi, opts: SolverOptions, state: SimplexState, max_iter: int):
    """Drive total infeasibility of the basic set to zero (find a BFS)."""
    step = make_step(A, b, c, lo, hi, opts, phase1=True)

    def cond(st: SimplexState):
        infeasible = ~_is_feasible(st.xB, lo, hi, st.basis, opts.feas_tol)
        return (st.status == Status.RUNNING) & (st.niter < max_iter) & infeasible

    state = lax.while_loop(cond, step, state)
    # Ran out of iterations while still infeasible → MAX_ITER.
    hit_cap = (
        (state.status == Status.RUNNING)
        & (state.niter >= max_iter)
        & ~_is_feasible(state.xB, lo, hi, state.basis, opts.feas_tol)
    )
    return state._replace(
        status=jnp.where(hit_cap, jnp.int32(Status.MAX_ITER), state.status)
    )


def run_phase2(A, b, c, lo, hi, opts: SolverOptions, state: SimplexState, max_iter: int):
    """Optimize c·x from a primal-feasible state (assumes fresh reduced costs)."""
    step = make_step(A, b, c, lo, hi, opts, phase1=False)

    def cond(st: SimplexState):
        return (st.status == Status.RUNNING) & (st.niter < max_iter)

    state = lax.while_loop(cond, step, state)
    return state._replace(
        status=jnp.where(
            state.status == Status.RUNNING, jnp.int32(Status.MAX_ITER), state.status
        )
    )


def solve_canonical(
    A, b, c, lo, hi, vstat0, basis0, opts: SolverOptions
) -> SimplexState:
    """Cold solve of a canonical LP: init state → phase 1 → phase 2.

    This is the device-side equivalent of `Problem::solve` → `Solver::try_new` +
    two-phase `optimize` (SURVEY.md §4.1).  Jittable, vmappable; `opts` must be
    static under jit.
    """
    M, N = A.shape
    dtype = A.dtype
    max_iter = opts.effective_max_iter(M, N)

    Binv, xB, d, obj = refactorize(
        A, b, c, lo, hi, basis0, vstat0, newton_iters=opts.newton_refine_iters
    )
    state = SimplexState(
        basis=basis0.astype(jnp.int32),
        vstat=vstat0.astype(jnp.int8),
        xB=xB,
        d=d,
        Binv=Binv,
        obj=obj,
        niter=jnp.int32(0),
        status=jnp.int32(Status.RUNNING),
        noimprove=jnp.int32(0),
        best=jnp.array(jnp.inf, dtype=dtype),
        weights=jnp.ones_like(d),
    )

    state = run_phase1(A, b, c, lo, hi, opts, state, max_iter)

    def to_phase2(st: SimplexState) -> SimplexState:
        # Fresh reduced costs / objective / inverse at the phase transition.
        Binv2, xB2, d2, obj2 = refactorize(
            A, b, c, lo, hi, st.basis, st.vstat,
            newton_iters=opts.newton_refine_iters,
        )
        st = st._replace(
            Binv=Binv2, xB=xB2, d=d2, obj=obj2,
            noimprove=jnp.int32(0), best=jnp.array(jnp.inf, dtype=dtype),
        )
        return run_phase2(A, b, c, lo, hi, opts, st, max_iter)

    state = lax.cond(
        state.status == Status.RUNNING, to_phase2, lambda st: st, state
    )
    return state
