"""Column-sharded (tensor-parallel) revised simplex: the full solve loop with
the constraint matrix partitioned by columns across the mesh's 'model' axis.

This is the BASELINE north-star scaling mode for one *large* LP ("partitioning
columns (pricing) … argmax pricing reductions … via psum/allreduce collectives
over ICI", SURVEY.md §3.3/§6.7): each chip owns a contiguous block of columns
of A (and of c, lo, hi, d, vstat, Devex weights); row-sized state (the basis,
the maintained inverse, basic values and the maintained lo_B/hi_B/c_B) is
replicated.  Per iteration:

  * pricing: each shard scores its local columns, one (score, global index)
    pair per shard is exchanged (`collectives.argmax_with_index`) — lowest
    global index wins ties, matching single-device argmax semantics;
  * FTRAN: the entering column is assembled by a one-hot matvec on the owner's
    block and a `psum`; the B⁻¹ matvec then runs replicated;
  * the ratio test runs fully replicated (row-sized data only);
  * the pivot's O(M·N/P) work — pivot row α = B⁻¹[r]·A, reduced-cost and Devex
    updates — is local to each shard; scalar lookups (d_q, lo_q, hi_q, c_q)
    are owner-extract + psum;
  * refactorization assembles B = Σ_p A_p·onehots_pᵀ with one psum and Newton-
    refines replicated.

Communication per iteration is therefore O(P) scalars + one M-vector psum —
pure ICI latency, no bandwidth term; all O(M·N) work scales 1/P.

Determinism (SURVEY.md §5(e)): entering/leaving choices replicate exactly —
argmax/argmin tie-breaks are lowest-global-index on both the sharded and the
single-device path, and the cross-shard reductions used for CHOICES are exact
(min/max have no reduction-order sensitivity; every owner-extract psum has
exactly one nonzero term).  The one place floating-point VALUES can differ
from the single-device op in the last ulp is `refactorize`'s psum of the
over-all-columns sums A·x_N and c·x_N (partial-sum grouping differs from the
single-device dot) — after which a near-tie could break differently.  Gates:
pivot-sequence identity is asserted on random instances AND on a deliberately
degenerate all-ties instance where x_N = 0 makes even that reduction exact
(tests/test_parallel.py::test_column_sharded_degenerate_ties_deterministic).
"""

from __future__ import annotations

from functools import partial
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..options import SolverOptions
from ..status import Status, VarStat
from .collectives import argmax_with_index
from .mesh import COL_AXIS


def _shard_helpers(A_loc, b_, c_loc, lo_loc, hi_loc, M, dtype, opts):
    """Column-shard primitives shared by the primal and dual sharded loops.

    All close over this shard's column block.  Exactness notes (the basis of
    the determinism contract): `gcol` and the one-hot column/B-matrix
    assemblies psum terms of which exactly ONE shard is nonzero (each global
    column has one owner), so they are bit-exact regardless of reduction
    order.  The only reductions whose grouping differs from the single-device
    op are the sums over ALL columns inside `refactorize` (A·x_N, c·x_N) —
    see the module docstring's determinism paragraph.
    """
    n_loc = A_loc.shape[1]
    offset = lax.axis_index(COL_AXIS) * n_loc
    gid = offset + jnp.arange(n_loc, dtype=jnp.int32)  # global col ids

    def psum(x):
        return lax.psum(x, COL_AXIS)

    def gcol(vec_loc, q, zero=0.0):
        """Global scalar vec[q] from a column-sharded vector."""
        owns = (q >= offset) & (q < offset + n_loc)
        idx = jnp.clip(q - offset, 0, n_loc - 1)
        v = jnp.where(owns, vec_loc[idx], jnp.asarray(zero, vec_loc.dtype))
        return psum(v)

    def gbound(bound_loc, q, sign):
        """Global lo/hi scalar at q with ±inf handling (sign: -1 lo, +1 hi)."""
        fin = jnp.isfinite(bound_loc)
        v = gcol(jnp.where(fin, bound_loc, 0.0), q)
        return jnp.where(
            gcol(fin.astype(dtype), q) > 0, v, sign * jnp.inf
        )

    def nonbasic_x_loc(vstat_loc):
        x = jnp.where(vstat_loc == VarStat.AT_LOWER, lo_loc, 0.0)
        x = jnp.where(vstat_loc == VarStat.AT_UPPER, hi_loc, x)
        x = jnp.where(vstat_loc == VarStat.FIXED, lo_loc, x)
        return x

    def gather_scalar_cols(basis):
        """Replicated (lo_B, hi_B, c_B) via one-hot matmuls + psum."""
        onehots = (gid[None, :] == basis[:, None]).astype(dtype)  # (M, n_loc)
        loB = psum(onehots @ jnp.where(jnp.isfinite(lo_loc), lo_loc, 0.0))
        loB = jnp.where(psum(onehots @ jnp.isfinite(lo_loc).astype(dtype)) > 0,
                        loB, -jnp.inf)
        hiB = psum(onehots @ jnp.where(jnp.isfinite(hi_loc), hi_loc, 0.0))
        hiB = jnp.where(psum(onehots @ jnp.isfinite(hi_loc).astype(dtype)) > 0,
                        hiB, jnp.inf)
        cB = psum(onehots @ c_loc)
        return loB, hiB, cB

    def refactorize(basis, vstat_loc, Binv_seed):
        onehots = (gid[None, :] == basis[:, None]).astype(dtype)
        Bmat = psum(A_loc @ onehots.T)                    # (M, M)
        eye = jnp.eye(M, dtype=dtype)
        X = Binv_seed
        R = eye - Bmat @ X
        ok = jnp.max(jnp.abs(R)) < 0.5
        for _ in range(max(opts.newton_refine_iters, 1)):
            X = X + X @ R
            R = eye - Bmat @ X
        xN = nonbasic_x_loc(vstat_loc)
        rhs_eff = b_ - psum(A_loc @ xN)
        xB = X @ rhs_eff
        loB, hiB, cB = gather_scalar_cols(basis)
        y = cB @ X
        d_loc = c_loc - y @ A_loc
        d_loc = jnp.where(vstat_loc == VarStat.BASIC, 0.0, d_loc)
        obj = cB @ xB + psum(c_loc @ xN)
        return X, xB, d_loc, loB, hiB, cB, obj, ok

    return SimpleNamespace(
        n_loc=n_loc, offset=offset, gid=gid, psum=psum, gcol=gcol,
        gbound=gbound, nonbasic_x_loc=nonbasic_x_loc,
        gather_scalar_cols=gather_scalar_cols, refactorize=refactorize,
    )


def solve_canonical_sharded(
    mesh, A, b, c, lo, hi, vstat0, basis0, opts: SolverOptions
):
    """Cold solve with columns of A sharded over the mesh 'model' axis.

    Same contract as `engine.primal.solve_canonical` (returns a dict of final
    basis/vstat/obj/niter/status; the full SimplexState pytree is not exposed
    because d/vstat live sharded).  N must divide evenly by the axis size.
    """
    M, N = A.shape
    n_shards = mesh.shape[COL_AXIS]
    if N % n_shards:
        raise ValueError(f"N={N} not divisible by model axis {n_shards}")
    dtype = A.dtype
    max_iter = opts.effective_max_iter(M, N)
    use_devex = opts.pricing == "devex"

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, COL_AXIS),  # A
            P(),                # b
            P(COL_AXIS),        # c
            P(COL_AXIS),        # lo
            P(COL_AXIS),        # hi
            P(COL_AXIS),        # vstat0
            P(),                # basis0
        ),
        out_specs=(P(), P(COL_AXIS), P(), P(), P(),
                   P(), P(), P(COL_AXIS), P(COL_AXIS)),
        check_vma=False,
    )
    def run(A_loc, b_, c_loc, lo_loc, hi_loc, vstat_loc0, basis_0):
        H = _shard_helpers(A_loc, b_, c_loc, lo_loc, hi_loc, M, dtype, opts)
        n_loc, offset, gid = H.n_loc, H.offset, H.gid
        psum, gcol, refactorize = H.psum, H.gcol, H.refactorize

        # ---- initial state --------------------------------------------------
        Binv0, xB0, d0, loB0, hiB0, cB0, obj0, _ok = refactorize(
            basis_0.astype(jnp.int32), vstat_loc0.astype(jnp.int8),
            jnp.eye(M, dtype=dtype),
        )
        state0 = dict(
            basis=basis_0.astype(jnp.int32), vstat=vstat_loc0.astype(jnp.int8),
            xB=xB0, d=d0, Binv=Binv0, loB=loB0, hiB=hiB0, cB=cB0, obj=obj0,
            weights=jnp.ones_like(d0),
            niter=jnp.int32(0), status=jnp.int32(Status.RUNNING),
            phase=jnp.int32(1), noimp=jnp.int32(0),
            best=jnp.array(jnp.inf, dtype=dtype),
        )

        def cond(st):
            return (st["status"] == Status.RUNNING) & (st["niter"] < max_iter)

        def body(st):
            basis, vstat, xB = st["basis"], st["vstat"], st["xB"]
            loB, hiB, cB = st["loB"], st["hiB"], st["cB"]
            Binv, d_loc = st["Binv"], st["d"]
            weights = st["weights"]

            # phase transition + periodic refresh (replicated decision)
            below = xB < loB - opts.feas_tol
            above = xB > hiB + opts.feas_tol
            feasible = ~jnp.any(below | above)
            transition = (st["phase"] == 1) & feasible
            phase = jnp.where(transition, 2, st["phase"]).astype(jnp.int32)
            do_refresh = transition | (
                (st["niter"] > 0)
                & (st["niter"] % opts.effective_refactor_period() == 0)
            )

            def do_ref(_):
                X, xB2, d2, loB2, hiB2, cB2, obj2, ok = refactorize(
                    basis, vstat, Binv
                )
                return X, xB2, d2, loB2, hiB2, cB2, obj2, ok

            def no_ref(_):
                return (Binv, xB, d_loc, loB, hiB, cB, st["obj"],
                        jnp.bool_(True))

            Binv2, xB2, d2, loB2, hiB2, cB2, obj2, ok = lax.cond(
                do_refresh, do_ref, no_ref, None
            )
            status = jnp.where(ok, st["status"], jnp.int32(Status.NUMERICAL))

            below = xB2 < loB2 - opts.feas_tol
            above = xB2 > hiB2 + opts.feas_tol
            sigma = jnp.where(below, -1.0, jnp.where(above, 1.0, 0.0)).astype(dtype)
            infeas = jnp.sum(jnp.maximum(loB2 - xB2, 0.0)
                             + jnp.maximum(xB2 - hiB2, 0.0))
            p1 = phase == 1

            d_use = lax.cond(
                p1,
                lambda: jnp.where(
                    vstat == VarStat.BASIC, 0.0, -((sigma @ Binv2) @ A_loc)
                ),
                lambda: d2,
            )
            metric = jnp.where(p1, infeas, obj2)

            # ---- pricing: local candidates + cross-shard argmax -------------
            bland = st["noimp"] >= opts.bland_after
            can_up = (vstat == VarStat.AT_LOWER) | (vstat == VarStat.FREE)
            can_dn = (vstat == VarStat.AT_UPPER) | (vstat == VarStat.FREE)
            elig = (can_up & (d_use < -opts.opt_tol)) | (
                can_dn & (d_use > opts.opt_tol)
            )
            gam = jnp.maximum(weights, 1e-12) if use_devex else jnp.ones_like(d_use)
            gam = jnp.where(p1, jnp.ones_like(gam), gam)
            score = jnp.where(elig, d_use * d_use / gam, -jnp.inf)
            j_loc = jnp.argmax(score).astype(jnp.int32)
            sc_dantzig = score[j_loc]
            idx = jnp.arange(n_loc, dtype=jnp.int32)
            jb_loc = jnp.argmin(jnp.where(elig, idx, n_loc)).astype(jnp.int32)
            sc_bland = jnp.where(
                jnp.any(elig), -(offset + jb_loc).astype(dtype), -jnp.inf
            )
            local_j = jnp.where(bland, jb_loc, j_loc)
            local_score = jnp.where(bland, sc_bland, sc_dantzig)
            best_sc, q = argmax_with_index(
                local_score, (offset + local_j).astype(jnp.int32), COL_AXIS
            )
            found = best_sc > -jnp.inf
            dq = gcol(d_use, q)
            s = jnp.where(dq < 0, 1.0, -1.0).astype(dtype)
            lo_q = gcol(jnp.where(jnp.isfinite(lo_loc), lo_loc, 0.0), q)
            lo_q = jnp.where(gcol(jnp.isfinite(lo_loc).astype(dtype), q) > 0,
                             lo_q, -jnp.inf)
            hi_q = gcol(jnp.where(jnp.isfinite(hi_loc), hi_loc, 0.0), q)
            hi_q = jnp.where(gcol(jnp.isfinite(hi_loc).astype(dtype), q) > 0,
                             hi_q, jnp.inf)
            c_q = gcol(c_loc, q)
            vq = gcol(vstat.astype(jnp.int32), q, zero=0)

            # ---- FTRAN: owner-assembled entering column + replicated matvec --
            onehot_q = (gid == q).astype(dtype)
            Acol = psum(A_loc @ onehot_q)
            w = Binv2 @ Acol

            # ---- ratio test (replicated; unified phase rule) -----------------
            delta = -s * w
            up = delta > opts.pivot_tol
            dn = delta < -opts.pivot_tol
            up_tgt = jnp.where(below, loB2, hiB2)
            dn_tgt = jnp.where(above, hiB2, loB2)
            up_ok = ~above
            dn_ok = ~below
            tgt = jnp.where(up, up_tgt, jnp.where(dn, dn_tgt, 0.0))
            blockable = ((up & up_ok) | (dn & dn_ok)) & jnp.isfinite(tgt)
            ratio = jnp.where(
                blockable,
                (tgt - xB2) / jnp.where(up | dn, delta, 1.0),
                jnp.inf,
            )
            ratio = jnp.maximum(ratio, 0.0)
            t_rows = jnp.min(ratio)

            # long-step phase-1 extension — verbatim mirror of
            # ops/ratio.py's (the replicated row-sized data makes it
            # shard-invariant; the niter-parity gates depend on the mirror)
            safe_delta = jnp.where(up | dn, delta, 1.0)
            inf_ = jnp.asarray(jnp.inf, dtype=w.dtype)
            sigma_ls = jnp.where(
                below, -1.0, jnp.where(above, 1.0, 0.0)
            ).astype(w.dtype)
            slope0 = jnp.sum(sigma_ls * delta)
            e1_ok = (up & below) | (dn & above)
            e1_tgt = jnp.where(up, loB2, hiB2)
            e1_w = jnp.abs(jnp.where(e1_ok, delta, 0.0))
            e1_t = jnp.where(
                e1_ok, jnp.maximum((e1_tgt - xB2) / safe_delta, 0.0), inf_
            )
            e2_ok = ((up & ~above & jnp.isfinite(hiB2))
                     | (dn & ~below & jnp.isfinite(loB2)))
            e2_tgt = jnp.where(up, hiB2, loB2)
            e2_w = jnp.abs(jnp.where(e2_ok, delta, 0.0))
            e2_t = jnp.where(
                e2_ok, jnp.maximum((e2_tgt - xB2) / safe_delta, 0.0), inf_
            )
            ev_t = jnp.concatenate([e1_t, e2_t])
            ev_w = jnp.concatenate([e1_w, e2_w])
            ev_tgt = jnp.concatenate([e1_tgt, e2_tgt])
            rows_ls = jnp.arange(xB2.shape[0], dtype=jnp.int32)
            ev_row = jnp.concatenate([rows_ls, rows_ls])
            order = jnp.argsort(ev_t, stable=True)
            csl = slope0 + jnp.cumsum(ev_w[order])
            crossed = (csl >= 0.0) & jnp.isfinite(ev_t[order])
            k_ls = jnp.argmax(crossed)
            has_cross = (slope0 < 0.0) & jnp.any(crossed)
            sel_ls = order[k_ls]
            use_ls = has_cross & ~bland
            t_ls = ev_t[sel_ls]
            r_ls = ev_row[sel_ls]
            tgt_ls = ev_tgt[sel_ls]
            t_rows = jnp.where(
                (slope0 < 0.0) & ~bland,
                jnp.where(has_cross, t_ls, inf_), t_rows,
            )

            tie = ratio <= t_rows * (1 + opts.ratio_tie_rel) + opts.ratio_tie_abs
            r_stab = jnp.argmax(jnp.where(tie, jnp.abs(w), -jnp.inf)).astype(jnp.int32)
            big = jnp.int32(jnp.iinfo(jnp.int32).max)
            r_bland = jnp.argmin(jnp.where(tie, basis, big)).astype(jnp.int32)
            r = jnp.where(bland, r_bland, r_stab)
            rng_q = hi_q - lo_q
            flip = rng_q <= t_rows
            unbounded = ~jnp.isfinite(jnp.minimum(t_rows, rng_q))
            t = jnp.where(flip, rng_q, ratio[r])
            r = jnp.where(use_ls, r_ls, r)
            t = jnp.where(flip, rng_q, jnp.where(use_ls, t_ls, t))

            do_pivot = found & ~flip & ~unbounded
            do_flip = found & flip & ~unbounded

            # ---- apply -------------------------------------------------------
            enter_base = jnp.where(
                (vq == VarStat.AT_LOWER) | (vq == VarStat.FIXED), lo_q,
                jnp.where(vq == VarStat.AT_UPPER, hi_q, 0.0),
            )
            lv = basis[r]
            tgt_r = jnp.where(use_ls, tgt_ls, tgt[r])
            lstat = jnp.where(
                loB2[r] == hiB2[r], jnp.int8(VarStat.FIXED),
                jnp.where(tgt_r == hiB2[r], jnp.int8(VarStat.AT_UPPER),
                          jnp.int8(VarStat.AT_LOWER)),
            )
            xB_flip = xB2 + t * delta
            vstat_flip = jnp.where(
                gid == q,
                jnp.where(vstat == VarStat.AT_LOWER,
                          jnp.int8(VarStat.AT_UPPER),
                          jnp.int8(VarStat.AT_LOWER)),
                vstat,
            )
            # pivot updates
            wr = w[r]
            pr = Binv2[r] / wr
            Binv_piv = (Binv2 - jnp.outer(w, pr)).at[r].set(pr)
            x_enter = enter_base + s * t
            xB_piv = (xB2 + t * delta).at[r].set(x_enter)
            basis_piv = basis.at[r].set(q)
            vstat_piv = jnp.where(gid == lv, lstat, vstat)
            vstat_piv = jnp.where(gid == q, jnp.int8(VarStat.BASIC), vstat_piv)
            loB_piv = loB2.at[r].set(lo_q)
            hiB_piv = hiB2.at[r].set(hi_q)
            cB_piv = cB2.at[r].set(c_q)
            alpha_loc = Binv2[r] @ A_loc          # local O(M·N/P)
            rd = dq / wr
            d_piv = d2 - rd * alpha_loc
            d_piv = jnp.where(gid == q, 0.0, d_piv)
            d_piv = jnp.where(gid == lv, -rd, d_piv)
            d_piv = jnp.where(vstat_piv == VarStat.BASIC, 0.0, d_piv)
            if use_devex:
                gq = jnp.maximum(gcol(weights, q), 1.0)
                tcol = alpha_loc / wr
                w_new = jnp.maximum(weights, (tcol * tcol) * gq)
                w_new = jnp.where(gid == lv, jnp.maximum(gq / (wr * wr), 1.0), w_new)
                w_new = jnp.where(gid == q, 1.0, w_new)
                w_new = jnp.where(gq > opts.devex_reset, jnp.ones_like(w_new), w_new)
            else:
                w_new = weights
            obj_piv = obj2 + dq * s * t

            # ---- select ------------------------------------------------------
            p2_piv = do_pivot & ~p1
            out = dict(st)
            out["basis"] = jnp.where(do_pivot, basis_piv, basis)
            out["vstat"] = jnp.where(
                do_pivot, vstat_piv, jnp.where(do_flip, vstat_flip, vstat)
            )
            out["xB"] = jnp.where(do_pivot, xB_piv,
                                  jnp.where(do_flip, xB_flip, xB2))
            out["Binv"] = jnp.where(do_pivot, Binv_piv, Binv2)
            out["loB"] = jnp.where(do_pivot, loB_piv, loB2)
            out["hiB"] = jnp.where(do_pivot, hiB_piv, hiB2)
            out["cB"] = jnp.where(do_pivot, cB_piv, cB2)
            out["d"] = jnp.where(p2_piv, d_piv, d2)
            out["weights"] = jnp.where(p2_piv, w_new, weights)
            out["obj"] = jnp.where(
                do_pivot & ~p1, obj_piv,
                jnp.where(do_flip & ~p1, obj2 + dq * s * t, obj2),
            )
            out["phase"] = phase
            status2 = jnp.where(
                found,
                jnp.where(
                    unbounded,
                    jnp.where(p1, jnp.int32(Status.NUMERICAL),
                              jnp.int32(Status.UNBOUNDED)),
                    status,
                ),
                jnp.where(p1, jnp.int32(Status.INFEASIBLE),
                          jnp.int32(Status.OPTIMAL)),
            )
            out["status"] = jnp.where(
                status == Status.RUNNING, status2, status
            )
            out["niter"] = st["niter"] + jnp.where(found, 1, 0).astype(jnp.int32)
            eps = 1e-10 * (1.0 + jnp.where(jnp.isfinite(st["best"]),
                                           jnp.abs(st["best"]), 0.0))
            improved = metric < st["best"] - eps
            out["noimp"] = jnp.where(improved, 0, st["noimp"] + 1).astype(jnp.int32)
            out["best"] = jnp.minimum(st["best"], metric)
            return out

        final = lax.while_loop(cond, body, state0)
        status = jnp.where(
            final["status"] == Status.RUNNING,
            jnp.int32(Status.MAX_ITER), final["status"],
        )
        return (final["basis"], final["vstat"], final["obj"], final["niter"],
                status, final["Binv"], final["xB"], final["d"],
                final["weights"])

    basis, vstat, obj, niter, status, Binv, xB, d, weights = run(
        jax.device_put(A, NamedSharding(mesh, P(None, COL_AXIS))),
        b, c, lo, hi, vstat0, basis0,
    )
    return {
        "basis": basis, "vstat": vstat, "obj": obj,
        "niter": niter, "status": status,
        # warm-start handoff (SURVEY.md §4.2, distributed): the maintained
        # inverse + basic values (replicated) and reduced costs / Devex
        # weights (column-sharded global arrays) seed `resolve_dual_sharded`
        # after a problem edit — no cold restart, no host round-trip needed.
        "Binv": Binv, "xB": xB, "d": d, "weights": weights,
    }


def resolve_dual_sharded(
    mesh, A, b, c, lo, hi, basis0, vstat0, Binv0, opts: SolverOptions
):
    """Column-sharded dual simplex warm restart (`engine.dual.resolve_dual`,
    distributed).

    The incremental edits (`add_constraint` / `fix_var` / Gomory cuts,
    SURVEY.md §4.2) keep the basis dual feasible; this runs the same
    restore-primal-feasibility loop as the single-device dual engine with the
    columns of A (and d, vstat) partitioned over the mesh 'model' axis:

      * leaving row: replicated (row-sized data only) — exact dual steepest
        edge from the replicated inverse's row norms;
      * pivot row α = B⁻¹[r]·A: each shard computes its local O(M·N/P) slice;
      * dual ratio test: local Harris two-pass candidates, global step bounds
        via `pmin` (exact — min has no reduction-order sensitivity), entering
        column via the deterministic lowest-index `argmax_with_index`;
      * bound flip (entering step clamped at its own range) exactly as in
        `engine/dual.py` — flip updates are elementwise/replicated;
      * PFI inverse update replicated; reduced-cost update local.

    Inputs `vstat0` is the FULL (N,) vector and `Binv0` the maintained (M, M)
    inverse from a previous sharded (or single-device) solve.  Returns the
    same dict shape as `solve_canonical_sharded`, warm state included.
    """
    M, N = A.shape
    n_shards = mesh.shape[COL_AXIS]
    if N % n_shards:
        raise ValueError(f"N={N} not divisible by model axis {n_shards}")
    dtype = A.dtype
    max_iter = opts.effective_max_iter(M, N)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, COL_AXIS),  # A
            P(),                # b
            P(COL_AXIS),        # c
            P(COL_AXIS),        # lo
            P(COL_AXIS),        # hi
            P(COL_AXIS),        # vstat0
            P(),                # basis0
            P(),                # Binv0
        ),
        out_specs=(P(), P(COL_AXIS), P(), P(), P(),
                   P(), P(), P(COL_AXIS), P(COL_AXIS)),
        check_vma=False,
    )
    def run(A_loc, b_, c_loc, lo_loc, hi_loc, vstat_loc0, basis_0, Binv_seed):
        H = _shard_helpers(A_loc, b_, c_loc, lo_loc, hi_loc, M, dtype, opts)
        n_loc, gid = H.n_loc, H.gid
        psum, gcol, gbound, refactorize = H.psum, H.gcol, H.gbound, H.refactorize

        def pmin(x):
            return -lax.pmax(-x, COL_AXIS)

        Binv1, xB1, d1, loB1, hiB1, cB1, obj1, ok = refactorize(
            basis_0.astype(jnp.int32), vstat_loc0.astype(jnp.int8), Binv_seed
        )
        state0 = dict(
            basis=basis_0.astype(jnp.int32),
            vstat=vstat_loc0.astype(jnp.int8),
            xB=xB1, d=d1, Binv=Binv1, loB=loB1, hiB=hiB1, cB=cB1, obj=obj1,
            niter=jnp.int32(0),
            status=jnp.where(ok, jnp.int32(Status.RUNNING),
                             jnp.int32(Status.NUMERICAL)),
            noimp=jnp.int32(0), best=jnp.array(jnp.inf, dtype=dtype),
        )

        def cond(st):
            return (st["status"] == Status.RUNNING) & (st["niter"] < max_iter)

        def body(st):
            basis, vstat, xB = st["basis"], st["vstat"], st["xB"]
            loB, hiB, cB = st["loB"], st["hiB"], st["cB"]
            Binv, d_loc = st["Binv"], st["d"]
            bland = st["noimp"] >= opts.bland_after

            # -- leaving row: exact dual steepest edge (replicated) -----------
            viol_lo = jnp.maximum(loB - xB, 0.0)
            viol_hi = jnp.maximum(xB - hiB, 0.0)
            viol = viol_lo + viol_hi
            row_norm2 = jnp.maximum(jnp.sum(Binv * Binv, axis=1), 1e-12)
            r = jnp.argmax((viol * viol) / row_norm2).astype(jnp.int32)
            max_viol = jnp.max(viol)
            feasible = max_viol <= opts.feas_tol
            e = jnp.where(viol_lo[r] > 0, 1.0, -1.0).astype(dtype)
            target = jnp.where(e > 0, loB[r], hiB[r])

            # -- pivot row + dual ratio test (local columns) ------------------
            alpha_loc = Binv[r] @ A_loc
            at = e * alpha_loc
            elig = (
                ((vstat == VarStat.AT_LOWER) & (at < -opts.pivot_tol))
                | ((vstat == VarStat.AT_UPPER) & (at > opts.pivot_tol))
                | ((vstat == VarStat.FREE)
                   & (jnp.abs(at) > opts.pivot_tol))
            )
            abs_a = jnp.abs(alpha_loc)
            theta = jnp.where(elig, jnp.abs(d_loc) / abs_a, jnp.inf)
            theta_min = pmin(jnp.min(theta))            # exact global min
            relaxed = jnp.where(
                elig, (jnp.abs(d_loc) + opts.opt_tol) / abs_a, jnp.inf
            )
            t_relaxed = pmin(jnp.min(relaxed))
            tie = elig & (
                (theta <= t_relaxed)
                | (theta <= theta_min * (1.0 + opts.ratio_tie_rel)
                   + opts.ratio_tie_abs)
            )
            any_elig = psum(jnp.sum(elig.astype(jnp.int32))) > 0
            # stability pick: largest |α| in the tie set, lowest-index ties;
            # Bland: lowest eligible global index (score = −index)
            sc_stab = jnp.where(tie, abs_a, -jnp.inf)
            j_stab = jnp.argmax(sc_stab).astype(jnp.int32)
            idx = jnp.arange(n_loc, dtype=jnp.int32)
            j_bland = jnp.argmin(jnp.where(tie, idx, n_loc)).astype(jnp.int32)
            sc_bland = jnp.where(
                jnp.any(tie), -(gid[j_bland]).astype(dtype), -jnp.inf
            )
            j_loc = jnp.where(bland, j_bland, j_stab)
            score = jnp.where(bland, sc_bland, sc_stab[j_stab])
            _best, q = argmax_with_index(score, gid[j_loc], COL_AXIS)

            # -- gathered entering scalars ------------------------------------
            dq = gcol(d_loc, q)
            alpha_q = gcol(alpha_loc, q)
            lo_q = gbound(lo_loc, q, -1.0)
            hi_q = gbound(hi_loc, q, +1.0)
            c_q = gcol(c_loc, q)
            vq = gcol(vstat.astype(jnp.int32), q, zero=0)
            dq_step = (xB[r] - target) / jnp.where(alpha_q == 0, 1.0, alpha_q)
            onehot_q = (gid == q).astype(dtype)
            Acol = psum(A_loc @ onehot_q)
            w = Binv @ Acol

            # -- bound flip vs basis exchange (mirrors engine/dual.py) --------
            rng_q = hi_q - lo_q
            flip = rng_q <= jnp.abs(dq_step)
            step_f = jnp.sign(dq_step) * rng_q
            xB_f = xB - step_f * w
            vstat_f = jnp.where(
                gid == q,
                jnp.where(vstat == VarStat.AT_LOWER,
                          jnp.int8(VarStat.AT_UPPER),
                          jnp.int8(VarStat.AT_LOWER)),
                vstat,
            )
            obj_f = st["obj"] + dq * step_f

            enter_base = jnp.where(
                (vq == VarStat.AT_LOWER) | (vq == VarStat.FIXED), lo_q,
                jnp.where(vq == VarStat.AT_UPPER, hi_q, 0.0),
            )
            enter_val = enter_base + dq_step
            xB2 = (xB - dq_step * w).at[r].set(enter_val)
            lv = basis[r]
            lstat = jnp.where(
                loB[r] == hiB[r], jnp.int8(VarStat.FIXED),
                jnp.where(e > 0, jnp.int8(VarStat.AT_LOWER),
                          jnp.int8(VarStat.AT_UPPER)),
            )
            vstat2 = jnp.where(gid == lv, lstat, vstat)
            vstat2 = jnp.where(gid == q, jnp.int8(VarStat.BASIC), vstat2)
            basis2 = basis.at[r].set(q)
            wr = jnp.where(w[r] == 0, 1.0, w[r])
            pr = Binv[r] / wr
            Binv2 = (Binv - jnp.outer(w, pr)).at[r].set(pr)
            delta_dual = dq / jnp.where(alpha_q == 0, 1.0, alpha_q)
            d2 = d_loc - delta_dual * alpha_loc
            d2 = jnp.where(gid == q, 0.0, d2)
            d2 = jnp.where(gid == lv, -delta_dual, d2)
            d2 = jnp.where(vstat2 == VarStat.BASIC, 0.0, d2)
            obj2 = st["obj"] + dq * dq_step
            loB2 = loB.at[r].set(lo_q)
            hiB2 = hiB.at[r].set(hi_q)
            cB2 = cB.at[r].set(c_q)

            # -- select: feasible → OPTIMAL; no entering → INFEASIBLE ---------
            took = ~feasible & any_elig
            do_flip = took & flip
            do_piv = took & ~flip
            out = dict(st)
            out["basis"] = jnp.where(do_piv, basis2, basis)
            out["vstat"] = jnp.where(
                do_piv, vstat2, jnp.where(do_flip, vstat_f, vstat)
            )
            out["xB"] = jnp.where(do_piv, xB2, jnp.where(do_flip, xB_f, xB))
            out["d"] = jnp.where(do_piv, d2, d_loc)
            out["Binv"] = jnp.where(do_piv, Binv2, Binv)
            out["obj"] = jnp.where(
                do_piv, obj2, jnp.where(do_flip, obj_f, st["obj"])
            )
            out["loB"] = jnp.where(do_piv, loB2, loB)
            out["hiB"] = jnp.where(do_piv, hiB2, hiB)
            out["cB"] = jnp.where(do_piv, cB2, cB)
            status2 = jnp.where(
                feasible, jnp.int32(Status.OPTIMAL),
                jnp.where(any_elig, st["status"],
                          jnp.int32(Status.INFEASIBLE)),
            )
            out["status"] = jnp.where(
                st["status"] == Status.RUNNING, status2, st["status"]
            )
            niter2 = st["niter"] + jnp.where(took, 1, 0).astype(jnp.int32)
            out["niter"] = niter2

            # -- progress tracking + periodic refactorization ------------------
            eps = 1e-10 * (1.0 + jnp.where(jnp.isfinite(st["best"]),
                                           jnp.abs(st["best"]), 0.0))
            improved = max_viol < st["best"] - eps
            out["noimp"] = jnp.where(improved, 0,
                                     st["noimp"] + 1).astype(jnp.int32)
            out["best"] = jnp.minimum(st["best"], max_viol)
            do_refac = (
                took & (niter2 % opts.effective_refactor_period() == 0)
                & (out["status"] == Status.RUNNING)
            )

            def refac(s3):
                Binv3, xB3, d3, loB3, hiB3, cB3, obj3, ok3 = refactorize(
                    s3["basis"], s3["vstat"], s3["Binv"]
                )
                s4 = dict(s3)
                s4.update(Binv=Binv3, xB=xB3, d=d3, loB=loB3, hiB=hiB3,
                          cB=cB3, obj=obj3,
                          status=jnp.where(ok3, s3["status"],
                                           jnp.int32(Status.NUMERICAL)))
                return s4

            return lax.cond(do_refac, refac, lambda s3: s3, out)

        final = lax.while_loop(cond, body, state0)
        status = jnp.where(
            final["status"] == Status.RUNNING,
            jnp.int32(Status.MAX_ITER), final["status"],
        )
        return (final["basis"], final["vstat"], final["obj"], final["niter"],
                status, final["Binv"], final["xB"], final["d"],
                jnp.ones_like(final["d"]))

    basis, vstat, obj, niter, status, Binv, xB, d, weights = run(
        jax.device_put(A, NamedSharding(mesh, P(None, COL_AXIS))),
        b, c, lo, hi, vstat0, basis0, Binv0,
    )
    return {
        "basis": basis, "vstat": vstat, "obj": obj,
        "niter": niter, "status": status,
        "Binv": Binv, "xB": xB, "d": d, "weights": weights,
    }
