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

Determinism: entering/leaving choices replicate exactly (same inputs, same
tie-breaks).  Floating-point sums reduced with `psum` can differ from the
single-device op order in the last ulp, so the *pivot sequence* is identical
in practice on non-degenerate instances (asserted by tests) but is not a
bitwise guarantee under ties.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..options import SolverOptions
from ..status import Status, VarStat
from .collectives import argmax_with_index
from .mesh import COL_AXIS


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
        out_specs=(P(), P(COL_AXIS), P(), P(), P()),
        check_vma=False,
    )
    def run(A_loc, b_, c_loc, lo_loc, hi_loc, vstat_loc0, basis_0):
        n_loc = A_loc.shape[1]
        offset = jax.lax.axis_index(COL_AXIS) * n_loc
        gid = offset + jnp.arange(n_loc, dtype=jnp.int32)  # global col ids

        def psum(x):
            return jax.lax.psum(x, COL_AXIS)

        def gcol(vec_loc, q, zero=0.0):
            """Global scalar vec[q] from a column-sharded vector."""
            owns = (q >= offset) & (q < offset + n_loc)
            idx = jnp.clip(q - offset, 0, n_loc - 1)
            v = jnp.where(owns, vec_loc[idx], jnp.asarray(zero, vec_loc.dtype))
            return psum(v)

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
                & (st["niter"] % opts.refactor_period == 0)
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
            tie = ratio <= t_rows * (1 + opts.ratio_tie_rel) + opts.ratio_tie_abs
            r_stab = jnp.argmax(jnp.where(tie, jnp.abs(w), -jnp.inf)).astype(jnp.int32)
            big = jnp.int32(jnp.iinfo(jnp.int32).max)
            r_bland = jnp.argmin(jnp.where(tie, basis, big)).astype(jnp.int32)
            r = jnp.where(bland, r_bland, r_stab)
            rng_q = hi_q - lo_q
            flip = rng_q <= t_rows
            unbounded = ~jnp.isfinite(jnp.minimum(t_rows, rng_q))
            t = jnp.where(flip, rng_q, ratio[r])

            do_pivot = found & ~flip & ~unbounded
            do_flip = found & flip & ~unbounded

            # ---- apply -------------------------------------------------------
            enter_base = jnp.where(
                (vq == VarStat.AT_LOWER) | (vq == VarStat.FIXED), lo_q,
                jnp.where(vq == VarStat.AT_UPPER, hi_q, 0.0),
            )
            lv = basis[r]
            lstat = jnp.where(
                loB2[r] == hiB2[r], jnp.int8(VarStat.FIXED),
                jnp.where(tgt[r] == hiB2[r], jnp.int8(VarStat.AT_UPPER),
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
        return final["basis"], final["vstat"], final["obj"], final["niter"], status

    basis, vstat, obj, niter, status = run(
        jax.device_put(A, NamedSharding(mesh, P(None, COL_AXIS))),
        b, c, lo, hi, vstat0, basis0,
    )
    return {
        "basis": basis, "vstat": vstat, "obj": obj,
        "niter": niter, "status": status,
    }
