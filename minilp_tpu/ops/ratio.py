"""Ratio test: choose the leaving row (or a bound flip, or detect unboundedness).

Reference analog: `choose_leaving_row` (`src/solver.rs` [CODE]; SURVEY.md §3.2
"Ratio test": textbook bounded-variable primal ratio test with an absolute
epsilon guard on pivot magnitude).  Reference is a scalar Rust loop; here it is
one masked vector pass + two masked reductions — the "vectorized Pallas ratio
test" subsystem called out in BASELINE's north star.

Semantics reproduced:
  * Bounded-variable rules: the entering variable moving by t ≥ 0 in direction
    s changes basic values by t·δ with δ = −s·w (w = FTRAN'd column).  A basic
    row blocks at the bound it approaches; the entering variable itself blocks
    at its opposite bound (a *bound flip*, `PivotInfo` with optional pivot elem
    [CODE]).
  * Phase-1 extension: a basic variable that is currently infeasible blocks at
    the violated bound it is moving *toward* (it becomes feasible there); its
    phase-1 cost changes at that breakpoint, so stopping there keeps the
    infeasibility decrease monotone.
  * Pivot-magnitude guard: rows with |δ| ≤ pivot_tol never block.
  * Tie-breaking: among ratios within a small window of the minimum, prefer the
    largest |w_r| (numerical stability); under Bland's rule, the lowest basic
    variable index (anti-cycling).  Both are deterministic.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RatioResult(NamedTuple):
    flip: jnp.ndarray       # () bool — entering variable flips to opposite bound
    unbounded: jnp.ndarray  # () bool — nothing blocks: ray of descent
    r: jnp.ndarray          # () int32 — leaving row (valid when not flip/unbounded)
    t: jnp.ndarray          # () f — step length
    tgt_r: jnp.ndarray      # () f — bound value the leaving variable lands on


def ratio_test(
    w: jnp.ndarray,
    s: jnp.ndarray,
    xB: jnp.ndarray,
    loB: jnp.ndarray,
    hiB: jnp.ndarray,
    rng_q: jnp.ndarray,
    basis: jnp.ndarray,
    bland: jnp.ndarray,
    *,
    phase1: bool,
    pivot_tol: float,
    feas_tol: float,
    tie_rel: float,
    tie_abs: float,
) -> RatioResult:
    M = w.shape[0]
    dtype = w.dtype
    delta = -s * w
    up = delta > pivot_tol
    dn = delta < -pivot_tol

    if phase1:
        # Infeasible-below rows moving up stop at their lower bound (feasibility
        # breakpoint); infeasible-above rows moving down stop at the upper bound.
        # A row moving *away* from its violated bound has no breakpoint at all —
        # its growing violation is priced into σ, so it must not block.
        below = xB < loB - feas_tol
        above = xB > hiB + feas_tol
        up_tgt = jnp.where(below, loB, hiB)
        dn_tgt = jnp.where(above, hiB, loB)
        up_ok = ~above
        dn_ok = ~below
    else:
        up_tgt = hiB
        dn_tgt = loB
        up_ok = dn_ok = jnp.bool_(True)

    tgt = jnp.where(up, up_tgt, jnp.where(dn, dn_tgt, 0.0))
    blockable = ((up & up_ok) | (dn & dn_ok)) & jnp.isfinite(tgt)
    safe_delta = jnp.where(up | dn, delta, 1.0)
    inf = jnp.array(jnp.inf, dtype=dtype)
    ratio = jnp.where(blockable, (tgt - xB) / safe_delta, inf)
    ratio = jnp.maximum(ratio, 0.0)  # drift guard: degenerate rather than negative

    t_rows = jnp.min(ratio)

    if phase1:
        # ---- long-step extension (inert when the basis is feasible) ------
        # The phase-1 objective along the ray is piecewise-linear CONVEX;
        # instead of stopping at the first breakpoint (one violation
        # repaired per pivot) walk the sorted breakpoints accumulating the
        # slope and stop at the event where it turns non-negative — one
        # pivot crosses (and repairs) many violated rows.  slope0 = σ·δ is
        # 0 on a feasible basis, so the override self-disables in phase 2 /
        # after feasibility; Bland mode keeps the exact first-breakpoint
        # rule (anti-cycling needs it).  Mirrored verbatim in
        # parallel/sharded_engine.py (pivot-count parity gates).
        sigma = jnp.where(below, -1.0, jnp.where(above, 1.0, 0.0)).astype(dtype)
        slope0 = jnp.sum(sigma * delta)
        e1_ok = (up & below) | (dn & above)
        e1_tgt = jnp.where(up, loB, hiB)
        e1_w = jnp.abs(jnp.where(e1_ok, delta, 0.0))
        e1_t = jnp.where(
            e1_ok, jnp.maximum((e1_tgt - xB) / safe_delta, 0.0), inf
        )
        e2_ok = ((up & ~above & jnp.isfinite(hiB))
                 | (dn & ~below & jnp.isfinite(loB)))
        e2_tgt = jnp.where(up, hiB, loB)
        e2_w = jnp.abs(jnp.where(e2_ok, delta, 0.0))
        e2_t = jnp.where(
            e2_ok, jnp.maximum((e2_tgt - xB) / safe_delta, 0.0), inf
        )
        ev_t = jnp.concatenate([e1_t, e2_t])
        ev_w = jnp.concatenate([e1_w, e2_w])
        ev_tgt = jnp.concatenate([e1_tgt, e2_tgt])
        rows = jnp.arange(M, dtype=jnp.int32)
        ev_row = jnp.concatenate([rows, rows])
        order = jnp.argsort(ev_t, stable=True)
        csl = slope0 + jnp.cumsum(ev_w[order])
        crossed = (csl >= 0.0) & jnp.isfinite(ev_t[order])
        k = jnp.argmax(crossed)
        has_cross = (slope0 < 0.0) & jnp.any(crossed)
        sel = order[k]
        use_ls = has_cross & ~bland
        t_ls = ev_t[sel]
        r_ls = ev_row[sel]
        tgt_ls = ev_tgt[sel]
        # no crossing with a strictly negative slope ⇒ infeasibility
        # decreases forever along the ray (numerically impossible in exact
        # arithmetic): surface as "nothing blocks" like the textbook rule
        t_rows = jnp.where(
            (slope0 < 0.0) & ~bland,
            jnp.where(has_cross, t_ls, inf), t_rows,
        )

    # Harris two-pass: pass 1 computes the maximal step under bounds relaxed by
    # the feasibility tolerance (each blocking bound may be overshot by δ);
    # pass 2 picks the largest |pivot| among rows whose strict ratio fits under
    # that relaxed step.  Under degeneracy (many zero ratios) this selects a
    # numerically strong pivot instead of an arbitrary tiny one, at the price
    # of ≤δ transient bound violations — which the periodic exact
    # refactorization (and phase-1's tolerance-aware ratio rule) absorb.
    relaxed = jnp.where(
        blockable, (tgt - xB + jnp.sign(delta) * feas_tol) / safe_delta, inf
    )
    t_relaxed = jnp.maximum(jnp.min(relaxed), 0.0)

    # Leaving-row choice: rows admissible under the relaxed step (always
    # includes the strict minimum), widened by the legacy tie window.
    tie = (ratio <= t_relaxed) | (ratio <= t_rows * (1.0 + tie_rel) + tie_abs)
    neg_inf = jnp.array(-jnp.inf, dtype=dtype)
    r_stab = jnp.argmax(jnp.where(tie, jnp.abs(w), neg_inf)).astype(jnp.int32)
    big = jnp.array(jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    r_bland = jnp.argmin(jnp.where(tie, basis, big)).astype(jnp.int32)
    r = jnp.where(bland, r_bland, r_stab)

    flip = rng_q <= t_rows  # prefer the (cheaper) flip on exact ties
    unbounded = ~jnp.isfinite(jnp.minimum(t_rows, rng_q))
    t = jnp.where(flip, rng_q, ratio[r])
    tgt_r = tgt[r]
    if phase1:
        # long-step override: the leaving row/step/landing bound come from
        # the slope-crossing event (a below-row can cross THROUGH lo and
        # leave at hi, which tgt[r] cannot express)
        r = jnp.where(use_ls, r_ls, r)
        t = jnp.where(flip, rng_q, jnp.where(use_ls, t_ls, t))
        tgt_r = jnp.where(use_ls, tgt_ls, tgt_r)
    return RatioResult(flip=flip & ~unbounded, unbounded=unbounded, r=r, t=t,
                       tgt_r=tgt_r)
