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
    return RatioResult(flip=flip & ~unbounded, unbounded=unbounded, r=r, t=t, tgt_r=tgt[r])
