"""Synthetic Netlib-shaped sparse LP instances.

The reference's correctness gate runs the real Netlib suite (`tests/` +
vendored `*.mps.gz` [CODE]; BASELINE.md §1 full-suite objectives).  Netlib
data is not on this machine, so these generators produce instances at the
same SHAPES and SPARSITIES as the headline Netlib problems — 25fv47
(821×1571, ~1% dense) and maros-r7 (3136×9408, ~0.1% dense) — with the
properties that make them honest stand-ins:

* sparse structural block (k nonzeros per row, k ≈ density·nv, min 2),
  N(0,1)-ish magnitudes after light column scaling spread (conditioning is
  non-trivial but not adversarial, like Netlib);
* guaranteed feasible (an interior x₀ is planted) and bounded (every
  structural variable is boxed), so the oracle comparison is always
  "optimal objective to 1e-6 relative", never a skip;
* mixed row senses (≤ / ≥ / =) and non-degenerate rhs slackness.

The exact optimum is NOT planted — gates compare against the scipy-HiGHS
oracle (tests/oracle.py), which is stronger than a fixed objective table.
"""

from __future__ import annotations

import numpy as np

from ..api import ComparisonOp, LinearExpr, OptimizationDirection, Problem


def netlib_shaped_problem(
    m: int,
    nv: int,
    density: float,
    seed: int = 0,
    frac_eq: float = 0.15,
    frac_ge: float = 0.25,
) -> Problem:
    """A feasible, bounded, sparse LP at the given (rows, vars, density).

    Row i has ``max(2, round(density*nv))`` structural nonzeros at random
    columns.  Every variable is boxed in [0, u_j] with u_j ∈ [0.5, 2.5];
    the planted interior point x₀ ∈ (0.1·u, 0.9·u) makes ≤/=/≥ rows with
    rhs = (Ax₀) + slackness all simultaneously satisfiable.
    """
    rng = np.random.default_rng(seed)
    k = max(2, int(round(density * nv)))

    prob = Problem(OptimizationDirection.Minimize)
    u = rng.uniform(0.5, 2.5, size=nv)
    obj = rng.normal(size=nv)
    variables = [
        prob.add_var(float(obj[j]), (0.0, float(u[j]))) for j in range(nv)
    ]
    x0 = u * rng.uniform(0.1, 0.9, size=nv)

    # per-row sparse patterns: k distinct columns each, values with a light
    # per-column scale spread (~Netlib-ish conditioning, far from identity)
    col_scale = np.exp(rng.normal(scale=0.7, size=nv))
    cols = np.stack([rng.choice(nv, size=k, replace=False) for _ in range(m)])
    vals = rng.normal(size=(m, k)) * col_scale[cols]
    ax0 = np.einsum("mk,mk->m", vals, x0[cols])

    senses = rng.random(m)
    for i in range(m):
        expr = LinearExpr(
            (float(vals[i, t]), variables[cols[i, t]]) for t in range(k)
        )
        if senses[i] < frac_eq:
            prob.add_constraint(expr, ComparisonOp.Eq, float(ax0[i]))
        elif senses[i] < frac_eq + frac_ge:
            prob.add_constraint(
                expr, ComparisonOp.Ge, float(ax0[i] - rng.uniform(0.05, 1.0))
            )
        else:
            prob.add_constraint(
                expr, ComparisonOp.Le, float(ax0[i] + rng.uniform(0.05, 1.0))
            )
    return prob


#: (name, rows, structural vars, density) for the headline Netlib shapes
NETLIB_SHAPES = {
    "25fv47": (821, 1571, 0.0080),   # real 25fv47: 821×1571, nnz≈10400
    "maros-r7": (3136, 9408, 0.0049),  # real maros-r7: 3136×9408, nnz≈145k
    "fit1p": (627, 1677, 0.0095),    # real fit1p: 627×1677, nnz≈9868
}
