"""scipy-HiGHS oracle: the NumPy/SciPy reference solver used by every gate.

The reference's correctness gate is Netlib objective parity to 1e-6 relative
(SURVEY.md §5 #3).  The Netlib data files are not available offline, so the gate
runs against `scipy.optimize.linprog(method="highs")` on hand-built and random
instances instead (SURVEY.md §8 Phase 0), which is a strictly harsher oracle
(exact per-instance answers rather than a fixed table).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
from scipy.optimize import linprog

from minilp_tpu.api import ComparisonOp, OptimizationDirection, Problem

#: outcome: "optimal" | "infeasible" | "unbounded"
OracleResult = Tuple[str, Optional[float], Optional[np.ndarray]]


def solve_with_oracle(problem: Problem) -> OracleResult:
    nv = problem.num_vars
    sign = 1.0 if problem.direction == OptimizationDirection.Minimize else -1.0
    c = sign * np.asarray(problem._obj, dtype=np.float64)

    A_ub, b_ub, A_eq, b_eq = [], [], [], []
    for terms, op, rhs in problem._constraints:
        row = np.zeros(nv)
        for j, coeff in terms:
            row[j] += coeff
        if op == ComparisonOp.Le:
            A_ub.append(row)
            b_ub.append(rhs)
        elif op == ComparisonOp.Ge:
            A_ub.append(-row)
            b_ub.append(-rhs)
        else:
            A_eq.append(row)
            b_eq.append(rhs)

    bounds = [
        (
            None if lo == -math.inf else lo,
            None if hi == math.inf else hi,
        )
        for lo, hi in zip(problem._lo, problem._hi)
    ]

    res = linprog(
        c,
        A_ub=np.asarray(A_ub) if A_ub else None,
        b_ub=np.asarray(b_ub) if b_ub else None,
        A_eq=np.asarray(A_eq) if A_eq else None,
        b_eq=np.asarray(b_eq) if b_eq else None,
        bounds=bounds,
        method="highs",
    )
    if res.status == 0:
        return "optimal", sign * float(res.fun), np.asarray(res.x)
    if res.status == 2:
        return "infeasible", None, None
    if res.status == 3:
        return "unbounded", None, None
    raise RuntimeError(f"oracle failed: status={res.status} message={res.message}")


def random_problem(
    rng: np.random.Generator,
    nv: int,
    m: int,
    density: float = 1.0,
    frac_free: float = 0.15,
    frac_boxed: float = 0.35,
    frac_fixed: float = 0.05,
) -> Problem:
    """A random LP with mixed bound types and mixed row senses.

    rhs values are chosen near A·x₀ for a random interior-ish point x₀ so a
    decent fraction of instances are feasible and bounded.
    """
    direction = (
        OptimizationDirection.Minimize if rng.random() < 0.5
        else OptimizationDirection.Maximize
    )
    prob = Problem(direction)
    x0 = rng.normal(size=nv)
    variables = []
    for j in range(nv):
        u = rng.random()
        obj = float(rng.normal())
        if u < frac_free:
            bounds = (None, None)
        elif u < frac_free + frac_boxed:
            bounds = (
                float(x0[j] - rng.random() * 3.0),
                float(x0[j] + rng.random() * 3.0),
            )
        elif u < frac_free + frac_boxed + frac_fixed:
            bounds = (float(x0[j]), float(x0[j]))
        else:
            # one-sided
            if rng.random() < 0.5:
                bounds = (float(x0[j] - rng.random() * 3.0), None)
            else:
                bounds = (None, float(x0[j] + rng.random() * 3.0))
        variables.append(prob.add_var(obj, bounds))

    A = rng.normal(size=(m, nv))
    if density < 1.0:
        A *= rng.random(size=(m, nv)) < density
    ax0 = A @ x0
    ops = [ComparisonOp.Le, ComparisonOp.Ge, ComparisonOp.Eq]
    for i in range(m):
        op = ops[int(rng.integers(0, 3))]
        slackness = float(rng.random() * 2.0 - 0.5)  # mostly loose, sometimes tight
        if op == ComparisonOp.Le:
            rhs = ax0[i] + abs(slackness)
        elif op == ComparisonOp.Ge:
            rhs = ax0[i] - abs(slackness)
        else:
            rhs = ax0[i]
        expr = sum(
            (float(A[i, j]) * variables[j] for j in range(nv) if A[i, j] != 0.0),
            start=0.0 * variables[0],
        )
        prob.add_constraint(expr, op, float(rhs))
    return prob
