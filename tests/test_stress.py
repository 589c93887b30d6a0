"""Randomized incremental stress gate: arbitrary interleavings of
add_constraint / fix_var / unfix_var cross-checked against the oracle after
every edit (SURVEY.md §5 #2's "incremental sequences", scaled up)."""

import copy

import numpy as np
import pytest

import minilp_tpu
from minilp_tpu.api import ComparisonOp, LinearExpr, Variable

from .oracle import random_problem, solve_with_oracle


@pytest.mark.parametrize("seed", [0, 1])
def test_incremental_stress(seed):
    _run_incremental_stress(seed, trials=12, steps=8, options=None)


def test_incremental_stress_megakernel():
    """Same interleaving gate forced through the warm Pallas megakernel path
    (interpret mode on CPU): cold solves and every re-solve go through the
    f32 kernel + f64 certification + fallback machinery."""
    from minilp_tpu.options import SolverOptions

    _run_incremental_stress(
        7, trials=4, steps=5, options=SolverOptions(use_megakernel="always")
    )


def _run_incremental_stress(seed, trials, steps, options):
    rng = np.random.default_rng(seed)
    fails = []
    for trial in range(trials):
        prob = random_problem(rng, int(rng.integers(4, 14)), int(rng.integers(3, 12)))
        if options is not None:
            prob.options = options
        shadow = copy.deepcopy(prob)  # oracle-side model; prob stays frozen
        if solve_with_oracle(shadow)[0] != "optimal":
            continue
        sol = prob.solve()
        fixed = {}
        for step in range(steps):
            op = int(rng.integers(0, 3))
            # mutate the shadow FIRST so the oracle sees the attempted edit
            # whether or not our solver raises
            if op == 0:
                coeffs = rng.normal(size=prob.num_vars)
                x = np.array([v for _, v in sol.iter()])
                rhs = float(coeffs @ x + rng.normal() * 0.5)
                sense = [ComparisonOp.Le, ComparisonOp.Ge][int(rng.integers(0, 2))]
                expr = LinearExpr(
                    [(float(coeffs[j]), Variable(j)) for j in range(prob.num_vars)]
                )
                shadow.add_constraint(expr, sense, rhs)
                action = lambda: sol.add_constraint(expr, sense, rhs)
            elif op == 1:
                j = int(rng.integers(0, prob.num_vars))
                if j in fixed:
                    continue
                xj = sol.var_value(Variable(j))
                val = float(np.clip(xj + rng.normal() * 0.1,
                                    shadow._lo[j], shadow._hi[j]))
                fixed[j] = (shadow._lo[j], shadow._hi[j])
                shadow._lo[j] = shadow._hi[j] = val
                action = lambda: sol.fix_var(Variable(j), val)
            else:
                if not fixed:
                    continue
                j = next(iter(fixed))
                lo0, hi0 = fixed.pop(j)
                shadow._lo[j], shadow._hi[j] = lo0, hi0
                action = lambda: sol.unfix_var(Variable(j))[1]

            try:
                sol = action()
            except minilp_tpu.Infeasible:
                if solve_with_oracle(shadow)[0] != "infeasible":
                    fails.append((trial, step, op, "false infeasible"))
                break
            except minilp_tpu.SolverFailure as e:
                fails.append((trial, step, op, f"failure {e}"))
                break
            outcome, obj, _ = solve_with_oracle(shadow)
            if outcome == "optimal":
                gap = abs(sol.objective() - obj) / (1 + abs(obj))
                if gap > 1e-6:
                    fails.append((trial, step, op, f"gap {gap:.2e}"))
                    break
            elif outcome == "infeasible":
                fails.append((trial, step, op, "missed infeasible"))
                break
    assert not fails, fails
