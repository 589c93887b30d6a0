"""Presolve: reductions preserve optima (oracle-gated) and prove statuses.

The reference has no presolve; these gates pin the build-only reductions in
minilp_tpu/presolve.py to the scipy-HiGHS oracle and to presolve-off runs.
"""

import math

import numpy as np
import pytest

from minilp_tpu import (
    ComparisonOp,
    Infeasible,
    OptimizationDirection,
    Problem,
    SolverOptions,
    Unbounded,
)
from minilp_tpu.presolve import presolve_problem

from .oracle import random_problem, solve_with_oracle

ON = SolverOptions(presolve=True)
OFF = SolverOptions(presolve=False)


def test_singleton_rows_become_bounds():
    prob = Problem(OptimizationDirection.Minimize)
    x = prob.add_var(1.0, (None, None))
    y = prob.add_var(1.0, (0.0, 10.0))
    prob.add_constraint(2.0 * x, ComparisonOp.Ge, 4.0)   # x >= 2
    prob.add_constraint(-1.0 * x, ComparisonOp.Ge, -8.0)  # x <= 8
    prob.add_constraint(y * 1.0, ComparisonOp.Eq, 3.0)    # y = 3
    reduced, stats = presolve_problem(prob)
    assert stats.singleton_rows == 3
    assert stats.rows_out == 0
    # x is tightened to [2, 8] by the two singleton rows, then (being in no
    # remaining row, minimized) fixed at its lower bound 2; y is fixed at 3.
    assert reduced._lo[0] == reduced._hi[0] == 2.0
    assert reduced._lo[1] == reduced._hi[1] == 3.0
    sol = prob.solve()
    assert abs(sol.objective() - 5.0) < 1e-9
    assert sol[x] == 2.0 and sol[y] == 3.0


def test_empty_and_redundant_rows_dropped():
    prob = Problem(OptimizationDirection.Minimize)
    x = prob.add_var(1.0, (0.0, 1.0))
    y = prob.add_var(1.0, (0.0, 1.0))
    prob.add_constraint(LinearZero(), ComparisonOp.Le, 5.0)  # 0 <= 5: empty
    prob.add_constraint(x + y, ComparisonOp.Le, 10.0)        # redundant vs box
    prob.add_constraint(x + y, ComparisonOp.Ge, 1.0)         # binding
    reduced, stats = presolve_problem(prob)
    assert stats.empty_rows == 1
    assert stats.redundant_rows == 1
    assert stats.rows_out == 1
    assert abs(prob.solve().objective() - 1.0) < 1e-9


class LinearZero:
    """Iterable of zero terms — builds an empty LinearExpr."""

    def __iter__(self):
        return iter(())


def test_presolve_proves_infeasible():
    prob = Problem(OptimizationDirection.Minimize)
    x = prob.add_var(1.0, (0.0, 1.0))
    prob.add_constraint(x * 1.0, ComparisonOp.Ge, 2.0)  # x >= 2 vs x <= 1
    with pytest.raises(Infeasible):
        prob.solve()


def test_presolve_proves_unbounded_free_column():
    prob = Problem(OptimizationDirection.Minimize)
    prob.add_var(1.0, (None, 0.0))  # min x, x unbounded below, in no row
    y = prob.add_var(0.0, (0.0, 1.0))
    prob.add_constraint(y * 1.0, ComparisonOp.Le, 1.0)
    with pytest.raises(Unbounded):
        prob.solve()


def test_interval_infeasibility():
    prob = Problem(OptimizationDirection.Minimize)
    x = prob.add_var(1.0, (0.0, 1.0))
    y = prob.add_var(1.0, (0.0, 1.0))
    prob.add_constraint(x + y, ComparisonOp.Ge, 3.0)  # max activity 2 < 3
    with pytest.raises(Infeasible):
        prob.solve()


def test_unused_objective_free_variable_fixed_finite():
    prob = Problem(OptimizationDirection.Minimize)
    x = prob.add_var(0.0, (None, None))  # no objective, no rows -> fixed at 0
    y = prob.add_var(1.0, (2.0, 5.0))
    prob.add_constraint(y * 1.0, ComparisonOp.Ge, 2.0)
    sol = prob.solve()
    assert sol[x] == 0.0
    assert abs(sol.objective() - 2.0) < 1e-9


def test_incremental_api_on_presolved_solution():
    # Singleton rows vanish in presolve; the incremental API must still work.
    prob = Problem(OptimizationDirection.Maximize, ON)
    x = prob.add_var(1.0, (0.0, None))
    y = prob.add_var(2.0, (0.0, None))
    prob.add_constraint(x * 1.0, ComparisonOp.Le, 5.0)   # singleton -> bound
    prob.add_constraint(y * 1.0, ComparisonOp.Le, 3.0)   # singleton -> bound
    prob.add_constraint(x + y, ComparisonOp.Le, 7.0)
    sol = prob.solve()
    assert abs(sol.objective() - 10.0) < 1e-7  # max x+2y: y=3, x=4
    sol = sol.add_constraint(x, ComparisonOp.Le, 1.0)
    assert abs(sol.objective() - 7.0) < 1e-7
    sol = sol.fix_var(y, 1.0)
    assert abs(sol.objective() - 3.0) < 1e-7
    changed, sol = sol.unfix_var(y)
    assert changed
    assert abs(sol.objective() - 7.0) < 1e-7


def _with_singletons(rng, nv=10, m=6, n_singletons=4) -> Problem:
    """A random LP plus singleton rows (bound tighteners) for presolve to chew."""
    prob = random_problem(rng, nv=nv, m=m)
    for _ in range(n_singletons):
        j = int(rng.integers(0, nv))
        a = float(rng.normal()) or 1.0
        op = (ComparisonOp.Le, ComparisonOp.Ge)[int(rng.integers(0, 2))]
        # rhs chosen loose around the variable's current bounds so most
        # singletons tighten without emptying the feasible set.
        base = prob._lo[j] if math.isfinite(prob._lo[j]) else 0.0
        rhs = a * (base + float(rng.random()) * 4.0 - 0.5)
        from minilp_tpu import LinearExpr, Variable
        prob.add_constraint(LinearExpr.from_term(a, Variable(j)), op, rhs)
    return prob


def _run(p: Problem) -> object:
    try:
        return p.solve().objective()
    except Infeasible:
        return "infeasible"
    except Unbounded:
        return "unbounded"


@pytest.mark.parametrize("seed", range(10))
def test_randomized_presolve_equivalence(seed):
    """presolve on == presolve off == oracle on random LPs with singletons."""
    prob_on = _with_singletons(np.random.default_rng(seed))
    prob_off = _with_singletons(np.random.default_rng(seed))
    prob_on.options = ON
    prob_off.options = OFF
    outcome, obj, _x = solve_with_oracle(prob_off)
    expect = obj if outcome == "optimal" else outcome
    got_on, got_off = _run(prob_on), _run(prob_off)
    if isinstance(expect, str):
        assert got_on == expect == got_off
    else:
        assert got_on == pytest.approx(expect, rel=1e-6, abs=1e-6)
        assert got_off == pytest.approx(expect, rel=1e-6, abs=1e-6)
