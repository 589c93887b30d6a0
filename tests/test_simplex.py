"""Cold-solve correctness gate: hand LPs with known optima, error cases, and
randomized cross-checks against the scipy-HiGHS oracle (SURVEY.md §5 #2/#3)."""

import numpy as np
import pytest

from minilp_tpu import (
    ComparisonOp,
    Infeasible,
    OptimizationDirection,
    Problem,
    Unbounded,
)

from .oracle import random_problem, solve_with_oracle

TOL = 1e-6


def rel_close(a, b, tol=TOL):
    return abs(a - b) <= tol * (1.0 + abs(b))


# ----------------------------------------------------------------------------------
# Hand-built LPs (reference C11-style inline tests)
# ----------------------------------------------------------------------------------


def test_doc_example_maximize():
    prob = Problem(OptimizationDirection.Maximize)
    x = prob.add_var(1.0, (0.0, None))
    y = prob.add_var(2.0, (0.0, 3.0))
    prob.add_constraint(x + y, ComparisonOp.Le, 4.0)
    sol = prob.solve()
    assert rel_close(sol.objective(), 7.0)
    assert rel_close(sol[x], 1.0)
    assert rel_close(sol[y], 3.0)


def test_simple_minimize_with_ge():
    # min x + y  s.t.  x + 2y >= 4, 3x + y >= 6, x,y >= 0  → x=1.6, y=1.2, obj=2.8
    prob = Problem()
    x = prob.add_var(1.0, (0.0, None))
    y = prob.add_var(1.0, (0.0, None))
    prob.add_constraint(x + 2 * y, ComparisonOp.Ge, 4.0)
    prob.add_constraint(3 * x + y, ComparisonOp.Ge, 6.0)
    sol = prob.solve()
    assert rel_close(sol.objective(), 2.8)
    assert rel_close(sol[x], 1.6)
    assert rel_close(sol[y], 1.2)


def test_equality_constraints():
    # min 2x + 3y  s.t.  x + y = 10, x - y = 2, free vars → x=6, y=4, obj=24
    prob = Problem()
    x = prob.add_var(2.0, (None, None))
    y = prob.add_var(3.0, (None, None))
    prob.add_constraint(x + y, ComparisonOp.Eq, 10.0)
    prob.add_constraint(x - y, ComparisonOp.Eq, 2.0)
    sol = prob.solve()
    assert rel_close(sol.objective(), 24.0)
    assert rel_close(sol[x], 6.0)
    assert rel_close(sol[y], 4.0)


def test_bound_flip_and_boxed_vars():
    # max x + y with 0<=x<=1, 0<=y<=1, x + y <= 10 → both at upper bound.
    prob = Problem(OptimizationDirection.Maximize)
    x = prob.add_var(1.0, (0.0, 1.0))
    y = prob.add_var(1.0, (0.0, 1.0))
    prob.add_constraint(x + y, ComparisonOp.Le, 10.0)
    sol = prob.solve()
    assert rel_close(sol.objective(), 2.0)


def test_negative_lower_bounds():
    # min x  with  -5 <= x <= 5, x >= -3  → x = -3
    prob = Problem()
    x = prob.add_var(1.0, (-5.0, 5.0))
    prob.add_constraint(1.0 * x, ComparisonOp.Ge, -3.0)
    sol = prob.solve()
    assert rel_close(sol.objective(), -3.0)


def test_fixed_var():
    prob = Problem()
    x = prob.add_var(1.0, (2.5, 2.5))
    y = prob.add_var(1.0, (0.0, None))
    prob.add_constraint(x + y, ComparisonOp.Ge, 4.0)
    sol = prob.solve()
    assert rel_close(sol.objective(), 4.0)
    assert rel_close(sol[x], 2.5)
    assert rel_close(sol[y], 1.5)


def test_no_constraints():
    prob = Problem()
    x = prob.add_var(1.0, (-1.0, 8.0))
    sol = prob.solve()
    assert rel_close(sol.objective(), -1.0)
    assert rel_close(sol[x], -1.0)


def test_infeasible():
    prob = Problem()
    x = prob.add_var(1.0, (0.0, None))
    prob.add_constraint(1.0 * x, ComparisonOp.Le, 1.0)
    prob.add_constraint(1.0 * x, ComparisonOp.Ge, 2.0)
    with pytest.raises(Infeasible):
        prob.solve()


def test_infeasible_bounds_vs_equality():
    prob = Problem()
    x = prob.add_var(0.0, (0.0, 1.0))
    y = prob.add_var(0.0, (0.0, 1.0))
    prob.add_constraint(x + y, ComparisonOp.Eq, 3.0)
    with pytest.raises(Infeasible):
        prob.solve()


def test_unbounded():
    prob = Problem(OptimizationDirection.Maximize)
    x = prob.add_var(1.0, (0.0, None))
    y = prob.add_var(0.0, (0.0, None))
    prob.add_constraint(x - y, ComparisonOp.Le, 1.0)
    with pytest.raises(Unbounded):
        prob.solve()


def test_unbounded_free_var():
    prob = Problem()
    x = prob.add_var(1.0, (None, None))
    prob.add_constraint(1.0 * x, ComparisonOp.Le, 5.0)
    with pytest.raises(Unbounded):
        prob.solve()


def test_degenerate_lp():
    # Multiple constraints active at the optimum; exercises degenerate pivots.
    prob = Problem()
    x = prob.add_var(-1.0, (0.0, None))
    y = prob.add_var(-1.0, (0.0, None))
    prob.add_constraint(x + y, ComparisonOp.Le, 1.0)
    prob.add_constraint(x, ComparisonOp.Le, 1.0)
    prob.add_constraint(y, ComparisonOp.Le, 1.0)
    prob.add_constraint(2 * x + y, ComparisonOp.Le, 2.0)
    sol = prob.solve()
    assert rel_close(sol.objective(), -1.0)


def test_solution_iteration_order():
    prob = Problem()
    vs = [prob.add_var(float(i + 1), (0.0, 1.0)) for i in range(5)]
    prob.add_constraint(sum(vs[1:], 1.0 * vs[0]), ComparisonOp.Ge, 2.0)
    sol = prob.solve()
    pairs = list(sol.iter())
    assert [v.idx for v, _ in pairs] == [0, 1, 2, 3, 4]
    # cheap objective: fill low-cost vars first
    assert rel_close(sol.objective(), 3.0)  # x0=1, x1=1 → 1*1 + 2*1


# ----------------------------------------------------------------------------------
# Randomized oracle cross-check (SURVEY.md §5 (c))
# ----------------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(30))
def test_random_lp_matches_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    nv = int(rng.integers(2, 12))
    m = int(rng.integers(1, 14))
    prob = random_problem(rng, nv, m)
    outcome, obj, _x = solve_with_oracle(prob)
    if outcome == "optimal":
        sol = prob.solve()
        assert rel_close(sol.objective(), obj), (
            f"seed={seed}: got {sol.objective()}, oracle {obj}"
        )
        # solution must be primal feasible
        _assert_feasible(prob, sol)
    elif outcome == "infeasible":
        with pytest.raises(Infeasible):
            prob.solve()
    else:
        with pytest.raises(Unbounded):
            prob.solve()


@pytest.mark.parametrize("seed", range(8))
def test_random_medium_lp_matches_oracle(seed):
    rng = np.random.default_rng(7000 + seed)
    nv = int(rng.integers(20, 60))
    m = int(rng.integers(15, 50))
    prob = random_problem(rng, nv, m, density=0.5)
    outcome, obj, _x = solve_with_oracle(prob)
    if outcome == "optimal":
        sol = prob.solve()
        assert rel_close(sol.objective(), obj)
        _assert_feasible(prob, sol)
    elif outcome == "infeasible":
        with pytest.raises(Infeasible):
            prob.solve()
    else:
        with pytest.raises(Unbounded):
            prob.solve()


def _assert_feasible(prob, sol, tol=1e-6):
    x = np.array([val for _, val in sol.iter()])
    for j in range(prob.num_vars):
        assert x[j] >= prob._lo[j] - tol
        assert x[j] <= prob._hi[j] + tol
    for terms, op, rhs in prob._constraints:
        lhs = sum(coeff * x[j] for j, coeff in terms)
        scale = 1.0 + abs(rhs)
        if op == ComparisonOp.Le:
            assert lhs <= rhs + tol * scale
        elif op == ComparisonOp.Ge:
            assert lhs >= rhs - tol * scale
        else:
            assert abs(lhs - rhs) <= tol * scale
