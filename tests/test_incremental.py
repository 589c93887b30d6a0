"""Incremental API gate: warm-started add_constraint / fix_var / unfix_var /
add_gomory_cut (reference C1 incremental surface + C10 branch-and-cut pattern;
SURVEY.md §4.2/§4.3)."""

import math

import numpy as np
import pytest

from minilp_tpu import (
    ComparisonOp,
    Infeasible,
    OptimizationDirection,
    Problem,
)

from .oracle import random_problem, solve_with_oracle

TOL = 1e-6


def rel_close(a, b, tol=TOL):
    return abs(a - b) <= tol * (1.0 + abs(b))


def test_add_constraint_tightens():
    # max x+y, x,y in [0,3], x+y<=4 → 4; then add x<=1 → 1+3=4 stays; add y<=2 → 3
    prob = Problem(OptimizationDirection.Maximize)
    x = prob.add_var(1.0, (0.0, 3.0))
    y = prob.add_var(1.0, (0.0, 3.0))
    prob.add_constraint(x + y, ComparisonOp.Le, 4.0)
    sol = prob.solve()
    assert rel_close(sol.objective(), 4.0)
    sol = sol.add_constraint(1.0 * x, ComparisonOp.Le, 1.0)
    assert rel_close(sol.objective(), 4.0)
    sol = sol.add_constraint(1.0 * y, ComparisonOp.Le, 2.0)
    assert rel_close(sol.objective(), 3.0)
    assert rel_close(sol[x], 1.0)
    assert rel_close(sol[y], 2.0)


def test_add_constraint_infeasible():
    prob = Problem(OptimizationDirection.Maximize)
    x = prob.add_var(1.0, (0.0, 10.0))
    prob.add_constraint(1.0 * x, ComparisonOp.Le, 5.0)
    sol = prob.solve()
    assert rel_close(sol.objective(), 5.0)
    with pytest.raises(Infeasible):
        sol.add_constraint(1.0 * x, ComparisonOp.Ge, 6.0)


def test_add_many_constraints_grows_capacity():
    # Exceed the initial row padding to exercise grow-by-recompile.
    prob = Problem(OptimizationDirection.Maximize)
    x = prob.add_var(1.0, (0.0, 100.0))
    y = prob.add_var(1.0, (0.0, 100.0))
    prob.add_constraint(x + y, ComparisonOp.Le, 100.0)
    sol = prob.solve()
    assert rel_close(sol.objective(), 100.0)
    for k in range(20):
        bound = 90.0 - 4.0 * k
        sol = sol.add_constraint(x + y, ComparisonOp.Le, bound)
        assert rel_close(sol.objective(), bound), f"k={k}"


def test_fix_and_unfix_var():
    # max x + 2y, x,y ∈ [0,3], x+y ≤ 4 → y=3,x=1 → 7
    prob = Problem(OptimizationDirection.Maximize)
    x = prob.add_var(1.0, (0.0, 3.0))
    y = prob.add_var(2.0, (0.0, 3.0))
    prob.add_constraint(x + y, ComparisonOp.Le, 4.0)
    sol = prob.solve()
    assert rel_close(sol.objective(), 7.0)
    sol = sol.fix_var(y, 1.0)           # → x=3, y=1 → 5
    assert rel_close(sol.objective(), 5.0)
    assert rel_close(sol[y], 1.0)
    changed, sol = sol.unfix_var(y)     # back to 7
    assert changed
    assert rel_close(sol.objective(), 7.0)
    changed, _sol = sol.fix_var(x, 1.0).unfix_var(x)  # x=1 is already optimal
    assert not changed


def test_fix_var_infeasible():
    prob = Problem()
    x = prob.add_var(1.0, (0.0, 10.0))
    y = prob.add_var(1.0, (0.0, 10.0))
    prob.add_constraint(x + y, ComparisonOp.Le, 5.0)
    sol = prob.solve()
    with pytest.raises(Infeasible):
        sol.fix_var(x, 7.0)


def test_fix_basic_variable():
    # Fixing a variable that is basic at the optimum forces a real dual pivot.
    prob = Problem()
    x = prob.add_var(1.0, (0.0, None))
    y = prob.add_var(1.0, (0.0, None))
    prob.add_constraint(x + 2 * y, ComparisonOp.Ge, 4.0)
    prob.add_constraint(3 * x + y, ComparisonOp.Ge, 6.0)
    sol = prob.solve()
    assert rel_close(sol.objective(), 2.8)  # x=1.6, y=1.2 both basic
    sol = sol.fix_var(x, 0.0)               # → y >= 6 → obj 6
    assert rel_close(sol.objective(), 6.0)
    changed, sol = sol.unfix_var(x)
    assert changed
    assert rel_close(sol.objective(), 2.8)


def test_incremental_warm_start_is_cheap():
    rng = np.random.default_rng(42)
    prob = random_problem(rng, 30, 25, density=0.7)
    outcome, obj, _ = solve_with_oracle(prob)
    if outcome != "optimal":
        pytest.skip("random instance not optimal")
    sol = prob.solve()
    cold_iters = sol._engine.iterations()
    # add a mild constraint: sum of first five vars <= (current value + 1)
    vs = list(sol.iter())[:5]
    cur = sum(v for _, v in vs)
    expr = sum((1.0 * var for var, _ in vs[1:]), start=1.0 * vs[0][0])
    sol2 = sol.add_constraint(expr, ComparisonOp.Le, cur + 1.0)
    warm_iters = sol2._engine.iterations()
    assert rel_close(sol2.objective(), sol.objective())  # not binding
    assert warm_iters <= max(3, cold_iters // 4), (warm_iters, cold_iters)


def test_incremental_matches_oracle_after_edits():
    rng = np.random.default_rng(7)
    for trial in range(5):
        prob = random_problem(rng, 8, 6)
        outcome, obj, _ = solve_with_oracle(prob)
        if outcome != "optimal":
            continue
        sol = prob.solve()
        # add a random extra constraint, re-solve, and cross-check by cold-solving
        # the extended problem both with us and with the oracle
        coeffs = rng.normal(size=prob.num_vars)
        xcur = np.array([v for _, v in sol.iter()])
        rhs = float(coeffs @ xcur - 0.5)  # cuts off the current optimum a bit
        from minilp_tpu.api import LinearExpr, Variable

        expr = LinearExpr([(float(coeffs[j]), Variable(j)) for j in range(prob.num_vars)])
        prob.add_constraint(expr, ComparisonOp.Ge, rhs)  # extended cold problem
        outcome2, obj2, _ = solve_with_oracle(prob)
        if outcome2 == "optimal":
            sol2 = sol.add_constraint(expr, ComparisonOp.Ge, rhs)
            assert rel_close(sol2.objective(), obj2), trial
        elif outcome2 == "infeasible":
            with pytest.raises(Infeasible):
                sol.add_constraint(expr, ComparisonOp.Ge, rhs)


# ----------------------------------------------------------------------------------
# Gomory cuts + a miniature branch-and-cut loop (reference C10, SURVEY.md §4.3)
# ----------------------------------------------------------------------------------


def _is_frac(v, tol=1e-6):
    return min(v - math.floor(v), math.ceil(v) - v) > tol


def test_gomory_cut_progresses_to_integrality():
    # Knapsack LP relaxation: max 5x1+4x2, 6x1+4x2<=24, x1+2x2<=6, 0<=x<=10.
    # LP optimum (3, 1.5) → obj 21; integer optimum obj 19 at... (2,3)? check:
    # (2,3): 6*2+4*3=24 ok, 2+2*3=8 >6 no. (3,1): obj 19, (4,0): 24 ok,4<=6: obj 20.
    # integer optimum is (4, 0) → 20? 6*4=24<=24, 4+0=4<=6 → feasible, obj 20.
    prob = Problem(OptimizationDirection.Maximize)
    x1 = prob.add_var(5.0, (0.0, 10.0))
    x2 = prob.add_var(4.0, (0.0, 10.0))
    prob.add_constraint(6 * x1 + 4 * x2, ComparisonOp.Le, 24.0)
    prob.add_constraint(x1 + 2 * x2, ComparisonOp.Le, 6.0)
    sol = prob.solve()
    assert rel_close(sol.objective(), 21.0)
    obj_prev = sol.objective()
    for _round in range(20):
        vals = [(var, v) for var, v in sol.iter()]
        frac = [var for var, v in vals if _is_frac(v)]
        if not frac:
            break
        sol = sol.add_gomory_cut(frac[0])
        # cuts only ever tighten a maximization relaxation
        assert sol.objective() <= obj_prev + 1e-7
        obj_prev = sol.objective()
    vals = {var.idx: v for var, v in sol.iter()}
    assert not any(_is_frac(v) for v in vals.values()), vals
    assert rel_close(sol.objective(), 20.0)
    assert rel_close(vals[0], 4.0) and rel_close(vals[1], 0.0)


def test_branch_and_bound_with_fix_unfix():
    # Tiny 0/1 knapsack via branch&bound on fix_var/unfix_var:
    # max 10a+6b+4c s.t. a+b+c<=2 (a,b,c ∈ {0,1} by branching) → a=1,b=1 → 16.
    prob = Problem(OptimizationDirection.Maximize)
    a = prob.add_var(10.0, (0.0, 1.0))
    b = prob.add_var(6.0, (0.0, 1.0))
    c = prob.add_var(4.0, (0.0, 1.0))
    prob.add_constraint(a + b + c, ComparisonOp.Le, 2.0)
    sol = prob.solve()

    best = [-math.inf]

    def branch(sol, depth):
        vals = [(var, v) for var, v in sol.iter()]
        frac = [var for var, v in vals if _is_frac(v)]
        if not frac:
            best[0] = max(best[0], sol.objective())
            return sol
        if sol.objective() <= best[0] + 1e-9:
            return sol  # bound
        var = frac[0]
        for val in (1.0, 0.0):
            try:
                child = sol.fix_var(var, val)
            except Infeasible:
                continue
            child = branch(child, depth + 1)
            _, sol = child.unfix_var(var)
        return sol

    branch(sol, 0)
    assert rel_close(best[0], 16.0)


def test_canonical_csc_cache_invalidated_by_row_edits():
    """CanonicalLP.csc() caches the dense->CSC view for the host sparse-LA
    seams (one ~1 s conversion at maros scale instead of four per cold
    solve); the ONE mutation path for A — _append_row — must invalidate it
    so incremental edits never solve against a stale matrix."""
    import numpy as np

    from minilp_tpu import ComparisonOp, LinearExpr, Variable
    from minilp_tpu.utils.synth import netlib_shaped_problem

    prob = netlib_shaped_problem(24, 60, 0.2, seed=3)
    sol = prob.solve()
    h = sol._engine
    csc0 = h.can.csc()
    assert h.can.csc() is csc0  # cached
    v = Variable(0)
    sol2 = sol.add_constraint(LinearExpr([(1.0, v)]), ComparisonOp.Le,
                              sol[v] + 1.0)
    csc1 = h.can.csc()
    assert csc1 is not csc0  # invalidated by the row write
    np.testing.assert_allclose(csc1.toarray(), h.can.A, rtol=0, atol=0)
    assert sol2.objective() is not None
