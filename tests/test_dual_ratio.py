"""Dual simplex ratio-test gates: bound flips + Harris relaxation.

Reference analog: the bounded-variable dual in `Solver::restore_feasibility`
(`src/solver.rs` [CODE]; SURVEY.md §4.2): a boxed entering variable whose
unclamped dual step overshoots its own opposite bound must *flip* there
(basis unchanged) instead of entering the basis out of bounds.
"""

import dataclasses

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from minilp_tpu.api import ComparisonOp, OptimizationDirection, Problem
from minilp_tpu.engine.dual import resolve_dual
from minilp_tpu.options import SolverOptions
from minilp_tpu.status import Status, VarStat

from .oracle import solve_with_oracle


def _overshoot_instance():
    """min 0.1·x1 + 0.5·x2 s.t. x1 + x2 ≥ 5, x1 ∈ [0,1], x2 ∈ [0,10].

    Warm dual start from the all-slack basis: the first dual iteration picks
    x1 (best ratio 0.1) whose unclamped step is 5 — overshooting its range of
    1, so it must flip to AT_UPPER without a basis change.
    """
    A = jnp.array([[-1.0, -1.0, 1.0]])
    b = jnp.array([-5.0])
    c = jnp.array([0.1, 0.5, 0.0])
    lo = jnp.array([0.0, 0.0, 0.0])
    hi = jnp.array([1.0, 10.0, jnp.inf])
    basis = jnp.array([2], dtype=jnp.int32)
    vstat = jnp.array(
        [int(VarStat.AT_LOWER), int(VarStat.AT_LOWER), int(VarStat.BASIC)],
        dtype=jnp.int8,
    )
    return A, b, c, lo, hi, basis, vstat


def test_dual_bound_flip_mechanism():
    """Iteration 1 must be a flip: basis unchanged, x1 lands AT_UPPER, and the
    violation shrinks by exactly x1's traversed range."""
    A, b, c, lo, hi, basis, vstat = _overshoot_instance()
    opts = dataclasses.replace(SolverOptions(), max_iter=1)
    st = resolve_dual(A, b, c, lo, hi, basis, vstat, jnp.eye(1), opts)
    assert np.asarray(st.basis).tolist() == [2]  # no basis change
    assert int(st.vstat[0]) == int(VarStat.AT_UPPER)  # x1 flipped
    assert float(st.xB[0]) == pytest.approx(-4.0)  # violation 5 → 4


def test_dual_flip_then_pivot_reaches_optimum():
    A, b, c, lo, hi, basis, vstat = _overshoot_instance()
    st = resolve_dual(A, b, c, lo, hi, basis, vstat, jnp.eye(1), SolverOptions())
    assert int(st.status) == int(Status.OPTIMAL)
    assert float(st.obj) == pytest.approx(2.1)  # x1=1, x2=4
    assert int(st.niter) == 2  # one flip + one pivot
    assert int(st.vstat[0]) == int(VarStat.AT_UPPER)
    assert np.asarray(st.basis).tolist() == [1]


def test_dual_all_flips_then_infeasible():
    """When every candidate flips and the violation survives, the dual is
    unbounded ⇒ primal INFEASIBLE (exact status, not MAX_ITER)."""
    # x1 + x2 ≥ 5 with x1 ∈ [0,1], x2 ∈ [0,2]: max attainable lhs is 3.
    A = jnp.array([[-1.0, -1.0, 1.0]])
    b = jnp.array([-5.0])
    c = jnp.array([0.1, 0.5, 0.0])
    lo = jnp.array([0.0, 0.0, 0.0])
    hi = jnp.array([1.0, 2.0, jnp.inf])
    basis = jnp.array([2], dtype=jnp.int32)
    vstat = jnp.array(
        [int(VarStat.AT_LOWER), int(VarStat.AT_LOWER), int(VarStat.BASIC)],
        dtype=jnp.int8,
    )
    st = resolve_dual(A, b, c, lo, hi, basis, vstat, jnp.eye(1), SolverOptions())
    assert int(st.status) == int(Status.INFEASIBLE)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_box_heavy_incremental_matches_oracle(seed):
    """Box-heavy warm re-solves: every variable boxed, added constraints force
    long entering steps — the flip path.  Oracle agreement + a pivot budget
    (the dual must stay ≪ a cold solve)."""
    rng = np.random.default_rng(seed)
    m, n = 8, 14
    prob = Problem(OptimizationDirection.Minimize)
    xs = [prob.add_var(float(rng.normal()), (0.0, float(rng.uniform(0.5, 2.0))))
          for _ in range(n)]
    A = rng.normal(size=(m, n))
    # rows through an interior point keep the base problem feasible
    x0 = rng.uniform(0.2, 0.4, size=n)
    for i in range(m):
        terms = [(xs[j], float(A[i, j])) for j in range(n)]
        prob.add_constraint(terms, ComparisonOp.Le, float(A[i] @ x0 + 0.5))
    sol = prob.solve()

    # a cutting row violated at the current vertex (forces dual re-solve)
    w = rng.uniform(0.5, 1.5, size=n)
    cur = sum(float(w[j]) * sol[xs[j]] for j in range(n))
    terms = [(xs[j], float(w[j])) for j in range(n)]
    sol2 = sol.add_constraint(terms, ComparisonOp.Ge, cur + 0.3)

    prob_ref = Problem(OptimizationDirection.Minimize)
    ys = [prob_ref.add_var(float(prob._obj[j]), (0.0, float(prob._hi[j])))
          for j in range(n)]
    for trm, op, rhs in prob._constraints:
        prob_ref.add_constraint([(ys[j], co) for (j, co) in trm], op, rhs)
    prob_ref.add_constraint([(ys[j], float(w[j])) for j in range(n)],
                            ComparisonOp.Ge, cur + 0.3)
    kind, obj_ref, _ = solve_with_oracle(prob_ref)
    assert kind == "optimal"
    assert sol2.objective() == pytest.approx(obj_ref, abs=1e-7 * (1 + abs(obj_ref)))
    # warm dual re-solve budget: far below a cold solve's O(m+n) pivots
    assert sol2._engine.iterations() <= 2 * (m + n)
