"""Modeling-layer unit tests (reference C1/C11: lib.rs doc-tests + inline tests)."""

import math

import numpy as np
import pytest

from minilp_tpu import (
    ComparisonOp,
    LinearExpr,
    OptimizationDirection,
    Problem,
    Variable,
)
from minilp_tpu.canonical import canonicalize
from minilp_tpu.status import VarStat


def test_linear_expr_operators():
    x, y, z = Variable(0), Variable(1), Variable(2)
    e = 2 * x + y - 3.0 * z
    assert e.terms() == [(0, 2.0), (1, 1.0), (2, -3.0)]
    e2 = e + e
    assert e2.terms() == [(0, 4.0), (1, 2.0), (2, -6.0)]
    e3 = -e
    assert e3.terms() == [(0, -2.0), (1, -1.0), (2, 3.0)]
    e4 = x - x
    assert e4.terms() == []


def test_linear_expr_from_iterable_and_add():
    x, y = Variable(0), Variable(1)
    e = LinearExpr([(1.0, x), (2.0, y), (0.5, x)])
    assert e.terms() == [(0, 1.5), (1, 2.0)]
    e.add(-1.5, x)
    assert e.terms() == [(1, 2.0)]


def test_add_var_bounds_validation():
    prob = Problem()
    with pytest.raises(ValueError):
        prob.add_var(1.0, (2.0, 1.0))
    with pytest.raises(ValueError):
        prob.add_var(1.0, (math.inf, None))
    with pytest.raises(ValueError):
        prob.add_var(1.0, (float("nan"), 1.0))


def test_constraint_unknown_var_rejected():
    prob = Problem()
    prob.add_var(1.0, (0, None))
    ghost = Variable(7)
    with pytest.raises(ValueError):
        prob.add_constraint(1.0 * ghost, ComparisonOp.Le, 1.0)


def test_canonicalize_shapes_and_layout():
    prob = Problem(OptimizationDirection.Maximize)
    x = prob.add_var(1.0, (0.0, None))
    y = prob.add_var(2.0, (0.0, 3.0))
    prob.add_constraint(x + y, ComparisonOp.Le, 4.0)
    prob.add_constraint(x - y, ComparisonOp.Ge, -1.0)
    prob.add_constraint(2 * x + y, ComparisonOp.Eq, 5.0)

    can = canonicalize(prob)
    assert can.m == 3 and can.nv == 2
    assert can.M % prob.options.row_align == 0
    assert can.N % prob.options.col_align == 0
    # objective negated for Maximize
    np.testing.assert_allclose(can.c[:2], [-1.0, -2.0])
    # slack identity block
    for i in range(can.M):
        assert can.A[i, can.slack_col(i)] == 1.0
    # slack bounds encode the ops
    assert can.lo[can.slack_col(0)] == 0.0 and can.hi[can.slack_col(0)] == math.inf
    assert can.lo[can.slack_col(1)] == -math.inf and can.hi[can.slack_col(1)] == 0.0
    assert can.lo[can.slack_col(2)] == 0.0 and can.hi[can.slack_col(2)] == 0.0
    # initial basis = slacks, everything else nonbasic; padding columns FIXED
    assert (can.basis0 == np.arange(can.nv, can.nv + can.M)).all()
    assert (can.vstat0[can.basis0] == int(VarStat.BASIC)).all()
    assert (can.vstat0[can.nv + can.M :] == int(VarStat.FIXED)).all()
    # padding rows are inert: zero row, zero rhs, fixed slack
    for i in range(can.m, can.M):
        assert can.b[i] == 0.0
        assert can.lo[can.slack_col(i)] == 0.0 == can.hi[can.slack_col(i)]
        row = can.A[i].copy()
        row[can.slack_col(i)] = 0.0
        assert not row.any()


def test_canonicalize_var_status_classification():
    prob = Problem()
    prob.add_var(0.0, (0.0, None))      # at lower
    prob.add_var(0.0, (None, 5.0))      # at upper
    prob.add_var(0.0, (None, None))     # free
    prob.add_var(0.0, (2.0, 2.0))       # fixed
    can = canonicalize(prob)
    assert can.vstat0[0] == int(VarStat.AT_LOWER)
    assert can.vstat0[1] == int(VarStat.AT_UPPER)
    assert can.vstat0[2] == int(VarStat.FREE)
    assert can.vstat0[3] == int(VarStat.FIXED)


def test_module_doc_examples():
    # The package and api module docstring examples double as the API spec
    # (the reference's doc-tests, SURVEY.md §5 #1).
    import doctest

    import minilp_tpu
    import minilp_tpu.api

    for mod in (minilp_tpu, minilp_tpu.api):
        results = doctest.testmod(mod, verbose=False)
        assert results.failed == 0, mod.__name__


def test_pair_iterables_both_orders():
    # the reference accepts (Variable, f64) pairs; we accept both orders
    from minilp_tpu import OptimizationDirection

    prob = Problem(OptimizationDirection.Maximize)
    x = prob.add_var(1.0, (0.0, None))
    y = prob.add_var(2.0, (0.0, 3.0))
    prob.add_constraint([(x, 1.0), (y, 1.0)], ComparisonOp.Le, 4.0)  # (var, coeff)
    sol = prob.solve()
    assert abs(sol.objective() - 7.0) < 1e-9
    sol = sol.add_constraint([(1.0, x)], ComparisonOp.Le, 0.5)       # (coeff, var)
    assert abs(sol.objective() - 6.5) < 1e-9
    e = LinearExpr([(x, 2.0), (1.0, y)])
    assert e.terms() == [(0, 2.0), (1, 1.0)]
