"""Host sparse simplex engine gates (engine/hostlp.py).

The host engine is the exact-f64 certify/polish/incremental seam — the role
the reference's `src/solver.rs` + `src/lu.rs` play natively.  Gates: oracle
agreement on mixed random LPs (statuses included), eta-file FTRAN/BTRAN
exactness against dense linear algebra, and warm-start behavior.
"""

import numpy as np
import pytest

from minilp_tpu.canonical import canonicalize
from minilp_tpu.engine import hostlp
from minilp_tpu.options import SolverOptions
from minilp_tpu.status import Status, VarStat

from .oracle import random_problem, solve_with_oracle

_STATUS_NAME = {
    int(Status.OPTIMAL): "optimal",
    int(Status.INFEASIBLE): "infeasible",
    int(Status.UNBOUNDED): "unbounded",
}


@pytest.mark.parametrize("seed", range(8))
def test_hostlp_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    prob = random_problem(rng, nv=40, m=25, density=0.5)
    outcome, obj, _x = solve_with_oracle(prob)
    can = canonicalize(prob, dtype=np.float64)
    res = hostlp.solve_host_sparse(
        can.A, can.b, can.c, can.lo, can.hi, can.basis0, can.vstat0,
        opts=SolverOptions(),
    )
    assert res is not None
    assert _STATUS_NAME.get(res.status) == outcome
    if outcome == "optimal":
        got = can.obj_sign * res.obj
        assert abs(got - obj) <= 1e-7 * (1 + abs(obj))


def test_hostlp_netlib_shape_25fv47():
    """Cold solve at the 25fv47 shape agrees with the oracle (the host
    engine's Netlib-class correctness gate; ~15 s)."""
    from minilp_tpu.utils.synth import NETLIB_SHAPES, netlib_shaped_problem

    m, nv, d = NETLIB_SHAPES["25fv47"]
    prob = netlib_shaped_problem(m, nv, d, seed=1)
    outcome, obj, _ = solve_with_oracle(prob)
    assert outcome == "optimal"
    can = canonicalize(prob, dtype=np.float64)
    res = hostlp.solve_host_sparse(
        can.A, can.b, can.c, can.lo, can.hi, can.basis0, can.vstat0,
        opts=SolverOptions(),
    )
    assert res.status == int(Status.OPTIMAL)
    got = can.obj_sign * res.obj
    assert abs(got - obj) <= 1e-7 * (1 + abs(obj))


def test_hostlp_warm_restart_is_cheap():
    """Re-solving from the optimal basis terminates in O(1) pivots."""
    rng = np.random.default_rng(3)
    prob = random_problem(rng, nv=30, m=20, density=0.6)
    outcome, obj, _ = solve_with_oracle(prob)
    if outcome != "optimal":
        pytest.skip("instance not optimal")
    can = canonicalize(prob, dtype=np.float64)
    opts = SolverOptions()
    res = hostlp.solve_host_sparse(
        can.A, can.b, can.c, can.lo, can.hi, can.basis0, can.vstat0,
        opts=opts,
    )
    assert res.status == int(Status.OPTIMAL)
    warm = hostlp.solve_host_sparse(
        can.A, can.b, can.c, can.lo, can.hi, res.basis, res.vstat, opts=opts,
    )
    assert warm.status == int(Status.OPTIMAL)
    assert warm.niter <= 2
    assert abs(warm.obj - res.obj) <= 1e-9 * (1 + abs(res.obj))


def test_hostlp_singular_basis_returns_none():
    rng = np.random.default_rng(5)
    prob = random_problem(rng, nv=20, m=10, density=0.8)
    can = canonicalize(prob, dtype=np.float64)
    bad = np.zeros(can.M, dtype=np.int32)  # repeated column ⇒ singular
    assert hostlp.solve_host_sparse(
        can.A, can.b, can.c, can.lo, can.hi, bad, can.vstat0,
        opts=SolverOptions(),
    ) is None


def test_eta_file_ftran_btran_exact():
    """BasisLU with a few recorded etas solves against the updated basis
    exactly (compared to dense solves)."""
    rng = np.random.default_rng(7)
    m = 12
    A = rng.normal(size=(m, 3 * m))
    import scipy.sparse as sp

    A_csc = sp.csc_matrix(A)
    basis = np.arange(m)
    lu = hostlp.BasisLU(A_csc, basis)
    basis = basis.copy()
    # three successive pivots: column q replaces basis row r
    for q, r in [(2 * m, 3), (2 * m + 5, 7), (m + 1, 3)]:
        w = lu.ftran(A[:, q])
        lu.update(w, r)
        basis[r] = q
    Bd = A[:, basis]
    rhs = rng.normal(size=m)
    np.testing.assert_allclose(lu.ftran(rhs.copy()),
                               np.linalg.solve(Bd, rhs), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(lu.btran(rhs.copy()),
                               np.linalg.solve(Bd.T, rhs), rtol=1e-9, atol=1e-9)


# ---------------------------------------------------------------------------
# Host dual simplex (solve_host_dual) — the reference's restore_feasibility
# analog on the sparse host engine.
# ---------------------------------------------------------------------------


def _optimal_canonical(seed, nv=30, m=20, density=0.6):
    """(can, optimal HostResult) for a random feasible instance; None if the
    instance is not optimal (callers skip or scan on)."""
    rng = np.random.default_rng(seed)
    prob = random_problem(rng, nv=nv, m=m, density=density)
    outcome, _obj, _ = solve_with_oracle(prob)
    if outcome != "optimal":
        return None
    can = canonicalize(prob, dtype=np.float64)
    res = hostlp.solve_host_sparse(
        can.A, can.b, can.c, can.lo, can.hi, can.basis0, can.vstat0,
        opts=SolverOptions(),
    )
    assert res.status == int(Status.OPTIMAL)
    return can, res


@pytest.mark.parametrize("seed", range(6))
def test_host_dual_restores_feasibility(seed):
    """Perturbing b keeps the optimal basis dual feasible (d is b-free) but
    primal infeasible — exactly the restore_feasibility state.  The host
    dual re-solve must agree with a cold primal solve of the perturbed
    problem (itself oracle-gated above)."""
    pair = _optimal_canonical(seed)
    if pair is None:
        pytest.skip("instance not optimal")
    can, res = pair
    rng = np.random.default_rng(100 + seed)
    b2 = can.b + rng.normal(scale=0.5, size=can.M)
    opts = SolverOptions()
    dual = hostlp.solve_host_dual(
        can.A, b2, can.c, can.lo, can.hi, res.basis, res.vstat, opts=opts,
    )
    cold = hostlp.solve_host_sparse(
        can.A, b2, can.c, can.lo, can.hi, can.basis0, can.vstat0, opts=opts,
    )
    assert dual is not None
    assert cold is not None
    assert dual.status == cold.status
    if dual.status == int(Status.OPTIMAL):
        assert abs(dual.obj - cold.obj) <= 1e-7 * (1 + abs(cold.obj))


@pytest.mark.parametrize("seed", range(6))
def test_host_dual_sequence_matches_dense_engine(seed):
    """Pivot-sequence equivalence vs engine/dual.py: from the same warm
    (basis, vstat) on the same perturbed-b instance, the sparse host dual
    and the dense XLA dual must take the same pivots (same final basis,
    same iteration count)."""
    import jax.numpy as jnp

    from minilp_tpu.engine.dual import resolve_dual

    pair = _optimal_canonical(seed, nv=24, m=14, density=0.7)
    if pair is None:
        pytest.skip("instance not optimal")
    can, res = pair
    rng = np.random.default_rng(200 + seed)
    b2 = can.b + rng.normal(scale=0.4, size=can.M)
    opts = SolverOptions()
    host = hostlp.solve_host_dual(
        can.A, b2, can.c, can.lo, can.hi, res.basis, res.vstat, opts=opts,
    )
    Binv0 = np.linalg.inv(can.A[:, res.basis])
    dense = resolve_dual(
        jnp.asarray(can.A), jnp.asarray(b2), jnp.asarray(can.c),
        jnp.asarray(can.lo), jnp.asarray(can.hi),
        jnp.asarray(res.basis), jnp.asarray(res.vstat), jnp.asarray(Binv0),
        opts=opts,
    )
    assert host is not None
    assert host.status == int(dense.status)
    assert host.niter == int(dense.niter)
    if host.status == int(Status.OPTIMAL):
        np.testing.assert_array_equal(host.basis, np.asarray(dense.basis))
        np.testing.assert_array_equal(host.vstat, np.asarray(dense.vstat))
        assert abs(host.obj - float(dense.obj)) <= 1e-8 * (1 + abs(host.obj))


def test_host_dual_rejects_dual_infeasible_start():
    """A slack basis with a nonbasic negative reduced cost is not dual
    feasible; solve_host_dual must hand it back (None) instead of running."""
    rng = np.random.default_rng(11)
    prob = random_problem(rng, nv=20, m=12, density=0.8)
    can = canonicalize(prob, dtype=np.float64)
    if not (can.c[: can.nv] < -1e-6).any():
        can.c[0] = -1.0  # force a dual-infeasible nonbasic
    res = hostlp.solve_host_dual(
        can.A, can.b, can.c, can.lo, can.hi, can.basis0, can.vstat0,
        opts=SolverOptions(),
    )
    assert res is None


def test_host_dual_detects_infeasible():
    """Contradictory b perturbation: dual unbounded ⇒ INFEASIBLE, and the
    primal two-phase loop agrees."""
    found = False
    for seed in range(12):
        pair = _optimal_canonical(seed)
        if pair is None:
            continue
        can, res = pair
        rng = np.random.default_rng(300 + seed)
        b2 = can.b + rng.normal(scale=50.0, size=can.M)
        opts = SolverOptions()
        dual = hostlp.solve_host_dual(
            can.A, b2, can.c, can.lo, can.hi, res.basis, res.vstat, opts=opts,
        )
        if dual is None or dual.status != int(Status.INFEASIBLE):
            continue
        cold = hostlp.solve_host_sparse(
            can.A, b2, can.c, can.lo, can.hi, can.basis0, can.vstat0,
            opts=opts,
        )
        assert cold.status == int(Status.INFEASIBLE)
        found = True
        break
    if not found:
        pytest.skip("no infeasible perturbation found in the sweep")


def test_host_dual_stall_exit_on_degenerate_cycle():
    """Regression (round-4 bench post-mortem): after an optimal solve every
    nonbasic prices to d ≈ 0, and on some cut re-solves the dual simplex
    2-cycles between two states that Bland-on-entering does not break
    (measured: 42k iterations / 27 s on a basis the primal loop finishes in
    6 pivots).  The stall exit must hand back MAX_ITER within a couple of
    Bland windows instead of consuming the whole iteration budget."""
    from minilp_tpu.api import ComparisonOp, LinearExpr, Variable
    from minilp_tpu.utils.synth import netlib_shaped_problem

    prob = netlib_shaped_problem(250, 760, 0.05, seed=11)
    sol = prob.solve()
    rng = np.random.default_rng(5)
    cur = sol
    for k in range(2):
        js = rng.choice(760, size=8, replace=False)
        coeffs = rng.normal(size=8)
        val = sum(float(cf) * cur[Variable(int(j))]
                  for cf, j in zip(coeffs, js))
        expr = LinearExpr(
            (float(cf), Variable(int(j))) for cf, j in zip(coeffs, js)
        )
        if k == 0:
            cur = cur.add_constraint(expr, ComparisonOp.Le, val - 0.05)
            continue
        # capture the cycling warm state, then drive the dual DIRECTLY with
        # a huge budget: the stall exit must fire long before it
        h = cur._engine
        import minilp_tpu.engine.incremental as inc  # noqa: F401

        basis0 = np.asarray(h.state.basis)
        vstat0 = np.asarray(h.state.vstat)
        cur = cur.add_constraint(expr, ComparisonOp.Le, val - 0.05)
        can = h.can
        res = hostlp.solve_host_dual(
            can.A, can.b, can.c, can.lo, can.hi, basis0, vstat0,
            opts=SolverOptions(), max_iter=50_000,
        )
        # the edit happened through the public path; this direct replay from
        # the PRE-edit state is dual feasible for the PRE-edit problem and
        # terminates immediately OR (on the cycling class) is rescued by the
        # anti-cycling cost perturbation — either way it must not burn the
        # 50k budget (the stall exit remains the final backstop)
        assert res is None or res.niter < 2_000


def test_host_dual_perturbation_path_is_exact():
    """VERDICT r4 #6: the anti-cycling cost perturbation must produce EXACT
    answers.  Force the perturbation to fire almost immediately
    (bland_after=1) on a fully dual-degenerate warm re-solve — duplicated
    columns, zero objective, every nonbasic at d = 0 — and check the dual
    loop terminates OPTIMAL inside itself with the oracle's objective."""
    from scipy.optimize import linprog

    rng = np.random.default_rng(7)
    m, base_cols, dup = 24, 18, 4
    nv = base_cols * dup
    A_struct = np.repeat(rng.normal(size=(m, base_cols)), dup, axis=1)
    A = np.concatenate([A_struct, np.eye(m)], axis=1)  # Le rows: slack >= 0
    c = np.concatenate([np.zeros(nv), rng.normal(size=m) * 0.0])
    # a nonzero objective on a FEW columns only (the rest dual-degenerate)
    c[: dup] = 1.0
    x0 = rng.uniform(0.2, 0.8, size=nv)
    b = A_struct @ x0 + rng.uniform(0.1, 0.5, size=m)
    lo = np.concatenate([np.zeros(nv), np.zeros(m)])
    hi = np.concatenate([np.ones(nv), np.full(m, np.inf)])
    basis0 = np.arange(nv, nv + m, dtype=np.int32)
    vstat0 = np.concatenate([
        np.full(nv, int(VarStat.AT_LOWER), dtype=np.int8),
        np.full(m, int(VarStat.BASIC), dtype=np.int8),
    ])
    opts = SolverOptions()
    res0 = hostlp.solve_host_sparse(A, b, c, lo, hi, basis0, vstat0,
                                    opts=opts)
    assert res0.status == int(Status.OPTIMAL)
    # perturb b to violate some basics: the warm basis stays dual feasible
    b2 = b - rng.uniform(0.0, 1.0, size=m)
    import dataclasses

    popts = dataclasses.replace(opts, bland_after=1)  # perturb ~immediately
    res = hostlp.solve_host_dual(A, b2, c, lo, hi, res0.basis, res0.vstat,
                                 opts=popts, max_iter=50_000)
    assert res is not None
    assert res.status == int(Status.OPTIMAL)
    assert 0 < res.niter < 200  # tens of pivots, not a cycling budget burn
    r = linprog(c[:nv], A_ub=A_struct, b_ub=b2,
                bounds=[(0.0, 1.0)] * nv, method="highs")
    assert r.status == 0
    assert abs(res.obj - r.fun) <= 1e-8 * (1 + abs(r.fun))


# ---------------------------------------------------------------------------
# Crossover basis identification (engine/crossover.py) unit gates.
# ---------------------------------------------------------------------------


def test_identify_basis_recovers_optimal_basis():
    """Feeding identify_basis the EXACT optimal vertex must recover a basis
    the polish finishes in ~0 pivots."""
    from minilp_tpu.engine import crossover

    rng = np.random.default_rng(21)
    prob = random_problem(rng, nv=40, m=25, density=0.5)
    outcome, obj, _ = solve_with_oracle(prob)
    if outcome != "optimal":
        pytest.skip("instance not optimal")
    can = canonicalize(prob, dtype=np.float64)
    opts = SolverOptions()
    res = hostlp.solve_host_sparse(
        can.A, can.b, can.c, can.lo, can.hi, can.basis0, can.vstat0,
        opts=opts,
    )
    assert res.status == int(Status.OPTIMAL)
    # exact optimal x and reduced costs from the certified basis
    import scipy.sparse as sp

    A = np.asarray(can.A, np.float64)
    lu = hostlp.BasisLU(sp.csc_matrix(A), np.asarray(res.basis))
    vstat = np.asarray(res.vstat, dtype=np.int64)
    xN = hostlp._nonbasic_x(vstat, can.lo, can.hi)
    xB = lu.ftran(can.b - A @ xN)
    x = np.array(xN)
    x[np.asarray(res.basis)] = xB
    y = lu.btran(can.c[np.asarray(res.basis)])
    d = can.c - y @ A
    basis, vstat2 = crossover.identify_basis(
        A, can.lo, can.hi, x, d, np.asarray(can.basis0)
    )
    # nonsingular by construction
    assert hostlp.factorize_basis(A, basis) is not None
    polish = hostlp.solve_host_sparse(
        can.A, can.b, can.c, can.lo, can.hi, basis, vstat2, opts=opts,
    )
    assert polish.status == int(Status.OPTIMAL)
    assert abs(polish.obj - res.obj) <= 1e-9 * (1 + abs(res.obj))
    assert polish.niter <= 10  # identification from the exact vertex ≈ free


def test_identify_basis_survives_degenerate_iterate():
    """A noisy iterate (the realistic crossover input) must still yield a
    NONSINGULAR basis — the slack-seeded eta crash's whole job."""
    from minilp_tpu.engine import crossover

    rng = np.random.default_rng(22)
    prob = random_problem(rng, nv=50, m=30, density=0.4)
    can = canonicalize(prob, dtype=np.float64)
    A = np.asarray(can.A, np.float64)
    x = rng.normal(size=can.N)  # garbage iterate: crash must still succeed
    d = rng.normal(size=can.N)
    basis, vstat = crossover.identify_basis(
        A, can.lo, can.hi, x, d, np.asarray(can.basis0)
    )
    assert hostlp.factorize_basis(A, basis) is not None
    assert len(np.unique(basis)) == can.M
    assert (np.asarray(vstat)[basis] == int(VarStat.BASIC)).all()
