"""PDHG first-order engine gate (BASELINE config 5 analog, SURVEY.md §3.3):
objective parity with the oracle at loosened tolerance, batched vmap use, and
the engine option wiring."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from minilp_tpu import OptimizationDirection, Problem, ComparisonOp, SolverFailure
from minilp_tpu.options import SolverOptions
from minilp_tpu.engine.pdhg import solve_pdhg
from minilp_tpu.status import Status

from .oracle import random_problem, solve_with_oracle

PDHG_OPTS = SolverOptions(engine="pdhg", feas_tol=1e-7, pdhg_max_iter=400_000)


def rel_close(a, b, tol=1e-5):
    return abs(a - b) <= tol * (1.0 + abs(b))


def test_pdhg_simple_problem():
    prob = Problem(OptimizationDirection.Maximize, options=PDHG_OPTS)
    x = prob.add_var(1.0, (0.0, None))
    y = prob.add_var(2.0, (0.0, 3.0))
    prob.add_constraint(x + y, ComparisonOp.Le, 4.0)
    sol = prob.solve()
    assert rel_close(sol.objective(), 7.0)
    assert rel_close(sol[x], 1.0, tol=1e-4)
    assert rel_close(sol[y], 3.0, tol=1e-4)


@pytest.mark.parametrize("seed", range(5))
def test_pdhg_random_matches_oracle(seed):
    rng = np.random.default_rng(3000 + seed)
    prob = random_problem(
        rng, nv=int(rng.integers(5, 20)), m=int(rng.integers(3, 15)),
        frac_free=0.0,  # keep iterates bounded: boxed/one-sided vars only
    )
    prob.options = PDHG_OPTS
    outcome, obj, _x = solve_with_oracle(prob)
    if outcome != "optimal":
        pytest.skip("instance not optimal")
    sol = prob.solve()
    assert rel_close(sol.objective(), obj), (sol.objective(), obj)


def test_pdhg_incremental_not_supported():
    prob = Problem(options=PDHG_OPTS)
    x = prob.add_var(1.0, (0.0, 5.0))
    prob.add_constraint(1.0 * x, ComparisonOp.Ge, 1.0)
    sol = prob.solve()
    with pytest.raises(SolverFailure, match="simplex"):
        sol.add_constraint(1.0 * x, ComparisonOp.Le, 3.0)


def test_pdhg_batched_vmap():
    # the engine is plain JAX: vmap over a batch of canonical LPs just works
    from minilp_tpu.parallel.batched import make_random_batch

    key = jax.random.PRNGKey(5)
    B, m, nv = 8, 6, 10
    A, b, c, lo, hi, _, _ = make_random_batch(key, B, m, nv)
    opts = SolverOptions(engine="pdhg", feas_tol=1e-7)
    out = jax.vmap(lambda A, b, c, lo, hi: solve_pdhg(A, b, c, lo, hi, opts=opts))(
        A, b, c, lo, hi
    )
    assert (np.asarray(out.status) == int(Status.OPTIMAL)).all()
    # cross-check objectives against the simplex engine on the same batch
    from minilp_tpu.parallel.batched import solve_batch
    simplex = solve_batch(A, b, c, lo, hi,
                          jnp.zeros_like(c).astype(jnp.int8).at[:, nv:].set(4),
                          jnp.broadcast_to(jnp.arange(nv, nv + m, dtype=jnp.int32), (B, m)),
                          opts=SolverOptions())
    pdhg_obj = np.einsum("bn,bn->b", np.asarray(c), np.asarray(out.x))
    np.testing.assert_allclose(pdhg_obj, np.asarray(simplex.obj), rtol=1e-4, atol=1e-4)
