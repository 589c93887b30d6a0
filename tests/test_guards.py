"""Numerical guards (SURVEY.md §6.2): NaN-free graphs and run-to-run
determinism of the pivot sequence."""

import numpy as np
import jax
import jax.numpy as jnp

from minilp_tpu import DEFAULT_OPTIONS
from minilp_tpu.parallel.batched import make_random_batch, solve_batch

from .oracle import random_problem, solve_with_oracle


def test_no_nans_under_debug_nans():
    # jax_debug_nans raises on any NaN materializing in the solve graph.
    with jax.debug_nans(True):
        args = make_random_batch(jax.random.PRNGKey(3), 4, 6, 8)
        state = solve_batch(*args, opts=DEFAULT_OPTIONS)
        jax.block_until_ready(state.obj)
    assert np.isfinite(np.asarray(state.obj)).all()


def test_solve_is_deterministic():
    # Same inputs → bit-identical basis, objective, and iteration count.
    args = make_random_batch(jax.random.PRNGKey(9), 8, 8, 12)
    s1 = solve_batch(*args, opts=DEFAULT_OPTIONS)
    s2 = solve_batch(*args, opts=DEFAULT_OPTIONS)
    np.testing.assert_array_equal(np.asarray(s1.basis), np.asarray(s2.basis))
    np.testing.assert_array_equal(np.asarray(s1.niter), np.asarray(s2.niter))
    np.testing.assert_array_equal(np.asarray(s1.obj), np.asarray(s2.obj))


def test_problem_level_determinism():
    rng = np.random.default_rng(55)
    prob = random_problem(rng, 15, 12)
    outcome, _, _ = solve_with_oracle(prob)
    if outcome != "optimal":
        return
    sol1 = prob.solve()
    sol2 = prob.solve()
    assert sol1.objective() == sol2.objective()
    assert sol1._engine.iterations() == sol2._engine.iterations()
