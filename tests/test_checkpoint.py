"""Checkpoint/resume gate (SURVEY.md §6.4): the state pytree round-trips
through disk and resumes incremental work bit-identically."""

import numpy as np

from minilp_tpu import ComparisonOp, OptimizationDirection, Problem
from minilp_tpu.utils.checkpoint import load_state, save_state


def test_state_roundtrip_and_resume(tmp_path):
    prob = Problem(OptimizationDirection.Maximize)
    x = prob.add_var(1.0, (0.0, 3.0))
    y = prob.add_var(2.0, (0.0, 3.0))
    prob.add_constraint(x + y, ComparisonOp.Le, 4.0)
    sol = prob.solve()

    path = str(tmp_path / "state.npz")
    save_state(path, sol._engine.state)
    restored = load_state(path)
    for f in restored._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(restored, f)),
            np.asarray(getattr(sol._engine.state, f)),
            err_msg=f,
        )

    # resume incremental work from the restored state
    sol._engine.state = restored
    sol2 = sol.add_constraint(1.0 * x, ComparisonOp.Le, 0.5)
    assert abs(sol2.objective() - 6.5) < 1e-9
