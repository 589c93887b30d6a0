"""Checkpoint / resume: serialize the warm-start state (SURVEY.md §6.4).

The reference has no persistence; its in-memory analog is the `Solution`
owning the full `Solver` state.  Here the solver state is an explicit pytree
(`SimplexState`), so checkpointing is trivial: save the arrays, restore them,
and hand the result to any resolver (`resolve_dual`, `solve_canonical` with a
warm basis, or the incremental API).  Uses `numpy.savez` — no extra deps; an
orbax `PyTreeCheckpointer` works on the same pytree unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..engine.state import SimplexState

_FIELDS = SimplexState._fields


def save_state(path: str, state: SimplexState) -> None:
    """Write the solver state to `path` (.npz)."""
    np.savez(path, **{f: np.asarray(getattr(state, f)) for f in _FIELDS})


def load_state(path: str) -> SimplexState:
    """Read a solver state written by `save_state`."""
    with np.load(path) as z:
        return SimplexState(**{f: jnp.asarray(z[f]) for f in _FIELDS})
