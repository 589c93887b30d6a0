"""Solver state pytree.

The reference's `Solver` struct holds the basis, variable states, current values,
reduced costs and the factorized basis (`src/solver.rs (struct Solver)` [CODE]).
Here that state is an explicit immutable pytree (SURVEY.md §6.4): it is the
warm-start handle, the checkpoint format, and the carry of every `lax.while_loop`
all at once.  All arrays have static padded shapes (M rows, N columns).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class SimplexState(NamedTuple):
    """Carry of the simplex loops; every field is a JAX array (device-resident).

    Invariants between iterations (up to roundoff, restored at refactorization):
      * ``basis`` holds the column index of the basic variable of each row;
        ``vstat[basis] == BASIC`` and exactly M entries of ``vstat`` are BASIC.
      * ``Binv @ A[:, basis] == I``.
      * ``xB == Binv @ (b - A @ x_nonbasic)``.
      * ``d == c - (c[basis] @ Binv) @ A`` with ``d[basis] == 0`` (phase 2 only).
    """

    basis: jnp.ndarray   # (M,) int32 — basic variable per row
    vstat: jnp.ndarray   # (N,) int8  — VarStat per variable
    xB: jnp.ndarray      # (M,) f     — values of basic variables
    d: jnp.ndarray       # (N,) f     — reduced costs (valid during phase 2)
    Binv: jnp.ndarray    # (M, M) f   — maintained basis inverse
    obj: jnp.ndarray     # ()  f      — canonical (minimize-form) objective value
    niter: jnp.ndarray   # ()  int32  — total simplex iterations so far
    status: jnp.ndarray  # ()  int32  — Status code
    noimprove: jnp.ndarray  # () int32 — iterations since last progress (anti-cycling)
    best: jnp.ndarray    # ()  f      — best progress metric seen (phase-dependent)
    weights: jnp.ndarray  # (N,) f    — Devex reference weights γ (pricing)
    phase: jnp.ndarray   # () int32  — 1 (feasibility) or 2 (optimality)
