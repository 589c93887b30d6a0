"""Compute-path operations of the simplex engine.

Each op has a reference analog in `src/solver.rs` (SURVEY.md §3.1 C2) and is
written as a pure JAX function on fixed-shape arrays so it can be (a) fused by
XLA, (b) vmapped for the batched engine, (c) sharded for multi-chip pricing, and
(d) swapped for a Pallas kernel without touching the engine control flow.
"""

from .pricing import choose_entering, phase1_sigma, phase1_reduced_costs
from .ratio import ratio_test

__all__ = [
    "choose_entering",
    "phase1_sigma",
    "phase1_reduced_costs",
    "ratio_test",
]
