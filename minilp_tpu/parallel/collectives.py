"""Deterministic cross-chip reductions for sharded pricing.

SURVEY.md §6.8: the required collective set is psum for partial reductions and a
combined argmax-with-index reduction for global entering-column choice, with
*deterministic* tie-breaking (lowest global index) so a sharded solve produces
the bit-identical pivot sequence as a single-device solve (SURVEY.md §5 (e)).

The argmax reduction gathers one (score, index) pair per shard (num_devices
elements — negligible traffic on ICI) and resolves ties by smallest index,
which composes with `jnp.argmax`'s first-maximum rule inside each shard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def argmax_with_index(
    score: jnp.ndarray, global_index: jnp.ndarray, axis_name: str
):
    """Global (max score, argmin index among ties) across a mesh axis.

    `score`: () local best score (−inf when the shard has no candidate);
    `global_index`: () the candidate's global column index.
    Returns (best_score, best_index) replicated across the axis.
    """
    scores = jax.lax.all_gather(score, axis_name)          # (n_shards,)
    indices = jax.lax.all_gather(global_index, axis_name)  # (n_shards,)
    best = jnp.max(scores)
    big = jnp.iinfo(indices.dtype).max
    # ties → smallest global index, matching single-device argmax semantics
    idx = jnp.min(jnp.where(scores == best, indices, big))
    return best, idx


def psum(x, axis_name: str):
    """Partial-sum reduction (residual norms, reduced-cost partials)."""
    return jax.lax.psum(x, axis_name)
