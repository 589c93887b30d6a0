"""Column-partitioned (tensor-parallel) pricing across the mesh's 'model' axis.

SURVEY.md §3.3 TP row / BASELINE north star: shard the non-basic columns of A
(equivalently, of the reduced-cost vector) across chips; each chip prices its
local columns, and the global entering column is chosen with a deterministic
argmax-with-index reduction over ICI (`parallel.collectives.argmax_with_index`).
Tie-breaking is lowest global index, so the sharded choice is bit-identical to
the single-device `ops.pricing.choose_entering` (determinism gate, SURVEY.md
§5 (e)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.pricing import EnteringChoice, eligibility
from .collectives import argmax_with_index
from .mesh import COL_AXIS


def choose_entering_sharded(
    mesh, d: jnp.ndarray, vstat: jnp.ndarray, opt_tol: float, bland: bool = False
) -> EnteringChoice:
    """Entering-column choice with `d`/`vstat` sharded over columns.

    Dantzig scoring (|d|² masked by eligibility); `bland=True` switches to the
    lowest-global-index rule.  Returns the same EnteringChoice as the
    single-device op, replicated on every shard.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(COL_AXIS), P(COL_AXIS)),
        out_specs=(P(), P(), P()),
        # outputs are value-replicated by construction (all_gather + identical
        # reductions on every shard); the static checker can't prove that
        check_vma=False,
    )
    def inner(d_loc, vstat_loc):
        n_loc = d_loc.shape[0]
        offset = jax.lax.axis_index(COL_AXIS) * n_loc
        elig_up, elig_dn = eligibility(d_loc, vstat_loc, opt_tol)
        elig = elig_up | elig_dn
        neg_inf = jnp.array(-jnp.inf, dtype=d_loc.dtype)
        if bland:
            idx = jnp.arange(n_loc, dtype=jnp.int32)
            j = jnp.argmin(jnp.where(elig, idx, n_loc)).astype(jnp.int32)
            # score: higher for lower index so the same argmax reduction works
            local_score = jnp.where(
                jnp.any(elig), -(offset + j).astype(d_loc.dtype), neg_inf
            )
        else:
            score = jnp.where(elig, d_loc * d_loc, neg_inf)
            j = jnp.argmax(score).astype(jnp.int32)
            local_score = score[j]
        gidx = (offset + j).astype(jnp.int32)
        best, q = argmax_with_index(local_score, gidx, COL_AXIS)
        found = best > neg_inf
        # fetch d[q] to fix the direction: owning shard contributes, others 0
        owns = (q >= offset) & (q < offset + n_loc)
        dq = jnp.where(owns, d_loc[jnp.clip(q - offset, 0, n_loc - 1)], 0.0)
        dq = jax.lax.psum(dq, COL_AXIS)
        direction = jnp.where(dq < 0, 1.0, -1.0).astype(d_loc.dtype)
        return q, direction, found

    q, direction, found = inner(d, vstat)
    return EnteringChoice(q=q, direction=direction, found=found)
