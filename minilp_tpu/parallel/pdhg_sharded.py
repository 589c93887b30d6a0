"""Row-sharded (distributed) PDHG — the SP/CP long-dimension analog.

The reference has no distributed solver at all (SURVEY.md §6.8 [CODE]); this
module is the build's answer to SURVEY.md §3.3/§6.7's SP-CP row: when a single
instance's CONSTRAINT dimension outgrows one chip's HBM, partition the rows of
A across the mesh and keep the PDHG loop otherwise unchanged.

Layout (scaling-book recipe: pick a mesh, shard the long axis, psum partials):

* A            → (M/P, N) row blocks, one per device on the mesh axis
* b, y, dr     → (M/P,) row blocks (co-located with their A rows)
* x, c, lo, hi, dc → replicated (N,)

The loop (engine/pdhg.py `_run_pdhg`) only touches A through `@`:

* ``A @ x``  — each device multiplies its block by the replicated x: a local
  matmul producing its own y block.  NO communication.
* ``Aᵀ @ y`` — each device computes the partial ``A_blkᵀ y_blk`` and a single
  ``psum`` over the mesh axis yields the replicated (N,) result.  This is the
  ONLY per-iteration collective: one (N,)-sized all-reduce riding ICI.

Row-space residual norms / dots (KKT error, certificates, adaptive-ω fits)
reduce through the same psum via `RowReduce`, so every scalar the loop
branches on (restart adoption, termination, status) is replicated — all
devices take identical decisions and the iterates stay coherent by
construction.  Determinism: psum order is fixed at compile time, so repeated
runs are bit-identical; vs. the single-device engine the only difference is
the summation ORDER inside reductions (float non-associativity), which the
gate in tests/test_parallel.py bounds at ~1e-12 on f64.

Padding rows (to make M divisible by the axis size) are all-zero rows with
b = 0: Ruiz leaves their scale at 1, their dual iterate stays exactly 0, and
they contribute 0 to every reduction — inert by construction, the same
invariant the simplex path uses (canonical.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from ..engine.pdhg import (
    PdhgState,
    RowReduce,
    _omega0,
    _ruiz_dense,
    _run_pdhg,
)
from ..options import SolverOptions
from .mesh import COL_AXIS


class _RowBlockOp:
    """The local row-block of a row-sharded A: `op @ x` → this shard's y rows."""

    def __init__(self, blk):
        self.blk = blk

    def __matmul__(self, x):
        return self.blk @ x


class _RowBlockOpT:
    """Aᵀ against a row-sharded y: local partial matmul + one psum."""

    def __init__(self, blk, axis_name):
        self.blk = blk
        self.axis_name = axis_name

    def __matmul__(self, y_blk):
        return lax.psum(self.blk.T @ y_blk, self.axis_name)


@lru_cache(maxsize=32)
def _build(mesh, axis_name: str, opts: SolverOptions):
    """Compile-cached shard_map'd PDHG solve for a (mesh, axis, opts) triple."""

    rr = RowReduce(
        sum=partial(lax.psum, axis_name=axis_name),
        max=partial(lax.pmax, axis_name=axis_name),
    )

    def core(A_blk, b_blk, c, lo, hi):
        dr_blk, dc = _ruiz_dense(A_blk, opts.pdhg_ruiz_iters, rr)
        As = A_blk * dr_blk[:, None] * dc[None, :]
        bs = b_blk * dr_blk
        cs = c * dc
        los = lo / dc
        his = hi / dc
        om0 = _omega0(bs, cs, dr_blk, dc, opts, rr)
        return _run_pdhg(
            _RowBlockOp(As), _RowBlockOpT(As, axis_name),
            bs, cs, los, his, dr_blk, dc, opts, om0, rr,
        )

    row = P(axis_name)
    rep = P()
    out_spec = PdhgState(
        x=rep, y=row, x_sum=rep, y_sum=row, x_rst=rep, y_rst=row,
        omega=rep, inner=rep, last_err=rep, niter=rep, status=rep, err=rep,
    )
    fn = shard_map(
        core,
        mesh=mesh,
        in_specs=(P(axis_name, None), row, rep, rep, rep),
        out_specs=out_spec,
        # every replicated output is value-replicated by construction (all
        # scalars pass through rr's psum/pmax); vma tracking can't see that
        # through the while_loop, so assert it manually instead
        check_vma=False,
    )
    return jax.jit(fn)


def solve_pdhg_sharded(
    A,
    b,
    c,
    lo,
    hi,
    opts: SolverOptions,
    mesh,
    axis_name: str = COL_AXIS,
) -> PdhgState:
    """Solve one canonical LP with the rows of A sharded over `axis_name`.

    Same contract as `engine.pdhg.solve_pdhg` (x/y in the ORIGINAL space,
    exact Status claims); rows are zero-padded to a multiple of the axis size
    and the padding is stripped from the returned state.
    """
    A = jnp.asarray(A)
    b = jnp.asarray(b)
    M, N = A.shape
    n_shards = mesh.shape[axis_name]
    Mp = -(-M // n_shards) * n_shards
    if Mp != M:
        A = jnp.pad(A, ((0, Mp - M), (0, 0)))
        b = jnp.pad(b, (0, Mp - M))
    st = _build(mesh, axis_name, opts)(
        A, b, jnp.asarray(c), jnp.asarray(lo), jnp.asarray(hi)
    )
    if Mp != M:
        st = st._replace(
            y=st.y[:M], y_sum=st.y_sum[:M], y_rst=st.y_rst[:M]
        )
    return st
