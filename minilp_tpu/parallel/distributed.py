"""Multi-host runtime initialization + scaling-efficiency measurement.

SURVEY.md §6.8: the "distributed backend" is JAX's multi-controller runtime
plus XLA collectives — no custom transport.  `init_distributed` wraps
`jax.distributed.initialize` (env-driven on TPU pods: each host calls it, then
`jax.devices()` spans the slice and the mesh constructors in
`parallel.mesh` lay axes over ICI/DCN automatically).

`measure_scaling` is the BASELINE protocol harness ("≥70% iterations/s scaling
efficiency at 2 hosts"): batched throughput at 1 device vs N devices on the
same mesh shape.  On a real pod slice each device is an independent chip and
the efficiency is meaningful; on the CI's virtual CPU mesh the devices share
host cores, so the harness is smoke-tested but its numbers are not asserted.
"""

from __future__ import annotations

import time
from typing import Optional

import jax

from ..options import SolverOptions
from ..utils import records
from . import batched
from .mesh import make_mesh


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX multi-controller runtime (no-op if single-process).

    On TPU pods all arguments are inferred from the environment; pass them
    explicitly for CPU/GPU multi-process testing.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def measure_scaling(
    n_devices: int,
    batch_per_device: int = 128,
    m: int = 16,
    nv: int = 24,
    opts: SolverOptions = SolverOptions(max_iter=500),
) -> dict:
    """Throughput at 1 device vs `n_devices` (same per-device batch).

    Returns {"t1": ..., "tn": ..., "efficiency": ...} where efficiency is
    (LPs/s at n) / (n × LPs/s at 1) — the BASELINE scaling metric.
    """
    def run(nd: int, batch: int) -> float:
        mesh = make_mesh(n_data=nd, n_model=1, devices=jax.devices()[:nd])
        args = batched.make_random_batch(jax.random.PRNGKey(0), batch, m, nv)
        state = batched.solve_batch_sharded(mesh, *args, opts=opts)  # compile
        jax.block_until_ready(state.obj)
        args = batched.make_random_batch(jax.random.PRNGKey(1), batch, m, nv)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        state = batched.solve_batch_sharded(mesh, *args, opts=opts)
        jax.block_until_ready(state.obj)
        dt = time.perf_counter() - t0
        return batch / dt

    r1 = run(1, batch_per_device)
    rn = run(n_devices, batch_per_device * n_devices)
    result = {
        "lps_per_sec_1dev": r1,
        "lps_per_sec_ndev": rn,
        "n_devices": n_devices,
        "efficiency": rn / (n_devices * r1),
        "backend": jax.default_backend(),
        "batch_per_device": batch_per_device,
        "m": m,
        "nv": nv,
    }
    # Trend tracking: the >=70%-at-2-hosts BASELINE metric is unmeasurable on
    # a single chip / virtual CPU mesh, but every run leaves a JSON record so
    # real-pod numbers slot into the same series the moment hardware exists.
    if records.enabled():
        records.emit(records.SolveRecord(
            event="scaling_harness", engine="simplex", status="OPTIMAL",
            rows=m, cols=nv, padded_rows=m, padded_cols=nv + m,
            iterations=0, objective=None, wall_s=0.0,
            backend=jax.default_backend(), dtype=opts.dtype,
            extra=result,
        ))
    return result
