#!/usr/bin/env python
"""Headline benchmark: batched scenario-LP throughput on one chip.

BASELINE config 3 ("1k–64k independent random dense LPs (m,n ≤ 256) vmapped
per chip") — the clearest apples-to-apples number against the single-threaded
reference: how many LPs per second does one TPU chip solve to optimality,
versus a state-of-the-art CPU solver (scipy/HiGHS) solving the same instances
one at a time on the host.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    # Persistent compilation cache: the TPU backend's remote compile is slow
    # (minutes for the full solver graph); cache executables across runs.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import minilp_tpu  # noqa: F401  (enables x64)
    from minilp_tpu.options import SolverOptions
    from minilp_tpu.parallel import batched
    from minilp_tpu.status import Status

    BATCH, M, NV = 1024, 24, 32
    opts = SolverOptions(max_iter=2000)

    # warmup/compile on one batch, then time on FRESH batches (new PRNG key per
    # run): honest timing, and it sidesteps re-execution-on-identical-args
    # quirks observed in the TPU runtime.
    warm = batched.make_random_batch(jax.random.PRNGKey(0), batch=BATCH, m=M, nv=NV)
    state = batched.solve_batch(*warm, opts=opts)
    jax.block_until_ready(state.obj)

    times = []
    for k in range(1, 4):
        args = batched.make_random_batch(
            jax.random.PRNGKey(k), batch=BATCH, m=M, nv=NV
        )
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        state = batched.solve_batch(*args, opts=opts)
        jax.block_until_ready(state.obj)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    lps_per_sec = BATCH / dt

    statuses = np.asarray(state.status)
    n_optimal = int((statuses == int(Status.OPTIMAL)).sum())

    # correctness guard + CPU baseline on a sample of the same instances
    from scipy.optimize import linprog

    A, b, c, lo, hi, _, _ = [np.asarray(x) for x in args]
    sample = min(64, BATCH)
    t0 = time.perf_counter()
    max_gap = 0.0
    for i in range(sample):
        bounds = [
            (lo[i, j] if np.isfinite(lo[i, j]) else None,
             hi[i, j] if np.isfinite(hi[i, j]) else None)
            for j in range(c.shape[1])
        ]
        res = linprog(c[i], A_eq=A[i], b_eq=b[i], bounds=bounds, method="highs")
        if res.status == 0:
            gap = abs(float(state.obj[i]) - res.fun) / (1.0 + abs(res.fun))
            max_gap = max(max_gap, gap)
    cpu_dt = time.perf_counter() - t0
    cpu_lps_per_sec = sample / cpu_dt

    mean_iters = float(np.asarray(state.niter).mean())
    iters_per_sec = float(np.asarray(state.niter).sum() / dt)

    print(json.dumps({
        "metric": "batched_lp_throughput",
        "value": round(lps_per_sec, 2),
        "unit": "LPs/s (1024 dense 24x56 LPs to optimality, f64)",
        "vs_baseline": round(lps_per_sec / cpu_lps_per_sec, 3),
        "baseline": "scipy-HiGHS sequential on host CPU (LPs/s)",
        "baseline_value": round(cpu_lps_per_sec, 2),
        "n_optimal": n_optimal,
        "batch": BATCH,
        "max_rel_gap_vs_highs": float(f"{max_gap:.3g}"),
        "mean_simplex_iters": round(mean_iters, 1),
        "simplex_iters_per_sec": round(iters_per_sec, 1),
        "wall_s": round(dt, 4),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
