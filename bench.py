#!/usr/bin/env python
"""Headline benchmark: batched scenario-LP throughput on one chip.

BASELINE config 3 ("1k–64k independent random dense LPs (m,n ≤ 256) vmapped
per chip") — how many LPs per second does one TPU chip solve to verified
optimality, versus a state-of-the-art CPU solver (scipy/HiGHS) solving the
same instances sequentially on the host.

The device path is the Pallas simplex megakernel (one grid program per LP,
all state VMEM-resident, f32 iteration — minilp_tpu/ops/kernels/): every
returned objective is re-derived exactly in f64 from the discovered basis and
certified primal+dual feasible, so the reported throughput is for *certified*
1e-7-grade solutions, not approximate ones.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    # Persistent compilation cache (the TPU backend's remote compile is slow).
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import minilp_tpu  # noqa: F401  (enables x64)
    from minilp_tpu.parallel import batched
    from minilp_tpu.parallel.batched import solve_batch_certified
    from minilp_tpu.status import Status

    BATCH, M, NV = 1024, 32, 96

    def make(k):
        args = batched.make_random_batch(
            jax.random.PRNGKey(k), batch=BATCH, m=M, nv=NV
        )
        return args[:5]  # A, b, c, lo, hi

    def solve(args):
        # every lane certified (f64 recompute; host re-solve of rare
        # uncertified lanes is INCLUDED in the timed region)
        return solve_batch_certified(*args, max_iter=2000)

    # warmup/compile on one batch, then time on FRESH batches per run.
    res = solve(make(0))
    jax.block_until_ready(res.status)

    times, results = [], []
    for k in range(1, 4):
        args = make(k)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        res = solve(args)
        jax.block_until_ready(res.obj)  # includes the host f64 certification
        times.append(time.perf_counter() - t0)
        results.append((args, res))
    dt = min(times)
    lps_per_sec = BATCH / dt
    args, res = results[int(np.argmin(times))]

    statuses = np.asarray(res.status)
    n_optimal = int((statuses == int(Status.OPTIMAL)).sum())
    n_verified = int(np.asarray(res.verified).sum())

    # CPU baseline + independent correctness guard on a sample.
    from scipy.optimize import linprog

    A, b, c, lo, hi = [np.asarray(x) for x in args]
    sample = min(64, BATCH)
    t0 = time.perf_counter()
    max_gap = 0.0
    for i in range(sample):
        bounds = [
            (lo[i, j] if np.isfinite(lo[i, j]) else None,
             hi[i, j] if np.isfinite(hi[i, j]) else None)
            for j in range(c.shape[1])
        ]
        r = linprog(c[i], A_eq=A[i], b_eq=b[i], bounds=bounds, method="highs")
        if r.status == 0 and bool(res.verified[i]):
            gap = abs(float(res.obj[i]) - r.fun) / (1.0 + abs(r.fun))
            max_gap = max(max_gap, gap)
    cpu_dt = time.perf_counter() - t0
    cpu_lps_per_sec = sample / cpu_dt

    mean_iters = float(np.asarray(res.niter).mean())
    print(json.dumps({
        "metric": "batched_lp_throughput",
        "value": round(lps_per_sec, 2),
        "unit": "certified LPs/s (1024 dense 32x128 LPs, pallas megakernel)",
        "vs_baseline": round(lps_per_sec / cpu_lps_per_sec, 3),
        "baseline": "scipy-HiGHS sequential on host CPU (LPs/s)",
        "baseline_value": round(cpu_lps_per_sec, 2),
        "n_optimal": n_optimal,
        "n_verified": n_verified,
        "batch": BATCH,
        "max_rel_gap_vs_highs": float(f"{max_gap:.3g}"),
        "mean_simplex_iters": round(mean_iters, 1),
        "simplex_iters_per_sec": round(float(np.asarray(res.niter).sum() / dt), 1),
        "wall_s": round(dt, 4),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
