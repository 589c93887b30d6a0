"""Profiling hooks (SURVEY.md §6.1).

The reference's only profiling surface is criterion benches; here the solver is
one compiled computation, so the natural tools are `jax.profiler` traces
(Perfetto / TensorBoard) plus the per-solve `iters_per_sec` records
(utils/records.py).  This module just packages the trace incantation.
"""

from __future__ import annotations

import contextlib
import time

import jax

# ---------------------------------------------------------------------------
# Stage timers: coarse host-side wall-clock attribution for a single solve.
# The round-3 verdict's flagship question was "where do ~550 s of cold-process
# overhead go at maros shape?" — these counters let bench.py publish the
# breakdown (first kernel launch incl. compile-cache load / later chunks /
# host polish / certify rebuild) from inside the real driver path, not from a
# re-run.  Not thread-safe by design (one diagnosed solve at a time).
# ---------------------------------------------------------------------------

_stages: dict[str, float] = {}


def reset_stages() -> None:
    _stages.clear()


def record_stage(name: str, seconds: float) -> None:
    _stages[name] = _stages.get(name, 0.0) + float(seconds)


def bump_stage(name: str, count: int = 1) -> None:
    _stages[name] = _stages.get(name, 0) + count


def stages() -> dict[str, float]:
    """Snapshot of the accumulated stage walls (seconds) / counters."""
    return {k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in _stages.items()}


@contextlib.contextmanager
def stage(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        record_stage(name, time.perf_counter() - t0)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/minilp_tpu_trace"):
    """Profile a block of solves:

        with profiling.trace("/tmp/tr"):
            prob.solve()

    View with TensorBoard (`tensorboard --logdir /tmp/tr`) or upload the
    contained .pb to ui.perfetto.dev.
    """
    with jax.profiler.trace(log_dir):
        yield log_dir
