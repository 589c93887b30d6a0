"""Profiling hooks (SURVEY.md §6.1).

The reference's only profiling surface is criterion benches; here the solver is
one compiled computation, so the natural tools are `jax.profiler` traces
(Perfetto / TensorBoard) plus the per-solve `iters_per_sec` records
(utils/records.py).  This module just packages the trace incantation.
"""

from __future__ import annotations

import contextlib

import jax


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
