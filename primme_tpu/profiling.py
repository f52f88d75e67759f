"""Profiling hooks (the reference's -DPRIMME_PROFILE analogue).

The reference compiles a regex-gated wall-clock tracer into every call
frame (``src/include/common.h:355-398``) and reports matches through the
monitor. Under jit, per-op host timers don't exist; the TPU-native answer
is the XLA profiler: a captured trace attributes device time to every
fused kernel of the solve (matvecs, Gram products, the projected solve)
with far finer granularity than the reference's per-function timers.

    with primme_tpu.profiling.trace("/tmp/primme_trace"):
        eigsh(A, k=10, ...)
    # then: xprof / tensorboard --logdir /tmp/primme_trace

Coarse per-solve counters (matvecs, restarts, inner iterations, locked
pairs, adaptive floors) are always available via ``return_stats``; the
outer-iteration event stream via ``monitor=``/``return_history``.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA profiler trace of the enclosed solves."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
