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


def _time_op(fn, *args, reps: int = 3) -> float:
    """Median wall time of ``fn(*args)`` after one warmup (jit-compiled,
    blocked on the result)."""
    import time

    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def time_breakdown(A, K, stats: dict, *, mmax: int, blk: int, cwin: int,
                   dtype, n: int = None) -> dict:
    """Host-timed per-category breakdown (``primme_stats``
    ``timeMatvec/timePrecond/timeOrtho/timeDense``,
    ``include/primme_eigs.h:121-126``).

    The solve itself is ONE fused XLA program — per-op host timers cannot
    exist inside it (the reference wraps every BLAS call in a wall-clock
    pair; XLA fuses those boundaries away). Instead each category's
    representative kernel is timed standalone at the solve's exact shapes
    and multiplied by the exact op counters the solve recorded. The
    categories cover the same work as the reference's timers:

    * ``time_matvec``   — ``num_matvecs`` block matvec columns
    * ``time_precond``  — ``num_preconds`` preconditioner columns
    * ``time_ortho``    — one ``block_ortho`` per outer iteration + init
    * ``time_dense``    — the fused VWXR residual kernel per window
    * ``time_global_sum`` — 0 on a single device; under a mesh the
      reductions are fused into the Gram kernels (counted there)

    Returns a new dict with the time_* keys added; ``time_other`` is the
    residual of ``elapsed_time`` (compile, projected solves, restarts).
    """
    import jax
    import jax.numpy as jnp

    from .core.linalg import block_ortho, compute_residuals

    n = n if n is not None else A.shape[0]
    key = jax.random.key(0)
    X = jax.random.normal(key, (n, blk), jnp.dtype(dtype)) \
        if not jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating) else \
        (jax.random.normal(key, (n, blk)) +
         1j * jax.random.normal(jax.random.fold_in(key, 1), (n, blk))
         ).astype(dtype)
    V = jnp.zeros((n, mmax), dtype).at[:, :blk].set(X)
    hv = jnp.zeros((mmax, cwin), dtype).at[:blk, :].set(
        jnp.ones((blk, cwin), dtype))
    hl = jnp.ones((cwin,), jnp.zeros((), dtype).real.dtype)

    t_mv = _time_op(jax.jit(A.matmat), X) / blk
    t_prec = 0.0
    if K is not None:
        from .operators import apply_precond
        sig = jnp.zeros((blk,), jnp.zeros((), dtype).real.dtype)
        t_prec = _time_op(jax.jit(
            lambda D: apply_precond(K, D, sig)), X) / blk
    t_ortho = _time_op(jax.jit(lambda x: block_ortho(
        x, (V, V), None, jnp.asarray(blk, jnp.int32),
        jax.random.key(1)).X), X)
    t_dense = _time_op(jax.jit(
        lambda v: compute_residuals(v, v, None, hv, hl).resnorms), V)

    out = dict(stats)
    nwin = stats["num_outer_iterations"] + stats["num_restarts"] + 1
    out["time_matvec"] = t_mv * stats["num_matvecs"]
    out["time_precond"] = t_prec * stats["num_preconds"]
    out["time_ortho"] = t_ortho * (stats["num_outer_iterations"] + 1)
    out["time_dense"] = t_dense * nwin
    out["time_global_sum"] = 0.0
    out["time_broadcast"] = 0.0
    out["time_other"] = max(0.0, stats.get("elapsed_time", 0.0)
                            - out["time_matvec"] - out["time_precond"]
                            - out["time_ortho"] - out["time_dense"])
    return out
