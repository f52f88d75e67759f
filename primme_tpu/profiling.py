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


_SCOPES = ("pt_matvec", "pt_precond", "pt_ortho", "pt_dense")


def measure_breakdown(fn, *args, logdir: str = None) -> dict:
    """MEASURED in-solve time breakdown (``primme_stats``
    ``timeMatvec/timePrecond/timeOrtho/timeDense``,
    ``include/primme_eigs.h:121-126``).

    Runs ``fn(*args)`` once under the XLA profiler and attributes the
    captured per-op device self-times to the solver's phase scopes
    (``pt_matvec``/``pt_precond``/``pt_ortho``/``pt_dense`` — every
    operator application, preconditioner application, block
    orthogonalization, and dense candidate/restart kernel in the package
    is tagged). Unattributed device time is ``time_other``; ``device_idle``
    is time the chip sat waiting (dispatch/host). This is an observation
    of the actual fused solve, not a re-timing estimate: the categories
    plus other plus idle sum to the traced device wall clock.

    Returns {} when the backend's profiler exposes no per-op device stats
    (the CPU backend) — callers fall back to :func:`time_breakdown`.
    """
    import glob
    import json
    import tempfile
    import time

    import jax

    out = fn(*args)               # compile outside the trace
    jax.block_until_ready(out)
    logdir = logdir or tempfile.mkdtemp(prefix="primme_tpu_prof_")
    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()

    try:
        from xprof.convert import raw_to_tool_data as rtd
    except Exception:  # pragma: no cover - parsing tool not present
        return {}
    files = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
    if not files:
        return {}
    data, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
    s = data if isinstance(data, str) else data.decode()
    tables = json.loads(s)
    buckets = {k: 0.0 for k in _SCOPES}
    other = idle = 0.0
    seen_device = False
    tbl = tables[0] if tables else {}
    cols = [c["id"] for c in tbl.get("cols", [])]
    for row in tbl.get("rows", []):
        d = dict(zip(cols, [c.get("v") for c in row["c"]]))
        if d.get("host_or_device") != "Device":
            continue
        seen_device = True
        us = float(d.get("total_self_time") or 0.0)
        name = str(d.get("operation") or "")
        if name == "IDLE":
            idle += us
            continue
        for k in _SCOPES:
            if f"/{k}/" in name or name.startswith(k):
                buckets[k] += us
                break
        else:
            other += us
    if not seen_device:
        return {}
    sec = 1e-6
    return {
        "time_matvec": buckets["pt_matvec"] * sec,
        "time_precond": buckets["pt_precond"] * sec,
        "time_ortho": buckets["pt_ortho"] * sec,
        "time_dense": buckets["pt_dense"] * sec,
        "time_other": other * sec,
        "device_idle": idle * sec,
        "time_global_sum": 0.0,
        "time_broadcast": 0.0,
        "profiled_wall": wall,
        "time_source": "measured",
    }


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
