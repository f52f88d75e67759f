"""DYNAMIC method switching: measured GD+k vs JDQMR selection.

The reference's ``PRIMME_DYNAMIC`` builds an analytic cost model from
per-op timers inside the iteration (``primme_CostModel``,
``src/eigs/main_iter.c:67-110``; model derivation ``:2111-2170``;
switch thresholds 0.96/1.04 ``:1221-1228``) because a C loop can read the
wall clock anywhere. Under ``jit`` the loop body is compiled and timers
are not observable, so the TPU re-design measures the quantity the model
only estimates: run the solver in short *segments* (a bounded
``lax.while_loop``), time each segment on the host between device syncs,
score it by convergence progress (digits of residual reduction + locked
pairs), and keep the method with the better measured digits/second —
with the reference's hysteresis so we don't flap.

Both method variants share identical state shapes (same basis sizes, same
``prev_hvecs`` width), so the on-device ``SolverState`` transfers between
the two compiled loops with no copies.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..params import PrimmeParams, Method, Target, set_method
from .solver import (EigsResult, setup_solver, extract_result,
                     make_config, prepare_window, _run_segment_jit)


_SEG_OUTER = 10          # outer iterations per measured segment
_HYSTERESIS = 1.04       # switch only on >4% advantage (main_iter.c:1221)
_REPROBE_EVERY = 4       # re-measure the idle method every N settled segments


def _progress_score(cfg, resnorms, num_locked, anorm, eps):
    """Total "digits" converged: locked pairs count full depth; basis
    targets count their residual reduction below ||A||."""
    tol = max(eps if eps > 0 else 1e-12, 1e-300) * max(anorm, 1e-300)
    depth = np.log10(max(anorm, 1e-300) / tol)
    res = np.maximum(np.asarray(resnorms, dtype=np.float64), 1e-300)
    digits = np.clip(np.log10(max(anorm, 1e-300) / res), 0.0, depth)
    take = max(0, min(len(res), cfg.ne - int(num_locked)))
    return float(num_locked) * depth + float(np.sum(digits[:take]))


def solve_eigs_dynamic(A, p: PrimmeParams, *, B=None, K=None, v0=None,
                       ortho_const=None, key=None, dtype=None,
                       has_precond=None, shard=None, monitor=None,
                       convtest=None, method_trace=None) -> EigsResult:
    """Eigensolve with runtime GD+k <-> JDQMR switching.

    ``method_trace``: optional list; the method name of every measured
    segment is appended (observability for tests and the monitor)."""
    from .inner import jdqmr_inner_solve

    if has_precond is None:
        has_precond = K is not None

    # Two method variants over one shared state geometry: resolve the GD+k
    # variant first, then pin its shape-determining fields on the JDQMR one.
    base = p.with_(dynamic_method_switch=False)
    p_gd = set_method(Method.GD_Olsen_plusK, base, has_precond=has_precond,
                      has_mass=B is not None)
    meth_jd = (Method.JDQMR_ETol if p.target.is_extreme else Method.JDQMR)
    p_jd = set_method(meth_jd, base.with_(
        max_basis_size=p_gd.max_basis_size,
        min_restart_size=p_gd.min_restart_size,
        max_block_size=p_gd.max_block_size,
        locking=p_gd.locking), has_precond=has_precond,
        has_mass=B is not None)
    p_jd = p_jd.with_(max_prev_retain=p_gd.max_prev_retain)

    cfg_gd = make_config(p_gd)
    cfg_jd = make_config(p_jd)
    cfg, shifts, s = setup_solver(A, p_gd, B=B, v0=v0,
                                  ortho_const=ortho_const, key=key,
                                  dtype=dtype, shard=shard)

    # Segments run through the module-level _run_segment_jit (static
    # cfg/inner_solve/monitor/convtest), so repeated dynamic solves with
    # the same configuration reuse the compiled loops like solve_eigs.
    # With a monitor/convtest the static key includes the CLOSURE
    # identity — usually fresh per call (api.py builds `mon` per solve),
    # so the shared cache would retain two never-again-hittable
    # executables per solve; use per-call jits (garbage-collected with
    # the solve) in that case instead.
    if monitor is None and convtest is None:
        def _run(meth, s, end):
            return _run_segment_jit(
                cfg_gd if meth == "gd" else cfg_jd, A, B, K,
                None if meth == "gd" else jdqmr_inner_solve,
                shifts, s, end, False, None, None)
    else:
        from .solver import run_segment
        _local = {
            "gd": jax.jit(lambda s, end: run_segment(
                cfg_gd, A, B, K, None, shifts, s, end,
                monitor=monitor, convtest=convtest)),
            "jd": jax.jit(lambda s, end: run_segment(
                cfg_jd, A, B, K, jdqmr_inner_solve, shifts, s, end,
                monitor=monitor, convtest=convtest)),
        }

        def _run(meth, s, end):
            return _local[meth](s, end)

    # Warm BOTH compiled loops before anything is timed: a seg_end at
    # the current outer-iteration count compiles the full program but
    # executes zero iterations (the while_loop cond is false on entry),
    # so XLA compilation (seconds, vs millisecond segments) never lands
    # in a measured dt. Without this the first segment of each method
    # reads a near-zero digits/second rate and the 0.5-weighted EMA
    # carries half that bias into the next measurement — early GD-vs-
    # JDQMR switching driven by compile noise, not convergence.
    _warm_end = jnp.asarray(int(s.stats.num_outer_iterations), jnp.int32)
    for _m in ("gd", "jd"):
        jax.block_until_ready(_run(_m, s, _warm_end).done)

    _snap = jax.jit(lambda s: prepare_window(
        cfg_gd, s, shifts, B is not None)[0].cands.resnorms)

    def snapshot(s):
        return (np.asarray(_snap(s)), int(s.num_locked),
                float(s.stats.anorm_estimate))

    rates = {"gd": None, "jd": None}
    current = "gd"   # the reference also starts on GD+k (main_iter.c:2135)
    max_outer = min(p.max_outer_iterations, (1 << 31) - 1)
    max_mv = min(p.max_matvecs, (1 << 31) - 1)

    prev_snap = None
    segs_since_probe = 0   # segments since the idle method last ran
    while True:
        it0 = int(s.stats.num_outer_iterations)
        if bool(s.done) or bool(s.give_up) or it0 >= max_outer or \
                int(s.stats.num_matvecs) >= max_mv:
            break
        res_b, lock_b, anorm_b = prev_snap or snapshot(s)
        score_b = _progress_score(cfg_gd, res_b, lock_b, max(anorm_b, 1e-30),
                                  p.eps)
        if method_trace is not None:
            method_trace.append(current)
        t0 = time.perf_counter()
        s = _run(current, s, jnp.asarray(it0 + _SEG_OUTER, jnp.int32))
        jax.block_until_ready(s.stats.num_outer_iterations)
        dt = max(time.perf_counter() - t0, 1e-9)
        res_a, lock_a, anorm_a = prev_snap = snapshot(s)
        score_a = _progress_score(cfg_gd, res_a, lock_a, max(anorm_a, 1e-30),
                                  p.eps)
        rate = max(score_a - score_b, 0.0) / dt
        rates[current] = (rate if rates[current] is None
                          else 0.5 * (rates[current] + rate))

        other = "jd" if current == "gd" else "gd"
        if rates[other] is None:
            current = other           # initial exploration of both methods
            segs_since_probe = 0
        elif rates[other] > _HYSTERESIS * (rates[current] or 0.0):
            current = other
            segs_since_probe = 0
        elif segs_since_probe >= _REPROBE_EVERY:
            # The idle method's rate is stale — its last measurement may
            # predate a regime change (spectrum region, locking phase).
            # Force one measured segment on it so switching stays live
            # (the reference recomputes both cost models every iteration,
            # update_statistics, src/eigs/main_iter.c:2194; here the cost
            # model IS the measurement, so the loser must actually run).
            current = other
            segs_since_probe = 0
        else:
            segs_since_probe += 1

    return extract_result(cfg_gd, s, shifts, B is not None)
