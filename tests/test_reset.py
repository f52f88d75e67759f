"""Direct tests of the basis-reset recovery path.

The reference rebuilds the basis when accumulated restart roundoff poisons
the residuals (``src/eigs/main_iter.c:853-896``); our analog is
``core/solver.do_reset``. Round-1 review noted the reset machinery was only
exercised indirectly — these tests corrupt a solver state on purpose and
verify every invariant ``do_reset`` must restore.
"""

import numpy as np
import jax
import jax.numpy as jnp

from primme_tpu import Method, PrimmeParams, set_method
from primme_tpu.operators import DenseOperator
from primme_tpu.core import solver as S


def _setup(n=80, k=4, dtype=jnp.float64):
    rng = np.random.default_rng(0)
    Ad = rng.normal(size=(n, n))
    Ad = (Ad + Ad.T) / 2 + np.diag(np.linspace(1.0, 50.0, n))
    A = DenseOperator(jnp.asarray(Ad, dtype))
    p = PrimmeParams(n=n, num_evals=k, eps=1e-10)
    p = set_method(Method.GD_Olsen_plusK, p)
    cfg, shifts, s0 = S.setup_solver(A, p, dtype=dtype)
    return A, cfg, s0, np.asarray(Ad)


def test_do_reset_restores_invariants():
    A, cfg, s0, Ad = _setup()
    b = int(s0.b)
    assert b >= 2

    # Poison the state the way a long run would: V slightly non-orthonormal,
    # W inconsistent with A V, H garbage, stagnation counters pegged.
    key = jax.random.key(7)
    V = s0.V + 1e-3 * jax.random.normal(key, s0.V.shape, s0.V.dtype)
    V = V * (jnp.arange(cfg.mmax) < b)[None, :].astype(V.dtype)
    s = s0._replace(
        V=V,
        W=jnp.ones_like(s0.W),
        H=jnp.full_like(s0.H, 3.0),
        prev_hvecs=jnp.ones_like(s0.prev_hvecs),
        stall_restarts=jnp.asarray(12, jnp.int32),
        restarts_since_reset=jnp.asarray(9, jnp.int32),
        best_res=jnp.asarray(1e-3, s0.best_res.dtype),
    )

    r = S.do_reset(cfg, A, None, s)
    nk = int(r.b)
    assert nk == b  # small perturbation: no column lost

    Vk = np.asarray(r.V)[:, :nk]
    # orthonormal again
    G = Vk.T @ Vk
    assert np.abs(G - np.eye(nk)).max() < 1e-12
    # W = A V rebuilt, H = V^H W consistent
    Wk = np.asarray(r.W)[:, :nk]
    assert np.abs(Wk - Ad @ Vk).max() < 1e-10 * np.abs(Ad).max()
    Hk = np.asarray(r.H)[:nk, :nk]
    assert np.abs(Hk - Vk.T @ Wk).max() < 1e-10 * np.abs(Ad).max()
    # stagnation tracking cleared, reset counted, +k memory dropped
    assert int(r.stats.num_resets) == int(s.stats.num_resets) + 1
    assert int(r.stall_restarts) == 0
    assert int(r.restarts_since_reset) == 0
    assert float(r.best_res) == float(jnp.finfo(r.best_res.dtype).max)
    assert np.all(np.asarray(r.prev_hvecs) == 0)
    # reset costs one full-basis matvec
    assert int(r.stats.num_matvecs) == int(s.stats.num_matvecs) + b


def test_do_reset_drops_dependent_columns():
    A, cfg, s0, Ad = _setup()
    b = int(s0.b)
    assert b >= 3
    # make column 1 a copy of column 0: rank-deficient active block
    V = s0.V.at[:, 1].set(s0.V[:, 0])
    s = s0._replace(V=V)
    r = S.do_reset(cfg, A, None, s)
    nk = int(r.b)
    assert nk == b - 1
    Vk = np.asarray(r.V)[:, :nk]
    G = Vk.T @ Vk
    assert np.abs(G - np.eye(nk)).max() < 1e-12
    # surviving columns are compacted left: no zero column inside [0, nk)
    assert np.linalg.norm(Vk, axis=0).min() > 0.9


def test_solve_recovers_after_corrupted_segment():
    """End-to-end: corrupt W mid-solve; the stagnation trigger must fire a
    reset and the solve still converge to the true eigenvalues."""
    from primme_tpu.core.solver import run_segment, make_config

    A, cfg, s0, Ad = _setup(n=60, k=3)
    shifts = jnp.zeros((1,), jnp.float64)

    # run a few outer iterations, then corrupt W (simulates accumulated
    # roundoff far beyond anything f64 would really produce)
    s = run_segment(cfg, A, None, None, None, shifts, s0, seg_end=3)
    s = s._replace(W=s.W + 0.1 * jnp.ones_like(s.W), done=jnp.zeros((), bool))
    s = run_segment(cfg, A, None, None, None, shifts, s,
                    seg_end=10 ** 9)
    evals = np.sort(np.asarray(s.locked_vals)[: int(s.num_locked)])
    ref = np.sort(np.linalg.eigvalsh(Ad))[:3]
    # the run must have recovered (reset or re-expansion) and converged
    assert int(s.num_locked) >= 3 or bool(s.done)
    if int(s.num_locked) >= 3:
        assert np.abs(evals[:3] - ref).max() < 1e-6 * np.abs(Ad).max()
