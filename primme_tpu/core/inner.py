"""Inner correction-equation solver: projected simplified QMR (JDQMR).

TPU re-design of ``inner_solve_Sprimme`` (``src/eigs/inner_solve.c:132``),
which solves, per block vector x with residual r and shift sigma,

    (I-BQQ')(I-Bxx')(A - sigma B)(I-xx'B)(I-QQ'B) s = -r

by Hermitian simplified QMR with a (optionally skew-)projected
preconditioner, plus PRIMME's signature *dynamic eigenpair monitoring*:
scalar recurrences (Delta/Beta/Phi/Psi/Gamma, ``inner_solve.c:439-486``)
reconstruct the updated Ritz value and eigenresidual estimate at every QMR
step for the ``primme_adaptive`` / ``primme_adaptive_ETolerance`` stopping
rules — the mechanism that makes JDQMR cost within ~GD+1 matvec per step.

Differences from the C implementation, by design:

* The C code shrinks the block by permuting converged columns out
  (``inner_solve.c:330-370``); under SPMD/static shapes a full-width block
  matvec costs the same regardless, so converged columns are *frozen* with
  an ``alive`` mask instead.
* All per-column scalar recurrences are ``[blk]`` vectors on the VPU;
  reductions over n are row-sharded dots (the reference's
  ``Num_dist_dots``, ``inner_solve.c:317-420``).
* The left/right projector configurations follow ``setup_JD_projectors``
  (``src/eigs/correction.c:862-997``): LeftQ/LeftX pick the left
  projectors; RightX(+SkewX+precond) selects the K^{-1}Bx skew projector
  in the preconditioner; RightQ uses the B-evecs projector, or — with
  SkewQ + a preconditioner (JDQR) — the skew projector
  (I - Qhat M^{-1} Q^H), Qhat = K^{-1}BQ, with the small M = Q^H Qhat
  LU-factorized once per outer iteration (the reference's UDU,
  ``src/eigs/factorize.c:83-183``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _mv(Op, X):
    with jax.named_scope("pt_matvec"):
        return Op.matmat(X)


from ..params import ConvTest, Target
from .linalg import real_dtype, machine_eps, gram, bcomb, prefix_project


def _dots(X, Y):
    """Per-column Re(x_j^H y_j) — a distributed dot under row sharding."""
    return jnp.real(jnp.sum(X.conj() * Y, axis=0))


def jdqmr_inner_solve(cfg, A, B, K, s, X, BX, R, sigma, res, valid, tol,
                      evals=None):
    """Solve the block correction equation with projected sQMR.

    Arguments mirror the candidate block prepared by the outer iteration:
    ``X``/``BX`` the Ritz vectors, ``R`` their residuals, ``sigma`` the
    shifts, ``res`` the residual norms, ``valid`` the active-column mask,
    ``tol`` the outer convergence tolerance (eps*problemNorm).

    Returns ``(sol, n_inner_its, n_matvec_cols, n_precond_cols)``.
    """
    from ..operators import apply_precond

    if evals is None:
        evals = sigma

    n, blk = X.shape
    dtype = X.dtype
    rdt = real_dtype(dtype)
    meps = machine_eps(dtype)
    # ``touch`` approximates the reference's progress counter. The
    # decreasing-LTolerance test tightens relTolBase^-touch per *call*
    # (inner_solve.c:238-244) -> outer-iteration count is the right proxy;
    # the adaptive 1.8^-touch factors tighten per converged pair ->
    # locked count is the right proxy.
    if cfg.conv_test == ConvTest.decreasing_LTolerance:
        touch = s.stats.num_outer_iterations
    else:
        touch = s.num_locked
    touch = jnp.minimum(touch.astype(rdt), 40.0)

    # eigenpair-monitoring recurrences need the Ritz value and the
    # correction shift separately (robust shifts make them differ)
    lam = jnp.where(jnp.isfinite(evals) & valid, evals, 0).astype(rdt)
    shift = jnp.where(jnp.isfinite(sigma) & valid, sigma, 0).astype(rdt)
    vmaskf = valid.astype(dtype)[None, :]

    has_lockedQ = cfg.locking or cfg.noc > 0
    Q, BQ = s.evecs, (s.Bevecs if B is not None else s.evecs)
    nlockq = (cfg.noc + s.num_locked).astype(jnp.int32)

    # --- skew-Q projector state (factorize.c:83-183) ------------------------
    # When SkewQ and a preconditioner are set (JDQR), the right projector on
    # the preconditioner is the *skew* projector (I - Qhat M^{-1} Q^H) with
    # Qhat = K^{-1} B Q and M = Q^H Qhat (``update_XKinvBX``,
    # ``apply_skew_projector``, ``src/eigs/inner_solve.c:769``). The
    # reference UDU-factorizes the small Hermitian-indefinite M (hetrf);
    # here M is replicated and LU-factorized once per outer iteration.
    skew_lu = None
    Qhat = None
    if cfg.skewQ and cfg.rightQ and K is not None and has_lockedQ:
        nqm = Q.shape[1]
        qmask = (jnp.arange(nqm) < (cfg.noc + s.num_locked))
        Qhat = apply_precond(K, BQ, None) * qmask.astype(dtype)[None, :]
        Mq = gram(Q, Qhat) + jnp.diag((~qmask).astype(dtype))
        skew_lu = jax.scipy.linalg.lu_factor(Mq)

    # --- projected operator -------------------------------------------------
    def apply_A_proj(D):
        W = _mv(A, D)
        BD = _mv(B, D) if B is not None else D
        W = W - BD * shift[None, :].astype(dtype)
        if cfg.leftQ and has_lockedQ:
            W = prefix_project(BQ, Q, W, nlockq)
        if cfg.leftX:
            W = W - BX * jnp.sum(X.conj() * W, axis=0)[None, :]
        return W

    # --- projected preconditioner ------------------------------------------
    if K is not None and cfg.skewX:
        KinvBx = apply_precond(K, BX, shift)
        xKinvBx = jnp.sum(X.conj() * KinvBx, axis=0)
        xKinvBx = jnp.where(jnp.abs(xKinvBx) < jnp.finfo(rdt).tiny,
                            1.0, xKinvBx)
    else:
        KinvBx = None
        xKinvBx = None

    def apply_K_proj(G):
        Y = apply_precond(K, G, shift) if K is not None else G
        if skew_lu is not None:
            ov = gram(Q, Y)
            Y = Y - bcomb(Qhat, jax.scipy.linalg.lu_solve(skew_lu, ov))
        elif cfg.rightQ and has_lockedQ:
            Y = prefix_project(BQ, Q, Y, nlockq)
        if KinvBx is not None:
            ov = jnp.sum(X.conj() * Y, axis=0)
            Y = Y - KinvBx * (ov / xKinvBx)[None, :]
        elif cfg.olsen:
            Y = Y - BX * jnp.sum(X.conj() * Y, axis=0)[None, :]
        return Y

    # --- stopping configuration (inner_solve.c:211-252) ---------------------
    eps = cfg.eps if cfg.eps > 0 else 1e4 * meps
    anorm = jnp.maximum(s.stats.anorm_estimate.astype(rdt), 1e-30)
    floor_tol = jnp.maximum(2 * meps, 0.0) * anorm
    conv_tol = jnp.maximum(eps, 2 * meps) * anorm   # eps * problemNorm
    if cfg.conv_test == ConvTest.decreasing_LTolerance:
        LTol = jnp.maximum(floor_tol,
                           jnp.asarray(max(cfg.rel_tol_base, 1.1), rdt)
                           ** (-touch))
        LTol_factor = jnp.asarray(1.0, rdt)
        ETol_factor = jnp.asarray(0.0, rdt)
        ETol = 0.0
    elif cfg.conv_test in (ConvTest.adaptive, ConvTest.adaptive_ETolerance):
        LTol = floor_tol
        LTol_factor = jnp.asarray(1.8, rdt) ** (-touch)
        ETol_factor = LTol_factor
        ETol = 0.1 if cfg.conv_test == ConvTest.adaptive_ETolerance else 0.0
    else:  # full_LTolerance
        LTol = floor_tol
        LTol_factor = jnp.asarray(1.0, rdt)
        ETol_factor = jnp.asarray(0.0, rdt)
        ETol = 0.0
    adaptive = cfg.conv_test in (ConvTest.adaptive,
                                 ConvTest.adaptive_ETolerance)

    if cfg.max_inner > 0:
        max_its_static = cfg.max_inner
    else:
        max_its_static = max(min(cfg.n, 1000), 1)
    # never exceed the remaining global matvec budget (the reference
    # clamps maxIterations to maxMatvecs - numMatvecs, inner_solve.c:255)
    remaining = jnp.maximum(
        jnp.asarray(cfg.max_matvecs, jnp.int32) - s.stats.num_matvecs, 1)
    max_its = jnp.minimum(jnp.asarray(max_its_static, jnp.int32),
                          remaining // max(blk, 1) + 1)

    class QmrState(NamedTuple):
        sol: jax.Array
        g: jax.Array          # linear-system residual
        d: jax.Array          # search direction
        delta: jax.Array
        alive: jax.Array      # [blk]
        rho_prev: jax.Array
        tau_prev: jax.Array
        tau_init: jax.Array
        theta_prev: jax.Array
        # eigen monitoring recurrences
        Beta: jax.Array
        Delta: jax.Array
        Phi: jax.Array
        Psi: jax.Array
        Gamma: jax.Array
        eval_prev: jax.Array
        eres_prev: jax.Array
        its: jax.Array
        nmv: jax.Array
        nprec: jax.Array
        # per-iteration event buffer [cap, blk, 3] (value, eres, alive);
        # [1, 1, 3] when tracing is off (primme_event_inner_iteration,
        # inner_solve.c:491-500 — recorded on device, replayed to the
        # monitor once per outer iteration)
        trace: jax.Array

    tcap = int(getattr(cfg, "inner_trace_cap", 0) or 0)

    g0 = -R * vmaskf
    d0 = apply_K_proj(g0)
    rho0 = _dots(g0, d0)
    tau0 = jnp.maximum(res.astype(rdt), jnp.finfo(rdt).tiny)
    normBx = _dots(BX, BX) if (B is not None and adaptive) else jnp.ones(
        (blk,), rdt)

    st0 = QmrState(
        sol=jnp.zeros_like(X), g=g0, d=d0, delta=jnp.zeros_like(X),
        alive=valid, rho_prev=rho0, tau_prev=tau0, tau_init=tau0,
        theta_prev=jnp.zeros((blk,), rdt),
        Beta=jnp.zeros((blk,), rdt), Delta=jnp.zeros((blk,), rdt),
        Phi=jnp.zeros((blk,), rdt), Psi=jnp.zeros((blk,), rdt),
        Gamma=jnp.zeros((blk,), rdt), eval_prev=lam,
        eres_prev=jnp.zeros((blk,), rdt),
        its=jnp.zeros((), jnp.int32), nmv=jnp.zeros((), jnp.int32),
        nprec=jnp.zeros((), jnp.int32),
        trace=jnp.zeros((tcap, blk, 3) if tcap > 0 else (1, 1, 3), rdt))

    def cond(st: QmrState):
        return jnp.any(st.alive) & (st.its < max_its)

    def body(st: QmrState):
        am = st.alive
        amf = am.astype(dtype)[None, :]
        w = apply_A_proj(st.d * amf)
        sigma_p = _dots(st.d, w)
        bad = (~jnp.isfinite(sigma_p)) | (sigma_p == 0)
        alpha = jnp.where(bad, 1.0, st.rho_prev / jnp.where(bad, 1.0, sigma_p))
        bad = bad | (~jnp.isfinite(alpha)) | (jnp.abs(alpha) < meps) \
            | (jnp.abs(alpha) > 1.0 / meps)
        # dead-on-first-iteration columns return sol = r (inner_solve.c:328)
        first = st.its == 0
        sol = jnp.where((bad & am & first)[None, :], -st.g, st.sol)
        upd = (am & ~bad)
        updr = upd.astype(rdt)
        g = st.g - w * (alpha * updr).astype(dtype)[None, :]

        gnorm = jnp.sqrt(jnp.maximum(_dots(g, g), 0.0))
        theta = gnorm / st.tau_prev
        c2 = 1.0 / (1.0 + theta * theta)
        tau = st.tau_prev * theta * jnp.sqrt(c2)
        gamma = c2 * st.theta_prev ** 2
        eta = alpha * c2
        # frozen columns: fold the mask into the scalar coefficients
        # (delta stays, sol untouched) instead of [n, blk] selects — a
        # select is a full extra array pass per iteration on the VPU
        gamma_eff = jnp.where(upd, gamma, 1.0)
        eta_eff = jnp.where(upd, eta, 0.0)
        delta = st.delta * gamma_eff.astype(dtype)[None, :] \
            + st.d * eta_eff.astype(dtype)[None, :]
        sol = sol + delta * updr.astype(dtype)[None, :]

        # --- convergence decisions (inner_solve.c:427-585) ---------------
        stop = bad
        stop = stop | (jnp.abs(st.rho_prev) == 0)
        not_first = ~first
        stop = stop | (not_first & (tau < LTol))

        if adaptive:
            if B is not None:
                Bsol = _mv(B, sol)
                dot_sol = _dots(sol, Bsol)
            else:
                dot_sol = _dots(sol, sol)
            Delta_n = gamma * st.Delta + eta * st.rho_prev
            Beta_n = st.Beta - Delta_n
            Phi_n = gamma * gamma * st.Phi + eta * eta * sigma_p
            Psi_n = gamma * st.Psi + gamma * st.Phi
            Gamma_n = st.Gamma + 2.0 * Psi_n + Phi_n
            Bn = 1.0 + dot_sol
            eval_upd = shift + (lam - shift + 2 * Beta_n + Gamma_n) / Bn
            eres2 = (tau * tau) / Bn \
                + normBx * (lam - shift + Beta_n) ** 2 / Bn \
                - (eval_upd - shift) ** 2
            eres = jnp.sqrt(jnp.where(eres2 < 0, tau * tau / Bn, eres2))

            stop = stop | (not_first & ((st.tau_prev <= eres)
                                        | (st.eres_prev <= tau)))
            if cfg.target == Target.smallest:
                stop = stop | (eval_upd > st.eval_prev)
            elif cfg.target == Target.largest:
                stop = stop | (eval_upd < st.eval_prev)
            elif cfg.target == Target.closest_abs:
                stop = stop | (jnp.abs(lam - eval_upd)
                               > st.tau_init + eres)
            if ETol > 0:
                stop = stop | (not_first & (eres < ETol * st.tau_init))
            isconv = jnp.minimum(
                tau / LTol_factor,
                jnp.where(ETol_factor > 0, eres / ETol_factor,
                          jnp.inf)) < conv_tol
            stop = stop | (not_first & isconv)
            keep = (am & ~stop)
            kf = keep.astype(rdt)
            nkf = 1.0 - kf
            st_new_eig = dict(
                Beta=Beta_n * kf + st.Beta * nkf,
                Delta=Delta_n * kf + st.Delta * nkf,
                Phi=Phi_n * kf + st.Phi * nkf,
                Psi=Psi_n * kf + st.Psi * nkf,
                Gamma=Gamma_n * kf + st.Gamma * nkf,
                eval_prev=eval_upd * kf + st.eval_prev * nkf,
                eres_prev=eres * kf + st.eres_prev * nkf)
            trace_val, trace_res = eval_upd, eres
        else:
            sqit = jnp.sqrt(st.its.astype(rdt) + 1.0)
            isconv = (tau / LTol_factor) * sqit < conv_tol
            stop = stop | (not_first & isconv)
            st_new_eig = dict(Beta=st.Beta, Delta=st.Delta, Phi=st.Phi,
                              Psi=st.Psi, Gamma=st.Gamma,
                              eval_prev=st.eval_prev, eres_prev=st.eres_prev)
            trace_val, trace_res = lam, tau

        trace = st.trace
        if tcap > 0:
            # record (value, eigenresidual/QMR-residual, alive) — the
            # fields the reference's inner-iteration monitor call reports
            rec = jnp.stack([trace_val.astype(rdt), trace_res.astype(rdt),
                             am.astype(rdt)], axis=-1)
            z = jnp.zeros((), jnp.int32)
            trace = jax.lax.dynamic_update_slice(
                st.trace, rec[None],
                (jnp.minimum(st.its, tcap - 1).astype(jnp.int32), z, z))

        alive_next = am & ~stop

        # --- next direction ------------------------------------------------
        # dead columns contribute K(0) = 0 to y, so folding the masks into
        # the [blk] coefficients (beta_eff = 1 freezes d) avoids two more
        # full-array selects; g needs none at all (alpha was masked).
        y = apply_K_proj(g * alive_next.astype(dtype)[None, :])
        rho = _dots(g, y)
        beta = jnp.where(st.rho_prev != 0, rho / st.rho_prev, 0.0)
        beta_eff = jnp.where(alive_next, beta, 1.0)
        d = y + st.d * beta_eff.astype(dtype)[None, :]
        anf = alive_next.astype(rdt)
        annf = 1.0 - anf

        nalive = jnp.sum(am.astype(jnp.int32)).astype(jnp.int32)
        return QmrState(
            sol=sol,
            g=g,
            d=d,
            delta=delta, alive=alive_next,
            rho_prev=rho * anf + st.rho_prev * annf,
            tau_prev=tau * anf + st.tau_prev * annf,
            tau_init=st.tau_init,
            theta_prev=theta * anf + st.theta_prev * annf,
            its=st.its + 1, nmv=(st.nmv + nalive).astype(jnp.int32),
            nprec=(st.nprec + jnp.sum(alive_next.astype(jnp.int32))).astype(jnp.int32),
            trace=trace,
            **st_new_eig)

    st = jax.lax.while_loop(cond, body, st0)

    sol = st.sol * vmaskf
    # A zero solution (e.g. stopped immediately) falls back to the residual
    # so the outer basis still gets an expansion direction.
    solnorm = jnp.sqrt(_dots(sol, sol))
    sol = jnp.where((solnorm < jnp.finfo(rdt).tiny)[None, :] & (vmaskf != 0),
                    R, sol)
    n_prec0 = jnp.sum(valid.astype(jnp.int32)) if K is not None else 0
    if tcap > 0:
        return sol, st.its, st.nmv, st.nprec + n_prec0, st.trace
    return sol, st.its, st.nmv, st.nprec + n_prec0


def normal_inner_solve(cfg, A, B, K, s, X, BX, R, sigma, res, valid, tol,
                       evals=None):
    """Inner correction solver for *normal* (non-Hermitian) operators:
    projected block GMRES(m) on

        (I - x x^H)(A - sigma)(I - x x^H) s = -r ,   sigma complex.

    The reference has no such solver — ``solve_correction`` returns
    ``PRIMME_FUNCTION_UNAVAILABLE`` for JDQMR on the KIND(N) axis
    (``src/eigs/correction.c:464``) — so this is a capability the TPU
    framework adds: simultaneous Arnoldi over the block (one [n, blk]
    matmat per step, batched small-dense updates on the VPU), least-squares
    solve of the m-step Hessenberg systems at the end. Complex shifts come
    straight from the complex Ritz values.

    Interface matches :func:`jdqmr_inner_solve`.
    """
    from ..operators import apply_precond

    n, blk = X.shape
    dtype = X.dtype
    rdt = real_dtype(dtype)
    if evals is None:
        evals = sigma
    shift = jnp.where(jnp.isfinite(sigma) & valid, sigma, 0).astype(dtype)
    vmaskf = valid.astype(dtype)[None, :]

    has_lockedQ = cfg.locking or cfg.noc > 0
    Q, BQ = s.evecs, (s.Bevecs if B is not None else s.evecs)
    nlockq = (cfg.noc + s.num_locked).astype(jnp.int32)

    def project(D):
        if cfg.leftQ and has_lockedQ:
            D = prefix_project(Q, Q, D, nlockq)
        if cfg.leftX:
            D = D - X * jnp.sum(X.conj() * D, axis=0)[None, :]
        return D

    def prec(D):
        # right preconditioning: GMRES runs on (A - sigma) K^{-1}, the
        # solution is K^{-1} (V y). K is fixed, so no flexible variant
        # is needed.
        if K is None:
            return D
        return apply_precond(K, D, shift)

    def op(D):
        Z = prec(D)
        return project(_mv(A, Z) - Z * shift[None, :])

    m = cfg.max_inner if cfg.max_inner > 0 else 15
    m = max(1, min(m, 64))

    # Per-column adaptive stopping: reduce the GMRES residual to a tenth
    # of the outer eigenresidual (the classic Jacobi-Davidson inner
    # tolerance), floored at a third of the outer convergence tolerance
    # so nearly-converged pairs are not over-solved.
    itol = jnp.maximum(0.1 * res.astype(rdt), 0.33 * tol.astype(rdt))

    # Arnoldi over the block: basis [m+1, n, blk]; the Hessenberg columns
    # are rotated on the fly by complex Givens rotations into the upper-
    # triangular Rm [m, m, blk] with rhs g [m+1, blk], so |g[i+1]| is the
    # exact GMRES residual of column b after step i — frozen columns stop
    # updating (static shapes; dead steps cost nothing extra per column).
    V0 = project(-R * vmaskf)
    beta = jnp.sqrt(jnp.maximum(_dots(V0, V0), 0.0))
    ok = (beta > jnp.finfo(rdt).tiny) & valid
    V0 = jnp.where(ok[None, :], V0 / jnp.maximum(
        beta, jnp.finfo(rdt).tiny)[None, :].astype(dtype), 0)

    Vk = jnp.zeros((m + 1, n, blk), dtype).at[0].set(V0)
    Rm = jnp.zeros((m, m, blk), dtype)
    g = jnp.zeros((m + 1, blk), dtype).at[0].set(beta.astype(dtype))
    cs = jnp.zeros((m, blk), rdt)
    sn = jnp.zeros((m, blk), dtype)
    alive0 = ok
    steps = jnp.zeros((blk,), jnp.int32)

    def body(i, carry):
        Vk, Rm, g, cs, sn, alive, steps = carry
        w = op(Vk[i])
        # two-pass classical Gram-Schmidt against all stored vectors
        # (masked j <= i); einsum keeps it one fused contraction
        jmask = (jnp.arange(m + 1) <= i)
        h = jnp.zeros((m + 1, blk), dtype)
        for _ in range(2):
            hp = jnp.einsum("jnb,nb->jb", Vk.conj(), w,
                            precision=jax.lax.Precision.HIGHEST)
            hp = hp * jmask[:, None]
            w = w - jnp.einsum("jnb,jb->nb", Vk, hp,
                               precision=jax.lax.Precision.HIGHEST)
            h = h + hp
        hnorm = jnp.sqrt(jnp.maximum(_dots(w, w), 0.0))
        good = (hnorm > jnp.finfo(rdt).tiny) & alive
        w = jnp.where(good[None, :], w / jnp.maximum(
            hnorm, jnp.finfo(rdt).tiny)[None, :].astype(dtype), 0)

        # apply previous rotations j < i to the new column
        def rot(j, h):
            a, b_ = h[j], h[j + 1]
            hj = cs[j].astype(dtype) * a + sn[j] * b_
            hj1 = -sn[j].conj() * a + cs[j].astype(dtype) * b_
            on = (j < i)
            h = h.at[j].set(jnp.where(on, hj, a))
            return h.at[j + 1].set(jnp.where(on, hj1, b_))
        h = jax.lax.fori_loop(0, m, rot, h)

        # new rotation zeroing the subdiagonal hnorm against a = h[i]:
        # c = |a|/r (real), s = (a/|a|) b/r, rotated diag = c a + s b
        a = h[i]
        bb = hnorm
        r_ = jnp.sqrt(jnp.abs(a) ** 2 + bb ** 2)
        nz = r_ > jnp.finfo(rdt).tiny
        rsafe = jnp.where(nz, r_, 1.0)
        aun = jnp.where(jnp.abs(a) > jnp.finfo(rdt).tiny,
                        a / jnp.abs(a).astype(dtype), 1.0)
        ci = jnp.where(nz, jnp.abs(a) / rsafe, 1.0)
        si = jnp.where(nz, aun * (bb / rsafe).astype(dtype), 0.0)
        # rotate the rhs: g[i+1] = -conj(s) g[i]; g[i] = c g[i]
        gi = g[i]
        g = g.at[i + 1].set(jnp.where(alive, -si.conj() * gi, g[i + 1]))
        g = g.at[i].set(jnp.where(alive, ci.astype(dtype) * gi, gi))

        Rm = Rm.at[:, i, :].set(jnp.where(alive[None, :],
                                          h[:m], Rm[:, i, :]))
        Rm = Rm.at[i, i, :].set(jnp.where(
            alive, ci.astype(dtype) * a + si * bb.astype(dtype),
            Rm[i, i, :]))
        cs = cs.at[i].set(jnp.where(alive, ci, cs[i]))
        sn = sn.at[i].set(jnp.where(alive, si, sn[i]))
        Vk = Vk.at[i + 1].set(jnp.where(alive[None, :], w, Vk[i + 1]))
        steps = steps + alive.astype(jnp.int32)
        resid = jnp.abs(g[i + 1])
        alive = alive & good & (resid > itol)
        return Vk, Rm, g, cs, sn, alive, steps

    Vk, Rm, g, cs, sn, alive, steps = jax.lax.fori_loop(
        0, m, body, (Vk, Rm, g, cs, sn, alive0, steps))

    # y per column: backsolve the triangular system over the steps taken;
    # untouched trailing columns of Rm are zero — give them unit diagonal
    # so the solve is well-posed and yields y = 0 there.
    used = (jnp.arange(m)[:, None] < steps[None, :])
    diagmag = jnp.abs(jnp.einsum("iib->ib", Rm))
    # unit diagonal on unused (or numerically dead) positions -> y = 0 there
    fix = (~used) | (diagmag < jnp.finfo(rdt).tiny)
    Rsolve = Rm + jnp.eye(m, dtype=dtype)[:, :, None] \
        * fix.astype(dtype)[None, :, :]
    gm = jnp.where(used, g[:m], 0)

    y = jax.vmap(lambda Rc, gc: jax.scipy.linalg.solve_triangular(
        Rc, gc, lower=False), in_axes=(2, 1), out_axes=1)(Rsolve, gm)
    y = jnp.where(used, y, 0)
    sol = jnp.einsum("jnb,jb->nb", Vk[:m], y,
                     precision=jax.lax.Precision.HIGHEST)
    sol = prec(sol)
    sol = sol * vmaskf
    solnorm = jnp.sqrt(_dots(sol, sol))
    sol = jnp.where((solnorm < jnp.finfo(rdt).tiny)[None, :] & (vmaskf != 0),
                    R, sol)
    nmv = jnp.sum(steps).astype(jnp.int32)
    nprec = (nmv + jnp.sum(valid.astype(jnp.int32))
             if K is not None else jnp.zeros((), jnp.int32))
    return (sol, jnp.max(steps).astype(jnp.int32), nmv,
            jnp.asarray(nprec, jnp.int32))
