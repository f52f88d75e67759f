"""Solver configuration: targets, projections, presets, and defaults.

TPU-native re-design of PRIMME's parameter system. The reference drives its
solver through a mutable C struct with enum-label reflection
(``include/primme_eigs.h:286-378``, ``src/eigs/primme_interface.c:101-783``).
Here the configuration is a frozen dataclass (:class:`PrimmeParams`); presets
(:func:`set_method`, mirroring ``primme_set_method``,
``src/eigs/primme_interface.c:236-530``) and defaults resolution
(:func:`resolve_defaults`, mirroring ``primme_set_defaults``,
``src/eigs/primme_interface.c:543-618``) are pure functions returning new
instances. Reflection (set/get by string name) is provided by
:func:`set_member` / :func:`get_member` for binding parity.

Everything in this module is static (Python-level) configuration: it shapes
the jitted computation (basis sizes, block sizes, method flags become trace
constants), so changing it triggers recompilation — the JAX analogue of the
reference's compile-time template instantiation.
"""

from __future__ import annotations

import dataclasses
import enum
from dataclasses import dataclass, field, replace
from typing import Any, Optional, Sequence, Tuple


class Target(enum.Enum):
    """Which part of the spectrum to compute (``primme_target``,
    ``include/primme_eigs.h:49-56``)."""

    smallest = "smallest"            # leftmost eigenvalues
    largest = "largest"              # rightmost eigenvalues
    closest_geq = "closest_geq"      # closest to shifts from above
    closest_leq = "closest_leq"      # closest to shifts from below
    closest_abs = "closest_abs"      # closest to shifts in |.|
    largest_abs = "largest_abs"      # farthest from shifts in |.|

    @property
    def is_extreme(self) -> bool:
        return self in (Target.smallest, Target.largest)


class Projection(enum.Enum):
    """Extraction method (``primme_projection``, ``include/primme_eigs.h:57-62``)."""

    RR = "RR"                 # Rayleigh-Ritz
    harmonic = "harmonic"     # harmonic Ritz
    refined = "refined"       # refined Ritz (SVD of shifted-QR R factor)


class InitBasisMode(enum.Enum):
    """How the initial basis is built (``primme_init``,
    ``include/primme_eigs.h:64-69``)."""

    krylov = "krylov"
    random = "random"
    user = "user"


class ConvTest(enum.Enum):
    """Inner (QMR) solver stopping criterion (``primme_convergencetest``,
    ``include/primme_eigs.h:71-78``)."""

    full_LTolerance = "full_LTolerance"
    decreasing_LTolerance = "decreasing_LTolerance"
    adaptive_ETolerance = "adaptive_ETolerance"
    adaptive = "adaptive"


class Method(enum.Enum):
    """Preset method catalog (``primme_preset_method``,
    ``include/primme_eigs.h:256-273``)."""

    DEFAULT_METHOD = "DEFAULT_METHOD"
    DYNAMIC = "DYNAMIC"
    DEFAULT_MIN_TIME = "DEFAULT_MIN_TIME"
    DEFAULT_MIN_MATVECS = "DEFAULT_MIN_MATVECS"
    Arnoldi = "Arnoldi"
    GD = "GD"
    GD_plusK = "GD_plusK"
    GD_Olsen_plusK = "GD_Olsen_plusK"
    JD_Olsen_plusK = "JD_Olsen_plusK"
    RQI = "RQI"
    JDQR = "JDQR"
    JDQMR = "JDQMR"
    JDQMR_ETol = "JDQMR_ETol"
    STEEPEST_DESCENT = "STEEPEST_DESCENT"
    LOBPCG_OrthoBasis = "LOBPCG_OrthoBasis"
    LOBPCG_OrthoBasis_Window = "LOBPCG_OrthoBasis_Window"


@dataclass(frozen=True)
class Projectors:
    """Jacobi-Davidson correction-equation projector flags
    (``include/primme_eigs.h:137-144``)."""

    LeftQ: bool = False
    LeftX: bool = False
    RightQ: bool = False
    RightX: bool = False
    SkewQ: bool = False
    SkewX: bool = False


# Sentinel meaning "not set by the user; resolve in resolve_defaults".
UNSET = -1


@dataclass(frozen=True)
class PrimmeParams:
    """Eigensolver configuration (analogue of ``primme_params``,
    ``include/primme_eigs.h:166-253``, minus the operator callbacks, which
    are passed separately as :class:`~primme_tpu.operators.LinearOperator`).

    Fields with value ``UNSET`` (or ``0`` where the reference uses 0 as
    "unset") are filled in by :func:`resolve_defaults`.
    """

    # Problem
    n: int = 0
    num_evals: int = 1
    target: Target = Target.smallest
    target_shifts: Tuple[float, ...] = ()
    eps: float = 0.0                      # 0 -> 1e4 * macheps (primme_c.c:356-360)
    a_norm: float = 0.0                   # 0 -> estimate during iteration
    b_norm: float = 0.0                   # ||B|| estimate (deltaEig floor)
    inv_b_norm: float = 0.0               # ||B^-1||: problemNorm = aNorm*invBNorm

    # Basis / restart
    max_basis_size: int = 0
    min_restart_size: int = 0
    max_block_size: int = 0
    max_prev_retain: int = UNSET          # the "+k" of GD+k
    locking: int = UNSET                  # 1 hard, 0 soft, UNSET -> heuristic
    init_basis_mode: InitBasisMode = InitBasisMode.krylov
    num_ortho_const: int = 0

    # Limits
    max_matvecs: int = 2**62
    max_outer_iterations: int = 2**62

    # Correction equation (inner solver)
    precondition: int = UNSET             # UNSET -> 1 iff a preconditioner given
    robust_shifts: bool = False
    max_inner_iterations: int = 0         # 0: GD; -1: unlimited QMR; >0: capped
    projectors: Projectors = field(default_factory=Projectors)
    rel_tol_base: float = 0.0
    conv_test: ConvTest = ConvTest.adaptive_ETolerance

    # Extraction
    projection: Projection = Projection.RR

    # Method switching
    dynamic_method_switch: bool = False

    # Reporting
    print_level: int = 1

    # Operator kind: True = Hermitian (KIND(H)); False = normal
    # non-Hermitian operator with complex Ritz values (KIND(N),
    # src/eigs/template_normal.h, the dprimme_normal/zprimme_normal axis).
    hermitian: bool = True

    # TPU-specific knobs (no reference analogue)
    internal_dtype: Optional[Any] = None  # working precision override
    rng_seed: int = 0
    # Spectrum-verification probe rounds (capability beyond the reference:
    # upstream PRIMME can silently return an incomplete degenerate cluster
    # when blockSize < multiplicity — measured on the 32^3 Laplacian it
    # misses 3-fold cluster members at blockSize=2). Each round injects a
    # random block and converges maxBlockSize extra pairs just far enough
    # to prove nothing sorts inside the returned set. UNSET -> 6 rounds;
    # 0 disables (reference-equivalent behavior).
    verify_spectrum: int = UNSET

    def with_(self, **kw) -> "PrimmeParams":
        return replace(self, **kw)


def _default_prev_retain(p: PrimmeParams, has_mass: bool) -> int:
    # primme_interface.c:345-353 (shared by all the +K presets)
    if p.max_prev_retain > 0:
        return p.max_prev_retain
    if (p.max_block_size == 1 and p.num_evals > 1) or has_mass:
        return 2
    return p.max_block_size


def set_method(method: Method, p: PrimmeParams, *,
               has_precond: bool = False, has_mass: bool = False
               ) -> PrimmeParams:
    """Apply a preset method's parameter overrides.

    Mirrors ``primme_set_method`` (``src/eigs/primme_interface.c:236-530``)
    including the DEFAULT_* aliasing and the per-method projector tables.
    Returns a fully-resolved params (calls :func:`resolve_defaults`).
    """
    if method == Method.DEFAULT_METHOD:
        method = Method.DYNAMIC
    if method == Method.DEFAULT_MIN_MATVECS:
        method = Method.GD_Olsen_plusK
    elif method == Method.DEFAULT_MIN_TIME:
        method = (Method.JDQMR_ETol if p.target.is_extreme else Method.JDQMR)

    p = p.with_(dynamic_method_switch=(method == Method.DYNAMIC))
    if p.max_block_size == 0:
        p = p.with_(max_block_size=1)
    if p.precondition == UNSET:
        p = p.with_(precondition=1 if has_precond else 0)

    P = Projectors
    if method == Method.Arnoldi:
        p = p.with_(max_prev_retain=0, precondition=0, max_inner_iterations=0)
    elif method == Method.GD:
        p = p.with_(max_prev_retain=0, robust_shifts=True,
                    max_inner_iterations=0, projectors=P())
    elif method == Method.GD_plusK:
        p = p.with_(max_prev_retain=_default_prev_retain(p, has_mass),
                    max_inner_iterations=0, projectors=P())
    elif method == Method.GD_Olsen_plusK:
        p = p.with_(max_prev_retain=_default_prev_retain(p, has_mass),
                    max_inner_iterations=0, projectors=P(RightX=True))
    elif method == Method.JD_Olsen_plusK:
        p = p.with_(max_prev_retain=_default_prev_retain(p, has_mass),
                    robust_shifts=True, max_inner_iterations=0,
                    projectors=P(RightX=True, SkewX=True))
    elif method == Method.RQI:
        p = p.with_(locking=1, max_prev_retain=0, robust_shifts=True,
                    max_inner_iterations=-1,
                    projectors=P(LeftQ=True, LeftX=True, RightX=True),
                    conv_test=ConvTest.full_LTolerance)
    elif method == Method.JDQR:
        inner = p.max_inner_iterations if p.max_inner_iterations != 0 else 10
        p = p.with_(locking=1, max_prev_retain=1, robust_shifts=False,
                    max_inner_iterations=inner,
                    projectors=P(LeftX=True, RightQ=True, RightX=True,
                                 SkewQ=True, SkewX=True),
                    rel_tol_base=1.5, conv_test=ConvTest.full_LTolerance)
    elif method == Method.JDQMR:
        mpr = p.max_prev_retain if p.max_prev_retain >= 0 else 1
        p = p.with_(max_prev_retain=mpr, max_inner_iterations=-1,
                    projectors=P(LeftQ=bool(p.precondition), LeftX=True,
                                 SkewX=True),
                    conv_test=ConvTest.adaptive)
    elif method == Method.JDQMR_ETol:
        mpr = p.max_prev_retain if p.max_prev_retain >= 0 else 1
        p = p.with_(max_prev_retain=mpr, max_inner_iterations=-1,
                    projectors=P(LeftQ=bool(p.precondition), LeftX=True),
                    conv_test=ConvTest.adaptive_ETolerance)
    elif method == Method.STEEPEST_DESCENT:
        p = p.with_(locking=1, max_basis_size=p.num_evals * 2,
                    min_restart_size=p.num_evals, max_block_size=p.num_evals,
                    max_prev_retain=0, max_inner_iterations=0,
                    projectors=P(RightX=True))
    elif method == Method.LOBPCG_OrthoBasis:
        p = p.with_(max_basis_size=p.num_evals * 3,
                    min_restart_size=p.num_evals, max_block_size=p.num_evals,
                    max_prev_retain=p.num_evals, max_inner_iterations=0,
                    projectors=P(RightX=True),
                    init_basis_mode=InitBasisMode.random)
    elif method == Method.LOBPCG_OrthoBasis_Window:
        if p.max_block_size == 1 and p.target in (Target.closest_leq,
                                                  Target.closest_geq):
            p = p.with_(max_basis_size=4, min_restart_size=2, max_prev_retain=1)
        else:
            p = p.with_(max_basis_size=p.max_block_size * 3,
                        min_restart_size=p.max_block_size,
                        max_prev_retain=p.max_block_size)
        p = p.with_(max_inner_iterations=0, projectors=P(RightX=True),
                    init_basis_mode=InitBasisMode.random)
    elif method == Method.DYNAMIC:
        p = p.with_(max_prev_retain=_default_prev_retain(p, has_mass),
                    max_inner_iterations=-1,
                    projectors=P(LeftQ=bool(p.precondition), LeftX=True),
                    conv_test=(ConvTest.adaptive_ETolerance
                               if p.target.is_extreme else ConvTest.adaptive))
    else:
        raise ValueError(f"unknown method {method}")

    return resolve_defaults(p)


def resolve_defaults(p: PrimmeParams) -> PrimmeParams:
    """Fill remaining UNSET/0 fields (``primme_set_defaults``,
    ``src/eigs/primme_interface.c:543-618``)."""
    mrs_was_set = p.min_restart_size > 0   # explicit (vs resolved below)
    if p.max_block_size == 0:
        p = p.with_(max_block_size=1)
    if p.max_prev_retain == UNSET:
        p = p.with_(max_prev_retain=0)
    if p.precondition == UNSET:
        p = p.with_(precondition=0)

    free_n = max(p.n - p.num_ortho_const, 1)
    if p.max_basis_size == 0:
        if p.target.is_extreme:
            mbs = max(max(15, 4 * p.max_block_size + p.max_prev_retain),
                      int(2.5 * p.min_restart_size) + p.max_prev_retain)
        else:
            mbs = max(max(35, 5 * p.max_block_size + p.max_prev_retain),
                      int(1.7 * p.min_restart_size) + p.max_prev_retain)
        p = p.with_(max_basis_size=min(free_n, mbs))
    else:
        p = p.with_(max_basis_size=min(free_n, p.max_basis_size))

    if p.min_restart_size == 0:
        if p.n <= 3:
            mrs = max(p.n - p.num_ortho_const, 1)
        elif p.target.is_extreme:
            mrs = int(0.5 + 0.4 * p.max_basis_size)
        else:
            mrs = int(0.5 + 0.6 * p.max_basis_size)
        # Align so an integer number of blocks fits between restarts
        # (primme_interface.c:588-599).
        if p.max_block_size > 1:
            mbs, blk, mpr = p.max_basis_size, p.max_block_size, p.max_prev_retain
            if mpr > 0:
                mrs = mbs - blk * (1 + (mbs - mrs - 1 - mpr) // blk) - mpr
            else:
                mrs = mbs - blk * (1 + (mbs - mrs - 1) // blk)
        p = p.with_(min_restart_size=max(1, min(mrs, p.max_basis_size)))
    p = p.with_(min_restart_size=min(p.min_restart_size, p.max_basis_size))

    if p.locking == UNSET:
        # The reference defaults to soft locking for extreme targets with
        # small numEvals (primme_interface.c:601-607). In this design hard
        # locking measures uniformly better (LUNDA-LA 182 vs 213 matvecs,
        # LUNDA-SA 1440 vs 2155, tridiag 1081 vs stall): converged pairs
        # kept in the fixed-shape masked basis crowd the candidate window,
        # while locking compacts them out for free (argsort permutation)
        # and the practical-convergence test keeps deflation stable.
        p = p.with_(locking=1)

    if p.locking == 0 and p.n > 2 and p.min_restart_size < p.num_evals:
        # Soft locking keeps every converged pair in the basis, so a
        # restart must be able to carry all numEvals candidates — the
        # reference REJECTS minRestartSize < numEvals with locking=0
        # outright (check_input error -33, src/eigs/primme_c.c:507);
        # left unchecked the configuration stalls (converged pairs
        # consume the whole restart budget and the unconverged tail is
        # re-derived from scratch every restart until the stagnation
        # reset gives up). Grow the restart size when the basis has
        # room — strictly more permissive than the reference — and
        # reject with the reference's error otherwise.
        if p.num_evals + p.max_block_size <= p.max_basis_size:
            if mrs_was_set:
                import warnings
                warnings.warn(
                    f"locking=0 with minRestartSize={p.min_restart_size}"
                    f" < numEvals={p.num_evals} is invalid (reference "
                    "error -33); raising minRestartSize to numEvals",
                    stacklevel=2)
            p = p.with_(min_restart_size=p.num_evals)
        else:
            raise ValueError(
                "soft locking (locking=0) requires minRestartSize >= "
                f"numEvals (reference check_input error -33): numEvals="
                f"{p.num_evals}, minRestartSize={p.min_restart_size}, "
                f"maxBasisSize={p.max_basis_size}. Enable locking=1 or "
                "raise maxBasisSize.")

    # Clamp prev-retain so restart basis fits.
    mpr = min(p.max_prev_retain,
              max(0, p.max_basis_size - p.min_restart_size - 1))
    p = p.with_(max_prev_retain=mpr)
    return p


# ---------------------------------------------------------------------------
# Reflection layer: string-name member access, mirroring
# primme_set_member/primme_get_member/primme_member_info
# (include/primme_eigs.h:286-378). Reference names map onto dataclass fields.
# ---------------------------------------------------------------------------

_REFERENCE_ALIASES = {
    # primme_params C-name -> PrimmeParams field
    "numEvals": "num_evals",
    "aNorm": "a_norm",
    "BNorm": "b_norm",
    "invBNorm": "inv_b_norm",
    "maxBasisSize": "max_basis_size",
    "minRestartSize": "min_restart_size",
    "maxBlockSize": "max_block_size",
    "maxMatvecs": "max_matvecs",
    "maxOuterIterations": "max_outer_iterations",
    "restarting_maxPrevRetain": "max_prev_retain",
    "maxPrevRetain": "max_prev_retain",
    "initBasisMode": "init_basis_mode",
    "numOrthoConst": "num_ortho_const",
    "correction_precondition": "precondition",
    "correction_robustShifts": "robust_shifts",
    "correction_maxInnerIterations": "max_inner_iterations",
    "correction_relTolBase": "rel_tol_base",
    "correction_convTest": "conv_test",
    "projection_projection": "projection",
    "printLevel": "print_level",
    "targetShifts": "target_shifts",
    "dynamicMethodSwitch": "dynamic_method_switch",
    "iseed": "rng_seed",
    # bare sub-struct member names (the F77/MEX surfaces address e.g.
    # maxInnerIterations without the correction_ scope)
    "maxInnerIterations": "max_inner_iterations",
    "robustShifts": "robust_shifts",
    "relTolBase": "rel_tol_base",
    "convTest": "conv_test",
}

_ENUM_FIELDS = {
    "target": Target,
    "projection": Projection,
    "init_basis_mode": InitBasisMode,
    "conv_test": ConvTest,
}


def _canonical(name: str) -> str:
    # dotted sub-struct labels (primme.correction.maxInnerIterations)
    # address the same flattened fields
    name = name.replace(".", "_")
    return _REFERENCE_ALIASES.get(name, name)


def member_names() -> Tuple[str, ...]:
    """All settable field names (canonical snake_case)."""
    return tuple(f.name for f in dataclasses.fields(PrimmeParams))


def set_member(p: PrimmeParams, name: str, value: Any) -> PrimmeParams:
    """Set a field by (reference or canonical) name; coerces enums from
    strings like ``"primme_smallest"`` / ``"smallest"`` and numeric
    strings (the text-config surface, ``tests/COMMON/shared_utils.c``)."""
    name = _canonical(name)
    if name not in member_names():
        raise KeyError(f"unknown primme parameter: {name!r}")
    if name in _ENUM_FIELDS and isinstance(value, str):
        cls = _ENUM_FIELDS[name]
        v = value
        for prefix in ("primme_proj_", "primme_init_", "primme_", ""):
            if v.startswith(prefix) and prefix:
                v = v[len(prefix):]
                break
        value = cls(v)
    if name == "target_shifts":
        if isinstance(value, str):
            value = value.replace(",", " ").split()
        value = tuple(float(s) for s in value)
    elif isinstance(value, str):
        cur = getattr(p, name)
        if isinstance(cur, bool) or isinstance(cur, int):
            value = int(value)
        elif isinstance(cur, float):
            value = float(value)
    return p.with_(**{name: value})


def get_member(p: PrimmeParams, name: str) -> Any:
    return getattr(p, _canonical(name))


def member_info(name: str) -> dict:
    """Type/arity metadata for a member (parity with ``primme_member_info``)."""
    name = _canonical(name)
    f = {fl.name: fl for fl in dataclasses.fields(PrimmeParams)}.get(name)
    if f is None:
        raise KeyError(name)
    return {"name": name, "type": f.type, "default": f.default}


def display_params(p: PrimmeParams, prefix: str = "primme") -> str:
    """Text dump of the configuration (``primme_display_params``,
    ``src/eigs/primme_interface.c:629``)."""
    lines = [f"// {'-' * 51}",
             f"//                 {prefix} configuration",
             f"// {'-' * 51}"]
    for f in dataclasses.fields(PrimmeParams):
        v = getattr(p, f.name)
        if isinstance(v, enum.Enum):
            v = v.value
        lines.append(f"{prefix}.{f.name} = {v}")
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# Constant reflection (``primme_constant_info``,
# ``src/eigs/primme_interface.c:1100+``): every enum constant of the
# reference API addressable by name. Values follow the reference headers'
# declaration order (``include/primme_eigs.h:47-101,256-273``,
# ``include/primme_svds.h:59-76``) so a config or binding written against
# the C library resolves identically here.
# ---------------------------------------------------------------------------

def _enum_table(*name_lists) -> dict:
    t = {}
    for names in name_lists:
        for i, nm in enumerate(names):
            t[nm] = i
    return t


_CONSTANTS = _enum_table(
    # primme_target
    ["primme_smallest", "primme_largest", "primme_closest_geq",
     "primme_closest_leq", "primme_closest_abs", "primme_largest_abs"],
    # primme_projection
    ["primme_proj_default", "primme_proj_RR", "primme_proj_harmonic",
     "primme_proj_refined"],
    # primme_init
    ["primme_init_default", "primme_init_krylov", "primme_init_random",
     "primme_init_user"],
    # primme_convergencetest
    ["primme_full_LTolerance", "primme_decreasing_LTolerance",
     "primme_adaptive_ETolerance", "primme_adaptive"],
    # primme_event
    ["primme_event_outer_iteration", "primme_event_inner_iteration",
     "primme_event_restart", "primme_event_reset",
     "primme_event_converged", "primme_event_locked",
     "primme_event_message", "primme_event_profile"],
    # primme_orth
    ["primme_orth_default", "primme_orth_implicit_I",
     "primme_orth_explicit_I"],
    # primme_op_datatype
    ["primme_op_default", "primme_op_half", "primme_op_float",
     "primme_op_double", "primme_op_quad", "primme_op_int"],
    # primme_preset_method
    ["PRIMME_DEFAULT_METHOD", "PRIMME_DYNAMIC", "PRIMME_DEFAULT_MIN_TIME",
     "PRIMME_DEFAULT_MIN_MATVECS", "PRIMME_Arnoldi", "PRIMME_GD",
     "PRIMME_GD_plusK", "PRIMME_GD_Olsen_plusK", "PRIMME_JD_Olsen_plusK",
     "PRIMME_RQI", "PRIMME_JDQR", "PRIMME_JDQMR", "PRIMME_JDQMR_ETol",
     "PRIMME_STEEPEST_DESCENT", "PRIMME_LOBPCG_OrthoBasis",
     "PRIMME_LOBPCG_OrthoBasis_Window"],
    # primme_svds_target
    ["primme_svds_largest", "primme_svds_smallest",
     "primme_svds_closest_abs"],
    # primme_svds_preset_method
    ["primme_svds_default", "primme_svds_hybrid",
     "primme_svds_normalequations", "primme_svds_augmented"],
    # primme_svds_operator
    ["primme_svds_op_none", "primme_svds_op_AtA", "primme_svds_op_AAt",
     "primme_svds_op_augmented"],
)


def constant_info(name: str) -> int:
    """Value of a reference API constant by name
    (``primme_constant_info``). Raises ``KeyError`` for unknown names."""
    try:
        return _CONSTANTS[name]
    except KeyError:
        raise KeyError(f"unknown primme constant: {name!r}") from None


def constant_names(prefix: str = "") -> Tuple[str, ...]:
    """All known constant names, optionally filtered by prefix."""
    return tuple(nm for nm in _CONSTANTS if nm.startswith(prefix))
