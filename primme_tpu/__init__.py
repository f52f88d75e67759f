"""primme_tpu: TPU-native preconditioned multimethod eigensolver & SVD.

A from-scratch JAX/XLA/Pallas framework with the capabilities of PRIMME
(see SURVEY.md): eigenpairs of large Hermitian (and generalized) operators
and singular triplets of rectangular operators, extreme and interior
targets, preconditioning, block methods, +k thick restarting, locking,
JDQMR inner solves, and a two-stage hybrid SVD solver — all as jitted
iterations over (optionally row-sharded) operators.
"""

from .params import (PrimmeParams, Target, Projection, InitBasisMode,
                     ConvTest, Method, Projectors, set_method,
                     resolve_defaults, set_member, get_member, member_info,
                     member_names, display_params)
from .operators import (LinearOperator, DenseOperator, DiagonalOperator,
                        ELLOperator, BlockELLOperator, WindowedELLOperator,
                        BandedOperator, Stencil3DOperator,
                        FunctionOperator, JacobiPrecond, ChebyshevPrecond,
                        aslinearoperator,
                        apply_precond)
from .core.solver import solve_eigs, EigsResult, Stats
from .api import eigsh, eigs, PrimmeError
from .svds import svds
from .refine import refine_eigsh
from . import io, native, profiling, testharness

__version__ = "0.1.0"

__all__ = [
    "PrimmeParams", "Target", "Projection", "InitBasisMode", "ConvTest",
    "Method", "Projectors", "set_method", "resolve_defaults", "set_member",
    "get_member", "member_info", "member_names", "display_params",
    "LinearOperator", "DenseOperator", "DiagonalOperator", "ELLOperator",
    "BlockELLOperator",
    "WindowedELLOperator",
    "BandedOperator",
    "Stencil3DOperator", "FunctionOperator", "JacobiPrecond",
    "ChebyshevPrecond",
    "aslinearoperator", "apply_precond",
    "solve_eigs", "EigsResult", "Stats", "eigsh", "eigs", "svds",
    "PrimmeError",
    "__version__",
]
