"""Linear solvers for the implicit stages: the MUMPS-LU replacement.

Each Rosenbrock-W stage needs (shift*I - J) y = b with J the RHS
Jacobian.  The reference solves this with a parallel sparse direct LU
(MUMPS) under PETSc KSP preonly (/root/reference/options84 PETSc
block).  TPU-native strategy:

- ``gmres``: matrix-free restarted GMRES (J action via jax.jvp), right
  thing at scale.  Preconditioned by the *exact* inverse of the stiff
  constant-coefficient part: on the periodic uniform grid every
  per-field operator (shift + gamma_f - D_f*Laplacian) is diagonal in
  Fourier space (ops/stencil.py laplacian_symbol is the exact DFT
  symbol of the discrete stencil, not the continuum symbol).  For the
  linear ligand fields the preconditioner *is* the exact inverse, so
  Krylov work is driven only by the rho-row nonlinearity.

- ``dense``: exact dense LU (jax.scipy lu_factor/lu_solve) of the full
  Jacobian built by jacfwd.  This is the MUMPS-parity path for small
  1D problems (the reference's options92/93 gates are 384 dofs) and
  the correctness oracle for the Krylov path.
"""

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..utils.debug import logger

logLIN = logger("LINALG")

__all__ = ["SpectralPreconditioner", "gmres_solve", "dense_solve_factory"]


class SpectralPreconditioner:
    """M^{-1} for W = shift*I - J, inverting the per-field stiff part.

    Per field f:  What_f = shift + decay_f - diff_f * lap_symbol,
    applied in Fourier space (rfftn over the spatial axes).
    ``lap_symbol`` are the exact DFT eigenvalues of the discrete
    Laplacian (<= 0), so What_f >= shift > 0: never singular.
    """

    def __init__(self, lap_symbol, sshape):
        self.lap_symbol = jnp.asarray(lap_symbol)
        self.sshape = tuple(sshape)
        self.spatial_axes = tuple(range(1, 1 + len(self.sshape)))

    def apply(self, v, shift, diff, decay):
        """v: (dof, *sshape); diff/decay: per-field scalars (traceable)."""
        vh = jnp.fft.rfftn(v, axes=self.spatial_axes)
        diff = jnp.stack([jnp.asarray(d, dtype=vh.real.dtype) for d in diff])
        decay = jnp.stack([jnp.asarray(d, dtype=vh.real.dtype) for d in decay])
        denom = (
            shift
            + decay.reshape((-1,) + (1,) * len(self.sshape))
            - diff.reshape((-1,) + (1,) * len(self.sshape)) * self.lap_symbol
        )
        return jnp.fft.irfftn(vh / denom, s=self.sshape, axes=self.spatial_axes)


def gmres_solve(op, b, M=None, tol=1e-8, restart=20, maxiter=50, x0=None):
    """Restarted GMRES on a matrix-free operator.  Traceable.

    Returns the solution (no convergence flag: like the reference's
    'ksp preonly' usage, failures surface through the step-error
    control and trigger rollback).
    """
    x, _ = jax.scipy.sparse.linalg.gmres(
        op,
        b,
        x0=x0,
        tol=tol,
        atol=0.0,
        restart=restart,
        maxiter=maxiter,
        M=M,
        solve_method="batched",
    )
    return x


def dense_solve_factory(rhs, shape, t_and_u_to_J=None):
    """Build exact dense stage solvers for small problems.

    Returns ``prepare(u, t) -> carry`` and
    ``solve(carry, shift, b) -> y`` where carry holds the dense
    Jacobian of ``rhs(u, t)`` flattened to (N, N).  ``solve`` factors
    (shift*I - J) per call; for N ~ 1e3 this is negligible next to
    the reference's per-stage MUMPS factorizations.
    """
    n = 1
    for s in shape:
        n *= int(s)

    def prepare(u, t):
        flat_rhs = lambda uf: rhs(uf.reshape(shape), t).reshape(-1)
        J = jax.jacfwd(flat_rhs)(u.reshape(-1))
        return J

    def solve(J, shift, b):
        W = shift * jnp.eye(n, dtype=J.dtype) - J
        lu, piv = jsl.lu_factor(W)
        return jsl.lu_solve((lu, piv), b.reshape(-1)).reshape(shape)

    return prepare, solve
