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


import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..utils.debug import logger

logLIN = logger("LINALG")

__all__ = [
    "SpectralPreconditioner",
    "BlockSpectralPreconditioner",
    "gmres_solve",
    "dense_solve_factory",
]


class SpectralPreconditioner:
    """M^{-1} for W = shift*I - J, inverting the per-field stiff part.

    Per field f the stiff operator is decay_f - diff_f*Laplacian; on
    the periodic uniform grid the discrete Laplacian is a symmetric
    circulant per axis, diagonalized EXACTLY by the orthonormal real
    DFT basis (ops/stencil.py real_dft_basis).  The transform is
    applied as per-axis matmuls with that basis — MXU work on TPU,
    float64-capable (TPU XLA has no f64 FFT), layout-robust, and
    sharding-transparent (XLA partitions the einsums).

    lam (<= 0) makes What_f = shift + decay_f - diff_f*lam >= shift
    > 0: never singular.
    """

    def __init__(self, grid, compute_dtype=None, use_fft=False):
        """compute_dtype: dtype of the transform matmuls.  The
        preconditioner is an approximate inverse, so float32 is the
        default — it runs the basis matmuls on the TPU MXU at full
        rate while the Krylov iteration itself stays in the solve
        dtype; only the Krylov convergence rate is (marginally)
        affected, never the solution.

        bfloat16 runs the TRANSFORM matmuls in bf16 (4x the f32 MXU
        rate; accumulation stays f32 via preferred_element_type) while
        all mode-space arithmetic (denominators, Schur complement)
        stays float32 — bf16 input rounding perturbs M^{-1} by ~1e-2
        relative, far inside the Richardson contraction margin, but
        bf16 DENOMINATOR arithmetic would be fatal (mode stiffness
        spans ~6 orders).  At many sweeps/stage on large grids the
        transforms dominate the step; this is the knob for that
        regime (-pc_dtype bf16).

        use_fft: apply the SAME circulant inverse through rfftn/irfftn
        instead of the basis matmuls — O(n log n) per axis instead of
        O(n^2), a ~100x FLOP cut at 1536^2 where the 16-sweep stage
        solves make the transforms the dominant step cost.  Exact up
        to f32 rounding (the complex DFT diagonalizes every circulant;
        laplacian_symbol is the same discrete-stencil symbol the
        matmul basis uses).  f32-only (TPU XLA has no f64 FFT) and
        single-shard only (an FFT along a sharded axis would gather;
        the einsum path shards transparently) — make_step_fn gates it
        accordingly (-pc_fft auto|on|off)."""
        from ..ops.stencil import laplacian_eigendecomp, laplacian_symbol

        self.sshape = tuple(grid.Sshape)
        self.dim = grid.dim
        self.use_fft = bool(use_fft)
        compute_dtype = jnp.dtype(compute_dtype or jnp.float32)
        self.transform_dtype = compute_dtype
        self.compute_dtype = (
            jnp.float32
            if compute_dtype == jnp.bfloat16
            else compute_dtype
        )
        if self.use_fft:
            # FFT mode is f32-only (TPU XLA has no f64 FFT): clamp the
            # mode-arithmetic dtype so an f64 pc_dtype cannot promote
            # the complex64 rfftn coefficients to complex128 (whose
            # irfftn would need the nonexistent f64 FFT).
            self.compute_dtype = jnp.float32
            self.Qs = None
            self.lam = jnp.asarray(
                laplacian_symbol(
                    [int(n) for n in grid.nps],
                    [float(s) for s in grid.spacing],
                    grid.stencil_width,
                ),
                dtype=jnp.float32,
            )
            return
        sw = grid.stencil_width
        Qs, lams = [], []
        for d in range(grid.dim):
            Q, lam = laplacian_eigendecomp(
                int(grid.nps[d]), float(grid.spacing[d]), sw
            )
            Qs.append(jnp.asarray(Q, dtype=self.transform_dtype))
            lams.append(lam)
        self.Qs = Qs
        # total eigenvalue per spatial mode: lam_x (+ lam_y (+ lam_z))
        total = lams[0]
        for d in range(1, grid.dim):
            total = total[..., None] + lams[d]
        self.lam = jnp.asarray(total)

    def _forward(self, v):
        # v: (dof, *sshape) -> spectral coefficients.  FFT mode:
        # complex64 rfftn coefficients (last axis truncated to
        # n//2+1); matmul mode: real coefficients, same shape as v.
        if self.use_fft:
            axes = tuple(range(1, 1 + self.dim))
            return jnp.fft.rfftn(v.astype(jnp.float32), axes=axes)
        # Inputs are cast to the transform dtype; accumulation and the
        # returned coefficients stay in compute_dtype (f32 for bf16
        # transforms).
        v = v.astype(self.transform_dtype)
        kw = dict(preferred_element_type=self.compute_dtype)
        if self.dim == 1:
            return jnp.einsum("fi,ik->fk", v, self.Qs[0], **kw)
        if self.dim == 2:
            return jnp.einsum(
                "fij,ik,jl->fkl", v, self.Qs[0], self.Qs[1], **kw
            )
        return jnp.einsum(
            "fijm,ik,jl,mn->fkln",
            v, self.Qs[0], self.Qs[1], self.Qs[2], **kw,
        )

    def _inverse(self, c):
        if self.use_fft:
            axes = tuple(range(1, 1 + self.dim))
            return jnp.fft.irfftn(c, s=self.sshape, axes=axes)
        c = c.astype(self.transform_dtype)
        kw = dict(preferred_element_type=self.compute_dtype)
        if self.dim == 1:
            return jnp.einsum("fk,ik->fi", c, self.Qs[0], **kw)
        if self.dim == 2:
            return jnp.einsum(
                "fkl,ik,jl->fij", c, self.Qs[0], self.Qs[1], **kw
            )
        return jnp.einsum(
            "fkln,ik,jl,mn->fijm",
            c, self.Qs[0], self.Qs[1], self.Qs[2], **kw,
        )

    def apply(self, v, shift, diff, decay):
        """v: (dof, *sshape); diff/decay: per-field scalars (traceable)."""
        in_dtype = v.dtype
        cd = self.compute_dtype
        c = self._forward(v.astype(cd))
        diff = jnp.stack([jnp.asarray(d, dtype=cd) for d in diff])
        decay = jnp.stack([jnp.asarray(d, dtype=cd) for d in decay])
        denom = (
            jnp.asarray(shift, dtype=cd)
            + decay.reshape((-1,) + (1,) * self.dim)
            - diff.reshape((-1,) + (1,) * self.dim)
            * self.lam.astype(cd)
        )
        return self._inverse(c / denom).astype(in_dtype)


class BlockSpectralPreconditioner(SpectralPreconditioner):
    """Per-mode EXACT inverse of the mean-state linearization.

    The diagonal SpectralPreconditioner inverts only each field's own
    diffusion/decay; this one also inverts the chemotaxis coupling of
    the PDE system linearized at the spatial means of the current
    state: per Fourier mode (Laplacian eigenvalue lam <= 0) the
    (dof x dof) matrix

        W(lam) = shift*I - J(lam),
        J_rho,i(lam) = rho_mean * lam * dG/dfield_i |_means
        J_Ul,rho = s_l,   J_Ul,Ul = -gamma_l + D_l*lam

    is an 'arrow' matrix (dense first row/column, diagonal ligand
    block), solved in closed form by a Schur complement on the rho
    row — pure elementwise arithmetic over the mode array, no batched
    linalg.  For near-uniform states this makes the Richardson
    iteration matrix nearly nilpotent; it degrades gracefully (and
    never below the diagonal version's quality in practice) for
    strongly aggregated states.
    """

    def __init__(self, grid, ops, compute_dtype=None, use_fft=False):
        super().__init__(grid, compute_dtype=compute_dtype,
                         use_fft=use_fft)
        self.ops = ops
        self.nfields = ops.nligands + 1

    def apply_linearized(self, v, shift, t, means, rho_diff=None):
        """v: (dof, *sshape); means: per-field scalars of the STATE
        being linearized (not of v, which is a residual).

        rho_diff: optional scalar upper bound on the rho row's
        effective diffusivity max_x(rho * dG/drho).  At capped density
        peaks rho*Vcap' exceeds the mean-state value by orders of
        magnitude; overestimating the diffusion in M keeps the
        preconditioned spectrum inside the Richardson stability region
        (slow modes are then caught by the step-error control), while
        the mean-state value underestimates it and lets the iteration
        diverge — the options92 equilibrium exposed exactly this.
        """
        cd = self.compute_dtype
        in_dtype = v.dtype
        nf = self.nfields
        c = self._forward(v.astype(cd))
        lam = self.lam.astype(cd)
        dG, s, gamma, D = self.ops.linearization_coefficients(means, t)
        rho_mean = jnp.asarray(means[0], dtype=cd)
        shift = jnp.asarray(shift, dtype=cd)
        dG = [jnp.asarray(g, dtype=cd) for g in dG]
        # arrow system per mode:
        #   a x_r + sum_l b_l x_l = y_r
        #   c_l x_r + d_l x_l     = y_l
        if rho_diff is not None:
            a = shift - jnp.asarray(rho_diff, dtype=cd) * lam
        else:
            a = shift - rho_mean * lam * dG[0]
        y_r = c[0]
        schur = a
        rhs_r = y_r
        xs_den = []
        for l in range(nf - 1):
            b_l = -rho_mean * lam * dG[1 + l]
            c_l = -jnp.asarray(s[l], dtype=cd)
            d_l = shift + jnp.asarray(gamma[l], dtype=cd) - jnp.asarray(
                D[l], dtype=cd
            ) * lam
            schur = schur - b_l * c_l / d_l
            rhs_r = rhs_r - b_l * c[1 + l] / d_l
            xs_den.append((c_l, d_l))
        x_r = rhs_r / schur
        outs = [x_r]
        for l in range(nf - 1):
            c_l, d_l = xs_den[l]
            outs.append((c[1 + l] - c_l * x_r) / d_l)
        # any extra (non-physical) trailing fields: shift-only inverse
        for extra in range(nf, v.shape[0]):
            outs.append(c[extra] / shift)
        return self._inverse(jnp.stack(outs, axis=0)).astype(in_dtype)


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


def dense_solve_factory(rhs, shape):
    """Build exact dense stage solvers for small problems.

    Returns ``prepare(u, t, shift) -> carry`` and
    ``solve(carry, b) -> y``: ``prepare`` builds the Jacobian of
    ``rhs(u, t)`` and LU-factors (shift*I - J) ONCE per step (shift
    and J are fixed across the Rosenbrock stages); ``solve`` runs only
    the O(N^2) triangular solves per stage.
    """
    n = 1
    for s in shape:
        n *= int(s)

    def prepare(u, t, shift):
        flat_rhs = lambda uf: rhs(uf.reshape(shape), t).reshape(-1)
        J = jax.jacfwd(flat_rhs)(u.reshape(-1))
        W = shift * jnp.eye(n, dtype=J.dtype) - J
        return jsl.lu_factor(W)

    def solve(lu_piv, b):
        return jsl.lu_solve(lu_piv, b.reshape(-1)).reshape(shape)

    return prepare, solve
