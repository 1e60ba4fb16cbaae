"""Exact direct stage solves for 1D problems via the native solver.

The reference materializes its analytic Jacobian into a PETSc AIJ
matrix through the ksfdMat Cython extension and LU-factors it with
MUMPS every stage (KSFD/ksfdsym.py:814-886, options* PETSc blocks).
The equivalent here:

1. The W-operator (shift*I - J) of the 1D interleaved-dof stencil
   system is cyclic banded with halfwidth sw*dof + dof - 1.  Its
   entries are extracted EXACTLY with (2*sw+1)*dof colored jvp probes
   (graph coloring of the stencil: columns whose points are >= 2*sw+1
   apart never overlap in any row).
2. The native C++ cyclic banded LU (ksfd_tpu/native/banded.cpp)
   factors once per step and back-solves all four Rosenbrock stages —
   the MUMPS-parity path, used by numerics ksp_type='banded'.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.exceptions import KSFDException
from ..native.banded import CyclicBandedSolver
from .steppers import wlte_norm_delta

__all__ = ["probe_stride", "extract_w_band", "make_banded_step"]


def probe_stride(n, sw):
    """Smallest divisor of n >= 2*sw+1 (colored-probe period)."""
    need = 2 * sw + 1
    for s in range(need, n + 1):
        if n % s == 0:
            return s
    raise KSFDException("no valid probe stride for n=%d" % n)


def extract_w_band(w_op, n, dof, sw):
    """Extract the cyclic banded matrix of a linear operator.

    w_op: linear callable on (dof, n) arrays (e.g. v -> shift*v - J v).
    Returns a CyclicBandedSolver factored from the exact entries.
    """
    stride = probe_stride(n, sw)
    ncolors = stride * dof
    # probe c = (s, g): ones at field g, points p == s (mod stride)
    P = np.zeros((ncolors, dof, n))
    for s in range(stride):
        for g in range(dof):
            P[s * dof + g, g, s::stride] = 1.0
    WP = np.asarray(jax.vmap(w_op)(jnp.asarray(P)))  # (ncolors, dof, n)
    WP = WP.reshape(stride, dof, dof, n)             # [s, g, f, p]

    N = n * dof
    bw = sw * dof + dof - 1
    kl = ku = bw
    ldab = 2 * kl + ku + 1
    band = np.zeros((ldab, N))
    corner = kl  # kl x kl corner blocks hold every wrapped entry
    top_right = np.zeros((corner, corner))
    bottom_left = np.zeros((corner, corner))
    q = np.arange(n)
    s_of_q = q % stride
    for d in range(-sw, sw + 1):
        rows_p = (q + d) % n
        wrap_lo = (q + d) < 0        # row wrapped to the bottom
        wrap_hi = (q + d) >= n       # row wrapped to the top
        interior = ~(wrap_lo | wrap_hi)
        for g in range(dof):
            for f in range(dof):
                vals = WP[s_of_q, g, f, rows_p]   # entry A[(q+d,f),(q,g)]
                i = rows_p * dof + f
                j = q * dof + g
                # interior -> band storage
                ii, jj = i[interior], j[interior]
                band[kl + ku + ii - jj, jj] = vals[interior]
                # wrapped -> corners
                if wrap_hi.any():
                    # i small (top rows), j large (right cols)
                    it, jt = i[wrap_hi], j[wrap_hi]
                    top_right[it, jt - (N - corner)] = vals[wrap_hi]
                if wrap_lo.any():
                    ib, jb = i[wrap_lo], j[wrap_lo]
                    bottom_left[ib - (N - corner), jb] = vals[wrap_lo]
    return CyclicBandedSolver(N, kl, ku, band, top_right, bottom_left)


def make_banded_step(ops, tab, atol, rtol):
    """Host-side implicit step using the native direct solver.

    Same contract as make_step_fn's jitted step: (u, t, h) ->
    (u1, enorm).  The RHS/jvp evaluations run on device; band
    extraction, factorization, and triangular solves run on host —
    exactly the division of labor of the reference (ufuncs on CPU
    workers, MUMPS on CPU).
    """
    if ops.grid.dim != 1:
        raise KSFDException("banded solver path is 1D only")
    n = ops.grid.nx
    dof = ops.grid.dof
    sw = ops.grid.stencil_width
    rhs_jit = jax.jit(ops.rhs)

    def step(u, t, h):
        from .direct import gather_global, place_like

        u_in = u
        u = gather_global(ops.groom(jnp.asarray(u)))
        t = float(t)
        h = float(h)
        shift = 1.0 / (h * tab.gamma)
        uj = jnp.asarray(u)
        _, f_jvp = jax.linearize(lambda uu: ops.rhs(uu, t), uj)
        w_op = lambda v: shift * v - f_jvp(v)
        solver = extract_w_band(w_op, n, dof, sw)
        try:
            Ys = []
            for i in range(tab.stages):
                Ui = u.copy()
                for jj in range(i):
                    if tab.a[i][jj]:
                        Ui = Ui + tab.a[i][jj] * Ys[jj]
                bi = np.asarray(rhs_jit(jnp.asarray(Ui), t + tab.alpha[i] * h))
                for jj in range(i):
                    if tab.c[i][jj]:
                        bi = bi + (tab.c[i][jj] / h) * Ys[jj]
                # interleaved-dof ordering: index (p, f) -> p*dof + f
                yi = solver.solve(bi.T.reshape(-1))
                Ys.append(yi.reshape(n, dof).T.copy())
            # same embedded-difference accumulation as _step_core:
            # d = sum_j (m2_j - m_j) Y_j with exact coefficient
            # differences (see wlte_norm_delta)
            u1 = u.copy()
            d = np.zeros_like(u)
            for jj in range(tab.stages):
                u1 = u1 + tab.m[jj] * Ys[jj]
                dm = tab.m2[jj] - tab.m[jj]
                if dm:
                    d = d + dm * Ys[jj]
        finally:
            solver.close()
        enorm = float(wlte_norm_delta(jnp.asarray(u1), jnp.asarray(d),
                                      atol, rtol))
        return place_like(u1, u_in), enorm

    return step
