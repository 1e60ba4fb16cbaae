"""Fused Pallas TPU kernel for the spectral block preconditioner.

The block preconditioner (solvers/linalg.BlockSpectralPreconditioner)
applies M^{-1} = Qx . arrow^{-1}(modes) . Qx^T v Qy . Qy^T as XLA
einsums.  XLA runs each GEMM as its own HBM round trip, so a 2D apply
costs ~8 state-sized HBM passes (v, three intermediates in+out, out)
— measured 122 us at 1024^2x3 on v5e against a ~65 us MXU-compute
floor (docs/PERF.md component table).  Since the apply fires
12-16x/step it is the step's dominant un-optimized block and the
reason VERDICT r3 ranked it #1.

This module fuses the whole apply into TWO pipelined Pallas kernels
with the half-transformed intermediates living ONLY in VMEM:

- forward kernel (grid over x-mode blocks): v stays VMEM-resident
  across grid steps (constant index map); each step contracts a
  (kb, nx) slab of Qx^T against it, right-multiplies by the resident
  Qy, and applies the per-mode arrow inverse (Schur complement on the
  rho row) computed IN KERNEL from the lam block + per-step scalars —
  recomputing mode math from the minimal inputs is the measured-
  optimal policy on HBM-bound kernels (the r3 transcendental-hoisting
  probe: flops are free, bytes are not);
- inverse kernel (grid over output x blocks): the mode coefficients
  stay resident; each step contracts a (ib, nx) slab of Qx and the
  resident Qy^T back to physical space.

Total HBM traffic: v in + modes out + modes in + out out + the basis
matrices — ~70 MB at 1024^2x3 vs XLA's ~100 MB, with the MXU work
(the true floor) fully overlapped by the Pallas block pipeline.

MXU dtype: on real TPU the dot operands are cast to bfloat16 with
float32 accumulation — the SAME numerics class as the einsum path
(XLA's default f32 dot precision rounds inputs to bf16 on v5e;
docs/PERF.md "bf16 pc transforms"), and well inside the
preconditioner's tolerance (linalg.py: M^{-1} perturbations ~1e-2
relative sit far inside the Richardson contraction margin).  Under
interpret (CI) the dots stay f32 so the equivalence test against the
einsum apply is tight.

Single-shard only: the sharded apply keeps the einsum path, whose
all-reduce-per-apply floor the comm audit pins (the sharded apply is
wire-bound, not HBM-bound).  Reference context: the apply plays the
role MUMPS's distributed triangular solves play per stage in the
reference (/root/reference/options84 PETSc block).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_stencil import VMEM_LIMIT_BYTES, _interpret_forced

__all__ = ["make_pallas_block_pc", "pallas_pc_available", "pack_pc_scalars"]


def _block(n):
    """Largest multiple of 128 <= 256 dividing n (0 if none)."""
    for b in (256, 128):
        if n % b == 0:
            return b
    return 0


def pallas_pc_available(grid, ops=None):
    """Fused block-pc kernels support 2D grids with 128-aligned axes
    on TPU (or forced interpret), physical dof only (no with-G
    trailing fields), and a resident state that fits VMEM."""
    try:
        if grid.dim != 2:
            return False
        if ops is not None and grid.dof != ops.nligands + 1:
            return False
        nx, ny = (int(n) for n in grid.nps)
        if not _block(nx) or ny % 128:
            return False
        # resident blocks: v (or modes) + Qy + per-step slabs; keep a
        # wide margin under the scoped-VMEM limit
        resident = grid.dof * nx * ny * 4 + ny * ny * 4
        if resident > VMEM_LIMIT_BYTES // 2:
            return False
        if _interpret_forced():
            return True
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def pack_pc_scalars(ops, shift, t, means, rho_diff):
    """The per-step scalar vector the fused kernels consume:
    [shift, rho_diff, rho_mean, dG_1..dG_nl, s_1..s_nl,
     gamma_1..gamma_nl, D_1..D_nl] (float32).  Matches
    BlockSpectralPreconditioner.apply_linearized's arrow system."""
    dG, s, gamma, D = ops.linearization_coefficients(means, t)
    nl = ops.nligands
    parts = [shift, rho_diff, means[0]]
    parts += [dG[1 + l] for l in range(nl)]
    parts += list(s) + list(gamma) + list(D)
    return jnp.stack(
        [jnp.asarray(p, dtype=jnp.float32) for p in parts]
    )


def make_pallas_block_pc(grid, ops, interpret=False, kb=None):
    """Build the fused apply: (sc, v32) -> M^{-1} v32 (float32).

    sc from pack_pc_scalars; v32 (dof, nx, ny) float32.  Exact same
    arithmetic as apply_linearized with rho_diff set (the production
    configuration) up to dot-product association/MXU input rounding.
    """
    from .stencil import laplacian_eigendecomp

    interpret = interpret or _interpret_forced()
    nx, ny = (int(n) for n in grid.nps)
    nf = int(grid.dof)
    nl = nf - 1
    sw = grid.stencil_width
    kb = kb or _block(nx)
    assert kb, "pallas_pc_available gates alignment"
    nkb = nx // kb

    Qs, lams = [], []
    for d in range(2):
        Q, lam = laplacian_eigendecomp(
            int(grid.nps[d]), float(grid.spacing[d]), sw
        )
        Qs.append(np.asarray(Q, dtype=np.float32))
        lams.append(lam)
    lam2d = jnp.asarray(
        lams[0][:, None] + lams[1][None, :], dtype=jnp.float32
    )

    # bf16 MXU operands on real TPU (XLA-default einsum class),
    # PRE-CAST OUTSIDE the kernel: the state/basis refs arrive bf16,
    # so no per-grid-step VPU cast of the resident blocks and half
    # the resident-DMA bytes.  Exact f32 under interpret so CI
    # equivalence tests stay tight.
    mxu = jnp.float32 if interpret else jnp.bfloat16

    def dot(a, b):
        return jax.lax.dot_general(
            a.astype(mxu), b.astype(mxu),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    Qx = jnp.asarray(Qs[0], dtype=mxu)
    QxT = jnp.asarray(Qs[0].T, dtype=mxu)
    Qy = jnp.asarray(Qs[1], dtype=mxu)
    QyT = jnp.asarray(Qs[1].T, dtype=mxu)

    def fwd_kernel(sc_ref, v_ref, qxt_ref, qy_ref, lam_ref, o_ref):
        shift = sc_ref[0]
        rho_diff = sc_ref[1]
        rho_mean = sc_ref[2]
        lam = lam_ref[...]
        cs = []
        for f in range(nf):
            tmp = dot(qxt_ref[...], v_ref[f])      # (kb, ny)
            cs.append(dot(tmp, qy_ref[...]))       # (kb, ny) modes
        # arrow inverse per mode (linalg.apply_linearized with the
        # pointwise rho-diffusivity bound — the production config)
        schur = shift - rho_diff * lam
        num = cs[0]
        backs = []
        for l in range(nl):
            dG_l = sc_ref[3 + l]
            s_l = sc_ref[3 + nl + l]
            g_l = sc_ref[3 + 2 * nl + l]
            D_l = sc_ref[3 + 3 * nl + l]
            inv_d = 1.0 / (shift + g_l - D_l * lam)
            b_over_d = (-rho_mean * dG_l) * lam * inv_d
            schur = schur - b_over_d * (-s_l)
            num = num - b_over_d * cs[1 + l]
            backs.append((-s_l, inv_d))
        x_r = num / schur
        o_ref[0] = x_r.astype(o_ref.dtype)
        for l in range(nl):
            c_l, inv_d = backs[l]
            o_ref[1 + l] = (
                (cs[1 + l] - c_l * x_r) * inv_d
            ).astype(o_ref.dtype)

    def inv_kernel(c_ref, qx_ref, qyt_ref, o_ref):
        for f in range(nf):
            tmp = dot(qx_ref[...], c_ref[f])       # (kb, ny)
            o_ref[f] = dot(tmp, qyt_ref[...])

    cparams = pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)
    # modes live in the MXU dtype end to end (fwd output = inv input);
    # only the final physical-space result is f32
    modes_t = jax.ShapeDtypeStruct((nf, nx, ny), mxu)
    state_t = jax.ShapeDtypeStruct((nf, nx, ny), jnp.float32)

    fwd = pl.pallas_call(
        fwd_kernel,
        out_shape=modes_t,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nkb,),
            # index maps receive (grid idx, scalar ref) under
            # PrefetchScalarGridSpec; zeros derived as i*0 so the
            # returned indices stay i32 under x64 (CLAUDE.md Mosaic
            # gotcha: literal 0 becomes i64 and fails legalization)
            in_specs=[
                pl.BlockSpec(
                    (nf, nx, ny), lambda i, s: (i * 0, i * 0, i * 0)
                ),
                pl.BlockSpec((kb, nx), lambda i, s: (i, i * 0)),
                pl.BlockSpec((ny, ny), lambda i, s: (i * 0, i * 0)),
                pl.BlockSpec((kb, ny), lambda i, s: (i, i * 0)),
            ],
            out_specs=pl.BlockSpec(
                (nf, kb, ny), lambda i, s: (i * 0, i, i * 0)
            ),
        ),
        interpret=interpret,
        compiler_params=cparams,
    )

    inv = pl.pallas_call(
        inv_kernel,
        out_shape=state_t,
        grid=(nkb,),
        in_specs=[
            pl.BlockSpec(
                (nf, nx, ny), lambda i: (i * 0, i * 0, i * 0)
            ),
            pl.BlockSpec((kb, nx), lambda i: (i, i * 0)),
            pl.BlockSpec((ny, ny), lambda i: (i * 0, i * 0)),
        ],
        out_specs=pl.BlockSpec(
            (nf, kb, ny), lambda i: (i * 0, i, i * 0)
        ),
        interpret=interpret,
        compiler_params=cparams,
    )

    def apply(sc, v32):
        # the cast to the MXU dtype fuses into v's producer at the
        # XLA level; the kernels then DMA half the resident bytes and
        # run zero per-step VPU casts on the big blocks
        c = fwd(sc, v32.astype(mxu), QxT, Qy, lam2d)
        return inv(c, Qx, QyT)

    # exposed for the probe tool's component timings
    apply.fwd = lambda sc, v32: fwd(sc, v32.astype(mxu), QxT, Qy, lam2d)
    apply.inv = lambda c: inv(c.astype(mxu), Qx, QyT)
    return apply
