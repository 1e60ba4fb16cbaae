"""Fused Pallas TPU kernels for the Keller-Segel RHS and its J-action.

The reference evaluates its RHS as a sequence of generated C ufuncs
over stencil-shifted array views (KSFD/ksfdsym.py:763-812); the XLA
path of this framework does the same with jnp rolls fused by XLA.
This module provides the hand-fused alternative the survey's build
plan calls the performance north star (SURVEY §7 step 7): ONE kernel
pass per evaluation that

- DMAs an x-slab of the state (tile rows + stencil_width halo rows,
  periodic wrap pre-applied by a cheap XLA pad) from HBM to VMEM,
- computes the pointwise free energy G (and, for the J-action, its
  field derivatives) on the slab,
- applies the x-stencils as static row slices and the y-stencils as
  in-register periodic rolls (full y rows are resident), and
- writes only the tile's interior rows back.

The J-action kernel implements the exact directional derivative,
derived from the product rule of div(rho grad G) with
dG = sum_i dG/dfield_i * v_i — the fused-kernel counterpart of the
reference's analytically assembled Jacobian (KSFD/ksfdsym.py:630-886).

Mosaic has no float64, so these kernels are float32: they power the
optional fast path; the float64 parity path keeps the XLA RHS.  2D
only (the benchmark-critical case).

Precision envelope (measured at 1024^2 x 3 on TPU v5e): on rough
(aggregated, production mid-run) states the kernels add NO error
beyond float32 itself — max rel deviation from the f64 RHS 1.1073e-4
vs 1.1074e-4 for the XLA-f32 RHS — while running 1.8x faster than
XLA-f32 and 6.5x faster than the XLA-f64 path (0.79 ms vs 1.44 /
5.1 ms per chained evaluation).  On NEAR-UNIFORM states (fields ~1e4
with ~1-amplitude structure) float32 quantization of the state itself
dominates: no f32 kernel can deliver the 1e-6-accurate free-energy
differences the stencil needs there; the kernel centers all
differenced quantities on f64-computed means to get the best f32
answer, but quantitative startup-regime work belongs to the f64 path.
"""


import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import deriv_coeffs

__all__ = ["make_pallas_rhs", "pallas_available"]


def pallas_available(grid, ops=None):
    """Fused kernels support plain 2D operators on TPU.

    with-G states (grid.dof == nligands+2) carry an extra field the
    kernels don't model; those fall back to the XLA path.
    """
    try:
        import jax

        if ops is not None and grid.dof != ops.nligands + 1:
            return False
        return (
            grid.dim == 2
            and jax.devices()[0].platform == "tpu"
        )
    except Exception:
        return False


def _dx(slab, cs, sw, tx, halo):
    """x-derivative of the tile interior: static row slices of the slab."""
    acc = None
    for j in range(-sw, sw + 1):
        c = float(cs[j + sw])
        if c == 0.0:
            continue
        term = c * slab[halo + j : halo + j + tx, :]
        acc = term if acc is None else acc + term
    return acc


def _dy(rows, cs, sw):
    """y-derivative of full rows via periodic in-register rolls."""
    ny = rows.shape[1]
    acc = None
    for j in range(-sw, sw + 1):
        c = float(cs[j + sw])
        if c == 0.0:
            continue
        # jnp.roll(rows, -j) == pltpu.roll(rows, (-j) % ny) (shift >= 0;
        # i32 — Mosaic's dynamic_rotate rejects the x64-default i64)
        term = c * pltpu.roll(rows, jnp.int32((-j) % ny), axis=1)
        acc = term if acc is None else acc + term
    return acc


def make_pallas_rhs(ops, tile_x=128, interpret=False):
    """Build (rhs_fn, jvp_fn) fused kernels for a 2D PDEOperators.

    rhs_fn(u, t): float32 (dof, nx, ny) -> (dof, nx, ny), including
        grooming, matching ops.rhs up to f32 arithmetic.  Sources are
        added outside the kernel (cheap fused XLA adds).
    jvp_fn(u, v, t): the exact directional derivative of rhs at u.
    """
    grid = ops.grid
    assert grid.dim == 2, "pallas RHS kernel is 2D"
    nx, ny = grid.Sshape
    dof = ops.nligands + 1
    sw = ops.sw
    tx = min(tile_x, nx)
    while nx % tx:
        tx //= 2
    ntiles = nx // tx
    # Mosaic requires VMEM slices row-aligned to the (8,128) f32 tile:
    # halo rows rounded up to a multiple of 4 so tx + 2*halo stays
    # 8-aligned (tx is a power of two >= 8)
    halo = ((sw + 3) // 4) * 4
    cs1x = deriv_coeffs(1, sw, ops.spacing[0])
    cs2x = deriv_coeffs(2, sw, ops.spacing[0])
    cs1y = deriv_coeffs(1, sw, ops.spacing[1])
    cs2y = deriv_coeffs(2, sw, ops.spacing[1])
    rhomin = np.float32(ops.rhomin)
    umin = np.float32(ops.Umin)

    G_fn = ops._G_fn
    dG_fns = ops._dG_fns
    lig = ops._lig_coeffs

    def groom_slab(slab):
        rho = jnp.maximum(slab[0], rhomin)
        Us = [jnp.maximum(slab[1 + l], umin) for l in range(dof - 1)]
        return [rho] + Us

    def lap(field_slab):
        # laplacian of the tile interior from a slab field
        return _dx(field_slab, cs2x, sw, tx, halo) + _dy(
            field_slab[halo : halo + tx, :], cs2y, sw
        )

    def graddot(a_slab, b_slab):
        # grad(a).grad(b) on the tile interior
        ax = _dx(a_slab, cs1x, sw, tx, halo)
        bx = _dx(b_slab, cs1x, sw, tx, halo)
        ay = _dy(a_slab[halo : halo + tx, :], cs1y, sw)
        by = _dy(b_slab[halo : halo + tx, :], cs1y, sw)
        return ax * bx + ay * by

    def rhs_kernel(sc_ref, u_ref, o_ref, slab, sem):
        # sc_ref layout: [t, mean_0..mean_{dof-1}, G_mean,
        #                 react_1..react_{dof-1}] — the means and the
        # mean-level reaction balances are computed in f64 OUTSIDE the
        # kernel; subtracting them before differencing removes the
        # catastrophic f32 cancellation of O(1e4) fields with O(1e-4)
        # derivatives.
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            u_ref.at[:, pl.ds(i * tx, tx + 2 * halo), :], slab, sem
        )
        cp.start()
        cp.wait()
        t = sc_ref[0]
        fields = groom_slab(slab[:])
        rho, Us = fields[0], fields[1:]
        G = G_fn(rho, *Us, t)
        Gc = G - sc_ref[1 + dof]          # centered free energy
        rho_c = rho - sc_ref[1]
        center = rho[halo : halo + tx, :]
        drho = graddot(rho_c, Gc) + center * lap(Gc)
        o_ref[0, :, :] = drho
        for l in range(dof - 1):
            Uc = Us[l] - sc_ref[2 + l]
            rc = rho_c[halo : halo + tx, :]
            dU = (
                -lig[l]["gamma"](t) * Uc[halo : halo + tx, :]
                + lig[l]["s"](t) * rc
                + sc_ref[2 + dof + l]      # f64 mean-level balance
                + lig[l]["D"](t) * lap(Uc)
            )
            o_ref[1 + l, :, :] = dU

    def jvp_kernel(t_ref, u_ref, v_ref, o_ref, slab, vslab, sem, vsem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            u_ref.at[:, pl.ds(i * tx, tx + 2 * halo), :], slab, sem
        )
        cp.start()
        cpv = pltpu.make_async_copy(
            v_ref.at[:, pl.ds(i * tx, tx + 2 * halo), :], vslab, vsem
        )
        cpv.start()
        cp.wait()
        cpv.wait()
        t = t_ref[0]
        fields = groom_slab(slab[:])
        rho, Us = fields[0], fields[1:]
        # clamp derivative: tangent zeroed where the clamp is active
        vrho = jnp.where(slab[0] > rhomin, vslab[0], 0.0)
        vUs = [
            jnp.where(slab[1 + l] > umin, vslab[1 + l], 0.0)
            for l in range(dof - 1)
        ]
        G = G_fn(rho, *Us, t)
        dGs = [fn(rho, *Us, t) for fn in dG_fns]
        dG = dGs[0] * vrho
        for l in range(dof - 1):
            dG = dG + dGs[1 + l] * vUs[l]
        c_rho = rho[halo : halo + tx, :]
        c_vrho = vrho[halo : halo + tx, :]
        # delta(drho) = grad(v_rho).grad(G) + grad(rho).grad(dG)
        #             + v_rho*lap(G) + rho*lap(dG)
        ddrho = (
            graddot(vrho, G)
            + graddot(rho, dG)
            + c_vrho * lap(G)
            + c_rho * lap(dG)
        )
        o_ref[0, :, :] = ddrho
        for l in range(dof - 1):
            dU = (
                -lig[l]["gamma"](t) * vUs[l][halo : halo + tx, :]
                + lig[l]["s"](t) * c_vrho
                + lig[l]["D"](t) * lap(vUs[l])
            )
            o_ref[1 + l, :, :] = dU

    def pad_x(u):
        # periodic halo rows, done once per call by XLA (cheap concat)
        return jnp.concatenate(
            [u[:, -halo:, :], u, u[:, :halo, :]], axis=1
        )

    out_shape = jax.ShapeDtypeStruct((dof, nx, ny), jnp.float32)
    grid_spec_rhs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (dof, tx, ny), lambda i, t: (i * 0, i, i * 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((dof, tx + 2 * halo, ny), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    grid_spec_jvp = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (dof, tx, ny), lambda i, t: (i * 0, i, i * 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((dof, tx + 2 * halo, ny), jnp.float32),
            pltpu.VMEM((dof, tx + 2 * halo, ny), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    @jax.jit
    def rhs_fn(u, t):
        # means + mean-level reaction balance in f64 (cheap reductions)
        u64 = u.astype(jnp.float64)
        means = [jnp.mean(u64[i]) for i in range(dof)]
        G_m = G_fn(*means, t)
        reacts = [
            lig[l]["s"](t) * means[0] - lig[l]["gamma"](t) * means[1 + l]
            for l in range(dof - 1)
        ]
        sc = jnp.asarray(
            [t] + means + [G_m] + reacts, dtype=jnp.float32
        )
        u = u.astype(jnp.float32)
        out = pl.pallas_call(
            rhs_kernel, out_shape=out_shape, grid_spec=grid_spec_rhs,
            interpret=interpret,
        )(sc, pad_x(u))
        for i, active in enumerate(ops._source_active):
            if active:
                out = out.at[i].add(
                    ops.sources[i](t).astype(jnp.float32)
                )
        return out

    @jax.jit
    def jvp_fn(u, v, t):
        u = u.astype(jnp.float32)
        v = v.astype(jnp.float32)
        tarr = jnp.asarray([t], dtype=jnp.float32)
        return pl.pallas_call(
            jvp_kernel, out_shape=out_shape, grid_spec=grid_spec_jvp,
            interpret=interpret,
        )(tarr, pad_x(u), pad_x(v))

    return rhs_fn, jvp_fn
