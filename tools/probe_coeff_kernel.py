#!/usr/bin/env python3
"""Measurement probe: coefficient-field resid kernel vs production.

VERDICT r2 #6 asks whether hoisting the per-sweep G/dG transcendental
evaluations out of the fused W/residual kernel pays.  The held-J step
evaluates G(u,t) and its field derivatives dG_i(u,t) INSIDE every
sweep kernel launch even though (u, t) is fixed for the whole step;
this probe precomputes them once per step as COEFFICIENT FIELDS
  C = [rho_groomed, G, dG_0*mask_0, ..., dG_{dof-1}*mask_{dof-1},
       maskpack]
(maskpack = sum_i 2^i * (u_i > floor_i), exact in f32 for dof <= 24)
and times an experimental resid kernel that reads C + v with ZERO
transcendentals against the production resid kernel (which reads
u + v and evaluates G/dG per launch).

The trade: the coeff slab is dof+3 fields where the u slab is dof —
~1.4x the slab read traffic at dof=3 on a kernel already measured at
~75-80%% of the HBM roofline — against the transcendental VPU time.
This script exists to SETTLE that with a slope timing; productionize
only on a win (docs/PERF.md records the outcome either way).

Timing discipline: chained sweeps (x -> resid -> x) inside one jit,
host-transfer fence, perturbed inputs, slope over two chain lengths,
min over repeats (CLAUDE.md).
"""

import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, "tests"))

import numpy as np


def build_coeff_resid(ops, tile_x=128, interpret=False):
    """Experimental coefficient-field resid kernel (2D, unsharded).

    Returns (prepare(u64, t) -> C32, resid(C32, v32, b32, t, shift)).
    Mirrors ops/pallas_stencil.py's resid_kernel exactly except that
    G/dG arrive as precomputed fields.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ksfd_tpu.ops.stencil import deriv_coeffs
    from ksfd_tpu.ops.pallas_stencil import (
        VMEM_LIMIT_BYTES,
        _halo_rows,
        make_slab_pipeline,
        _interpret_forced,
    )

    interpret = interpret or _interpret_forced()
    grid = ops.grid
    nx, ny = grid.Sshape
    dof = ops.nligands + 1
    nc = dof + 3  # rho_g, G, dG'_i..., maskpack
    sw = ops.sw
    tx = min(tile_x, nx)
    while nx % tx:
        tx //= 2
    ntiles = nx // tx
    halo = _halo_rows(sw)
    cs1x = deriv_coeffs(1, sw, ops.spacing[0])
    cs2x = deriv_coeffs(2, sw, ops.spacing[0])
    cs1y = deriv_coeffs(1, sw, ops.spacing[1])
    cs2y = deriv_coeffs(2, sw, ops.spacing[1])
    rhomin = np.float32(ops.rhomin)
    umin = np.float32(ops.Umin)
    G_fn = ops._G_fn
    dG_fns = ops._dG_fns
    lig = ops._lig_coeffs

    def _dx(slab, cs):
        acc = None
        for j in range(-sw, sw + 1):
            c = float(cs[j + sw])
            if c == 0.0:
                continue
            term = c * slab[halo + j : halo + j + tx, :]
            acc = term if acc is None else acc + term
        return acc

    def _dy(rows, cs):
        acc = None
        for j in range(-sw, sw + 1):
            c = float(cs[j + sw])
            if c == 0.0:
                continue
            term = c * pltpu.roll(rows, jnp.int32((-j) % ny), axis=1)
            acc = term if acc is None else acc + term
        return acc

    def lap(f):
        return _dx(f, cs2x) + _dy(f[halo : halo + tx, :], cs2y)

    def graddot(a, b):
        return _dx(a, cs1x) * _dx(b, cs1x) + _dy(
            a[halo : halo + tx, :], cs1y
        ) * _dy(b[halo : halo + tx, :], cs1y)

    _pipe, nchunks = make_slab_pipeline(
        nx_loc=nx, tx=tx, halo=halo, ntiles=ntiles, B=0,
        padded_src=False,
    )

    def resid_kernel(sc_ref, c_ref, v_ref, b_ref, o_ref, cslab, vslab,
                     csem, vsem):
        i = pl.program_id(0)
        buf = _pipe([(c_ref, cslab, csem), (v_ref, vslab, vsem)],
                    None, i)
        t = sc_ref[0]
        shift = sc_ref[1]
        C = cslab[buf]
        V = vslab[buf]
        rho = C[0]
        G = C[1]
        dGs = [C[2 + f] for f in range(dof)]
        mi = C[2 + dof].astype(jnp.int32)
        # masked tangents from the packed clamp bits (exact f32 ints)
        vrho = jnp.where(
            jax.lax.rem(mi, jnp.int32(2)) > 0, V[0], 0.0
        )
        vUs = [
            jnp.where(
                jax.lax.rem(
                    jax.lax.div(mi, jnp.int32(1 << (1 + l))),
                    jnp.int32(2),
                ) > 0,
                V[1 + l], 0.0,
            )
            for l in range(dof - 1)
        ]
        # dGs are PRE-masked, so dG uses the raw tangent
        dG = dGs[0] * V[0]
        for l in range(dof - 1):
            dG = dG + dGs[1 + l] * V[1 + l]
        c_rho = rho[halo : halo + tx, :]
        c_vrho = vrho[halo : halo + tx, :]
        rows = [
            graddot(vrho, G)
            + graddot(rho, dG)
            + c_vrho * lap(G)
            + c_rho * lap(dG)
        ]
        for l in range(dof - 1):
            rows.append(
                -lig[l]["gamma"](t) * vUs[l][halo : halo + tx, :]
                + lig[l]["s"](t) * c_vrho
                + lig[l]["D"](t) * lap(vUs[l])
            )
        for f in range(dof):
            v_c = V[f][halo : halo + tx, :]
            o_ref[(f,)] = b_ref[(f,)] - shift * v_c + rows[f]

    tile_blk = pl.BlockSpec(
        (dof, tx, ny), lambda i, t: (i * 0, i, i * 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2 + [tile_blk],
        out_specs=tile_blk,
        scratch_shapes=[
            pltpu.VMEM((2, nc, tx + 2 * halo, ny), jnp.float32),
            pltpu.VMEM((2, dof, tx + 2 * halo, ny), jnp.float32),
            pltpu.SemaphoreType.DMA((2, nchunks)),
            pltpu.SemaphoreType.DMA((2, nchunks)),
        ],
    )
    out_shape = jax.ShapeDtypeStruct((dof, nx, ny), jnp.float32)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)

    @jax.jit
    def prepare(u, t):
        """Coefficient fields at (u, t), f32: one transcendental pass
        per STEP instead of per sweep."""
        u32 = u.astype(jnp.float32)
        t32 = jnp.asarray(t, dtype=jnp.float32)
        masks = [u32[0] > rhomin] + [
            u32[1 + l] > umin for l in range(dof - 1)
        ]
        rho_g = jnp.where(masks[0], u32[0], rhomin)
        Us_g = [
            jnp.where(masks[1 + l], u32[1 + l], umin)
            for l in range(dof - 1)
        ]
        G = G_fn(rho_g, *Us_g, t32)
        dGs = [fn(rho_g, *Us_g, t32) for fn in dG_fns]
        maskpack = sum(
            (1 << i) * masks[i].astype(jnp.float32)
            for i in range(dof)
        )
        fields = [rho_g, G] + [
            jnp.where(masks[i], dGs[i], 0.0) for i in range(dof)
        ] + [maskpack]
        return jnp.stack(fields)

    def resid(C32, v, b, t, shift):
        sc = jnp.asarray([t, shift], dtype=jnp.float32)
        return pl.pallas_call(
            resid_kernel, out_shape=out_shape, grid_spec=grid_spec,
            interpret=interpret, compiler_params=cparams,
        )(sc, C32, v.astype(jnp.float32), b.astype(jnp.float32))

    return prepare, jax.jit(resid)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--nx", type=int, default=1024)
    parser.add_argument("--sweeps", type=int, default=64)
    parser.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from ksfd_tpu.ops.pallas_stencil import make_pallas_kernels

    ps, grid, ops = ge._make_problem(args.nx, args.nx)
    rng = np.random.default_rng(0)
    u = jnp.asarray(np.stack([
        6000 + 3000 * np.abs(rng.standard_normal(grid.Sshape)),
        6000 + 1000 * np.abs(rng.standard_normal(grid.Sshape)),
        6000 + 500 * np.abs(rng.standard_normal(grid.Sshape)),
    ]))
    v0 = jnp.asarray(
        rng.standard_normal(grid.Vshape), dtype=jnp.float32
    )
    b = jnp.asarray(rng.standard_normal(grid.Vshape), dtype=jnp.float32)
    t, shift = 0.5, 37.0

    kern = make_pallas_kernels(ops)
    prepare, cresid = build_coeff_resid(ops)
    u32 = u.astype(jnp.float32)
    C = prepare(u, t)

    # correctness: coeff kernel == production kernel (identical math)
    r_prod = np.asarray(kern.resid(u32, v0, b, t, shift))
    r_coef = np.asarray(cresid(C, v0, b, t, shift))
    dev = np.abs(r_prod - r_coef).max() / np.abs(r_prod).max()
    print("coeff-vs-production resid rel dev: %.3e" % dev,
          file=sys.stderr)
    assert dev < 1e-5, dev

    # chained-sweep slope timing (x -> resid -> x)
    t32 = jnp.float32(t)
    s32 = jnp.float32(shift)

    @jax.jit
    def chain_prod(x, n):
        def body(i, x):
            return 0.1 * kern.resid(u32, x, b, t32, s32)
        return jax.lax.fori_loop(0, n, body, x)

    @jax.jit
    def chain_coef(x, n):
        def body(i, x):
            return 0.1 * cresid(C, x, b, t32, s32)
        return jax.lax.fori_loop(0, n, body, x)

    def slope(chain, label):
        n_s, n_b = 4, args.sweeps + 4
        fence = lambda a: float(a[0, 0, 0])
        for n in (n_s, n_b):
            fence(chain(v0, n))
        ts = {n_s: [], n_b: []}
        for rep in range(args.repeats):
            for n in (n_s, n_b):
                xp = v0 * (1.0 + 1e-6 * (rep + 1)) + 1e-6
                fence(xp)
                t0 = time.perf_counter()
                fence(chain(xp, n))
                ts[n].append(time.perf_counter() - t0)
        us = (min(ts[n_b]) - min(ts[n_s])) / (n_b - n_s) * 1e6
        print("%s: %.1f us/sweep" % (label, us), file=sys.stderr)
        return us

    us_prod = slope(chain_prod, "production resid (G/dG per sweep)")
    us_coef = slope(chain_coef, "coeff-field resid (no transcendentals)")
    print(json.dumps({
        "nx": args.nx,
        "production_us": round(us_prod, 2),
        "coeff_us": round(us_coef, 2),
        "speedup": round(us_prod / us_coef, 4),
        "rel_dev": float(dev),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
