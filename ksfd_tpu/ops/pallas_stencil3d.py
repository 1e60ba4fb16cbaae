"""Fused Pallas TPU kernels for the 3D Keller-Segel operators.

The 3D analog of ops/pallas_stencil.py (same design notes apply; the
reference's dim-3 capability is KSFD/ksfdgrid.py:60-148).

TPU-first layout choice: a 4D (dof, nx, ny, nz) memref puts nz on the
lane dimension, and Mosaic requires lane extents (and every DMA slice
of them) aligned to the 128-lane tile — which production 3D grids
(64^3, nz=64) violate.  Instead the kernels operate on the state
FOLDED to (dof, nx, ny*nz): the (y, z) cross-section rides the lane
dimension (ny*nz is a multiple of 128 for any grid >= 16x8), x rides
sublanes exactly like the 2D kernels.  Derivatives on the folded
layout:

- x: static sublane slices of a DMA'd slab with halo rows (halo by
  periodic self-wrap, or ppermute ring exchange when x-sharded) —
  identical to the 2D kernel;
- y: a flat lane roll by j*nz IS the periodic y-shift (row-major
  (y, z) flattening wraps y exactly);
- z: two lane rolls + a static iota-mask select: a flat roll by j is
  the periodic z-shift except at the j lanes per row where the shift
  crosses a y row; those take the roll by j -+ nz instead.

This removes the 4D tiling constraint entirely and needs NO y/z halo
materialization (less HBM traffic than the 2D design needs per row).

Provides the same kernel trio as 2D — rhs (f32 fast mode), jvp (the
sweep-chain W operator), delta (stage-RHS increments via the
cancellation-free forms of ops/delta.py) — with identical calling
conventions on (dof, nx, ny, nz) arrays, so the solver uses them
interchangeably.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import deriv_coeffs
from .pallas_stencil import (
    VMEM_LIMIT_BYTES,
    _interpret_forced,
    member_batching_rules,
    pallas_mesh_ok,
)

__all__ = ["make_pallas_kernels_3d", "pallas3d_available"]

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16 MB VMEM


def _vmem_estimate(dof, tx, ny, nz, n_slabs):
    slab = dof * (tx + 8) * ny * nz * 4
    out = dof * tx * ny * nz * 4
    return n_slabs * slab + out


def pallas3d_available(grid, ops=None):
    """3D fused kernels: TPU (or forced interpret), plain operators,
    a 128-aligned folded cross-section, and VMEM feasibility at the
    minimum tile."""
    try:
        import jax

        if ops is not None and grid.dof != ops.nligands + 1:
            return False
        if ops is not None and getattr(ops, "flux_form", False):
            return False
        if grid.dim != 3:
            return False
        nx, ny, nz = (int(n) for n in grid.nps)
        sw = 1 + grid.order // 2 if ops is None else ops.sw
        if (ny * nz) % 128 or nz <= 2 * sw:
            return False
        if _vmem_estimate(grid.dof, 8, ny, nz, 3) > _VMEM_BUDGET:
            return False
        if _interpret_forced():
            return True
        # Mosaic on real TPU: x tiles need 8-row alignment, the same
        # constraint the 2D gate enforces (pallas_stencil.py) —
        # misaligned grids take the XLA path instead of failing
        # kernel compilation.
        return nx % 8 == 0 and jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def make_pallas_kernels_3d(ops, tile_x=8, interpret=False, mesh=None,
                           batch=0):
    """Build the fused 3D kernels.  Same contract as
    pallas_stencil.make_pallas_kernels (returns .rhs/.jvp/.delta),
    including the member-batched build + custom_vmap rules (batch=)."""
    from types import SimpleNamespace

    grid = ops.grid
    assert grid.dim == 3, "3D kernel builder"
    interpret = interpret or _interpret_forced()
    nx, ny, nz = grid.Sshape
    L = ny * nz
    n_shards = 1
    axis_x = None
    if mesh is not None and int(np.prod(mesh.devices.shape)) > 1:
        if not pallas_mesh_ok(mesh, grid):
            raise ValueError(
                "3D pallas kernels require an x-only sharding; got "
                "mesh %r over nx=%d"
                % (dict(zip(mesh.axis_names, mesh.devices.shape)), nx)
            )
        axis_x = mesh.axis_names[0]
        n_shards = dict(zip(mesh.axis_names, mesh.devices.shape))[axis_x]
    nx_loc = nx // n_shards
    dof = ops.nligands + 1
    sw = ops.sw
    tx = min(tile_x, nx_loc)
    while nx_loc % tx:
        tx //= 2
    while _vmem_estimate(dof, tx, ny, nz, 3) > _VMEM_BUDGET and tx > 1:
        tx //= 2
    ntiles = nx_loc // tx
    # x halo rows rounded to keep tx + 2*halo 8-row aligned (cf. 2D)
    halo = ((sw + 3) // 4) * 4
    # member batching (see pallas_stencil.py — same scheme)
    B = int(batch)
    if B and n_shards > 1:
        raise ValueError("batched kernels cannot also be mesh-sharded")
    kgrid = (B, ntiles) if B else (ntiles,)
    if B:
        pid = lambda: (pl.program_id(0), pl.program_id(1))
        scv = lambda sc_ref, b, j: sc_ref[b, j]
        slab_src = lambda ref, b, i: ref.at[
            b, :, pl.ds(i * tx, tx + 2 * halo), :
        ]
        oix = lambda f: (0, f)
    else:
        pid = lambda: (None, pl.program_id(0))
        scv = lambda sc_ref, b, j: sc_ref[j]
        slab_src = lambda ref, b, i: ref.at[
            :, pl.ds(i * tx, tx + 2 * halo), :
        ]
        oix = lambda f: (f,)
    cs1 = [deriv_coeffs(1, sw, ops.spacing[d]) for d in range(3)]
    cs2 = [deriv_coeffs(2, sw, ops.spacing[d]) for d in range(3)]
    rhomin = np.float32(ops.rhomin)
    umin = np.float32(ops.Umin)

    G_fn = ops._G_fn
    dG_fns = ops._dG_fns
    G_delta_fn = getattr(ops, "_G_delta_fn", None)
    lig = ops._lig_coeffs

    ix = slice(halo, halo + tx)

    def _zid(rows):
        # lane's z index within its (y) row — static, CSE'd by Mosaic.
        # Strictly i32 end to end (lax.rem, i32 literal): jnp's `%`
        # would promote through Python-int operands to i64 under x64,
        # and Mosaic's i64 convert lowering recurses unboundedly.
        idx = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
        return jax.lax.rem(idx, jnp.int32(nz))

    def _d(slab, axis, cs):
        """Derivative of the tile interior along one axis.

        slab: (tx + 2*halo, L) folded field.  x via static sublane
        slices; y via flat lane rolls (stride nz); z via the masked
        two-roll periodic shift described in the module docstring.
        """
        acc = None
        rows = None if axis == 0 else slab[ix, :]
        for j in range(-sw, sw + 1):
            c = float(cs[j + sw])
            if c == 0.0:
                continue
            if axis == 0:
                term = c * slab[halo + j : halo + j + tx, :]
            elif axis == 1:
                term = c * pltpu.roll(
                    rows, jnp.int32((-j * nz) % L), axis=1
                )
            else:
                a = pltpu.roll(rows, jnp.int32((-j) % L), axis=1)
                if j > 0:
                    b = pltpu.roll(rows, jnp.int32(nz - j), axis=1)
                    w = jnp.where(_zid(rows) < jnp.int32(nz - j), a, b)
                else:
                    b = pltpu.roll(
                        rows, jnp.int32((L - nz - j) % L), axis=1
                    )
                    w = jnp.where(_zid(rows) >= jnp.int32(-j), a, b)
                term = c * w
            acc = term if acc is None else acc + term
        return acc

    def lap(field):
        return (
            _d(field, 0, cs2[0])
            + _d(field, 1, cs2[1])
            + _d(field, 2, cs2[2])
        )

    def graddot(a, b):
        acc = None
        for d in range(3):
            term = _d(a, d, cs1[d]) * _d(b, d, cs1[d])
            acc = term if acc is None else acc + term
        return acc

    def groom_slab(slab):
        # where-form clamp: NaN compares False, so NaN -> min like
        # PDEOperators.groom (maximum() would propagate the NaN)
        rho = jnp.where(slab[0] >= rhomin, slab[0], rhomin)
        Us = [
            jnp.where(slab[1 + l] >= umin, slab[1 + l], umin)
            for l in range(dof - 1)
        ]
        return [rho] + Us

    def _copy_in(ref, scratch, sem, b, i):
        cp = pltpu.make_async_copy(slab_src(ref, b, i), scratch, sem)
        cp.start()
        return cp

    # ------------------------------------------------------------------
    def rhs_kernel(sc_ref, u_ref, o_ref, slab, sem):
        # sc layout matches the 2D kernel: [t, means..., G_mean,
        # reaction balances...] (f64-computed outside; centering
        # removes the catastrophic f32 cancellation on O(1e4) fields)
        b, i = pid()
        _copy_in(u_ref, slab, sem, b, i).wait()
        t = scv(sc_ref, b, 0)
        fields = groom_slab(slab[:])
        rho, Us = fields[0], fields[1:]
        G = G_fn(rho, *Us, t)
        Gc = G - scv(sc_ref, b, 1 + dof)
        rho_c = rho - scv(sc_ref, b, 1)
        o_ref[oix(0)] = graddot(rho_c, Gc) + rho[ix, :] * lap(Gc)
        for l in range(dof - 1):
            Uc = Us[l] - scv(sc_ref, b, 2 + l)
            o_ref[oix(1 + l)] = (
                -lig[l]["gamma"](t) * Uc[ix, :]
                + lig[l]["s"](t) * rho_c[ix, :]
                + scv(sc_ref, b, 2 + dof + l)
                + lig[l]["D"](t) * lap(Uc)
            )

    def _jvp_rows(t, slab, vslab):
        """J-action rows on the tile interior (shared by jvp/resid)."""
        fields = groom_slab(slab[:])
        rho, Us = fields[0], fields[1:]
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
        rows = [
            graddot(vrho, G)
            + graddot(rho, dG)
            + vrho[ix, :] * lap(G)
            + rho[ix, :] * lap(dG)
        ]
        for l in range(dof - 1):
            rows.append(
                -lig[l]["gamma"](t) * vUs[l][ix, :]
                + lig[l]["s"](t) * vrho[ix, :]
                + lig[l]["D"](t) * lap(vUs[l])
            )
        return rows

    def jvp_kernel(t_ref, u_ref, v_ref, o_ref, slab, vslab, sem, vsem):
        b, i = pid()
        cp = _copy_in(u_ref, slab, sem, b, i)
        cpv = _copy_in(v_ref, vslab, vsem, b, i)
        cp.wait()
        cpv.wait()
        rows = _jvp_rows(scv(t_ref, b, 0), slab, vslab)
        for f in range(dof):
            o_ref[oix(f)] = rows[f]

    def resid_kernel(
        sc_ref, u_ref, v_ref, b_ref, o_ref, slab, vslab, sem, vsem
    ):
        # fused Richardson residual (see the 2D resid_kernel);
        # sc = [t, shift]; b is an auto-blocked VMEM tile
        b, i = pid()
        cp = _copy_in(u_ref, slab, sem, b, i)
        cpv = _copy_in(v_ref, vslab, vsem, b, i)
        cp.wait()
        cpv.wait()
        shift = scv(sc_ref, b, 1)
        rows = _jvp_rows(scv(sc_ref, b, 0), slab, vslab)
        for f in range(dof):
            v_c = vslab[f][ix, :]
            o_ref[oix(f)] = b_ref[oix(f)] - shift * v_c + rows[f]

    def delta_kernel(
        sc_ref, u_ref, d_ref, s_ref, o_ref, slab, dslab, sslab,
        sem, dsem, ssem,
    ):
        # see the 2D delta_kernel derivation (pallas_stencil.py)
        b, i = pid()
        cps = [
            _copy_in(u_ref, slab, sem, b, i),
            _copy_in(d_ref, dslab, dsem, b, i),
            _copy_in(s_ref, sslab, ssem, b, i),
        ]
        for cp in cps:
            cp.wait()
        t = scv(sc_ref, b, 0)
        rho0 = slab[0]
        Us0 = [slab[1 + l] for l in range(dof - 1)]
        drho = dslab[0]
        dUs = [dslab[1 + l] for l in range(dof - 1)]
        f1 = [sslab[l] for l in range(dof)]
        G0c = G_fn(rho0, *Us0, t) - scv(sc_ref, b, 2)
        dG = G_delta_fn(rho0, *Us0, drho, *dUs, *f1, t)
        Gs = G0c + dG
        rho0c = rho0 - scv(sc_ref, b, 1)
        o_ref[oix(0)] = (
            graddot(drho, Gs)
            + graddot(rho0c, dG)
            + drho[ix, :] * lap(Gs)
            + rho0[ix, :] * lap(dG)
        )
        for l in range(dof - 1):
            o_ref[oix(1 + l)] = (
                -lig[l]["gamma"](t) * dUs[l][ix, :]
                + lig[l]["s"](t) * drho[ix, :]
                + lig[l]["D"](t) * lap(dUs[l])
            )

    # ------------------------------------------------------------------
    def pad_x(u):
        """x halo on the folded (dof, nx_loc, L) block: periodic
        self-wrap single-shard, ppermute ring exchange sharded."""
        if n_shards == 1:
            ax = u.ndim - 2
            lo = (slice(None),) * ax + (slice(-halo, None),)
            hi = (slice(None),) * ax + (slice(None, halo),)
            return jnp.concatenate([u[lo], u, u[hi]], axis=ax)
        fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        left = jax.lax.ppermute(u[:, -halo:, :], axis_x, perm=fwd)
        right = jax.lax.ppermute(u[:, :halo, :], axis_x, perm=bwd)
        return jnp.concatenate([left, u, right], axis=1)

    def shardwrap(fn, n_in):
        """Run fn over local (dof, nx_loc, ny, nz) blocks; the fold to
        (dof, nx_loc, L) happens inside, so specs stay 4D."""
        if n_shards == 1:
            return fn
        state = PartitionSpec(None, *mesh.axis_names)
        return jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(PartitionSpec(),) + (state,) * n_in,
            out_specs=state,
            check_vma=False,
        )

    if B:
        out_shape = jax.ShapeDtypeStruct((B, dof, nx_loc, L), jnp.float32)
        out_spec = pl.BlockSpec(
            (1, dof, tx, L), lambda b, i, t: (b, i * 0, i, i * 0),
            memory_space=pltpu.VMEM,
        )
    else:
        out_shape = jax.ShapeDtypeStruct((dof, nx_loc, L), jnp.float32)
        out_spec = pl.BlockSpec(
            (dof, tx, L), lambda i, t: (i * 0, i, i * 0),
            memory_space=pltpu.VMEM,
        )
    slab_t = pltpu.VMEM((dof, tx + 2 * halo, L), jnp.float32)

    def grid_spec(n_in):
        return pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=kgrid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
            out_specs=out_spec,
            scratch_shapes=[slab_t] * n_in
            + [pltpu.SemaphoreType.DMA] * n_in,
        )

    def _fold(u):
        # (…, dof, nx, ny, nz) -> (…, dof, nx, L); works batched too
        return u.reshape(u.shape[:-2] + (L,))

    def _unfold(o):
        return o.reshape(o.shape[:-1] + (ny, nz))

    _cparams = pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)

    def rhs_local(sc, u32):
        out = pl.pallas_call(
            rhs_kernel, out_shape=out_shape, grid_spec=grid_spec(1),
            interpret=interpret, compiler_params=_cparams,
        )(sc, pad_x(_fold(u32)))
        return _unfold(out)

    def jvp_local(tarr, u32, v32):
        out = pl.pallas_call(
            jvp_kernel, out_shape=out_shape, grid_spec=grid_spec(2),
            interpret=interpret, compiler_params=_cparams,
        )(tarr, pad_x(_fold(u32)), pad_x(_fold(v32)))
        return _unfold(out)

    def delta_local(sc, u32, d32, s32):
        out = pl.pallas_call(
            delta_kernel, out_shape=out_shape, grid_spec=grid_spec(3),
            interpret=interpret, compiler_params=_cparams,
        )(sc, pad_x(_fold(u32)), pad_x(_fold(d32)), pad_x(_fold(s32)))
        return _unfold(out)

    grid_spec_resid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=kgrid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            out_spec,
        ],
        out_specs=out_spec,
        scratch_shapes=[slab_t] * 2 + [pltpu.SemaphoreType.DMA] * 2,
    )

    def resid_local(sc, u32, v32, b32):
        out = pl.pallas_call(
            resid_kernel, out_shape=out_shape,
            grid_spec=grid_spec_resid, interpret=interpret,
            compiler_params=_cparams,
        )(sc, pad_x(_fold(u32)), pad_x(_fold(v32)), _fold(b32))
        return _unfold(out)

    rhs_sharded = shardwrap(rhs_local, 1)
    jvp_sharded = shardwrap(jvp_local, 2)
    delta_sharded = shardwrap(delta_local, 3)
    resid_sharded = shardwrap(resid_local, 3)

    if B == 0 and n_shards == 1:
        # member batching under jax.vmap — same scheme as the 2D
        # builder (shared rule factory in pallas_stencil.py)
        wrapped = member_batching_rules(
            lambda nb: make_pallas_kernels_3d(
                ops, tile_x=tile_x, interpret=interpret, batch=nb
            )._locals,
            dict(rhs=rhs_sharded, jvp=jvp_sharded,
                 delta=delta_sharded, resid=resid_sharded),
        )
        rhs_sharded = wrapped["rhs"]
        jvp_sharded = wrapped["jvp"]
        delta_sharded = wrapped["delta"]
        resid_sharded = wrapped["resid"]


    # means over the GROOMED view: ops.rhs grooms before every use of
    # the state, and a NaN entry (where-clamped to the floor inside
    # the kernel slabs) must not poison the f64 mean scalars either
    _rhomin64, _umin64 = float(ops.rhomin), float(ops.Umin)

    def _mean_groomed(u64, i):
        lo = _rhomin64 if i == 0 else _umin64
        f = u64[i]
        return jnp.mean(jnp.where(f >= lo, f, lo))

    @jax.jit
    def rhs_fn(u, t):
        u64 = u.astype(jnp.float64)
        means = [_mean_groomed(u64, i) for i in range(dof)]
        G_m = G_fn(*means, t)
        reacts = [
            lig[l]["s"](t) * means[0] - lig[l]["gamma"](t) * means[1 + l]
            for l in range(dof - 1)
        ]
        sc = jnp.asarray([t] + means + [G_m] + reacts, dtype=jnp.float32)
        out = rhs_sharded(sc, u.astype(jnp.float32))
        for i, active in enumerate(ops._source_active):
            if active:
                out = out.at[i].add(ops.sources[i](t).astype(jnp.float32))
        return out

    @jax.jit
    def jvp_fn(u, v, t):
        tarr = jnp.asarray([t], dtype=jnp.float32)
        return jvp_sharded(
            tarr, u.astype(jnp.float32), v.astype(jnp.float32)
        )

    @jax.jit
    def resid_fn(u, v, b, t, shift):
        """Fused Richardson residual b - (shift*v - J(u) v)."""
        sc = jnp.asarray([t, shift], dtype=jnp.float32)
        return resid_sharded(
            sc,
            u.astype(jnp.float32),
            v.astype(jnp.float32),
            b.astype(jnp.float32),
        )

    delta_fn = None
    if G_delta_fn is not None:

        @jax.jit
        def delta_fn(u0, d, u1, t):
            u64 = u0.astype(jnp.float64)
            rho_mean = _mean_groomed(u64, 0)
            means = [rho_mean] + [
                _mean_groomed(u64, i) for i in range(1, dof)
            ]
            G_m = G_fn(*means, t)
            sc = jnp.asarray([t, rho_mean, G_m], dtype=jnp.float32)
            return delta_sharded(
                sc,
                u0.astype(jnp.float32),
                d.astype(jnp.float32),
                u1.astype(jnp.float32),
            )

    return SimpleNamespace(
        rhs=rhs_fn, jvp=jvp_fn, delta=delta_fn, resid=resid_fn,
        _locals=dict(
            rhs=rhs_sharded, jvp=jvp_sharded, delta=delta_sharded,
            resid=resid_sharded,
        ),
    )
