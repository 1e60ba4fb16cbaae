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

- x: static sublane slices of a DMA'd slab with halo rows (fetched
  by the shared double-buffered wrap-chunk pipeline of the 2D
  kernels — tile i+1's HBM fetch overlaps tile i's compute; sharded
  sources arrive ppermute-ring padded instead) — identical to the 2D
  kernel;
- y: a flat lane roll by j*nz IS the periodic y-shift (row-major
  (y, z) flattening wraps y exactly);
- z: two lane rolls + a static iota-mask select: a flat roll by j is
  the periodic z-shift except at the j lanes per row where the shift
  crosses a y row; those take the roll by j -+ nz instead.

This removes the 4D tiling constraint entirely and needs NO y/z halo
materialization (less HBM traffic than the 2D design needs per row).

Large cross-sections (VERDICT r3 #3: the old builder required the
WHOLE folded extent L = ny*nz resident per slab, capping fused 3D at
L ~ 20k and silently dropping 256^3-class grids to the 7.4x-slower
XLA path): the lane axis is now TILED too.  The tile grid becomes
(x-tile, lane-tile); each tile's slab holds cl = ny_t*nz body lanes
plus hl = sw*nz halo lanes per side, fetched as three lane pieces per
x-chunk by the shared pipeline (periodic wrap in y = the mod-L piece
offsets, no pad copy).  In-chunk y rolls stay correct because every
kept (interior) lane is >= hl lanes from the chunk edge, and the
z-mask arithmetic is invariant because cl and hl are multiples of nz.
Lane-read amplification is (cl + 2*hl)/cl — the plan chooser
minimizes the combined row/lane amplification under the VMEM budget.

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
    _halo_rows,
    _interpret_forced,
    make_slab_pipeline,
    member_batching_rules,
    pallas_mesh_ok,
)

__all__ = ["make_pallas_kernels_3d", "pallas3d_available"]

NBUF = 2  # double-buffered slab DMA (see make_slab_pipeline)

# Scoped-VMEM budget the tile chooser fits the worst kernel (delta: 3
# double-buffered input slabs) into, leaving margin under the 100 MiB
# VMEM_LIMIT_BYTES for Mosaic's own scheduling slack.
_VMEM_BUDGET = 80 * 1024 * 1024
_N_TEMPS = 24  # stack-frame allowance: slab-sized kernel temporaries
               # (G/dG fields, per-axis derivative accumulators); the
               # 2D resid kernel measured ~28 temp-equivalents at its
               # 16.39 MB frame (1024 lanes, 144-row slabs)


def _vmem_estimate(dof, tx, lanes, n_inputs, halo=8):
    """Worst-kernel VMEM bytes for a slab of ``lanes`` lane extent
    (the full folded L, or a lane chunk cl + 2*hl)."""
    slab_rows = tx + 2 * halo
    slabs = n_inputs * dof * slab_rows * lanes * 4 * NBUF
    out = dof * tx * lanes * 4
    temps = _N_TEMPS * slab_rows * lanes * 4
    return slabs + out + temps


def _tile_plan3d(nx_loc, dof, ny, nz, sw, tile_x=64):
    """(tx, ny_t, halo) plan for the 3D builder, or None.

    tx: x-tile rows — a multiple of 8 dividing nx_loc (the
    make_slab_pipeline contract; plain halving used to produce
    12/10-row tiles and crash the builder).  ny_t: y rows per lane
    tile (ny_t == ny means the lane axis stays untiled — the original
    full-L layout).  The chooser enumerates feasible (tx, ny_t) pairs
    under the VMEM budget and picks the one minimizing the combined
    halo read amplification ((tx+2*halo)/tx) * ((cl+2*hl)/cl),
    tie-breaking toward larger tiles.
    """
    nx_loc, ny, nz, sw = int(nx_loc), int(ny), int(nz), int(sw)
    if nx_loc % 8:
        return None
    halo = _halo_rows(sw)
    L = ny * nz
    if L % 128:
        return None
    start = max(8, min(int(tile_x), nx_loc) // 8 * 8)
    txs = [
        tx for tx in range(start, 7, -8)
        if nx_loc % tx == 0 and tx >= halo
    ]
    if not txs:
        return None
    # untiled lane axis first: zero lane amplification
    for tx in txs:
        if _vmem_estimate(dof, tx, L, 3, halo) <= _VMEM_BUDGET:
            return (tx, ny, halo)
    # lane tiling: hl = sw*nz halo lanes must be 128-aligned (lane
    # piece offsets are multiples of gcd(cl, hl))
    hl = sw * nz
    if hl % 128:
        return None
    best = None
    for ny_t in range(ny - 1, 0, -1):
        if ny % ny_t:
            continue
        cl = ny_t * nz
        if cl % 128 or hl > cl:
            continue
        lanes = cl + 2 * hl
        for tx in txs:
            if _vmem_estimate(dof, tx, lanes, 3, halo) > _VMEM_BUDGET:
                continue
            amp = ((tx + 2.0 * halo) / tx) * ((cl + 2.0 * hl) / cl)
            key = (amp, -tx, -ny_t)
            if best is None or key < best[0]:
                best = (key, (tx, ny_t, halo))
            break  # larger tx under budget dominates smaller ones
    return best[1] if best else None


def _tile_rows3d(nx_loc, dof, L, tile_x=64, halo=8):
    """Back-compat row-count probe used by pallas_mesh_ok: the x-tile
    rows of the plan (0 when no plan exists).  L is the folded ny*nz;
    the lane split is inferred assuming nz divides gcd-friendly — the
    full planner is _tile_plan3d, which callers with (ny, nz) in hand
    should prefer."""
    nx_loc = int(nx_loc)
    if nx_loc % 8:
        return 0
    start = max(8, min(int(tile_x), nx_loc) // 8 * 8)
    for tx in range(start, 7, -8):
        if nx_loc % tx == 0 and _vmem_estimate(
            dof, tx, L, 3, halo
        ) <= _VMEM_BUDGET:
            return tx
    return 0


def pallas3d_available(grid, ops=None):
    """3D fused kernels: TPU (or forced interpret), plain operators,
    a 128-aligned folded cross-section, 8-row-aligned x extent (the
    wrap-chunk DMA addresses rows in 8-row units), and a VMEM-feasible
    (x-tile, lane-tile) plan."""
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
        if nx % 8:
            return False
        if _tile_plan3d(nx, grid.dof, ny, nz, sw) is None:
            return False
        if _interpret_forced():
            return True
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def make_pallas_kernels_3d(ops, tile_x=64, interpret=False, mesh=None,
                           batch=0):
    """Build the fused 3D kernels.  Same contract as
    pallas_stencil.make_pallas_kernels (returns .rhs/.jvp/.delta),
    including the member-batched build + custom_vmap rules (batch=).

    Uses the shared double-buffered slab-DMA pipeline (tile i+1's HBM
    fetch overlaps tile i's compute; single-shard sources read
    UNPADDED via mod-offset wrap chunks) — the 2D kernels' design,
    which bought them ~1.4x (docs/PERF.md).  The default tile is 64
    rows (not the 2D 128): the folded lane extent is large, so the
    halo-amortization sweet spot sits at smaller tiles; _tile_plan3d
    shrinks rows and/or tiles the lane axis to fit the VMEM budget."""
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
    if nx_loc % 8:
        raise ValueError(
            "3D pallas kernels require the per-shard row count to be "
            "a multiple of 8; got nx=%d over %d shard(s)"
            % (nx, n_shards)
        )
    dof = ops.nligands + 1
    sw = ops.sw
    plan = _tile_plan3d(nx_loc, dof, ny, nz, sw, tile_x=tile_x)
    if plan is None:
        raise ValueError(
            "3D pallas kernels: no VMEM-feasible (x-tile, lane-tile) "
            "plan for nx_loc=%d, (ny, nz)=(%d, %d); "
            "pallas3d_available routes such grids to the XLA path"
            % (nx_loc, ny, nz)
        )
    tx, ny_t, halo = plan
    ntiles = nx_loc // tx
    # lane tiling (ny_t < ny): cl body lanes + hl halo lanes per side
    nlt = ny // ny_t
    cl = ny_t * nz
    hl = sw * nz if nlt > 1 else 0
    clh = cl + 2 * hl  # slab lane extent
    # member batching (see pallas_stencil.py — same scheme)
    B = int(batch)
    if B and n_shards > 1:
        raise ValueError("batched kernels cannot also be mesh-sharded")
    kgrid = (B, ntiles, nlt) if B else (ntiles, nlt)
    if B:
        pid = lambda: (
            pl.program_id(0), pl.program_id(1), pl.program_id(2),
        )
        scv = lambda sc_ref, b, j: sc_ref[b, j]
        oix = lambda f: (0, f)
    else:
        pid = lambda: (None, pl.program_id(0), pl.program_id(1))
        scv = lambda sc_ref, b, j: sc_ref[j]
        oix = lambda f: (f,)

    # shared double-buffered slab-DMA machinery (pallas_stencil.py)
    padded_src = n_shards > 1
    _pipe, nchunks = make_slab_pipeline(
        nx_loc=nx_loc, tx=tx, halo=halo, ntiles=ntiles, B=B,
        padded_src=padded_src, nbuf=NBUF,
        lane_chunks=(nlt, cl, hl, L) if nlt > 1 else None,
    )

    def _db_prologue(inputs):
        b, i, iy = pid()
        return _pipe(inputs, b, i, iy)
    cs1 = [deriv_coeffs(1, sw, ops.spacing[d]) for d in range(3)]
    cs2 = [deriv_coeffs(2, sw, ops.spacing[d]) for d in range(3)]
    rhomin = np.float32(ops.rhomin)
    umin = np.float32(ops.Umin)

    G_fn = ops._G_fn
    dG_fns = ops._dG_fns
    G_delta_fn = getattr(ops, "_G_delta_fn", None)
    lig = ops._lig_coeffs

    ix = slice(halo, halo + tx)
    # interior lane slice of a (tx, clh) tile value (identity when
    # the lane axis is untiled)
    il = (
        (lambda a: a)
        if hl == 0
        else (lambda a: a[:, hl:hl + cl])
    )

    def _zid(rows):
        # lane's z index within its (y) row — static, CSE'd by Mosaic.
        # Strictly i32 end to end (lax.rem, i32 literal): jnp's `%`
        # would promote through Python-int operands to i64 under x64,
        # and Mosaic's i64 convert lowering recurses unboundedly.
        # Valid for lane chunks too: cl and hl are multiples of nz,
        # so position p in the chunk has z = p % nz exactly.
        idx = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
        return jax.lax.rem(idx, jnp.int32(nz))

    def _d(slab, axis, cs):
        """Derivative of the tile interior along one axis.

        slab: (tx + 2*halo, clh) folded field.  x via static sublane
        slices; y via flat lane rolls (stride nz); z via the masked
        two-roll periodic shift described in the module docstring.
        Lane rolls use the chunk extent as modulus: every interior
        lane sits >= hl lanes from the chunk edge (hl >= sw*nz >=
        nz + sw, the largest shift), so the chunk-cyclic wrap never
        reaches a kept lane; the untiled case (clh == L) wraps
        periodically, which IS the y boundary condition."""
        lanes = slab.shape[-1]
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
                    rows, jnp.int32((-j * nz) % lanes), axis=1
                )
            else:
                a = pltpu.roll(rows, jnp.int32((-j) % lanes), axis=1)
                if j > 0:
                    b = pltpu.roll(rows, jnp.int32(nz - j), axis=1)
                    w = jnp.where(_zid(rows) < jnp.int32(nz - j), a, b)
                else:
                    b = pltpu.roll(
                        rows, jnp.int32((lanes - nz - j) % lanes),
                        axis=1,
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

    # ------------------------------------------------------------------
    def rhs_kernel(sc_ref, u_ref, o_ref, slab, sem):
        # sc layout matches the 2D kernel: [t, means..., G_mean,
        # reaction balances...] (f64-computed outside; centering
        # removes the catastrophic f32 cancellation on O(1e4) fields)
        b, i, iy = pid()
        buf = _db_prologue([(u_ref, slab, sem)])
        t = scv(sc_ref, b, 0)
        fields = groom_slab(slab[buf])
        rho, Us = fields[0], fields[1:]
        G = G_fn(rho, *Us, t)
        Gc = G - scv(sc_ref, b, 1 + dof)
        rho_c = rho - scv(sc_ref, b, 1)
        o_ref[oix(0)] = il(
            graddot(rho_c, Gc) + rho[ix, :] * lap(Gc)
        )
        for l in range(dof - 1):
            Uc = Us[l] - scv(sc_ref, b, 2 + l)
            o_ref[oix(1 + l)] = il(
                -lig[l]["gamma"](t) * Uc[ix, :]
                + lig[l]["s"](t) * rho_c[ix, :]
                + scv(sc_ref, b, 2 + dof + l)
                + lig[l]["D"](t) * lap(Uc)
            )

    def _jvp_rows(t, slab, vslab):
        """J-action rows on the tile interior (shared by jvp/resid).
        slab/vslab are VALUES (loaded slab buffers), not refs."""
        fields = groom_slab(slab)
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
        b, i, iy = pid()
        buf = _db_prologue([(u_ref, slab, sem), (v_ref, vslab, vsem)])
        rows = _jvp_rows(scv(t_ref, b, 0), slab[buf], vslab[buf])
        for f in range(dof):
            o_ref[oix(f)] = il(rows[f])

    def resid_kernel(
        sc_ref, u_ref, v_ref, b_ref, o_ref, slab, vslab, sem, vsem
    ):
        # fused Richardson residual (see the 2D resid_kernel);
        # sc = [t, shift]; b is an auto-blocked VMEM tile
        b, i, iy = pid()
        buf = _db_prologue([(u_ref, slab, sem), (v_ref, vslab, vsem)])
        shift = scv(sc_ref, b, 1)
        vval = vslab[buf]
        rows = _jvp_rows(scv(sc_ref, b, 0), slab[buf], vval)
        for f in range(dof):
            v_c = vval[f][ix, :]
            o_ref[oix(f)] = b_ref[oix(f)] - il(shift * v_c - rows[f])

    def delta_kernel(
        sc_ref, u_ref, d_ref, s_ref, o_ref, slab, dslab, sslab,
        sem, dsem, ssem,
    ):
        # see the 2D delta_kernel derivation (pallas_stencil.py)
        b, i, iy = pid()
        buf = _db_prologue([
            (u_ref, slab, sem), (d_ref, dslab, dsem), (s_ref, sslab, ssem),
        ])
        t = scv(sc_ref, b, 0)
        uval, dval, sval = slab[buf], dslab[buf], sslab[buf]
        rho0 = uval[0]
        Us0 = [uval[1 + l] for l in range(dof - 1)]
        drho = dval[0]
        dUs = [dval[1 + l] for l in range(dof - 1)]
        f1 = [sval[l] for l in range(dof)]
        G0c = G_fn(rho0, *Us0, t) - scv(sc_ref, b, 2)
        dG = G_delta_fn(rho0, *Us0, drho, *dUs, *f1, t)
        Gs = G0c + dG
        rho0c = rho0 - scv(sc_ref, b, 1)
        o_ref[oix(0)] = il(
            graddot(drho, Gs)
            + graddot(rho0c, dG)
            + drho[ix, :] * lap(Gs)
            + rho0[ix, :] * lap(dG)
        )
        for l in range(dof - 1):
            o_ref[oix(1 + l)] = il(
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
            (1, dof, tx, cl),
            lambda b, i, iy, t: (b, i * 0, i, iy),
            memory_space=pltpu.VMEM,
        )
    else:
        out_shape = jax.ShapeDtypeStruct((dof, nx_loc, L), jnp.float32)
        out_spec = pl.BlockSpec(
            (dof, tx, cl), lambda i, iy, t: (i * 0, i, iy),
            memory_space=pltpu.VMEM,
        )
    slab_t = pltpu.VMEM((NBUF, dof, tx + 2 * halo, clh), jnp.float32)
    sems_t = pltpu.SemaphoreType.DMA((NBUF, nchunks))
    # sharded sources arrive ppermute-padded; single-shard/batched
    # sources are read unpadded (wrap chunks), cf. the 2D builder
    maybe_pad = pad_x if padded_src else (lambda u: u)

    def grid_spec(n_in, extra_in=()):
        return pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=kgrid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in
            + list(extra_in),
            out_specs=out_spec,
            scratch_shapes=[slab_t] * n_in + [sems_t] * n_in,
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
        )(sc, maybe_pad(_fold(u32)))
        return _unfold(out)

    def jvp_local(tarr, u32, v32):
        out = pl.pallas_call(
            jvp_kernel, out_shape=out_shape, grid_spec=grid_spec(2),
            interpret=interpret, compiler_params=_cparams,
        )(tarr, maybe_pad(_fold(u32)), maybe_pad(_fold(v32)))
        return _unfold(out)

    def delta_local(sc, u32, d32, s32):
        out = pl.pallas_call(
            delta_kernel, out_shape=out_shape, grid_spec=grid_spec(3),
            interpret=interpret, compiler_params=_cparams,
        )(
            sc, maybe_pad(_fold(u32)), maybe_pad(_fold(d32)),
            maybe_pad(_fold(s32)),
        )
        return _unfold(out)

    def resid_local(sc, u32, v32, b32):
        out = pl.pallas_call(
            resid_kernel, out_shape=out_shape,
            grid_spec=grid_spec(2, extra_in=[out_spec]),
            interpret=interpret, compiler_params=_cparams,
        )(sc, maybe_pad(_fold(u32)), maybe_pad(_fold(v32)), _fold(b32))
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
        tile_plan=dict(tx=tx, ny_t=ny_t, halo=halo, nlt=nlt,
                       cl=cl, hl=hl),
    )
