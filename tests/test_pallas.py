"""Pallas fused-kernel tests (interpret mode on CPU).

The real-TPU accuracy/performance envelope is documented in
ksfd_tpu/ops/pallas_stencil.py; here we verify the kernel MATH in
interpret mode: on states where f32 is adequate, the fused kernels
must agree with the XLA RHS / J-action.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ksfd_tpu import Grid, SolutionParameters
from ksfd_tpu.ops import PDEOperators
from ksfd_tpu.ops.pallas_stencil import make_pallas_rhs
from helpers import make_clargs, OPTIONS92_PARAMS


@pytest.fixture(scope="module")
def ops2d():
    params = [
        p for p in OPTIONS92_PARAMS
        if p.split("=", 1)[0]
        not in ("nelements", "dim", "rho0", "U0_1_1", "U0_2_1")
    ] + ["nelements=64", "dim=2", "height=1", "rho0=murho",
         "U0_1_1=", "U0_2_1="]
    ps = SolutionParameters(make_clargs(params=params))
    grid = Grid(dim=2, width=1.0, height=1.0, nx=64, ny=64, dof=3, order=3)
    return ps, grid, PDEOperators(ps, grid)


def rough_state(grid, scale=1000.0):
    rng = np.random.default_rng(0)
    return np.stack([
        6000 + 3 * scale * np.abs(rng.standard_normal(grid.Sshape)),
        6000 + scale * np.abs(rng.standard_normal(grid.Sshape)),
        6000 + 0.5 * scale * np.abs(rng.standard_normal(grid.Sshape)),
    ])


def test_pallas_rhs_matches_xla(ops2d):
    ps, grid, ops = ops2d
    u = rough_state(grid)
    u64 = jnp.asarray(u)
    u32 = u64.astype(jnp.float32)
    rhs_p, _ = make_pallas_rhs(ops, tile_x=16, interpret=True)
    ref = np.asarray(ops.rhs(u64, 0.5))
    out = np.asarray(rhs_p(u32, 0.5))
    scale = np.abs(ref).max()
    # f32-level agreement with the f64 oracle on a rough state
    assert np.abs(out - ref).max() / scale < 5e-4


def test_pallas_jvp_matches_xla(ops2d):
    ps, grid, ops = ops2d
    u = rough_state(grid)
    rng = np.random.default_rng(1)
    v = rng.standard_normal(grid.Vshape)
    _, jvp_p = make_pallas_rhs(ops, tile_x=16, interpret=True)
    ref = np.asarray(
        ops.jacobian_action(jnp.asarray(u), 0.5, jnp.asarray(v))
    )
    out = np.asarray(
        jvp_p(jnp.asarray(u, dtype=jnp.float32),
              jnp.asarray(v, dtype=jnp.float32), 0.5)
    )
    assert np.abs(out - ref).max() / np.abs(ref).max() < 5e-4


def test_pallas_halo_exceeds_tile_falls_back(monkeypatch):
    """A stencil whose halo (rounded to 8-row DMA units) exceeds the
    tile row count must be routed to the XLA path: the unpadded
    wrap-chunk DMA reads [base-halo, base) as ONE chunk, which
    straddles the periodic boundary when halo > tx (ADVICE r2)."""
    import jax as jax_mod
    from ksfd_tpu.ops import pallas_stencil as pst

    class _Dev:
        platform = "tpu"

    monkeypatch.delenv("KSFD_PALLAS_INTERPRET", raising=False)
    monkeypatch.setattr(jax_mod, "devices", lambda: [_Dev()])
    # order=17 -> sw=9 -> halo rounds to 16; nx=136 collapses the tile
    # to 8 rows (128 -> 64 -> ... -> 8), so halo > tx
    wide = Grid(dim=2, width=1.0, height=1.0, nx=136, ny=128, dof=3,
                order=17)
    assert pst._halo_rows(wide.stencil_width) > pst._tile_rows(136)
    assert not pst.pallas_available(wide, None)
    # same stencil with a tile that fits the halo stays available
    ok = Grid(dim=2, width=1.0, height=1.0, nx=128, ny=128, dof=3,
              order=17)
    assert pst.pallas_available(ok, None)
    # sharded: 8 shards of a 64-row grid leave 8-row tiles < halo
    from ksfd_tpu.parallel import grid_mesh

    monkeypatch.undo()
    small = Grid(dim=2, width=1.0, height=1.0, nx=64, ny=128, dof=3,
                 order=17)
    mesh = grid_mesh(small, shape=(8, 1))
    assert not pst.pallas_mesh_ok(mesh, small)


def test_pallas_mesh_ok_3d_uses_3d_tile_chooser():
    """The 3D tile chooser shrinks further than the 2D one (VMEM
    budget over the folded lane extent), so pallas_mesh_ok must use
    it for dim-3 grids: a wide-stencil sharded 3D config whose
    per-shard tile collapses below the halo must fall back to the XLA
    path HERE rather than raising inside make_pallas_kernels_3d."""
    from ksfd_tpu.grid import Grid
    from ksfd_tpu.ops import pallas_stencil as pst
    from ksfd_tpu.parallel import grid_mesh

    # order=17 -> sw=9 -> halo rounds to 16; 8 shards of nx=64 leave
    # 8-row tiles (the chooser's floor) < halo
    g = Grid(dim=3, nx=64, ny=16, nz=8, dof=3, order=17)
    mesh = grid_mesh(g, shape=(8, 1, 1))
    assert not pst.pallas_mesh_ok(mesh, g)
    # same stencil with 32-row shards (tile 32 >= halo 16) stays ok
    g2 = Grid(dim=3, nx=256, ny=16, nz=8, dof=3, order=17)
    mesh2 = grid_mesh(g2, shape=(8, 1, 1))
    assert pst.pallas_mesh_ok(mesh2, g2)


def test_pallas_rhs_periodic_wrap(ops2d):
    """The x-halo padding must reproduce periodic wraparound exactly:
    translate the state by one tile; outputs translate too."""
    ps, grid, ops = ops2d
    u = rough_state(grid)
    rhs_p, _ = make_pallas_rhs(ops, tile_x=16, interpret=True)
    u32 = jnp.asarray(u, dtype=jnp.float32)
    out = np.asarray(rhs_p(u32, 0.0))
    shifted = jnp.roll(u32, 16, axis=1)
    out_shifted = np.asarray(rhs_p(shifted, 0.0))
    np.testing.assert_allclose(
        out_shifted, np.roll(out, 16, axis=1),
        rtol=1e-4, atol=1e-4 * np.abs(out).max(),
    )


def test_pallas_available_lane_alignment(ops2d, monkeypatch):
    """On real TPU hardware the kernels require ny on the 128-lane
    tile; misaligned grids (e.g. 64x64 — the driver's entry() shape)
    must fall back to the XLA path instead of a Mosaic compile error."""
    import jax as jax_mod
    from ksfd_tpu.ops import pallas_stencil as pst

    ps, grid, ops = ops2d  # ny = 64

    class _Dev:
        platform = "tpu"

    monkeypatch.delenv("KSFD_PALLAS_INTERPRET", raising=False)
    monkeypatch.setattr(jax_mod, "devices", lambda: [_Dev()])
    assert not pst.pallas_available(grid, ops)
    grid_ok = Grid(
        dim=2, width=1.0, height=1.0, nx=64, ny=128, dof=3, order=3
    )
    assert pst.pallas_available(grid_ok, ops)


# ---------------------------------------------------------------------
# sharded fast path: shard_map + ppermute halo exchange
# ---------------------------------------------------------------------

def test_pallas_mesh_ok(ops2d):
    from ksfd_tpu.ops.pallas_stencil import pallas_mesh_ok
    from ksfd_tpu.parallel import grid_mesh

    ps, grid, ops = ops2d
    assert pallas_mesh_ok(None, grid)
    assert pallas_mesh_ok(grid_mesh(grid, shape=(8, 1)), grid)
    assert pallas_mesh_ok(grid_mesh(grid, shape=(2, 1)), grid)
    # y sharded: the kernel needs full rows resident
    assert not pallas_mesh_ok(grid_mesh(grid, shape=(4, 2)), grid)
    # 64/8 = 8 rows per shard is the alignment floor; a 16-way split
    # of a 64-row grid would leave 4 rows per shard
    assert (64 // 8) % 8 == 0


def test_pallas_sharded_matches_single(ops2d):
    """Sharded kernels (ppermute halos) == single-device kernels."""
    from ksfd_tpu.parallel import distribute, grid_mesh

    ps, grid, ops = ops2d
    mesh = grid_mesh(grid, shape=(8, 1))
    u = rough_state(grid)
    rng = np.random.default_rng(2)
    v = rng.standard_normal(grid.Vshape)

    rhs_1, jvp_1 = make_pallas_rhs(ops, tile_x=16, interpret=True)
    rhs_s, jvp_s = make_pallas_rhs(
        ops, tile_x=16, interpret=True, mesh=mesh
    )
    u_sh, _ = distribute(jnp.asarray(u), grid, mesh=mesh)
    v_sh, _ = distribute(jnp.asarray(v), grid, mesh=mesh)

    out1 = np.asarray(rhs_1(jnp.asarray(u, dtype=jnp.float32), 0.5))
    outs = np.asarray(rhs_s(u_sh, 0.5))
    # identical math; only the f64 mean reduction order differs
    np.testing.assert_allclose(
        outs, out1, rtol=1e-5, atol=1e-5 * np.abs(out1).max()
    )

    j1 = np.asarray(
        jvp_1(jnp.asarray(u, dtype=jnp.float32),
              jnp.asarray(v, dtype=jnp.float32), 0.5)
    )
    js = np.asarray(jvp_s(u_sh, v_sh, 0.5))
    np.testing.assert_allclose(
        js, j1, rtol=1e-5, atol=1e-5 * np.abs(j1).max()
    )
    # and both still agree with the f64 oracle
    ref = np.asarray(ops.rhs(jnp.asarray(u), 0.5))
    assert np.abs(outs - ref).max() / np.abs(ref).max() < 5e-4


def test_pallas_sharded_rejects_bad_mesh(ops2d):
    from ksfd_tpu.parallel import grid_mesh

    ps, grid, ops = ops2d
    mesh = grid_mesh(grid, shape=(4, 2))
    with pytest.raises(ValueError):
        make_pallas_rhs(ops, interpret=True, mesh=mesh)


def test_sharded_pallas_solve(ops2d, monkeypatch):
    """End-to-end: the Solver engages the SHARDED Pallas fast path on
    an x-sharded state (VERDICT r1 'missing #3') and matches the
    single-device fast path."""
    from ksfd_tpu import NumericsOptions
    from ksfd_tpu.parallel import distribute, grid_mesh
    from ksfd_tpu.solvers import Solver

    monkeypatch.setenv("KSFD_PALLAS_INTERPRET", "1")
    ps, grid, ops = ops2d
    u0 = rough_state(grid)
    numerics = NumericsOptions(
        precision="float32", use_pallas=True, adapt_type="none",
    )

    def run(u_init):
        solver = Solver(
            ops, numerics, t0=0.0, dt=0.05, tmax=0.2, maxsteps=3,
        )
        return solver, np.asarray(solver.solve(u_init))

    s1, ref = run(jnp.asarray(u0, dtype=jnp.float32))
    mesh = grid_mesh(grid, shape=(8, 1))
    u_sh, _ = distribute(jnp.asarray(u0, dtype=jnp.float32), grid, mesh=mesh)
    ss, out = run(u_sh)
    assert ss._mesh is mesh  # the sharded fast path actually engaged
    assert ss.numerics.use_pallas
    np.testing.assert_allclose(
        out, ref, rtol=2e-4, atol=2e-4 * np.abs(ref).max()
    )


def test_mixed_precision_pallas_W(ops2d, monkeypatch):
    """f64 parity path, f32 sweep chain: swapping the XLA f32
    re-linearization for the fused Pallas J-action kernel must not
    change the accepted state beyond the sweep-truncation floor."""
    from ksfd_tpu import NumericsOptions
    from ksfd_tpu.solvers import make_step_fn

    ps, grid, ops = ops2d
    u0 = ops.groom(jnp.asarray(rough_state(grid)))
    t = jnp.asarray(0.0)
    # an ACCEPTED step (enorm < 1): a hugely rejected step's states
    # diverge inside the failing solve and amplify representation
    # differences meaninglessly
    h = jnp.asarray(1e-3)

    step_xla, _ = make_step_fn(
        ops, NumericsOptions(use_pallas=False), atol=0.01, rtol=1e-6
    )
    u_ref, e_ref = step_xla(u0, t, h)
    assert float(e_ref) < 1.0

    monkeypatch.setenv("KSFD_PALLAS_INTERPRET", "1")
    step_pal, _ = make_step_fn(
        ops, NumericsOptions(use_pallas=True), atol=0.01, rtol=1e-6
    )
    u_pal, e_pal = step_pal(u0, t, h)
    assert u_pal.dtype == u_ref.dtype == jnp.float64
    scale = float(jnp.max(jnp.abs(u_ref - u0)))  # the step increment
    dev = float(jnp.max(jnp.abs(u_pal - u_ref)))
    assert dev / scale < 1e-5, (dev, scale)
    # the embedded error estimates must agree (controller parity)
    assert abs(float(e_pal) - float(e_ref)) / float(e_ref) < 1e-2


def test_sharded_f64_mixed_step_matches_single(ops2d, monkeypatch):
    """The FLAGSHIP path multi-chip-true (VERDICT r2 next #1): the
    default f64 mixed-precision step built with mesh= runs its
    delta/jvp/resid kernels sharded (shard_map + ppermute) and matches
    the single-device step at the established envelope."""
    from ksfd_tpu import NumericsOptions
    from ksfd_tpu.parallel import distribute, grid_mesh
    from ksfd_tpu.solvers import make_step_fn
    from ksfd_tpu.solvers.solver import BUILD_INFO

    monkeypatch.setenv("KSFD_PALLAS_INTERPRET", "1")
    ps, grid, ops = ops2d
    u0 = ops.groom(jnp.asarray(rough_state(grid)))
    t = jnp.asarray(0.0)
    h = jnp.asarray(1e-3)  # accepted-step region

    step_1, _ = make_step_fn(
        ops, NumericsOptions(), atol=0.01, rtol=1e-6
    )
    assert BUILD_INFO["mixed32"] and BUILD_INFO["pallas_delta"]
    u_ref, e_ref = step_1(u0, t, h)
    assert float(e_ref) < 1.0

    mesh = grid_mesh(grid, shape=(8, 1))
    step_s, _ = make_step_fn(
        ops, NumericsOptions(), atol=0.01, rtol=1e-6, mesh=mesh
    )
    # every fused kernel of the mixed path engaged, SHARDED
    assert BUILD_INFO["mesh_shape"] == {"x": 8, "y": 1}
    assert BUILD_INFO["mixed32"]
    assert BUILD_INFO["pallas_delta"] and BUILD_INFO["pallas_jvp"]
    assert BUILD_INFO["pallas_resid"]
    u_sh, _ = distribute(u0, grid, mesh=mesh)
    u_s, e_s = step_s(u_sh, t, h)
    assert u_s.dtype == jnp.float64
    assert not u_s.sharding.is_fully_replicated
    inc = float(jnp.max(jnp.abs(u_ref - u0)))
    dev = float(jnp.max(jnp.abs(u_s - u_ref)))
    assert dev / inc < 1e-5, (dev, inc)
    assert abs(float(e_s) - float(e_ref)) / float(e_ref) < 1e-2


def test_sharded_adaptive_chunk_f64(ops2d, monkeypatch):
    """The device-fused adaptive chunk runs SHARDED on the f64 mixed
    path: same accept/attempt counts and trajectory as single-device."""
    from ksfd_tpu import NumericsOptions
    from ksfd_tpu.parallel import distribute, grid_mesh
    from ksfd_tpu.solvers.solver import make_adaptive_chunk_fn

    monkeypatch.setenv("KSFD_PALLAS_INTERPRET", "1")
    ps, grid, ops = ops2d
    u0 = ops.groom(jnp.asarray(rough_state(grid)))
    t0, h0 = jnp.asarray(0.0), jnp.asarray(1e-3)

    # pc_dtype pinned f32: the identity comparison needs the same pc
    # on both sides ('auto' engages the bf16 wire lever on the
    # sharded side, a deliberate non-identity default)
    nm = NumericsOptions(pc_dtype="float32")
    chunk1, _ = make_adaptive_chunk_fn(ops, nm, atol=0.01, rtol=1e-6)
    u1, t1, h1, k1, a1, r1 = chunk1(u0, t0, h0, 1e9, 5)
    assert int(k1) > 0

    mesh = grid_mesh(grid, shape=(8, 1))
    u_sh, _ = distribute(u0, grid, mesh=mesh)
    chunks, _ = make_adaptive_chunk_fn(
        ops, nm, atol=0.01, rtol=1e-6, mesh=mesh
    )
    us, ts_, hs_, ks_, as_, rs_ = chunks(u_sh, t0, h0, 1e9, 5)
    assert int(ks_) == int(k1) and int(as_) == int(a1)
    assert not us.sharding.is_fully_replicated
    inc = float(jnp.max(jnp.abs(u1 - u0)))
    assert float(jnp.max(jnp.abs(us - u1))) / inc < 1e-4
    assert abs(float(ts_) - float(t1)) / float(t1) < 1e-3


def test_solver_sharded_f64_default_mesh_engages_pallas(
    ops2d, monkeypatch
):
    """End-to-end VERDICT r2 next #1+#2: a DEFAULT-mesh (x-only via
    mesh_shape_for) sharded f64 run through Solver.solve keeps
    use_pallas on, rebuilds on the sharded kernels, and matches the
    single-device solve."""
    from ksfd_tpu import NumericsOptions
    from ksfd_tpu.parallel import distribute
    from ksfd_tpu.solvers import Solver

    monkeypatch.setenv("KSFD_PALLAS_INTERPRET", "1")
    ps, grid, ops = ops2d
    u0 = jnp.asarray(rough_state(grid))
    numerics = NumericsOptions(adapt_type="none")  # f64 mixed default

    def run(u):
        s = Solver(
            ops, numerics, t0=0.0, dt=1e-3, tmax=1e9, maxsteps=3,
            rtol=1e-6, atol=0.01,
        )
        return s, np.asarray(s.solve(u))

    s1, ref = run(u0)
    u_sh, mesh = distribute(u0, grid)  # DEFAULT mesh: x-only
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "x": 8, "y": 1,
    }
    ss, out = run(u_sh)
    assert ss._mesh is mesh
    assert ss.numerics.use_pallas
    assert ss.build_info["mixed32"] and ss.build_info["pallas_delta"]
    assert ss.build_info["mesh_shape"] == {"x": 8, "y": 1}
    inc = np.abs(ref - np.asarray(ops.groom(u0))).max()
    assert np.abs(out - ref).max() / inc < 1e-4


def test_unsharded_pallas_guard_multidevice(ops2d, monkeypatch):
    """On a multi-device backend without forced interpret, make_step_fn
    must NOT engage unsharded Pallas kernels when no mesh is given
    (the driver shards state whenever >1 device exists); unsharded_ok
    re-enables them after the caller confirms single-device state."""
    import jax as jax_mod
    from ksfd_tpu import Grid as _Grid
    from ksfd_tpu import NumericsOptions
    from ksfd_tpu.ops import PDEOperators
    from ksfd_tpu.solvers import make_step_fn
    from ksfd_tpu.solvers.solver import BUILD_INFO

    ps, _grid, _ops = ops2d
    # lane-aligned grid so pallas_available holds on (fake) real TPU
    grid = _Grid(dim=2, width=1.0, height=1.0, nx=64, ny=128, dof=3,
                 order=3)
    ops = PDEOperators(ps, grid)

    class _Dev:
        platform = "tpu"

    monkeypatch.delenv("KSFD_PALLAS_INTERPRET", raising=False)
    monkeypatch.setattr(jax_mod, "devices", lambda: [_Dev(), _Dev()])
    make_step_fn(ops, NumericsOptions(), atol=0.01, rtol=1e-6)
    assert not BUILD_INFO["pallas_jvp"]  # guard fired
    assert not BUILD_INFO["pallas_delta"]
    make_step_fn(
        ops, NumericsOptions(), atol=0.01, rtol=1e-6, unsharded_ok=True
    )
    assert BUILD_INFO["pallas_jvp"] and BUILD_INFO["pallas_delta"]


def test_solver_unrecoverable_sharding_disables_pallas(
    ops2d, monkeypatch
):
    """A state sharded over >1 device whose mesh sharding_mesh cannot
    recover (not a NamedSharding) must drop the Solver to the
    sharding-transparent XLA path — NEVER rebuild with unsharded_ok
    (unsharded kernels on sharded state is the exact failure the
    multi-device guard exists to prevent)."""
    import ksfd_tpu.ops.pallas_stencil as pst
    from ksfd_tpu import NumericsOptions
    from ksfd_tpu.parallel import distribute, grid_mesh
    from ksfd_tpu.solvers import Solver

    monkeypatch.setenv("KSFD_PALLAS_INTERPRET", "1")
    ps, grid, ops = ops2d
    u0 = ops.groom(jnp.asarray(rough_state(grid)))
    mesh = grid_mesh(grid, shape=(8, 1))
    u_sh, _ = distribute(u0, grid, mesh=mesh)
    # simulate a >1-device sharding with no recoverable mesh (JAX 0.9
    # only builds NamedSharding, so stand in for the positional/GSPMD
    # case by blinding sharding_mesh)
    monkeypatch.setattr(pst, "sharding_mesh", lambda u: None)
    s = Solver(ops, NumericsOptions(), t0=0.0, dt=1e-3, tmax=1e6,
               maxsteps=1, atol=0.01, rtol=1e-6)
    s.solve(u_sh)
    assert not s.numerics.use_pallas
    assert not s.build_info.get("pallas_jvp")
    assert s.k == 1 and not s.diverged


# ---------------------------------------------------------------------
# stage-delta kernel: f(u0 + d) - f(u0) via cancellation-free forms
# ---------------------------------------------------------------------

def test_delta_kernel_accuracy(ops2d):
    """The fused increment kernel must match the f64 oracle increment
    to ~f32 eps RELATIVE TO THE INCREMENT on both rough and
    near-uniform states."""
    from ksfd_tpu.ops.pallas_stencil import make_pallas_kernels

    ps, grid, ops = ops2d
    k = make_pallas_kernels(ops, tile_x=16, interpret=True)
    assert k.delta is not None
    rng = np.random.default_rng(3)
    n = grid.Sshape[0]
    wave = np.sin(2 * np.pi * np.arange(n) / n)[:, None] * np.ones(
        grid.Sshape
    )
    cases = [
        (jnp.asarray(rough_state(grid)), 100.0, 3e-6),
        (
            jnp.asarray(
                np.stack([9000 + wave, 6162 + 0.7 * wave, 797 + 0.1 * wave])
            ),
            1e-3,
            1e-6,
        ),
    ]
    for u0, scale, tol in cases:
        u0 = ops.groom(u0)
        d = jnp.asarray(scale * rng.standard_normal(grid.Vshape))
        ug = ops.groom(u0 + d)
        dd = ug - u0
        ref = np.asarray(ops.rhs(ug, 0.5) - ops.rhs(u0, 0.5))
        out = np.asarray(k.delta(u0, dd, ug, 0.5))
        assert np.abs(out - ref).max() / np.abs(ref).max() < tol


def test_stage_delta_step_matches_full(ops2d, monkeypatch):
    """An f64 step with stage-delta evals must match the full-f64-eval
    step to the mixed-precision envelope."""
    from ksfd_tpu import NumericsOptions
    from ksfd_tpu.solvers import make_step_fn

    ps, grid, ops = ops2d
    u0 = ops.groom(jnp.asarray(rough_state(grid)))
    t = jnp.asarray(0.0)
    h = jnp.asarray(1e-3)  # accepted step (see test above)

    step_full, _ = make_step_fn(
        ops, NumericsOptions(use_pallas=False), atol=0.01, rtol=1e-6
    )
    u_ref, e_ref = step_full(u0, t, h)
    assert float(e_ref) < 1.0

    monkeypatch.setenv("KSFD_PALLAS_INTERPRET", "1")
    step_delta, _ = make_step_fn(
        ops, NumericsOptions(use_pallas=True), atol=0.01, rtol=1e-6
    )
    u_del, e_del = step_delta(u0, t, h)
    assert u_del.dtype == jnp.float64
    inc = float(jnp.max(jnp.abs(u_ref - u0)))
    dev = float(jnp.max(jnp.abs(u_del - u_ref)))
    assert dev / inc < 1e-5, (dev, inc)
    assert np.isfinite(float(e_del))

    # opting out restores full evals (identical to the xla path up to
    # the pallas-W sweep difference already covered above)
    step_nodelta, _ = make_step_fn(
        ops, NumericsOptions(use_pallas=True, stage_delta=False),
        atol=0.01, rtol=1e-6,
    )
    u_nd, _ = step_nodelta(u0, t, h)
    assert float(jnp.max(jnp.abs(u_nd - u_ref))) / inc < 1e-5


def test_multistep_f0_chaining_matches_per_step(ops2d, monkeypatch):
    """The fused fixed-dt multistep advances the base RHS f0 through
    the increment kernel (one fresh f64 eval per block); the result
    must match per-step fresh evaluations to the mixed-precision
    envelope, accumulated over the block."""
    from ksfd_tpu import NumericsOptions
    from ksfd_tpu.solvers import make_multistep_fn
    from ksfd_tpu.solvers.solver import make_step_fn

    monkeypatch.setenv("KSFD_PALLAS_INTERPRET", "1")
    ps, grid, ops = ops2d
    numerics = NumericsOptions()
    # chaining must actually engage
    sc, _ = make_step_fn(ops, numerics, atol=0.01, rtol=1e-6,
                         chain_f0=True)
    assert sc is not None

    u0 = ops.groom(jnp.asarray(rough_state(grid)))
    h = jnp.asarray(1e-3)
    n = 6

    multi, _ = make_multistep_fn(ops, numerics, atol=0.01, rtol=1e-6)
    u_chain, t_chain, emax = multi(u0, jnp.asarray(0.0), h, n)
    assert float(emax) < 1.0  # all steps accepted territory

    step, _ = make_step_fn(ops, numerics, atol=0.01, rtol=1e-6)
    u = u0
    inc_total = 0.0
    for i in range(n):
        u_prev = u
        u, _ = step(u, jnp.asarray(i * 1e-3), h)
        inc_total += float(jnp.max(jnp.abs(u - u_prev)))
    dev = float(jnp.max(jnp.abs(np.asarray(u_chain) - np.asarray(u))))
    assert dev / inc_total < 1e-5, (dev, inc_total)


def test_resid_kernel_matches_composition(ops2d):
    """resid(u, v, b, t, shift) == b - (shift*v - jvp(u, v, t))."""
    from ksfd_tpu.ops.pallas_stencil import make_pallas_kernels

    ps, grid, ops = ops2d
    k = make_pallas_kernels(ops, tile_x=16, interpret=True)
    rng = np.random.default_rng(5)
    u = jnp.asarray(rough_state(grid), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal(grid.Vshape), dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(grid.Vshape), dtype=jnp.float32)
    shift = 7.5
    ref = np.asarray(b - (shift * v - k.jvp(u, v, 0.5)))
    out = np.asarray(k.resid(u, v, b, 0.5, shift))
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() / scale < 1e-5


def test_adaptive_chunk_f0_chaining(ops2d, monkeypatch):
    """The fused adaptive chunk carries the chained base RHS across
    accept/reject; its trajectory must match the unchained chunk."""
    from ksfd_tpu import NumericsOptions
    from ksfd_tpu.solvers.solver import (
        make_adaptive_chunk_fn,
        make_step_fn,
    )

    monkeypatch.setenv("KSFD_PALLAS_INTERPRET", "1")
    ps, grid, ops = ops2d
    assert make_step_fn(
        ops, NumericsOptions(), atol=0.01, rtol=1e-6, chain_f0=True
    )[0] is not None

    u0 = ops.groom(jnp.asarray(rough_state(grid)))
    args = (u0, jnp.asarray(0.0), jnp.asarray(1e-3), 1e9, 6)

    chunk_c, _ = make_adaptive_chunk_fn(
        ops, NumericsOptions(), atol=0.01, rtol=1e-6
    )
    uc, tc, hc, kc, ac, _rc = chunk_c(*args)
    chunk_p, _ = make_adaptive_chunk_fn(
        ops, NumericsOptions(use_pallas=False), atol=0.01, rtol=1e-6
    )
    up, tp, hp, kp, ap, _rp = chunk_p(*args)
    assert int(kc) == int(kp) and int(ac) == int(ap)
    # adaptive h amplifies the pallas-vs-XLA sweep representation
    # difference into slightly different accepted h's; the step
    # SEQUENCE must agree, t to ~0.1%
    assert abs(float(tc) - float(tp)) / float(tp) < 1e-3
    inc = float(jnp.max(jnp.abs(up - u0)))
    assert float(jnp.max(jnp.abs(uc - up))) / inc < 1e-4


def test_delta_kernel_clamp_to_floor(ops2d):
    """Increments that groom-clamp rho to its floor (drho/rho0 == -1
    in f32) must not produce inf/NaN and must stay accurate — the
    shifted-state input exists for exactly this."""
    from ksfd_tpu.ops.pallas_stencil import make_pallas_kernels

    ps, grid, ops = ops2d
    k = make_pallas_kernels(ops, tile_x=16, interpret=True)
    u0 = ops.groom(jnp.asarray(rough_state(grid)))
    rng = np.random.default_rng(4)
    inc = jnp.asarray(3e4 * rng.standard_normal(grid.Vshape))
    ug = ops.groom(u0 + inc)  # many points clamp to rhomin/Umin
    assert float(jnp.min(ug[0])) == ops.rhomin
    dd = ug - u0
    ref = np.asarray(ops.rhs(ug, 0.5) - ops.rhs(u0, 0.5))
    out = np.asarray(k.delta(u0, dd, ug, 0.5))
    assert np.all(np.isfinite(out))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5


def test_pallas_kernels_vmap_batching(ops2d):
    """jax.vmap over the kernel wrappers engages the custom_batching
    rule (member-batched Pallas grid) and matches per-member calls."""
    ps, grid, ops = ops2d
    from ksfd_tpu.ops.pallas_stencil import make_pallas_kernels

    kern = make_pallas_kernels(ops, tile_x=16, interpret=True)
    rng = np.random.default_rng(3)
    U = np.stack([rough_state(grid) * (1 + 0.01 * i) for i in range(3)])
    V = rng.standard_normal(U.shape)
    ts = jnp.asarray([0.25, 0.5, 1.0])
    Uj = jnp.asarray(U)
    Vj = jnp.asarray(V)

    out_v = np.asarray(jax.vmap(kern.jvp)(Uj, Vj, ts))
    out_s = np.stack([
        np.asarray(kern.jvp(Uj[i], Vj[i], ts[i])) for i in range(3)
    ])
    np.testing.assert_allclose(out_v, out_s, rtol=1e-6, atol=1e-6)

    out_v = np.asarray(jax.vmap(kern.rhs)(Uj, ts))
    out_s = np.stack([
        np.asarray(kern.rhs(Uj[i], ts[i])) for i in range(3)
    ])
    np.testing.assert_allclose(out_v, out_s, rtol=1e-6, atol=1e-6)

    if kern.delta is not None:
        Ug = jax.vmap(ops.groom)(Uj)
        D = 1e-3 * Vj
        U1 = jax.vmap(ops.groom)(Ug + D)
        out_v = np.asarray(jax.vmap(kern.delta)(Ug, U1 - Ug, U1, ts))
        out_s = np.stack([
            np.asarray(
                kern.delta(Ug[i], (U1 - Ug)[i], U1[i], ts[i])
            )
            for i in range(3)
        ])
        np.testing.assert_allclose(out_v, out_s, rtol=1e-6, atol=1e-6)


def test_pallas3d_available_row_alignment(monkeypatch):
    """On real TPU the 3D kernels need nx 8-row alignment like the 2D
    gate (regression: a misaligned nx built Mosaic-rejected kernels
    instead of falling back to XLA)."""
    import jax as jax_mod
    from ksfd_tpu.ops import pallas_stencil3d as pst3

    class _Dev:
        platform = "tpu"

    monkeypatch.delenv("KSFD_PALLAS_INTERPRET", raising=False)
    monkeypatch.setattr(jax_mod, "devices", lambda: [_Dev()])
    bad = Grid(dim=3, width=1.0, height=1.0, depth=1.0,
               nx=100, ny=16, nz=8, dof=3, order=3)
    assert not pst3.pallas3d_available(bad)
    good = Grid(dim=3, width=1.0, height=1.0, depth=1.0,
                nx=96, ny=16, nz=8, dof=3, order=3)
    assert pst3.pallas3d_available(good)


def test_pallas_groom_clamps_nan(ops2d):
    """The kernels' in-slab groom must map NaN to the floor like
    PDEOperators.groom (jnp.maximum would propagate the NaN), so a
    corrupted state recovers on the fast path exactly as on XLA."""
    ps, grid, ops = ops2d
    u = rough_state(grid)
    u_nan = u.copy()
    u_nan[0, 3, 5] = np.nan
    u_nan[1, 10, 20] = np.nan
    u_clamped = u.copy()
    u_clamped[0, 3, 5] = ops.rhomin
    u_clamped[1, 10, 20] = ops.Umin
    rhs_p, _ = make_pallas_rhs(ops, tile_x=16, interpret=True)
    out_nan = np.asarray(rhs_p(jnp.asarray(u_nan, jnp.float32), 0.0))
    out_cl = np.asarray(rhs_p(jnp.asarray(u_clamped, jnp.float32), 0.0))
    assert np.isfinite(out_nan).all()
    np.testing.assert_array_equal(out_nan, out_cl)


def _ops2d_128():
    """128-aligned variant of ops2d: the fused pc kernels require
    128-multiple axes (pallas_pc_available)."""
    from helpers import make_clargs, OPTIONS92_PARAMS
    from ksfd_tpu import Grid, SolutionParameters
    from ksfd_tpu.ops import PDEOperators

    params = [
        p for p in OPTIONS92_PARAMS
        if p.split("=", 1)[0]
        not in ("nelements", "dim", "rho0", "U0_1_1", "U0_2_1")
    ] + ["nelements=128", "dim=2", "height=1", "rho0=murho",
         "U0_1_1=", "U0_2_1="]
    ps = SolutionParameters(make_clargs(params=params))
    grid = Grid(dim=2, width=1.0, height=1.0, nx=128, ny=128, dof=3,
                order=3)
    return ps, grid, PDEOperators(ps, grid)


def test_pallas_pc_matches_einsum_apply(ops2d, monkeypatch):
    """The fused Pallas block-pc apply (opt-in -pc_pallas; measured at
    parity with the einsum apply on v5e, tools/probe_pc_kernel.py)
    must reproduce apply_linearized exactly up to dot association in
    interpret mode."""
    from ksfd_tpu.ops.pallas_pc import (
        make_pallas_block_pc,
        pallas_pc_available,
        pack_pc_scalars,
    )
    from ksfd_tpu.solvers.linalg import BlockSpectralPreconditioner

    monkeypatch.setenv("KSFD_PALLAS_INTERPRET", "1")
    ps, grid, ops = _ops2d_128()
    assert pallas_pc_available(grid, ops)
    pc = BlockSpectralPreconditioner(grid, ops, compute_dtype="float32")
    fused = make_pallas_block_pc(grid, ops)
    u0 = ops.groom(jnp.asarray(rough_state(grid)))
    rng = np.random.default_rng(3)
    v = jnp.asarray(
        rng.standard_normal((grid.dof,) + tuple(grid.Sshape)),
        dtype=jnp.float32,
    )
    t, shift = 0.0, 2.29
    nf = grid.dof
    means = [jnp.mean(u0[i]) for i in range(nf)]
    dG0 = ops._dG_fns[0](*[u0[i] for i in range(nf)], t)
    rho_diff = jnp.max(u0[0] * dG0)
    want = np.asarray(
        pc.apply_linearized(v, shift, t, means, rho_diff=rho_diff)
    )
    sc = pack_pc_scalars(ops, shift, t, means, rho_diff)
    got = np.asarray(fused(sc, v))
    dev = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert dev < 1e-5, dev


def test_pc_pallas_step_matches_default(ops2d, monkeypatch):
    """A -pc_pallas step matches the default-einsum step at the
    stage-solve truncation envelope (different pc rounding class =>
    different solve truncation, bounded by the Richardson margin)."""
    from ksfd_tpu import NumericsOptions
    from ksfd_tpu.solvers import make_step_fn
    from ksfd_tpu.solvers.solver import BUILD_INFO

    monkeypatch.setenv("KSFD_PALLAS_INTERPRET", "1")
    ps, grid, ops = _ops2d_128()
    u0 = ops.groom(jnp.asarray(rough_state(grid)))
    t = jnp.asarray(0.0)
    h = jnp.asarray(1e-3)
    step_ref, _ = make_step_fn(
        ops, NumericsOptions(), atol=0.01, rtol=1e-6
    )
    u_ref, e_ref = step_ref(u0, t, h)
    step_pc, _ = make_step_fn(
        ops, NumericsOptions(pc_pallas=True), atol=0.01, rtol=1e-6
    )
    assert BUILD_INFO["pallas_pc"]
    u_pc, e_pc = step_pc(u0, t, h)
    inc = float(jnp.max(jnp.abs(u_ref - u0)))
    dev = float(jnp.max(jnp.abs(u_pc - u_ref)))
    assert dev / inc < 1e-4, (dev, inc)
