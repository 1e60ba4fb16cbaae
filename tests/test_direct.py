"""Tests of the any-dimension sparse direct solve (ksp_type='lu').

Reference parity: the reference LU-factors its assembled Jacobian with
MUMPS at any dimension (KSFD/ksfdsym.py:814-886; options84
'-ksp_type preonly -pc_type lu -pc_factor_mat_solver_type mumps');
solvers/direct.py is the >= 2D counterpart of the 1D native banded
path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from helpers import make_clargs
from ksfd_tpu import Grid, NumericsOptions, SolutionParameters
from ksfd_tpu.ops import PDEOperators
from ksfd_tpu.solvers import Solver, make_step_fn
from ksfd_tpu.solvers.direct import (
    axis_strides,
    extract_w_sparse,
    make_sparse_step,
)

PARAMS_2D = [
    "dim=2", "nelements=24", "width=1", "height=1",
    "degree=3", "rhomax=28000", "cushion=2000", "s2=2.78e-4",
    "ngroups=1", "nligands_1=1", "alpha_1=1500", "beta_1=5.56e-4",
    "s_1_1=0.01", "gamma_1_1=0.01", "D_1_1=1e-6",
]

PARAMS_3D = [
    {"dim=2": "dim=3", "nelements=24": "nelements=8"}.get(p, p)
    for p in PARAMS_2D
] + ["depth=1"]


def _problem2d(nx=24, ny=24):
    ps = SolutionParameters(make_clargs(params=PARAMS_2D))
    grid = Grid(dim=2, width=1, height=1, nx=nx, ny=ny, dof=2, order=3)
    return ps, grid, PDEOperators(ps, grid)


def _problem3d(nx=8):
    ps = SolutionParameters(make_clargs(params=PARAMS_3D))
    grid = Grid(dim=3, width=1, height=1, depth=1,
                nx=nx, ny=nx, nz=nx, dof=2, order=3)
    return ps, grid, PDEOperators(ps, grid)


def _u0(grid, amp=50.0):
    axes = [np.arange(n) / n for n in grid.nps]
    mesh = np.meshgrid(*axes, indexing="ij")
    rho = 9000.0 + amp * np.sin(2 * np.pi * sum(mesh))
    return np.stack([rho] * grid.dof)


def test_axis_strides():
    assert axis_strides((128, 128), 2) == (16, 16)   # >= 4*2+1
    assert axis_strides((24, 36), 2) == (12, 9)
    assert axis_strides((8, 8), 2) == (8, 8)         # short axis: n
    assert axis_strides((125,), 1) == (5,)


def _w_op_for(ops, u, t, shift):
    _, f_jvp = jax.linearize(lambda uu: ops.rhs(uu, t), jnp.asarray(u))
    return lambda v: shift * v - f_jvp(v)


@pytest.mark.parametrize("dim", [2, 3])
def test_extract_w_sparse_solves_operator(dim):
    """A @ (flattened v) reproduces w_op(v), and the LU solve inverts
    it (the built-in verify also runs two matvec checks)."""
    from scipy.sparse.linalg import splu

    ps, grid, ops = _problem2d() if dim == 2 else _problem3d()
    u = _u0(grid)
    w_op = _w_op_for(ops, u, 0.0, shift=2.3)
    A = extract_w_sparse(w_op, grid.nps, grid.dof, grid.stencil_width)
    rng = np.random.default_rng(3)
    v = rng.standard_normal((grid.dof,) + tuple(grid.nps))
    b = np.asarray(w_op(jnp.asarray(v)))
    x = splu(A).solve(np.moveaxis(b, 0, -1).reshape(-1))
    x = np.moveaxis(x.reshape(tuple(grid.nps) + (grid.dof,)), -1, 0)
    np.testing.assert_allclose(x, v, rtol=1e-9, atol=1e-9)


def test_extract_w_sparse_short_axis_aliasing():
    """On an axis with n <= 4*sw the periodic cross offsets alias;
    duplicated (row, col) candidates must not double-count entries
    (COO sums duplicates)."""
    ps, grid, ops = _problem2d(nx=24, ny=8)   # ny=8 == 4*sw, sw=2
    u = _u0(grid)
    w_op = _w_op_for(ops, u, 0.0, shift=1.7)
    # verify=True raises KSFDException on any matvec mismatch
    extract_w_sparse(w_op, grid.nps, grid.dof, grid.stencil_width)


def test_sparse_step_matches_dense_step_2d():
    ps, grid, ops = _problem2d(nx=16, ny=16)
    dense_fn, tab = make_step_fn(
        ops, NumericsOptions(ksp_type="dense"), atol=0.01, rtol=1e-6
    )
    sparse_fn = make_sparse_step(ops, tab, atol=0.01, rtol=1e-6)
    u0 = jnp.asarray(_u0(grid))
    t, h = 0.0, 0.5
    u_d, e_d = dense_fn(u0, jnp.asarray(t), jnp.asarray(h))
    u_s, e_s = sparse_fn(u0, t, h)
    inc = float(jnp.max(jnp.abs(u_d - u0)))
    assert inc > 0
    np.testing.assert_allclose(
        np.asarray(u_s), np.asarray(u_d), atol=1e-8 * max(inc, 1.0)
    )
    assert abs(float(e_s) - float(e_d)) < 1e-6 * max(float(e_d), 1.0)


def test_solver_lu_adaptive_2d():
    """The Solver runs the lu path end-to-end: several accepted
    adaptive steps, zero failures, finite growing state."""
    ps, grid, ops = _problem2d(nx=16, ny=16)
    s = Solver(ops, NumericsOptions(ksp_type="lu"), t0=0.0, dt=1.0,
               tmax=20.0, maxsteps=20, rtol=1e-6, atol=0.01)
    u = np.asarray(s.solve(jnp.asarray(_u0(grid))))
    assert s.t > 20.0 and s.snes_failures == 0
    assert s.build_info == {"ksp_type": "lu"}
    assert np.isfinite(u).all()


def test_solver_lu_matches_richardson_3d():
    """One adaptive lu step agrees with the iterative default at the
    mixed-precision envelope on a 3D problem."""
    ps, grid, ops = _problem3d()
    u0 = jnp.asarray(_u0(grid))
    args = dict(t0=0.0, dt=0.5, tmax=0.5, maxsteps=1, rtol=1e-6,
                atol=0.01)
    s_lu = Solver(ops, NumericsOptions(ksp_type="lu"), **args)
    u_lu = np.asarray(s_lu.solve(u0))
    s_it = Solver(ops, NumericsOptions(ksp_iters=16), **args)
    u_it = np.asarray(s_it.solve(u0))
    inc = np.max(np.abs(u_lu - np.asarray(u0)))
    assert inc > 0
    assert np.max(np.abs(u_lu - u_it)) < 1e-4 * inc


def test_lu_rescue_engages_after_consecutive_failures():
    """When the iterative step AND the robust retry keep failing, the
    host loop escalates to the exact sparse-LU step at the same h
    instead of marching to diverged (the reference's MUMPS never fails
    a stage solve; below the factorization cap neither do we)."""
    ps, grid, ops = _problem2d(nx=16, ny=16)
    s = Solver(ops, NumericsOptions(), t0=0.0, dt=0.5, tmax=100.0,
               maxsteps=3, rtol=1e-6, atol=0.01)
    # sabotage every iterative tier: the fast step and the robust
    # fallback both return non-finite error estimates
    broken = lambda u, t, h: (u, jnp.asarray(np.nan))
    s.step_fn = broken
    s._fallback_fn = broken
    u = np.asarray(s.solve(jnp.asarray(_u0(grid))))
    assert s.k == 3 and not s.diverged
    assert np.isfinite(u).all()
    # the FIRST accept burned LU_RESCUE_AFTER-1 rejections; the
    # controller then PARKS on the exact tier (hysteresis), so later
    # steps must NOT re-burn a full failure storm each
    assert s.snes_failures >= Solver.LU_RESCUE_AFTER - 1
    assert s.snes_failures < 3 * (Solver.LU_RESCUE_AFTER - 1)
    assert s._lu_step is not None


def test_lu_rescue_respects_dof_cap_and_process_count(monkeypatch):
    ps, grid, ops = _problem2d(nx=16, ny=16)
    s = Solver(ops, NumericsOptions(), t0=0.0, dt=0.5, tmax=100.0,
               maxsteps=1, rtol=1e-6, atol=0.01)
    monkeypatch.setattr(Solver, "LU_RESCUE_MAX_DOFS", 10)
    assert s._get_exact_step() is None
    monkeypatch.undo()
    # multi-process no longer disqualifies the tier: the step gathers
    # the global state per process (direct.gather_global) and solves
    # replicated (tests/test_distributed.py proves the 2-process run)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    assert s._get_exact_step() is not None
    monkeypatch.undo()
    assert s._get_exact_step() is not None


def test_lu_rescue_reachable_from_device_chunk_without_fallback():
    """-device_loop 1 with a non-richardson ksp_type has NO robust
    GMRES fallback; persistent chunk rejections must still escalate
    to the exact-LU tier (one-shot host retry at the same h) instead
    of marching to diverged with the exact tier never tried."""
    ps, grid, ops = _problem2d(nx=16, ny=16)
    s = Solver(ops, NumericsOptions(device_loop=True, ksp_type="gmres"),
               t0=0.0, dt=0.5, tmax=100.0, maxsteps=2, rtol=1e-6,
               atol=0.01)
    assert s._chunk is not None and s._get_fallback() is None
    chunk_calls = []

    def stuck_chunk(u, t, h, tmax_eff, maxacc):
        chunk_calls.append(float(h))
        return u, t, h, 0, 1, True   # zero accepts, rejected

    s._chunk = stuck_chunk
    u = np.asarray(s.solve(jnp.asarray(_u0(grid))))
    assert s.k == 2 and not s.diverged
    assert np.isfinite(u).all()
    # each accepted step came from the exact tier after
    # LU_RESCUE_AFTER stuck chunk dispatches at the SAME h
    assert len(chunk_calls) == 2 * Solver.LU_RESCUE_AFTER
    assert s._lu_step is not None


def test_lu_rescue_exception_degrades_not_crashes():
    """An exception inside the exact step (assembly verify failure,
    singular factorization...) must degrade to the ordinary
    reject-and-shrink path and disable the tier after two errors —
    never crash the run."""
    ps, grid, ops = _problem2d(nx=16, ny=16)
    s = Solver(ops, NumericsOptions(), t0=0.0, dt=0.5, tmax=100.0,
               maxsteps=3, rtol=1e-6, atol=0.01, hmin=1e-6)
    broken = lambda u, t, h: (u, jnp.asarray(np.nan))
    s.step_fn = broken
    s._fallback_fn = broken

    def boom(u, t, h):
        raise RuntimeError("Factor is exactly singular")

    s._lu_step = boom
    s.solve(jnp.asarray(_u0(grid)))   # must not raise
    assert s._lu_errors >= 2
    assert s.k == 0                   # nothing ever stepped
    # the run ended by h-underflow or the failure cap, not a crash
    assert s.h < 1e-5 or s.diverged


def test_cli_accepts_ksp_lu():
    from ksfd_tpu.utils.cli import decode_numerics

    opts = decode_numerics(["-ksp_type", "lu"])
    assert opts.ksp_type == "lu"


def test_ensemble_rejects_host_direct():
    from ksfd_tpu.solvers import EnsembleSolver
    from ksfd_tpu.utils.exceptions import KSFDException

    ps, grid, ops = _problem2d(nx=16, ny=16)
    for kt in ("lu", "banded"):
        with pytest.raises(KSFDException):
            EnsembleSolver(
                ops, NumericsOptions(ksp_type=kt), t0=0.0, dt=1.0,
                tmax=10.0, maxsteps=5,
            )


def test_route_petsc_direct():
    """A PETSc '-ksp_type preonly -pc_type lu' block routes to the
    exact direct tier when the grid fits a host factorization
    (VERDICT r3 #4): banded in 1D, sparse LU at >= 2D, iterative
    default above the cap or on DIRK tableaus."""
    import dataclasses

    from ksfd_tpu.solvers import route_petsc_direct

    nm = dataclasses.replace(NumericsOptions(), petsc_direct=True)
    g1 = Grid(dim=1, width=1, nx=128, dof=3, order=3)
    assert route_petsc_direct(nm, g1).ksp_type == "banded"
    g2 = Grid(dim=2, width=1, height=1, nx=24, ny=24, dof=2, order=3)
    assert route_petsc_direct(nm, g2).ksp_type == "lu"
    gbig = Grid(dim=2, width=1, height=1, nx=512, ny=512, dof=3,
                order=3)
    assert route_petsc_direct(nm, gbig).ksp_type == nm.ksp_type
    # 1D exemption (ADVICE r4): the native cyclic-banded LU is
    # O(N*b^2), so a 1D grid far above the 2D SuperLU cap still
    # routes to the banded tier...
    g1big = Grid(dim=1, width=1, nx=16384, dof=3, order=3)
    assert g1big.n_dofs > Solver.PETSC_ROUTE_MAX_DOFS
    assert route_petsc_direct(nm, g1big).ksp_type == "banded"
    # ...but not without limit
    g1huge = Grid(dim=1, width=1, nx=131072, dof=3, order=3)
    assert g1huge.n_dofs > Solver.BANDED_ROUTE_MAX_DOFS
    assert route_petsc_direct(nm, g1huge).ksp_type == nm.ksp_type
    nma = dataclasses.replace(nm, ts_type="arkimex")
    assert route_petsc_direct(nma, g2).ksp_type == nma.ksp_type
    # no request recorded: untouched
    assert (
        route_petsc_direct(NumericsOptions(), g1).ksp_type
        == NumericsOptions().ksp_type
    )


def test_decode_preonly_lu_records_direct_request():
    """decode_numerics turns the PETSc pair into petsc_direct=True
    (with a note), keeps preonly-alone as a plain note, and lets an
    explicit native ksp_type override the pair."""
    from ksfd_tpu import decode_numerics

    opts = decode_numerics([], petsc_tokens=[
        "-ksp_type", "preonly", "-pc_type", "lu",
    ])
    assert opts.petsc_direct is True
    assert opts.ksp_type == NumericsOptions().ksp_type
    assert any("preonly" in u for u in opts.unrecognized)

    opts = decode_numerics(
        ["-ksp_type", "richardson"],
        petsc_tokens=["-ksp_type", "preonly", "-pc_type", "lu"],
    )
    assert opts.petsc_direct is False

    opts = decode_numerics(["-ksp_type", "preonly"])
    assert opts.petsc_direct is False
    assert any("preonly" in u for u in opts.unrecognized)
