"""Feature-coverage tests: with-G variant, cap potentials, CFL, noise
injection + conservation, Fourier-series ligands, zip checkpoints,
ligand sources, 3D, driver flags."""

import glob
import os
import zipfile

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import sympy as sy

from ksfd_tpu import Grid, NumericsOptions, SolutionParameters
from ksfd_tpu.ops import (
    PDEOperators,
    SpatialExpression,
    WithGOperators,
    with_g_grid,
)
from ksfd_tpu.solvers import Solver
from ksfd_tpu.io import TimeSeries, make_checkpoint_monitor
from helpers import make_clargs, OPTIONS92_PARAMS
from manufactured import make_problem, exact_state


# ---------------------------------------------------------------- with-G
def test_with_g_matches_plain_and_stores_G():
    ps, grid, ops = make_problem(nx=32)
    fg = with_g_grid(grid)
    wops = WithGOperators(ps, fg)
    u_phys = exact_state(ps, grid, 0.0)
    u_full = np.concatenate([u_phys, np.zeros((1, 32))], axis=0)

    numerics = NumericsOptions(adapt_type="none", ksp_iters=16)
    s_plain = Solver(ops, numerics, t0=0.0, dt=1.0, tmax=1e9, maxsteps=3,
                     rtol=1e-6, atol=0.01)
    s_g = Solver(wops, numerics, t0=0.0, dt=1.0, tmax=1e9, maxsteps=3,
                 rtol=1e-6, atol=0.01)
    up = np.asarray(s_plain.solve(jnp.asarray(u_phys)))
    ug = np.asarray(s_g.solve(jnp.asarray(u_full)))
    # physical fields evolve identically (up to f32-preconditioner
    # rounding-path differences in the iterative stage solves)
    np.testing.assert_allclose(ug[:3], up, rtol=1e-8)
    # the G slot holds the free energy of the current state
    expected_G = np.asarray(wops.G(jnp.asarray(ug[:3]), s_g.t))
    np.testing.assert_allclose(ug[3], expected_G, rtol=1e-10)


# ------------------------------------------------------------ potentials
def test_witch_cap_potential():
    clargs = make_clargs(params=OPTIONS92_PARAMS, cappotential="witch")
    ps = SolutionParameters(clargs)
    rho, U1, U2 = sy.symbols("rho U1 U2")
    V = ps.V([U1, U2], rho, params=ps.values0)
    vals = ps.values0
    s2 = vals["s2"]
    r = 29000.0
    expected_cap = (
        vals["maxscale"] * s2
        * (np.tanh((r - vals["rhomax"]) / vals["cushion"]) + 1)
        * (r / vals["rhomax"])
    )
    full = float(V.subs({U1: 9000, U2: 9000, rho: r}))
    nocap = (
        -vals["beta_1"] * np.log(vals["alpha_1"] + 9000)
        - vals["beta_2"] * np.log(vals["alpha_2"] + 9000)
    )
    assert full - nocap == pytest.approx(expected_cap, rel=1e-12)


# ------------------------------------------------------------------- CFL
def test_cfl_clamps_step():
    ps, grid, ops = make_problem(
        nx=32, extra_params=["CFL_safety_factor=1e-8"]
    )
    numerics = NumericsOptions(adapt_type="none", ksp_type="dense")
    solver = Solver(ops, numerics, t0=0.0, dt=1.0, tmax=1e9, maxsteps=2,
                    rtol=1e-6, atol=0.01)
    solver.solve(jnp.asarray(exact_state(ps, grid, 0.0)))
    # the eigenmode state has nonzero velocity; a tiny safety factor
    # must clamp h far below the initial dt
    assert solver.CFL_maxh is not None and np.isfinite(solver.CFL_maxh)
    assert solver.h < 1.0


# ------------------------------------------------- noise + conservation
def test_noise_injection_and_conservation():
    ps, grid, ops = make_problem(
        nx=32,
        extra_params=[
            "variance_rate=1e-4",
            "variance_timing_function=t",  # inject every >=1 time unit
            "conserve_worms=True",
        ],
    )
    numerics = NumericsOptions(adapt_type="none", ksp_iters=16)
    solver = Solver(ops, numerics, t0=0.0, dt=1.0, tmax=1e9, maxsteps=4,
                    rtol=1e-6, atol=0.01, rng_key=jax.random.PRNGKey(3))
    u0 = exact_state(ps, grid, 0.0)
    n0 = float(u0[0].sum())
    u = np.asarray(solver.solve(jnp.asarray(u0)))
    # noise fired (lastvart advanced) and worms conserved exactly
    assert solver.lastvart > 0.0
    assert float(u[0].sum()) == pytest.approx(n0, rel=1e-12)
    # same run without conservation drifts (noise is multiplicative)
    ps2, grid2, ops2 = make_problem(
        nx=32,
        extra_params=["variance_rate=1e-4",
                      "variance_timing_function=t",
                      "conserve_worms=False"],
    )
    solver2 = Solver(ops2, numerics, t0=0.0, dt=1.0, tmax=1e9, maxsteps=4,
                     rtol=1e-6, atol=0.01, rng_key=jax.random.PRNGKey(3))
    u2 = np.asarray(solver2.solve(jnp.asarray(u0)))
    assert float(u2[0].sum()) != pytest.approx(n0, rel=1e-12)


def test_variance_timing_function_gate():
    ps, grid, ops = make_problem(
        nx=32,
        extra_params=["variance_rate=1e-4",
                      "variance_timing_function=t/50"],
    )
    numerics = NumericsOptions(adapt_type="none", ksp_iters=12)
    solver = Solver(ops, numerics, t0=0.0, dt=1.0, tmax=1e9, maxsteps=3,
                    rtol=1e-6, atol=0.01, rng_key=jax.random.PRNGKey(4))
    solver.solve(jnp.asarray(exact_state(ps, grid, 0.0)))
    # VTF increases by 3/50 < 1 over the run: no injection
    assert solver.lastvart == 0.0


# ------------------------------------------------- Fourier-series ligands
def test_fourier_series_end_to_end():
    params = [p for p in OPTIONS92_PARAMS
              if p.split("=", 1)[0] not in ("U0_1_1", "U0_2_1")]
    params += ["series_1_1=3", "depth_1_1=0.4", "U0_1_1=", "U0_2_1="]
    # series expansion consumes per-ligand params named like the CLI
    clargs = make_clargs(params=params)
    ps = SolutionParameters(clargs)
    # group 1's single ligand expanded into 3 components
    assert ps.nligands == 4
    names = list(ps.groups.names())
    assert names == ["U_1_1", "U_1_2", "U_1_3", "U_2_1"]
    grid = Grid(dim=1, width=1.0, nx=32, dof=ps.nligands + 1, order=3)
    ops = PDEOperators(ps, grid)
    u = np.full(grid.Vshape, 9000.0)
    out = np.asarray(ops.rhs(jnp.asarray(u), 0.0))
    assert out.shape == grid.Vshape
    assert np.all(np.isfinite(out))


# ------------------------------------------------------- zip checkpoints
def test_zip_checkpoint_monitor(tmp_path):
    ps, grid, ops = make_problem(nx=32)
    numerics = NumericsOptions(adapt_type="none", ksp_iters=12)
    solver = Solver(ops, numerics, t0=0.0, dt=1.0, tmax=1e9, maxsteps=3,
                    rtol=1e-6, atol=0.01)
    prefix = str(tmp_path / "cp.zip")
    solver.add_monitor(make_checkpoint_monitor(prefix, grid))
    solver.solve(jnp.asarray(exact_state(ps, grid, 0.0)))
    zf = str(tmp_path / "cps1r0.zip")
    assert os.path.exists(zf)
    with zipfile.ZipFile(zf) as z:
        names = z.namelist()
    assert len(names) == 4  # steps 0..3
    # h5 files were removed after archiving
    assert not glob.glob(str(tmp_path / "cp_*.h5"))


# ------------------------------------------------------------ U sources
def test_ligand_source_term():
    ps, grid, _ = make_problem(nx=32)
    src = SpatialExpression(ps, grid, "100*cos(2*pi*x)")
    ops = PDEOperators(ps, grid, sources=[0.0, src, 0.0])
    base = PDEOperators(ps, grid)
    u = jnp.asarray(exact_state(ps, grid, 0.0))
    x = np.arange(32) / 32.0
    diff = np.asarray(ops.rhs(u, 0.0) - base.rhs(u, 0.0))
    np.testing.assert_allclose(diff[1], 100 * np.cos(2 * np.pi * x),
                               atol=1e-12)
    np.testing.assert_allclose(diff[0], 0.0, atol=1e-12)
    np.testing.assert_allclose(diff[2], 0.0, atol=1e-12)


# -------------------------------------------------------------------- 3D
def test_three_dimensional_smoke():
    params = [
        "dim=3", "nelements=8", "width=1", "height=1", "depth=1",
        "degree=3", "sigma=0.02357", "s2=sigma**2/2",
        "ngroups=1", "nligands_1=1", "alpha_1=1500", "beta_1=5.56e-4",
        "s_1_1=0.01", "gamma_1_1=0.01", "D_1_1=1e-6",
    ]
    ps = SolutionParameters(make_clargs(params=params))
    grid = Grid(dim=3, nx=8, ny=8, nz=8, dof=2, order=3)
    ops = PDEOperators(ps, grid)
    rng = np.random.default_rng(0)
    u = jnp.asarray(9000.0 + 10 * rng.standard_normal(grid.Vshape))
    numerics = NumericsOptions(adapt_type="none", ksp_iters=12)
    step, _ = __import__("ksfd_tpu.solvers", fromlist=["make_step_fn"]
                         ).make_step_fn(ops, numerics, atol=0.01, rtol=1e-6)
    u1, enorm = step(u, 0.0, 0.1)
    assert np.all(np.isfinite(np.asarray(u1)))
    assert np.isfinite(float(enorm))
