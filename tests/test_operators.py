"""Tests of the PDE operator vs closed forms and invariants."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import sympy as sy

from ksfd_tpu import Grid, SolutionParameters
from ksfd_tpu.ops import PDEOperators, SpatialExpression
from helpers import make_clargs, OPTIONS92_PARAMS


@pytest.fixture(scope="module")
def ps92():
    return SolutionParameters(make_clargs(params=OPTIONS92_PARAMS))


@pytest.fixture(scope="module")
def ops92(ps92):
    grid = Grid(
        dim=1,
        width=ps92.width,
        nx=ps92.nwidth,
        dof=ps92.nligands + 1,
        order=ps92.degree,
    )
    return PDEOperators(ps92, grid)


def uniform_state(ops, rho=9000.0, Us=None):
    grid = ops.grid
    u = np.zeros(grid.Vshape)
    u[0] = rho
    for l in range(ops.nligands):
        u[1 + l] = Us[l] if Us is not None else rho
    return jnp.asarray(u)


def test_spatial_expression_basic():
    ps = SolutionParameters(make_clargs(params=["k0=4.0", "nelements=64"]))
    grid = Grid(dim=1, nx=64, dof=2)
    se = SpatialExpression(ps, grid, "sin(2*pi*k0*x) + t")
    x = np.arange(64) / 64.0
    np.testing.assert_allclose(
        np.asarray(se(0.5)), np.sin(2 * np.pi * 4 * x) + 0.5, atol=1e-12
    )
    assert SpatialExpression(ps, grid, 0.0).is_zero()


def test_G_matches_sympy_pointwise(ps92, ops92):
    """G at a point == the sympy expression evaluated numerically."""
    rho, U1, U2 = 9000.0, 8900.0, 9100.0
    g = float(ops92.G(uniform_state(ops92, rho, [U1, U2]), t=0.0)[0])
    vals = ps92.values0
    s2 = vals["s2"]
    expected = (
        -vals["beta_1"] * np.log(vals["alpha_1"] + U1)
        - vals["beta_2"] * np.log(vals["alpha_2"] + U2)
        + vals["maxscale"] * s2 * (np.tanh((rho - vals["rhomax"]) / vals["cushion"]) + 1)
        + s2 * np.log(rho)
    )
    assert g == pytest.approx(expected, rel=1e-12)


def test_rhs_zero_at_uniform_steady_state(ops92):
    """At uniform rho with U_l = s_l/gamma_l * rho, all derivatives vanish."""
    rho = 9000.0
    Us = [rho * 0.01 / 0.01, rho * 0.001 / 0.001]  # s/gamma == 1 for both
    u = uniform_state(ops92, rho, Us)
    dudt = ops92.rhs(u, 0.0)
    np.testing.assert_allclose(np.asarray(dudt), 0.0, atol=1e-8)


def test_rho_equation_near_conservation_product_rule(ps92, ops92):
    """The reference's product-rule form conserves sum(rho) only up to
    truncation error (the reference carries a commented-out correction,
    ksfdsym.py:806-808).  On smooth data the defect is small."""
    n = ops92.grid.nx
    x = np.arange(n) / n
    u = np.full(ops92.grid.Vshape, 9000.0)
    u[0] += 100 * np.sin(2 * np.pi * 2 * x)
    u[1] += 50 * np.cos(2 * np.pi * 3 * x)
    dudt = ops92.rhs(jnp.asarray(u), 0.0)
    total = float(jnp.sum(dudt[0]))
    scale = float(jnp.sum(jnp.abs(dudt[0])))
    assert abs(total) < 1e-6 * max(scale, 1.0)


def test_rho_equation_flux_form_conserves_exactly(ps92):
    """flux_form=True conserves sum(rho) to roundoff, even on noise."""
    grid = Grid(dim=1, width=1.0, nx=128, dof=3, order=3)
    ops = PDEOperators(ps92, grid, flux_form=True)
    rng = np.random.default_rng(3)
    u = np.full(grid.Vshape, 9000.0) + 90 * rng.standard_normal(grid.Vshape)
    dudt = ops.rhs(jnp.asarray(u), 0.0)
    total = float(jnp.sum(dudt[0]))
    scale = float(jnp.sum(jnp.abs(dudt[0])))
    assert abs(total) < 1e-11 * max(scale, 1.0)


def test_ligand_rhs_closed_form(ops92):
    """dU/dt = -gamma*U + s*rho + D*lap(U) for a sinusoidal U."""
    n = ops92.grid.nx
    x = np.arange(n) / n
    k = 2 * np.pi * 4
    rho = np.full(n, 9000.0)
    U1 = 9000.0 + 5 * np.sin(k * x)
    u = np.stack([rho, U1, np.full(n, 9000.0)])
    dudt = ops92.rhs(jnp.asarray(u), 0.0)
    gamma, s, D = 0.01, 0.01, 1e-6
    # FD laplacian of sin has the symbol multiplier; use operator directly
    from ksfd_tpu.ops import laplacian_apply

    lap = np.asarray(laplacian_apply(jnp.asarray(U1), ops92.spacing, ops92.sw))
    expected = -gamma * U1 + s * rho + D * lap
    np.testing.assert_allclose(np.asarray(dudt[1]), expected, rtol=1e-10)


def test_groom_clamps_and_denans(ops92):
    u = np.full(ops92.grid.Vshape, 100.0)
    u[0, 3] = -5.0
    u[1, 4] = np.nan
    g = np.asarray(ops92.groom(jnp.asarray(u)))
    assert g[0, 3] == pytest.approx(1e-7)
    assert g[1, 4] == pytest.approx(1e-7)
    assert g[0, 0] == 100.0


def test_jacobian_action_matches_fd(ops92):
    """jvp == finite-difference directional derivative of the RHS."""
    rng = np.random.default_rng(4)
    u = np.full(ops92.grid.Vshape, 9000.0) + 90 * rng.standard_normal(
        ops92.grid.Vshape
    )
    v = rng.standard_normal(ops92.grid.Vshape)
    u = jnp.asarray(u)
    v = jnp.asarray(v)
    jv = ops92.jacobian_action(u, 0.0, v)
    eps = 1e-4
    fd = (ops92.rhs(u + eps * v, 0.0) - ops92.rhs(u - eps * v, 0.0)) / (2 * eps)
    np.testing.assert_allclose(
        np.asarray(jv), np.asarray(fd), rtol=2e-5, atol=2e-5 * float(jnp.abs(fd).max())
    )


def test_velocity_shape_and_value(ops92):
    """v = grad G; for uniform U and sinusoidal rho, v = s2 * grad(log rho)."""
    n = ops92.grid.nx
    x = np.arange(n) / n
    rho = 9000.0 + 100 * np.sin(2 * np.pi * x)
    u = np.stack([rho, np.full(n, 9000.0), np.full(n, 9000.0)])
    vel = np.asarray(ops92.velocity(jnp.asarray(u), 0.0))
    assert vel.shape == (1, n)
    from ksfd_tpu.ops import grad_apply

    s2 = 0.02357**2 / 2
    # V(U)=const, Vcap(rho) negligible far below rhomax -> G ~ s2 log rho + c
    expected = s2 * np.asarray(
        grad_apply(jnp.asarray(np.log(rho)), ops92.spacing, ops92.sw)[0]
    )
    np.testing.assert_allclose(vel[0], expected, rtol=1e-4, atol=1e-12)


def test_rhs_with_source(ps92):
    grid = Grid(dim=1, width=1.0, nx=32, dof=3, order=3)
    src = SpatialExpression(ps92, grid, "exp(t*lamda)*sin(2*pi*x)")
    ops = PDEOperators(ps92, grid, sources=[src, 0.0, 0.0])
    u = jnp.asarray(np.full(grid.Vshape, 9000.0))
    base = PDEOperators(ps92, grid).rhs(u, 2.0)
    with_src = ops.rhs(u, 2.0)
    x = np.arange(32) / 32.0
    lamda = 0.003974930217658144
    np.testing.assert_allclose(
        np.asarray(with_src[0] - base[0]),
        np.exp(2.0 * lamda) * np.sin(2 * np.pi * x),
        atol=1e-12,
    )
    np.testing.assert_allclose(np.asarray(with_src[1:]), np.asarray(base[1:]))


def test_rhs_jits_and_matches_eager(ops92):
    rng = np.random.default_rng(5)
    u = jnp.asarray(
        np.full(ops92.grid.Vshape, 9000.0)
        + 90 * rng.standard_normal(ops92.grid.Vshape)
    )
    jitted = jax.jit(ops92.rhs)
    np.testing.assert_allclose(
        np.asarray(jitted(u, 1.5)), np.asarray(ops92.rhs(u, 1.5)), rtol=1e-10,
        atol=1e-9,
    )
