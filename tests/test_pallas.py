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
