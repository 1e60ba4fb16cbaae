"""Chebyshev-accelerated stage solves + three-tier chunk escalation.

VERDICT r4 #1 (the h-gap): the aggregated phase's stage solves limit
the accepted step size — the preconditioned spectrum spreads to
kappa ~ dmax/dmin because the block pc bounds the rho diffusivity by
its spatial max.  Chebyshev iteration reaches a given contraction in
~sqrt(kappa) fewer applications than Richardson, with NO inner
products (chunk-safe where Krylov compositions are not), letting the
escalated chunk tiers hold step sizes only a near-exact solve
supports.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ksfd_tpu import NumericsOptions
from ksfd_tpu.solvers import Solver, make_step_fn
from ksfd_tpu.solvers.gmres import chebyshev_solve, richardson_solve
from ksfd_tpu.utils.cli import decode_numerics
from manufactured import make_problem, exact_state


@pytest.fixture(scope="module")
def prob():
    return make_problem(nx=32)


def test_cheb_sqrt_kappa_acceleration():
    """On a kappa=50 SPD system, Chebyshev at the exact interval beats
    Richardson by orders of magnitude at equal application count (the
    sqrt(kappa) property the escalation tiers rely on)."""
    rng = np.random.default_rng(0)
    lam = np.concatenate([[0.02, 1.0], rng.uniform(0.02, 1.0, 198)])
    A = jnp.asarray(np.diag(lam))
    b = jnp.asarray(rng.normal(size=200))
    op = lambda v: A @ v
    M = lambda v: v
    xex = b / jnp.asarray(lam)
    relerr = lambda x: float(
        jnp.linalg.norm(x - xex) / jnp.linalg.norm(xex)
    )
    ec = relerr(chebyshev_solve(op, b, M, iters=32, lmin=0.02, lmax=1.0))
    er = relerr(richardson_solve(op, b, M, iters=32))
    assert ec < 1e-3 and er > 0.1, (ec, er)
    # eigenvalues BELOW the interval must still contract (lmin
    # over-estimated): the asymmetric-safety property the on-device
    # interval estimate leans on
    ec2 = relerr(
        chebyshev_solve(op, b, M, iters=32, lmin=0.2, lmax=1.0)
    )
    assert ec2 < er, (ec2, er)


def test_cheb_step_matches_richardson_on_smooth(prob):
    """At a well-resolved h both solvers converge the same stage
    systems: accepted steps, states equal to the mixed-precision
    envelope."""
    ps, grid, ops = prob
    u = jnp.asarray(exact_state(ps, grid, 0.0))
    sr, _ = make_step_fn(
        ops, NumericsOptions(ksp_iters=16), atol=0.01, rtol=1e-6
    )
    sc, _ = make_step_fn(
        ops, NumericsOptions(ksp_type="chebyshev", ksp_iters=16),
        atol=0.01, rtol=1e-6,
    )
    u1r, er = sr(u, 0.0, 1.0)
    u1c, ec = sc(u, 0.0, 1.0)
    assert float(er) <= 1.0 and float(ec) <= 1.0
    inc = float(jnp.max(jnp.abs(u1r - u)))
    dev = float(jnp.max(jnp.abs(u1c - u1r)))
    assert dev < 1e-4 * max(inc, 1.0), (dev, inc)


def test_cheb_adaptive_solve_reaches_tmax(prob):
    """A full adaptive run with -ksp_type chebyshev integrates the
    manufactured problem to tmax and lands near the richardson run."""
    ps, grid, ops = prob
    u0 = jnp.asarray(exact_state(ps, grid, 0.0))
    out = {}
    for tag, nm in (
        ("rich", NumericsOptions()),
        ("cheb", NumericsOptions(ksp_type="chebyshev", ksp_iters=8)),
    ):
        s = Solver(ops, nm, t0=0.0, dt=1.0, tmax=50.0, maxsteps=200,
                   rtol=1e-6, atol=0.01)
        out[tag] = np.asarray(s.solve(u0))
        assert not s.diverged and s.t > 50.0, (tag, s.t, s.k)
    np.testing.assert_allclose(
        out["cheb"], out["rich"], rtol=1e-4, atol=1e-3
    )


def test_chunk_escalated_tiers_are_chebyshev(prob):
    """Default numerics (block pc, esc_cheb on): the chunk's escalated
    tiers build as Chebyshev steps (BUILD_INFO of the LAST tier built
    records cheb=True), and the chunk still integrates."""
    from ksfd_tpu.solvers.solver import BUILD_INFO, make_adaptive_chunk_fn

    ps, grid, ops = prob
    nm = NumericsOptions()
    assert nm.esc_cheb and nm.ksp_iters_max2 > nm.ksp_iters_max
    chunk, _ = make_adaptive_chunk_fn(ops, nm, atol=0.01, rtol=1e-6)
    # the last step built is the top escalation tier
    assert BUILD_INFO.get("cheb") is True, dict(BUILD_INFO)
    u0 = ops.groom(jnp.asarray(exact_state(ps, grid, 0.0)))
    u, t, h, k, att, rej = chunk(u0, 0.0, 1.0, 1e9, 4)
    assert int(k) == 4 and not bool(rej)
    assert np.all(np.isfinite(np.asarray(u)))


def test_chunk_esc_cheb_opt_out(prob):
    """-esc_cheb 0 keeps the escalated tiers on Richardson."""
    from ksfd_tpu.solvers.solver import BUILD_INFO, make_adaptive_chunk_fn

    ps, grid, ops = prob
    nm = NumericsOptions(esc_cheb=False)
    chunk, _ = make_adaptive_chunk_fn(ops, nm, atol=0.01, rtol=1e-6)
    assert BUILD_INFO.get("cheb") is False, dict(BUILD_INFO)


def test_decode_cheb_options():
    nm = decode_numerics(
        ["-ksp_type", "chebyshev", "-ksp_iters_max2", "64",
         "-esc_cheb", "0", "-cheb_lmax", "1.5", "-cheb_lmin", "0.1",
         "-cheb_safety", "0.8"]
    )
    assert nm.ksp_type == "chebyshev"
    assert nm.ksp_iters_max2 == 64
    assert nm.esc_cheb is False
    assert nm.cheb_lmax == 1.5
    assert nm.cheb_lmin == 0.1
    assert nm.cheb_safety == 0.8
    assert not nm.unrecognized


def test_cheb_with_dirk_stage_solves(prob):
    """-ksp_type chebyshev also serves the ESDIRK (arkimex) stage
    solves' modified-Newton iterations."""
    ps, grid, ops = prob
    u = jnp.asarray(exact_state(ps, grid, 0.0))
    s, _ = make_step_fn(
        ops,
        NumericsOptions(ts_type="arkimex", ksp_type="chebyshev",
                        ksp_iters=16),
        atol=0.01, rtol=1e-6,
    )
    u1, e = s(u, 0.0, 1.0)
    assert np.isfinite(float(e)) and float(e) <= 1.0
    sr, _ = make_step_fn(
        ops, NumericsOptions(ts_type="arkimex", ksp_iters=16),
        atol=0.01, rtol=1e-6,
    )
    u1r, er = sr(u, 0.0, 1.0)
    inc = float(jnp.max(jnp.abs(u1r - u)))
    assert float(jnp.max(jnp.abs(u1 - u1r))) < 1e-4 * max(inc, 1.0)
