"""ARKIMEX (ESDIRK ARK324L2SA) stepper: parity with ROSW + order.

Reference capability: '-ts_type arkimex' selects PETSc's additive RK
integrator (KSFD/ksfdts.py:69 leaves the TS type to the options file;
options84 carries a leftover -ts_arkimex_type setting).  KSFD
integrates its whole RHS implicitly, so the matching native method is
the ESDIRK implicit part of ARKIMEX3 with modified-Newton stage solves
(see solvers/steppers.py::ARK324).
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from ksfd_tpu import NumericsOptions, decode_numerics
from ksfd_tpu.solvers import Solver
from manufactured import make_problem, exact_state


def _run_fixed(ops, u0, ts_type, dt, nsteps, **kw):
    numerics = NumericsOptions(
        ts_type=ts_type, adapt_type="none", ksp_iters=16, **kw
    )
    s = Solver(ops, numerics, t0=0.0, dt=dt, tmax=1e18, maxsteps=nsteps,
               rtol=1e-6, atol=0.01)
    u = np.asarray(s.solve(jnp.asarray(u0)))
    return u, s


def test_arkimex_matches_rosw_trajectory():
    """Same manufactured problem, same dt: the two order-3 methods must
    agree far below the discretization error."""
    ps, grid, ops = make_problem(nx=64)
    u0 = exact_state(ps, grid, 0.0)
    u_rosw, s1 = _run_fixed(ops, u0, "rosw", 1.0, 20)
    u_ark, s2 = _run_fixed(ops, u0, "arkimex", 1.0, 20)
    assert s1.t == s2.t == 20.0
    assert s1.snes_failures == 0 and s2.snes_failures == 0
    exact = exact_state(ps, grid, 20.0)
    assert np.abs(u_rosw - exact).max() < 2e-5
    assert np.abs(u_ark - exact).max() < 2e-5
    # bound leaves room for the mixed-path f32 combination envelope in
    # the rosw stages (~1e-8 on this trajectory) on top of the methods'
    # genuine LTE difference
    assert np.abs(u_rosw - u_ark).max() < 5e-8


def test_arkimex_third_order_in_time():
    """Self-convergence against a fine-dt reference (the spatial error
    cancels): the ESDIRK pair converges at its design order 3, like
    ROS34PW2."""
    ps, grid, ops = make_problem(nx=64)
    u0 = exact_state(ps, grid, 0.0)
    T = 128.0
    ref, _ = _run_fixed(ops, u0, "arkimex", 2.0, int(T / 2.0))
    errs = [
        np.abs(_run_fixed(ops, u0, "arkimex", dt, int(T / dt))[0] - ref).max()
        for dt in (64.0, 32.0, 16.0)
    ]
    orders = [math.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert min(orders) > 2.7, (errs, orders)


def test_arkimex_ksponly_single_newton():
    """-snes_type ksponly (the reference's configuration) = one Newton
    iteration per stage; still accurate on the manufactured problem."""
    ps, grid, ops = make_problem(nx=32)
    u0 = exact_state(ps, grid, 0.0)
    u, s = _run_fixed(ops, u0, "arkimex", 1.0, 10, snes_iters=1)
    exact = exact_state(ps, grid, 10.0)
    assert np.abs(u - exact).max() < 2e-3


def test_decode_arkimex_and_ksponly():
    opts = decode_numerics(
        ["-ts_type", "arkimex", "-snes_type", "ksponly"]
    )
    assert opts.ts_type == "arkimex"
    assert opts.snes_iters == 1


def test_banded_rejects_dirk_tableau():
    ps, grid, ops = make_problem(nx=32)
    with pytest.raises(ValueError):
        Solver(ops, NumericsOptions(ts_type="arkimex", ksp_type="banded"))


def test_arkimex_adaptive():
    """The embedded order-2 pair drives the basic adaptor."""
    ps, grid, ops = make_problem(nx=32)
    u0 = exact_state(ps, grid, 0.0)
    numerics = NumericsOptions(ts_type="arkimex", ksp_iters=16)
    s = Solver(ops, numerics, t0=0.0, dt=1.0, tmax=50.0, maxsteps=200,
               rtol=1e-6, atol=0.01)
    u = np.asarray(s.solve(jnp.asarray(u0)))
    assert s.t > 50.0 and s.k < 200
    # h accelerates well past tmax; at nx=32 the spatial floor
    # dominates — the check is stability + tracking of the growing mode
    assert np.abs(u - exact_state(ps, grid, s.t)).max() < 2e-2


def test_ark436_order_conditions():
    """ARK4(3)6L[2]SA (PETSc -ts_arkimex_type 4, implicit part):
    quadrature conditions through order 4 and stiff accuracy."""
    from ksfd_tpu.solvers.steppers import get_tableau

    tab = get_tableau("ark436")
    A = np.array(tab.A)
    b = np.array(tab.b)
    bh = np.array(tab.bhat)
    c = np.array(tab.c)
    assert tab.stages == 6 and tab.gamma == 0.25
    assert b.sum() == pytest.approx(1.0, abs=1e-14)
    assert b @ c == pytest.approx(0.5, abs=1e-14)
    assert b @ c**2 == pytest.approx(1.0 / 3.0, abs=1e-13)
    assert b @ c**3 == pytest.approx(0.25, abs=1e-13)
    assert b @ A @ c == pytest.approx(1.0 / 6.0, abs=1e-13)
    assert bh.sum() == pytest.approx(1.0, abs=1e-13)
    assert bh @ c == pytest.approx(0.5, abs=1e-13)
    # embedded pair is order 3, NOT 4 (the estimate must see the
    # order-4 error)
    assert abs(bh @ c**3 - 0.25) > 1e-3
    np.testing.assert_allclose(A[-1], b, atol=1e-15)  # stiffly accurate


def test_ark436_matches_rosw_trajectory():
    """Same problem, same dt: the order-4 pair agrees with ROSW far
    below the discretization error (and closer to the fine-dt truth)."""
    ps, grid, ops = make_problem(nx=64)
    u0 = exact_state(ps, grid, 0.0)
    u_rosw, s1 = _run_fixed(ops, u0, "rosw", 1.0, 20)
    u_ark, s2 = _run_fixed(ops, u0, "ark436", 1.0, 20, snes_iters=2)
    assert s2.snes_failures == 0
    assert np.abs(u_rosw - u_ark).max() < 5e-8


def test_ark436_fourth_order_in_time():
    """Self-convergence at design order 4 (Newton solved tightly so
    the stage-solve error does not mask the LTE)."""
    ps, grid, ops = make_problem(nx=64)
    u0 = exact_state(ps, grid, 0.0)
    T = 128.0
    kw = dict(snes_iters=3)
    ref, _ = _run_fixed(ops, u0, "ark436", 2.0, int(T / 2.0), **kw)
    errs = [
        np.abs(
            _run_fixed(ops, u0, "ark436", dt, int(T / dt), **kw)[0] - ref
        ).max()
        for dt in (64.0, 32.0, 16.0)
    ]
    orders = [math.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert min(orders) > 3.5, (errs, orders)


def test_decode_arkimex_type_4():
    opts = decode_numerics(
        ["-ts_type", "arkimex", "-ts_arkimex_type", "4",
         "-snes_type", "ksponly"]
    )
    assert opts.ts_type == "ark436"
    # the selector alone (no arkimex ts_type) must not hijack rosw
    opts = decode_numerics(["-ts_type", "rosw", "-ts_arkimex_type", "4"])
    assert opts.ts_type == "rosw"
