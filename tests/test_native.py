"""Tests of the native C++ cyclic banded solver and the banded path."""

import numpy as np
import pytest
import jax.numpy as jnp

from ksfd_tpu import NumericsOptions
from ksfd_tpu.native.banded import (
    CyclicBandedSolver,
    band_storage_from_dense,
    native_available,
)
from ksfd_tpu.solvers import make_step_fn
from ksfd_tpu.solvers.banded_path import (
    probe_stride,
    extract_w_band,
    make_banded_step,
)
from manufactured import make_problem, exact_state

pytestmark = pytest.mark.skipif(
    not native_available(), reason="C++ toolchain unavailable"
)


def _random_cyclic_banded(n, w, seed=0):
    rng = np.random.default_rng(seed)
    A = np.zeros((n, n))
    for i in range(n):
        for d in range(-w, w + 1):
            A[i, (i + d) % n] = rng.standard_normal()
        A[i, i] += 2 * w + 5
    return A


@pytest.mark.parametrize("n,w", [(16, 1), (64, 5), (96, 8)])
def test_cyclic_banded_vs_dense(n, w):
    A = _random_cyclic_banded(n, w)
    solver = CyclicBandedSolver.from_dense_cyclic(A, w, w)
    rng = np.random.default_rng(1)
    b = rng.standard_normal((4, n))
    x = solver.solve(b)
    np.testing.assert_allclose(x, np.linalg.solve(A, b.T).T, atol=1e-11)
    solver.close()


def test_probe_stride():
    assert probe_stride(128, 2) == 8   # smallest divisor >= 5
    assert probe_stride(125, 2) == 5
    assert probe_stride(30, 2) == 5


def test_extract_w_band_matches_operator():
    """Probed band entries reproduce the operator exactly."""
    ps, grid, ops = make_problem(nx=32)
    import jax

    u = jnp.asarray(exact_state(ps, grid, 0.0))
    shift = 2.3
    _, f_jvp = jax.linearize(lambda uu: ops.rhs(uu, 0.0), u)
    w_op = lambda v: shift * v - f_jvp(v)
    solver = extract_w_band(w_op, 32, 3, 2)
    rng = np.random.default_rng(2)
    v = rng.standard_normal((3, 32))
    b = np.asarray(w_op(jnp.asarray(v)))
    # solve W x = b must give back v
    x = solver.solve(b.T.reshape(-1)).reshape(32, 3).T
    np.testing.assert_allclose(x, v, rtol=1e-10, atol=1e-10)
    solver.close()


def test_banded_step_matches_dense_step():
    ps, grid, ops = make_problem(nx=32)
    from ksfd_tpu.solvers.steppers import get_tableau

    dense_fn, tab = make_step_fn(
        ops, NumericsOptions(ksp_type="dense"), atol=0.01, rtol=1e-6
    )
    banded_fn = make_banded_step(ops, tab, atol=0.01, rtol=1e-6)
    u0 = jnp.asarray(exact_state(ps, grid, 0.0))
    ud, ed = dense_fn(u0, 0.0, 1.0)
    ub, eb = banded_fn(u0, 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(ub), np.asarray(ud),
                               rtol=1e-11, atol=1e-11)
    assert float(eb) == pytest.approx(float(ed), rel=1e-6)


def test_banded_solver_in_outer_loop():
    from ksfd_tpu.solvers import Solver

    ps, grid, ops = make_problem(nx=32)
    numerics = NumericsOptions(ksp_type="banded", adapt_type="none")
    solver = Solver(ops, numerics, t0=0.0, dt=1.0, tmax=1e9, maxsteps=5,
                    rtol=1e-6, atol=0.01)
    u = np.asarray(solver.solve(jnp.asarray(exact_state(ps, grid, 0.0))))
    uex = exact_state(ps, grid, 5.0)
    assert np.abs(u - uex).max() < 5e-2  # nx=32 spatial truncation level
    assert solver.k == 5


def test_cyclic_banded_nontrivial_pivoting():
    """Non-diagonally-dominant cyclic matrices force real pivoting in
    the Sherman-Morrison capacitance solve (regression: the dense LU
    solve interleaved pivot application with forward substitution,
    which is wrong for full-row-swapped dgetrf-style factors — a
    cond~66 system returned residual ~71)."""
    rng = np.random.default_rng(3)
    n, w = 40, 5
    A = np.zeros((n, n))
    for i in range(n):
        for d in range(-w, w + 1):
            A[i, (i + d) % n] = rng.standard_normal()
    # no added diagonal dominance
    assert np.linalg.cond(A) < 1e4
    solver = CyclicBandedSolver.from_dense_cyclic(A, w, w)
    b = rng.standard_normal((3, n))
    x = solver.solve(b)
    np.testing.assert_allclose(x, np.linalg.solve(A, b.T).T, atol=1e-9)
    solver.close()


def test_cyclic_banded_exact_zero_pivot_raises():
    """An exactly-zero pivot (here: a structurally zero row in the
    banded core) must raise KSFDException, not return a handle that
    later divides by zero.  (Near-singular matrices follow LAPACK
    semantics: they factor and the error-controlled stepper judges
    the garbage solve.)"""
    from ksfd_tpu.utils.exceptions import KSFDException

    n, w = 24, 1
    A = np.eye(n)
    A[5, 5] = 0.0  # zero pivot column within the band
    with pytest.raises(KSFDException):
        CyclicBandedSolver.from_dense_cyclic(A, w, w)
