"""Tests for FD stencil coefficients, operators, and spectral symbols."""

import numpy as np
import pytest
import jax.numpy as jnp

from ksfd_tpu.ops import (
    deriv_coeffs,
    grad_apply,
    laplacian_apply,
    laplacian_symbol,
)


def test_first_derivative_coeffs_4th_order():
    # sw=2 central first derivative: [1/12, -2/3, 0, 2/3, -1/12]/h
    cs = deriv_coeffs(1, 2, 1.0)
    np.testing.assert_allclose(
        cs, [1 / 12, -2 / 3, 0.0, 2 / 3, -1 / 12], atol=1e-14
    )


def test_second_derivative_coeffs_4th_order():
    # sw=2 central second derivative: [-1/12, 4/3, -5/2, 4/3, -1/12]/h^2
    cs = deriv_coeffs(2, 2, 1.0)
    np.testing.assert_allclose(
        cs, [-1 / 12, 4 / 3, -5 / 2, 4 / 3, -1 / 12], atol=1e-14
    )


def test_second_order_coeffs():
    # sw=1: [1, -2, 1]/h^2 and [-1/2, 0, 1/2]/h
    np.testing.assert_allclose(deriv_coeffs(2, 1, 0.5), [4.0, -8.0, 4.0])
    np.testing.assert_allclose(deriv_coeffs(1, 1, 0.5), [-1.0, 0.0, 1.0])


def test_grad_laplacian_exact_on_sinusoid_1d():
    # FD derivative of sin(kx) on periodic grid = multiplier * sin/cos;
    # at 4th order with n=128 the truncation error is tiny.
    n, L, sw = 128, 1.0, 2
    h = L / n
    x = np.arange(n) * h
    k = 2 * np.pi * 3
    f = jnp.asarray(np.sin(k * x))
    (g,) = grad_apply(f, (h,), sw)
    lap = laplacian_apply(f, (h,), sw)
    np.testing.assert_allclose(np.asarray(g), k * np.cos(k * x), atol=5e-4)
    np.testing.assert_allclose(np.asarray(lap), -k * k * np.sin(k * x), atol=0.06)


def test_laplacian_symbol_matches_operator_1d():
    n, L, sw = 64, 2.0, 2
    h = L / n
    rng = np.random.default_rng(0)
    u = rng.standard_normal(n)
    lap = np.asarray(laplacian_apply(jnp.asarray(u), (h,), sw))
    lam = laplacian_symbol((n,), (h,), sw)
    lap_fft = np.fft.irfft(lam * np.fft.rfft(u), n)
    np.testing.assert_allclose(lap_fft, lap, atol=1e-9 * np.abs(lap).max())


def test_laplacian_symbol_matches_operator_2d():
    n0, n1, sw = 32, 16, 2
    h = (0.5, 0.25)
    rng = np.random.default_rng(1)
    u = rng.standard_normal((n0, n1))
    lap = np.asarray(laplacian_apply(jnp.asarray(u), h, sw))
    lam = laplacian_symbol((n0, n1), h, sw)
    lap_fft = np.fft.irfft2(lam * np.fft.rfft2(u), s=(n0, n1))
    np.testing.assert_allclose(lap_fft, lap, atol=1e-9 * np.abs(lap).max())


def test_laplacian_conserves_mass():
    n, sw = 64, 2
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal(n))
    lap = laplacian_apply(u, (0.1,), sw)
    assert abs(float(jnp.sum(lap))) < 1e-10
