"""Spatial convergence + noise-path bit-exact resume."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ksfd_tpu import NumericsOptions
from ksfd_tpu.io import TimeSeries, make_save_monitor
from ksfd_tpu.solvers import Solver
from ksfd_tpu import ic as ksfd_ic
from helpers import make_clargs
from manufactured import make_problem, exact_state


def test_fourth_order_spatial_convergence():
    """The reference's thesis-3.8 convergence test: degree-3 stencils
    give 4th-order spatial accuracy on the manufactured solution."""
    errs = []
    for nx in (32, 64):
        ps, grid, ops = make_problem(nx=nx)
        numerics = NumericsOptions(adapt_type="none", ksp_iters=16)
        solver = Solver(ops, numerics, t0=0.0, dt=1.0, tmax=1e18,
                        maxsteps=20, rtol=1e-6, atol=0.01)
        u = np.asarray(solver.solve(jnp.asarray(exact_state(ps, grid, 0.0))))
        errs.append(np.abs(u - exact_state(ps, grid, solver.t)).max())
    order = np.log2(errs[0] / errs[1])
    assert order > 3.5, (errs, order)


def test_bitexact_resume_through_noise(tmp_path):
    """Resume must reproduce the noise stream: the checkpointed JAX
    PRNG key makes restart bit-exact even across injections (stricter
    than the reference, which restarts its RNG from the seed —
    SURVEY §5.4)."""
    from ksfd_tpu.io import make_checkpoint_monitor

    ps, grid, ops = make_problem(
        nx=32,
        extra_params=["variance_rate=1e-5", "variance_timing_function=t"],
    )
    numerics = NumericsOptions(adapt_type="none", ksp_iters=16)
    cp = str(tmp_path / "checks/noisy")
    solver = Solver(ops, numerics, t0=0.0, dt=1.0, tmax=1e9, maxsteps=6,
                    rtol=1e-6, atol=0.01, rng_key=jax.random.PRNGKey(11))
    solver.add_monitor(
        make_checkpoint_monitor(cp, grid, clargs=ps.clargs)
    )
    u_final = np.asarray(solver.solve(jnp.asarray(exact_state(ps, grid, 0.0))))
    assert solver.lastvart > 0.0  # noise fired during the run

    # resume from step 3's checkpoint (stored state + PRNG key) and
    # retake the remaining noisy steps: must match bit-exactly
    clargs = make_clargs(resume=cp + "_3_", params=[])
    u3, t3, extras = ksfd_ic.resume_values(clargs, grid, ps)
    assert "rng_key" in extras
    solver2 = Solver(ops, numerics, t0=t3, dt=1.0, tmax=1e9, maxsteps=3,
                     rtol=1e-6, atol=0.01, rng_key=extras["rng_key"],
                     lastvart=float(ps.params0["lastvart"]))
    u_resumed = np.asarray(solver2.solve(jnp.asarray(u3), t=t3))
    np.testing.assert_array_equal(u_resumed, u_final)
