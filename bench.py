#!/usr/bin/env python3
"""Benchmark: DOF-updates/sec/chip for the implicit Keller-Segel step.

Workload: the options84-class 2D problem (worm density + attractant +
repellent ligand groups, periodic, degree-3 stencils) at nx=ny=1024,
3 dofs = 3.1M DOF, float64 state.  One "update" = one full implicit
Rosenbrock-W (ROS34PW2) step: 4 stages, Jacobian linearization,
spectrally block-preconditioned Richardson stage solves (matrix-free
GMRES is the rejection fallback), embedded error estimate — the same
work the reference does per PETSc TSStep with analytic-Jacobian
assembly + MUMPS LU.

Anti-dedupe: the axon TPU tunnel pipelines/dedupes repeated identical
executions and reports absurd speeds (CLAUDE.md), so the timed call
uses a PERTURBED initial state — different bytes from warmup — and we
assert the two executions' outputs actually differ.

Baseline derivation (BASELINE.md): the reference's only at-scale
figure is the options84 cluster config — 16 MPI ranks x 8 threads,
1536^2 x 3 dofs (~7.08M DOF), maxsteps=10000, completing within the
24 h SLURM walltime (options84s16.sh) => >= 7.08e6*1e4/86400 =
8.19e5 DOF-updates/sec for the whole 16-rank allocation.
vs_baseline = (our DOF-updates/sec on ONE chip) / 8.19e5.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import argparse
import json
import os
import sys
import time


BASELINE_DOF_UPDATES_PER_SEC = 7.08e6 * 1e4 / 86400.0  # 819,200/s


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--nx", type=int, default=None,
                        help="grid points per axis (default 1024 on TPU, "
                             "256 on CPU)")
    parser.add_argument("--steps", type=int, default=10,
                        help="timed steps (after warmup)")
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--dt", type=float, default=1.0)
    parser.add_argument("--ksp-iters", type=int, default=None,
                        help="preconditioned Richardson sweeps per stage "
                             "(default: the library default)")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    sys.path.insert(0, os.path.join(here, "tests"))
    import __graft_entry__ as ge
    from ksfd_tpu import NumericsOptions
    from ksfd_tpu.solvers import make_multistep_fn

    platform = jax.devices()[0].platform
    nx = args.nx or (1024 if platform not in ("cpu",) else 256)
    ps, grid, ops = ge._make_problem(nx, nx)
    numerics = (
        NumericsOptions(ksp_iters=args.ksp_iters)
        if args.ksp_iters
        else NumericsOptions()
    )
    # the fused fixed-dt multi-step driver: the steps are CHAINED
    # (each consumes the previous state) inside one device execution,
    # exactly like a production fixed-dt run
    multi, _ = make_multistep_fn(ops, numerics, atol=0.01, rtol=1e-6)
    u = jnp.asarray(ge._initial_state(grid))
    t = jnp.asarray(0.0)
    h = jnp.asarray(args.dt)

    # warmup (compile + cache); nsteps is a static arg so warm up with
    # the same value as the timed call
    uw, tw, enorm = multi(u, t, h, args.steps)
    uw.block_until_ready()
    enorm0 = float(enorm)

    # timed call on a perturbed input so the tunnel cannot dedupe it
    # against the warmup execution (see module docstring)
    up = u * (1.0 + 1e-9) + 1e-9
    up.block_until_ready()
    t0 = time.perf_counter()
    u1, t1, enorm = multi(up, t, h, args.steps)
    u1.block_until_ready()
    elapsed = time.perf_counter() - t0
    assert not bool(jnp.array_equal(u1, uw)), (
        "timed output identical to warmup output - dedupe suspected"
    )

    step_time = elapsed / args.steps
    dof = grid.n_dofs
    rate = dof / step_time
    if args.verbose:
        print(
            "platform=%s nx=%d dof=%d step_time=%.4fs enorm=%.3g"
            % (platform, nx, dof, step_time, enorm0),
            file=sys.stderr,
        )
    assert np.isfinite(float(enorm)), "benchmark step diverged"
    print(
        json.dumps(
            {
                "metric": "implicit KS step DOF-updates/sec/chip "
                          "(2D %dx%d, 3 dofs, f64, ROS34PW2 + spectral-"
                          "preconditioned stage solves)" % (nx, nx),
                "value": round(rate, 1),
                "unit": "DOF-updates/sec/chip",
                "vs_baseline": round(rate / BASELINE_DOF_UPDATES_PER_SEC, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
