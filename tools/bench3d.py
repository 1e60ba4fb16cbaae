#!/usr/bin/env python3
"""Big-3D benchmark + kernel validation for the fused 3D path.

The 3D analog of bench.py (same slope-timing discipline, CLAUDE.md
"Environment gotchas"): the options84-class physics (rho + attractant
+ repellent, 3 dofs) on an nx^3 grid, f64 mixed-precision ROS34PW2
steps chained inside one device execution.  Reference capability:
dim-3 grids are first-class (KSFD/ksfdgrid.py:60-148).

--check additionally compares the fused 3D kernels (rhs/jvp/delta)
against the f64 XLA oracle on a ROUGH state (a near-uniform state
makes raw f32 comparisons meaningless — docs/HANDOFF_r2.md) before
timing.

Prints ONE JSON line like bench.py.
"""

import argparse
import json
import os
import sys
import time

BASELINE_DOF_UPDATES_PER_SEC = 7.08e6 * 1e4 / 86400.0  # bench.py

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, "tests"))


def make_problem3d(nx, ny=None, nz=None):
    from helpers import make_clargs, OPTIONS92_PARAMS
    from ksfd_tpu import Grid, SolutionParameters
    from ksfd_tpu.ops import PDEOperators

    ny = ny or nx
    nz = nz or nx
    params = [
        p
        for p in OPTIONS92_PARAMS
        if p.split("=", 1)[0]
        not in ("nelements", "dim", "rho0", "U0_1_1", "U0_2_1")
    ] + [
        "nelements=%d" % nx,
        "nwidth=%d" % nx,
        "nheight=%d" % ny,
        "ndepth=%d" % nz,
        "dim=3",
        "height=1",
        "depth=1",
        "rho0=murho + arho*sin(2*pi*(x+y+z))",
        "U0_1_1=",
        "U0_2_1=",
    ]
    ps = SolutionParameters(make_clargs(params=params))
    grid = Grid(
        dim=3, width=1.0, height=1.0, depth=1.0,
        nx=nx, ny=ny, nz=nz, dof=3, order=3,
    )
    return ps, grid, PDEOperators(ps, grid)


def rough_state(grid, scale=1000.0):
    import numpy as np

    rng = np.random.default_rng(0)
    return np.stack([
        6000 + 3 * scale * np.abs(rng.standard_normal(grid.Sshape)),
        6000 + scale * np.abs(rng.standard_normal(grid.Sshape)),
        6000 + 0.5 * scale * np.abs(rng.standard_normal(grid.Sshape)),
    ])


def check_kernels(ops, grid, verbose=False):
    """Max rel deviation of each fused 3D kernel from the f64 oracle
    on a rough state; returns a dict of rel errors."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ksfd_tpu.ops.pallas_stencil3d import make_pallas_kernels_3d

    kern = make_pallas_kernels_3d(ops)
    u = jnp.asarray(rough_state(grid))
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal(grid.Vshape))
    t = 0.5
    out = {}
    ref = np.asarray(ops.rhs(u, t))
    got = np.asarray(kern.rhs(u.astype(jnp.float32), t))
    out["rhs"] = float(np.abs(got - ref).max() / np.abs(ref).max())
    _, jvp64 = jax.linearize(lambda uu: ops.rhs(uu, t), u)
    refj = np.asarray(jvp64(v))
    gotj = np.asarray(
        kern.jvp(u.astype(jnp.float32), v.astype(jnp.float32), t)
    )
    out["jvp"] = float(np.abs(gotj - refj).max() / np.abs(refj).max())
    if kern.delta is not None:
        d = 1e-3 * v
        u1 = ops.groom(u + d)
        refd = np.asarray(ops.rhs(u1, t) - ops.rhs(ops.groom(u), t))
        gotd = np.asarray(kern.delta(ops.groom(u), u1 - ops.groom(u),
                                     u1, t))
        out["delta"] = float(
            np.abs(gotd - refd).max() / np.abs(refd).max()
        )
    if verbose:
        print("3D kernel rel deviations vs f64 oracle:", out,
              file=sys.stderr)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--nx", type=int, default=128)
    parser.add_argument("--ny", type=int, default=None)
    parser.add_argument("--nz", type=int, default=None)
    parser.add_argument("--steps", type=int, default=24)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--dt", type=float, default=1.0)
    parser.add_argument("--check", action="store_true",
                        help="validate the fused kernels vs the f64 "
                             "oracle on a rough state first")
    parser.add_argument("--no-pallas", action="store_true",
                        help="time the XLA path instead (A/B)")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ksfd_tpu import NumericsOptions
    from ksfd_tpu.solvers import make_multistep_fn

    ps, grid, ops = make_problem3d(args.nx, args.ny, args.nz)
    platform = jax.devices()[0].platform
    if args.check:
        check_kernels(ops, grid, verbose=True)
    numerics = NumericsOptions(use_pallas=not args.no_pallas)
    multi, _ = make_multistep_fn(
        ops, numerics, atol=0.01, rtol=1e-6, static_steps=False
    )
    x = np.arange(grid.nx) / grid.nx
    y = np.arange(grid.ny) / grid.ny
    z = np.arange(grid.nz) / grid.nz
    X, Y, Z = np.meshgrid(x, y, z, indexing="ij")
    s = np.sin(2 * np.pi * (X + Y + Z))
    u = jnp.asarray(
        np.stack([9000.0 + s, 9000.0 + 0.7 * s, 9000.0 + 0.1 * s])
    )
    t = jnp.asarray(0.0)
    h = jnp.asarray(args.dt)

    n_small, n_big = 2, args.steps + 2

    def fence(arr, e):
        return float(arr[0, 0, 0, 0]) + float(e)

    uw = {}
    enorm0 = None
    for nst in (n_small, n_big):
        u1, t1, e1 = multi(u, t, h, nst)
        fence(u1, e1)
        uw[nst] = u1
        enorm0 = float(e1)

    times = {n_small: [], n_big: []}
    outs = {}
    enorm = enorm0
    for rep in range(args.repeats):
        for nst in (n_small, n_big):
            pert = 1e-9 * (1 + 2 * rep + (nst == n_big))
            up = u * (1.0 + pert) + pert
            fence(up, 0.0)
            t0 = time.perf_counter()
            u1, t1, e1 = multi(up, t, h, nst)
            fence(u1, e1)
            times[nst].append(time.perf_counter() - t0)
            outs[nst] = u1
            enorm = e1
    for nst in (n_small, n_big):
        assert not bool(jnp.array_equal(outs[nst], uw[nst])), (
            "timed output identical to warmup output - dedupe suspected"
        )

    step_time = (min(times[n_big]) - min(times[n_small])) / (
        n_big - n_small
    )
    dof = grid.n_dofs
    rate = dof / step_time
    assert np.isfinite(float(enorm)), "benchmark step diverged"
    if args.verbose:
        print(
            "platform=%s grid=%s dof=%d step_time=%.4fs enorm=%.3g"
            % (platform, grid.Sshape, dof, step_time, enorm0),
            file=sys.stderr,
        )
    print(json.dumps({
        "metric": "implicit KS step DOF-updates/sec/chip "
                  "(3D %dx%dx%d, 3 dofs, f64, ROS34PW2%s)"
                  % (grid.nx, grid.ny, grid.nz,
                     ", XLA path" if args.no_pallas else ""),
        "value": round(rate, 1),
        "unit": "DOF-updates/sec/chip",
        "vs_baseline": round(rate / BASELINE_DOF_UPDATES_PER_SEC, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
