#!/usr/bin/env python3
"""Honest per-component profile of the implicit step.

Decomposes the fused ROS34PW2 step (the bench.py workload) into its
hot components and slope-times each on the current default device,
following the timing discipline in CLAUDE.md / docs/PERF.md:

- every timed region is CHAINED work inside one jit call (output of
  iteration k feeds iteration k+1) so the axon tunnel cannot pipeline
  or dedupe independent executions;
- timing stops on a scalar HOST TRANSFER derived from the result
  (block_until_ready can return early on the tunnel);
- per-call fixed dispatch cost cancels via slope timing
  (t(n_big) - t(n_small)) / (n_big - n_small);
- each timed call perturbs its input so it cannot be deduped against
  the warmup execution.

RUN THIS ON AN OTHERWISE IDLE CHIP: a concurrent process sharing the
device inflates every number (measured ~20% on the step time).

Usage:  python tools/profile_step.py [--nx 1024] [--ksp-iters N]
"""

import argparse
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=None)
    ap.add_argument("--ksp-iters", type=int, default=None)
    args = ap.parse_args(argv)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from ksfd_tpu import NumericsOptions
    from ksfd_tpu.solvers import make_multistep_fn
    from ksfd_tpu.solvers.linalg import BlockSpectralPreconditioner

    platform = jax.devices()[0].platform
    nx = args.nx or (1024 if platform != "cpu" else 256)
    ps, grid, ops = ge._make_problem(nx, nx)
    u = jnp.asarray(ge._initial_state(grid))
    t0s = jnp.asarray(0.0)
    h = jnp.asarray(1.0)
    print("platform=%s grid=%dx%d dofs=%d" % (platform, nx, nx, u.shape[0]),
          flush=True)

    def slope_step(numerics, tag, n_small=2, n_big=12):
        multi, _ = make_multistep_fn(
            ops, numerics, atol=0.01, rtol=1e-6, static_steps=False
        )
        fence = lambda a, e: float(a[0, 0, 0]) + float(e)
        for nst in (n_small, n_big):
            u1, _, e1 = multi(u, t0s, h, nst)
            fence(u1, e1)
        times = {}
        for nst, pert in ((n_small, 1e-9), (n_big, 2e-9)):
            up = u * (1.0 + pert) + pert
            fence(up, 0.0)
            tic = time.perf_counter()
            u1, _, e1 = multi(up, t0s, h, nst)
            fence(u1, e1)
            times[nst] = time.perf_counter() - tic
        ms = (times[n_big] - times[n_small]) / (n_big - n_small) * 1e3
        print("  %-36s %8.3f ms/step" % (tag, ms), flush=True)
        return ms

    def slope_apply(fn, v0, tag, n_small=5, n_big=45):
        """Chained unary-operator timing: v <- fn(v)*0.999."""

        def chained(v, n):
            return jax.lax.fori_loop(0, n, lambda i, v: fn(v) * 0.999, v)

        cj = jax.jit(chained)
        fence = lambda a: float(a.ravel()[0])
        for n in (n_small, n_big):
            fence(cj(v0, n))
        times = {}
        for n, pert in ((n_small, 1e-6), (n_big, 2e-6)):
            vp = v0 * (1.0 + pert)
            fence(vp)
            tic = time.perf_counter()
            fence(cj(vp, n))
            times[n] = time.perf_counter() - tic
        us = (times[n_big] - times[n_small]) / (n_big - n_small) * 1e6
        print("  %-36s %8.1f us/apply" % (tag, us), flush=True)
        return us

    print("full step (fused multistep):", flush=True)
    base = NumericsOptions()
    if args.ksp_iters is not None:
        import dataclasses

        base = dataclasses.replace(base, ksp_iters=args.ksp_iters)
    slope_step(base, "default (iters=%d)" % base.ksp_iters)
    import dataclasses

    slope_step(dataclasses.replace(base, ksp_iters=1), "iters=1 (intercept)")
    slope_step(
        dataclasses.replace(base, stage_delta=False), "no stage_delta"
    )

    print("components:", flush=True)
    nf = ops.nligands + 1
    means = [jnp.mean(u[i]) for i in range(nf)]
    dG0 = ops._dG_fns[0](*[u[i] for i in range(nf)], 0.0)
    rho_diff = jnp.max(u[0] * dG0)
    v0 = (u * 1e-3).astype(jnp.float32)
    pc = BlockSpectralPreconditioner(grid, ops, compute_dtype="float32")
    slope_apply(
        lambda v: pc.apply_linearized(v, 2.29, 0.0, means, rho_diff=rho_diff),
        v0, "block pc apply f32",
    )

    from ksfd_tpu.ops.pallas_stencil import (
        make_pallas_kernels,
        pallas_available,
    )

    if pallas_available(grid, ops):
        kern = make_pallas_kernels(ops)
        u32 = u.astype(jnp.float32)
        t32 = jnp.float32(0.0)
        s32 = jnp.float32(2.29)
        slope_apply(lambda v: kern.jvp(u32, v, t32), v0, "pallas jvp (W)")
        if getattr(kern, "resid", None) is not None:
            slope_apply(
                lambda v: kern.resid(u32, v, v0, t32, s32), v0,
                "pallas resid (b - W x)",
            )
        if kern.delta is not None:
            slope_apply(
                lambda v: kern.delta(
                    u, v.astype(u.dtype), u + v.astype(u.dtype), 0.0
                ).astype(jnp.float32),
                v0, "pallas delta (stage RHS incr)",
            )
    slope_apply(
        lambda v: (v + ops.rhs(u + v.astype(u.dtype), 0.0).astype(jnp.float32)),
        v0, "f64 RHS (XLA)",
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
