#!/usr/bin/env python3
"""Measure the fused Pallas block-pc apply against the einsum apply.

The measurement record behind ops/pallas_pc.py (VERDICT r3 #1): the
einsum apply's 4 GEMM HBM round trips measured ~117-122 us at
1024^2x3 on v5e against a ~65 us MXU floor; the fused kernels keep the
half-transformed intermediates in VMEM.  Timing discipline per
CLAUDE.md: chained applies inside one jit, host-transfer fence, slope
over two chain lengths, perturbed inputs.

Usage: python tools/probe_pc_kernel.py [--nx 1024]
"""

import argparse
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=None)
    args = ap.parse_args(argv)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)

    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from ksfd_tpu.solvers.linalg import BlockSpectralPreconditioner
    from ksfd_tpu.ops.pallas_pc import (
        make_pallas_block_pc,
        pallas_pc_available,
        pack_pc_scalars,
    )

    platform = jax.devices()[0].platform
    nx = args.nx or (1024 if platform != "cpu" else 256)
    ps, grid, ops = ge._make_problem(nx, nx)
    print("platform=%s grid=%dx%d" % (platform, nx, nx), flush=True)
    assert pallas_pc_available(grid, ops)

    rng = np.random.default_rng(0)
    u = jnp.asarray(
        np.stack([
            9000 + 100 * rng.standard_normal(grid.Sshape)
            for _ in range(3)
        ])
    )
    v0 = jnp.asarray(
        rng.standard_normal((3,) + tuple(grid.Sshape)),
        dtype=jnp.float32,
    )
    t = 0.0
    shift = 2.29
    means = [jnp.mean(u[i]) for i in range(3)]
    dG0 = ops._dG_fns[0](*[u[i] for i in range(3)], t)
    rho_diff = jnp.max(u[0] * dG0)

    pc = BlockSpectralPreconditioner(grid, ops, compute_dtype="float32")
    fused = make_pallas_block_pc(grid, ops)
    sc = pack_pc_scalars(ops, shift, t, means, rho_diff)

    want = np.asarray(
        pc.apply_linearized(v0, shift, t, means, rho_diff=rho_diff)
    )
    got = np.asarray(fused(sc, v0))
    dev = np.max(np.abs(got - want)) / np.max(np.abs(want))
    print("rel dev fused vs einsum: %.3e" % dev, flush=True)

    def slope_apply(fn, tag, n_small=50, n_big=450, repeats=5):
        """min-over-repeats slope: the tunnel's ~0.7 s fixed dispatch
        cost carries run-to-run weather larger than a short chain's
        compute, so each length takes the min of several samples and
        the chains are long enough that the work dominates the noise
        band (bench.py discipline)."""

        def chained(v, n):
            return jax.lax.fori_loop(
                0, n, lambda i, vv: fn(vv) * 0.999, v
            )

        cj = jax.jit(chained)
        fence = lambda a: float(a.ravel()[0])
        for n in (n_small, n_big):
            fence(cj(v0, n))
        times = {n_small: [], n_big: []}
        for rep in range(repeats):
            for n in (n_small, n_big):
                vp = v0 * (1.0 + 1e-6 * (1 + rep) * (1 + (n == n_big)))
                fence(vp)
                tic = time.perf_counter()
                fence(cj(vp, n))
                times[n].append(time.perf_counter() - tic)
        us = (min(times[n_big]) - min(times[n_small])) / (
            n_big - n_small
        ) * 1e6
        print("  %-32s %8.1f us/apply" % (tag, us), flush=True)
        return us

    slope_apply(
        lambda v: pc.apply_linearized(
            v, shift, t, means, rho_diff=rho_diff
        ),
        "einsum apply",
    )
    slope_apply(lambda v: fused(sc, v), "fused apply")
    slope_apply(
        lambda v: fused.fwd(sc, v).astype(jnp.float32),
        "fused fwd+mode only",
    )
    slope_apply(lambda v: fused.inv(v), "fused inv only")
    pcb = BlockSpectralPreconditioner(
        grid, ops, compute_dtype="bfloat16"
    )
    gotb = np.asarray(
        pcb.apply_linearized(v0, shift, t, means, rho_diff=rho_diff)
    )
    devb = np.max(np.abs(gotb - want)) / np.max(np.abs(want))
    print("rel dev bf16-interm vs f32 einsum: %.3e" % devb, flush=True)
    slope_apply(
        lambda v: pcb.apply_linearized(
            v, shift, t, means, rho_diff=rho_diff
        ),
        "einsum apply bf16 interm",
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
