#!/usr/bin/env python3
"""Real-Mosaic smoke of the SHARDED kernel build (VERDICT r4 #7).

The sharded-kernel tests and the MULTICHIP gate run under
KSFD_PALLAS_INTERPRET=1 (virtual CPU mesh), so the shard_map +
ppermute + pallas_call composition never lowers through the REAL
Mosaic compiler anywhere — and r4 proved interpret mode can pass
where the hardware prover rejects (the lane-offset class, commit
1b9ec07).  This script builds the f64 mixed step over a mesh of ONE
real TPU device ({'x': 1}; the ppermute ring is degenerate but the
kernels still lower through shard_map -> Mosaic) and executes it.

Run on the tunnel:  python tools/smoke_sharded_mosaic.py
"""
import os
import sys

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)
sys.path.insert(0, os.path.join(here, "tests"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from ksfd_tpu import NumericsOptions
    from ksfd_tpu.parallel import distribute, grid_mesh
    from ksfd_tpu.solvers import make_step_fn
    from ksfd_tpu.solvers.solver import BUILD_INFO

    assert os.environ.get("KSFD_PALLAS_INTERPRET", "0") != "1", (
        "unset KSFD_PALLAS_INTERPRET: this smoke exists to exercise "
        "REAL Mosaic"
    )
    platform = jax.devices()[0].platform
    print("platform:", platform)
    ps, grid, ops = ge._make_problem(256, 256)
    mesh = grid_mesh(grid, devices=jax.devices()[:1], shape=(1, 1))
    step, _ = make_step_fn(
        ops, NumericsOptions(), atol=0.01, rtol=1e-6, mesh=mesh
    )
    info = dict(BUILD_INFO)
    assert info["pallas_delta"] and info["pallas_jvp"] and (
        info["pallas_resid"]
    ), ("sharded kernels did not engage", info)
    u0 = jnp.asarray(ge._initial_state(grid))
    u_sh, _ = distribute(u0, grid, mesh=mesh)
    u1, enorm = step(u_sh, jnp.asarray(0.0), jnp.asarray(0.5))
    enorm = float(enorm)
    assert np.isfinite(enorm), enorm
    # oracle: the unsharded build of the same step
    step0, _ = make_step_fn(
        ops, NumericsOptions(), atol=0.01, rtol=1e-6,
        unsharded_ok=True,
    )
    u1r, enr = step0(u0, jnp.asarray(0.0), jnp.asarray(0.5))
    inc = float(jnp.max(jnp.abs(u1r - u0)))
    dev = float(jnp.max(jnp.abs(u1 - u1r)))
    print(
        "sharded-mosaic smoke OK: mesh {'x': 1} enorm=%.4g "
        "dev/inc=%.3g (pc %s)" % (enorm, dev / inc, info["pc_dtype"])
    )
    assert dev / inc < 1e-4, (dev, inc)
    return 0


if __name__ == "__main__":
    sys.exit(main())
