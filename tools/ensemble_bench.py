#!/usr/bin/env python3
"""Ensemble throughput benchmark: N members as ONE vmapped program.

Measures ms per ensemble step (every member advances one fixed-dt
implicit ROS34PW2 step) and aggregate DOF-updates/sec on the current
backend, one JSON line per member count.  Timing follows bench.py's
honest-tunnel discipline: perturbed inputs per timed call (outputs
asserted to differ from warmup), host-pull fences, and slope timing
over two chained execution lengths so fixed per-dispatch costs cancel.

--no-pallas forces the XLA step for an apples-to-apples read on the
member-batched Mosaic kernels (docs/PERF.md "Ensemble batching"); the
default path exercises the jax.custom_batching rules that swap in the
member-batched Pallas kernel builds under vmap.
"""

import argparse
import dataclasses
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=256)
    ap.add_argument("--members", default="1,4,8,16",
                    help="comma-separated member counts")
    ap.add_argument("--steps", type=int, default=24,
                    help="timed chained steps (after warmup)")
    ap.add_argument("--repeats", type=int, default=3,
                    help="timed repeats per chain length (min taken)")
    ap.add_argument("--dt", type=float, default=1.0)
    ap.add_argument("--no-pallas", action="store_true",
                    help="force the XLA step (comparison tier)")
    args = ap.parse_args(argv)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    sys.path.insert(0, os.path.join(here, "tests"))
    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from ksfd_tpu import NumericsOptions
    from ksfd_tpu.solvers import make_multistep_fn

    nm = NumericsOptions()
    if args.no_pallas:
        nm = dataclasses.replace(nm, use_pallas=False)
    ps, grid, ops = ge._make_problem(args.nx, args.nx)
    multi, _ = make_multistep_fn(ops, nm, atol=0.01, rtol=1e-6)
    vmulti = jax.jit(
        jax.vmap(multi, in_axes=(0, 0, 0, None)), static_argnums=3
    )
    base = np.asarray(ge._initial_state(grid))
    platform = jax.devices()[0].platform
    n_small, n_big = 2, args.steps + 2

    def fence(arr, e):
        # host transfer derived from the result: the only reliable
        # completion fence on the axon tunnel (CLAUDE.md)
        return float(np.asarray(arr).ravel()[0]) + float(
            np.asarray(e).ravel()[0]
        )

    for N in [int(x) for x in args.members.split(",")]:
        rng = np.random.default_rng(0)
        U0 = jnp.asarray(
            np.stack(
                [
                    base * (1.0 + 1e-4 * rng.standard_normal(base.shape))
                    for _ in range(N)
                ]
            )
        )
        ts = jnp.zeros(N)
        hs = jnp.full(N, args.dt)
        uw = {}
        for nst in (n_small, n_big):  # compile loops AND fence gather
            u1, _, e1 = vmulti(U0, ts, hs, nst)
            fence(u1, e1)
            uw[nst] = u1
        # min over repeats per chain length: single-sample slopes are
        # swamped by tunnel run-to-run noise (negative slopes observed
        # at members=8/16 in the r2 unattended validation run)
        times = {n_small: [], n_big: []}
        for rep in range(args.repeats):
            for nst in (n_small, n_big):
                up = U0 * (1.0 + 1e-9 * (1 + rep + (nst == n_big)))
                fence(up, jnp.zeros(N))
                t0 = time.perf_counter()
                u1, _, e1 = vmulti(up, ts, hs, nst)
                fence(u1, e1)
                times[nst].append(time.perf_counter() - t0)
                assert not bool(jnp.array_equal(u1, uw[nst])), (
                    "timed output identical to warmup - dedupe suspected"
                )
                assert np.isfinite(np.asarray(e1)).all(), "step diverged"
        step_time = (min(times[n_big]) - min(times[n_small])) / (
            n_big - n_small
        )
        if step_time <= 0:
            print(
                json.dumps({"members": N, "note": "nonpositive slope",
                            "times_s": times}),
                flush=True,
            )
            continue
        print(
            json.dumps(
                {
                    "platform": platform,
                    "nx": args.nx,
                    "members": N,
                    "pallas": not args.no_pallas,
                    "ms_per_ensemble_step": round(step_time * 1e3, 3),
                    "per_member_ms": round(step_time * 1e3 / N, 3),
                    "aggregate_dof_per_s": round(
                        N * grid.n_dofs / step_time, 1
                    ),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
