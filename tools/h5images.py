#!/usr/bin/env python3
"""Dump per-frame field arrays + parameter values to an HDF5 file.

Reference parity: /root/reference/h5images.py — for downstream
analysis in other tools (e.g. Mathematica), writes datasets
'images<n>' with attrs t and a JSON params string.

    python tools/h5images.py -n 100 solutions/run1 run1_images.h5
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import h5py

from ksfd_tpu.io.solution import Solution  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser(description="dump solution images")
    parser.add_argument("-n", "--nframes", type=int, default=100)
    parser.add_argument("--steps", action="store_true",
                        help="use stored steps instead of interpolation")
    parser.add_argument("-s", "--start", type=float, default=None)
    parser.add_argument("-e", "--end", type=float, default=None)
    parser.add_argument("prefix")
    parser.add_argument("outfile")
    args = parser.parse_args(argv)
    soln = Solution(args.prefix)
    t0 = args.start if args.start is not None else soln.tmin
    t1 = args.end if args.end is not None else soln.tmax
    if args.steps:
        times = [t for t in soln.tstimes if t0 <= t <= t1]
    else:
        times = np.linspace(t0, t1, args.nframes)
    with h5py.File(args.outfile, "w") as out:
        out["times"] = np.asarray(times, dtype=float)
        out["coords"] = np.asarray(soln.grid.coords)
        for n, t in enumerate(times):
            ims = soln.images(t)
            ds = out.create_dataset("images%d" % n, data=np.asarray(ims))
            ds.attrs["t"] = t
            if soln.ps is not None:
                vals = soln.ps.values(t)
                ds.attrs["params"] = json.dumps(
                    {k: v for k, v in vals.items()
                     if isinstance(v, (int, float, bool))}
                )
    soln.close()
    print(args.outfile)
    return 0


if __name__ == "__main__":
    sys.exit(main())
