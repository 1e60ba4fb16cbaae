#!/usr/bin/env python3
"""Render frames of a stored solution (1D curves / 2D images).

Reference parity: /root/reference/moviemaker1.py — reads a Solution,
plots rho and each ligand at a series of times (interpolated with -n,
or the actual stored steps with --steps), labels frames with evaluated
parameters, writes numbered PNGs ready for ffmpeg:

    python tools/moviemaker.py -n 100 solutions/run1 frames/run1
    ffmpeg -r 10 -i frames/run1%04d.png movie.mp4
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ksfd_tpu.io.solution import Solution  # noqa: E402


def field_names(soln):
    names = ["rho"]
    if soln.ps is not None:
        names += [lig.name() for lig in soln.ps.Vgroups.ligands()]
    else:
        names += ["U%d" % i for i in range(1, soln.grid.dof)]
    return names


def plot_frame(soln, t, names, label_params=()):
    ims = soln.images(t)
    grid = soln.grid
    fig, axes = plt.subplots(
        len(names), 1, figsize=(8, 2.5 * len(names)), squeeze=False
    )
    title = "t = %.6g" % t
    if label_params and soln.ps is not None:
        vals = soln.ps.values(t)
        title += "  " + ", ".join(
            "%s=%.4g" % (p, vals[p]) for p in label_params if p in vals
        )
    fig.suptitle(title)
    for i, name in enumerate(names):
        ax = axes[i][0]
        if grid.dim == 1:
            x = grid.axis_coords(0)
            ax.plot(x, ims[i])
            ax.set_ylabel(name)
        else:
            im = ax.imshow(
                ims[i].T if grid.dim == 2 else ims[i][..., 0].T,
                origin="lower",
                extent=[0, grid.width, 0, grid.height],
                aspect="auto",
            )
            fig.colorbar(im, ax=ax)
            ax.set_ylabel(name)
    return fig


def main(argv=None):
    parser = argparse.ArgumentParser(description="render solution frames")
    parser.add_argument("-n", "--nframes", type=int, default=100,
                        help="number of interpolated frames")
    parser.add_argument("--steps", action="store_true",
                        help="use stored steps instead of interpolation")
    parser.add_argument("-p", "--param", action="append", default=[],
                        help="parameter names to print on each frame")
    parser.add_argument("--start", type=float, default=None)
    parser.add_argument("--end", type=float, default=None)
    parser.add_argument("prefix", help="solution prefix (--save value)")
    parser.add_argument("frameprefix", help="output PNG prefix")
    args = parser.parse_args(argv)
    soln = Solution(args.prefix)
    t0 = args.start if args.start is not None else soln.tmin
    t1 = args.end if args.end is not None else soln.tmax
    if args.steps:
        times = [t for t in soln.tstimes if t0 <= t <= t1]
    else:
        times = np.linspace(t0, t1, args.nframes)
    names = field_names(soln)
    outdir = os.path.dirname(args.frameprefix)
    if outdir:
        os.makedirs(outdir, exist_ok=True)
    for fnum, t in enumerate(times):
        fig = plot_frame(soln, t, names, label_params=args.param)
        fname = "{p}{n:04d}.png".format(p=args.frameprefix, n=fnum)
        fig.savefig(fname, dpi=100)
        plt.close(fig)
        print(fname)
    soln.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
