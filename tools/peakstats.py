#!/usr/bin/env python3
"""Peak/aggregate statistics over saved series (ensemble analysis).

The reference's pattern-formation claims are statements about counts
of aggregates: options80 "evolves toward 5 sharp peaks"
(/root/reference/options80:6-7), hexagons2d-class runs form a
hexagonal spot lattice.  Those counts are SEED-DEPENDENT — the IC is
a random perturbation — so parity with the reference is a
distributional statement, checked here: run `ksfdsolver.py
--ensemble=N`, then

    python tools/peakstats.py solutions/ens_m@          # 1D or 2D
    python tools/peakstats.py solutions/one_run         # single series

prints one line per member (peak count, rho range) and the count
distribution.  A trailing '@' expands to every member series
'<prefix><i>' (the --ensemble naming '<save>_m<i>').

Counting rule: connected components of {rho >= thresh} on the
periodic grid, thresh = murho + frac*(max rho - murho) with murho the
spatial mean and frac=0.5 by default — robust for the saturated-peak
states these workloads end in (peaks ~3x the mean, troughs ~0); a
component must also contain a strict local maximum.  1D uses periodic
run-length components; 2D/3D uses scipy.ndimage.label with a periodic
wrap merge.
"""

import argparse
import glob
import os
import re
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
os.environ.setdefault("KSFD_PLATFORM", "cpu")


def count_peaks_1d(rho, frac=0.5):
    """Connected runs of {rho >= thresh} on a periodic 1D grid."""
    mu = float(np.mean(rho))
    thresh = mu + frac * (float(np.max(rho)) - mu)
    mask = np.asarray(rho) >= thresh
    if mask.all():
        return 1
    if not mask.any():
        return 0
    # rotate so index 0 is outside a run, then count run starts
    off = int(np.argmin(mask))
    m = np.roll(mask, -off)
    starts = np.sum(m[1:] & ~m[:-1]) + int(m[0])
    return int(starts)


def count_peaks_nd(rho, frac=0.5):
    """Connected components of {rho >= thresh}, periodic wrap merged."""
    from scipy import ndimage

    rho = np.asarray(rho)
    if rho.ndim == 1:
        return count_peaks_1d(rho, frac)
    mu = float(np.mean(rho))
    thresh = mu + frac * (float(np.max(rho)) - mu)
    mask = rho >= thresh
    lab, n = ndimage.label(mask)
    if n == 0:
        return 0
    # merge labels that touch across each periodic boundary
    parent = list(range(n + 1))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    for ax in range(rho.ndim):
        lo = np.take(lab, 0, axis=ax).ravel()
        hi = np.take(lab, -1, axis=ax).ravel()
        for a, b in zip(lo, hi):
            if a and b:
                union(int(a), int(b))
    return len({find(i) for i in range(1, n + 1)})


def member_series(prefix):
    """Expand 'prefix@' to sorted member prefixes, else [prefix]."""
    if not prefix.endswith("@"):
        return [prefix]
    base = prefix[:-1]
    found = []
    for fn in glob.glob(base + "*s*r0.h5"):
        m = re.fullmatch(re.escape(base) + r"(\d+)s\d+r0\.h5", fn)
        if m:
            found.append((int(m[1]), base + m[1]))
    return [p for _, p in sorted(found)]


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="peak-count statistics over saved series"
    )
    ap.add_argument("prefix",
                    help="series prefix; trailing '@' = every member "
                         "'<prefix><i>' (ensemble naming '<save>_m@')")
    ap.add_argument("--frac", type=float, default=0.5,
                    help="threshold fraction of (max-mean) above the "
                         "mean (default 0.5)")
    ap.add_argument("-t", "--time", type=float, default=None,
                    help="analysis time (default: last saved)")
    args = ap.parse_args(argv)

    from ksfd_tpu.io.solution import Solution

    prefixes = member_series(args.prefix)
    if not prefixes:
        print("no series match %r" % args.prefix, file=sys.stderr)
        return 1
    counts = []
    for p in prefixes:
        s = Solution(p)
        t = args.time if args.time is not None else s.tstimes[-1]
        frame = np.asarray(s.images(t))
        s.close()
        rho = frame[0]
        c = count_peaks_nd(rho, args.frac)
        counts.append(c)
        print(
            "%-40s t=%-10g peaks=%-3d rho=[%.4g, %.4g]"
            % (os.path.basename(p), t, c,
               float(rho.min()), float(rho.max()))
        )
    if len(counts) > 1:
        vals, freq = np.unique(counts, return_counts=True)
        dist = ", ".join(
            "%d peaks x%d" % (v, f) for v, f in zip(vals, freq)
        )
        print(
            "members=%d  distribution: %s  (min %d, max %d)"
            % (len(counts), dist, min(counts), max(counts))
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
