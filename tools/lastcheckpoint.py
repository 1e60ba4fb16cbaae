#!/usr/bin/env python3
"""Print the prefix of the newest checkpoint of a run.

Globs '<prefix><k>_s<size>r<rank>.h5' files and prints the prefix of
the max-k checkpoint, for scripted resume pipelines.  Reference
parity: /root/reference/lastcheckpoint.py.

Usage:
    python tools/lastcheckpoint.py checks/run_
    python tools/lastcheckpoint.py --gather checks/run_   # '@' syntax
"""

import argparse
import glob
import os
import re
import sys


def last_checkpoint(prefix):
    """Checkpoint k of --check=<prefix> lives at '<prefix>_<k>_...'.

    Zip-mode runs (--check=<prefix>.zip) archive every checkpoint file
    into '<prefix>s<size>r<rank>.zip'; those are scanned by member
    name.
    """
    pat = re.compile(
        re.escape(os.path.basename(prefix)) + r"_(\d+)_s\d+r\d+\.h5$"
    )
    best = None
    for f in glob.glob(prefix + "_*_s*r*.h5"):
        m = pat.fullmatch(os.path.basename(f))
        if m:
            k = int(m.group(1))
            if best is None or k > best:
                best = k
    import zipfile

    for zf in glob.glob(prefix + "s*r*.zip"):
        try:
            names = zipfile.ZipFile(zf).namelist()
        except (OSError, zipfile.BadZipFile):
            continue
        for name in names:
            m = pat.fullmatch(os.path.basename(name))
            if m:
                k = int(m.group(1))
                if best is None or k > best:
                    best = k
    if best is None:
        return None
    return prefix + "_" + str(best) + "_"


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="find the last checkpoint of a run"
    )
    parser.add_argument("--gather", action="store_true",
                        help="print in '@' gather syntax")
    parser.add_argument("prefix", help="checkpoint prefix (--check value)")
    args = parser.parse_args(argv)
    result = last_checkpoint(args.prefix)
    if result is None:
        print("no checkpoints found for " + args.prefix, file=sys.stderr)
        return 1
    print(result + "@" if args.gather else result)
    return 0


if __name__ == "__main__":
    sys.exit(main())
