"""Solver monitors that persist state: save series and checkpoints.

Reference parity: makeSaveMonitor and checkpointMonitor
(KSFD/ksfdts.py:370-497).  Both store the dilled problem description
in '/info' (here: stdlib pickle -> uint8 array, see ``picklenp``) plus
dt and lastvart; our checkpoints additionally carry '/solver_state'
(step counter + JAX PRNG key) for bit-exact resume.
"""

import os
import pickle
import zipfile

import numpy as np

from ..utils.debug import logger
from .timeseries import TimeSeries

logSERIES = logger("SERIES")

__all__ = [
    "picklenp",
    "pickleunp",
    "make_save_monitor",
    "make_checkpoint_monitor",
    "write_info",
    "snapshot_block",
]


def picklenp(obj):
    """Pickle an object into a uint8 ndarray (HDF5-storable).

    The analog of the reference's dillnp (KSFD/ksfdtsmaker.py:10-29).
    """
    return np.frombuffer(pickle.dumps(obj), dtype=np.uint8)


def pickleunp(arr):
    return pickle.loads(np.asarray(arr).tobytes())


def snapshot_block(u, ranges):
    """The block of state ``u`` that a TimeSeries expects, as numpy.

    ranges None -> the full array.  For a slab series, extract the
    block — from local shards only when ``u`` is a multi-process
    global array (no cross-process gather), by plain slicing otherwise.
    """
    if ranges is None:
        return np.asarray(u)
    try:
        fully_addressable = u.is_fully_addressable
    except AttributeError:
        fully_addressable = True
    if not fully_addressable:
        from ..parallel.distributed import local_values

        return local_values(u, ranges)
    slc = (slice(None),) + tuple(slice(lo, hi) for lo, hi in ranges)
    return np.asarray(u[slc])


def write_info(tseries, clargs=None, ps=None, sources=None):
    """Store the problem description in /info (reference names)."""
    if clargs is not None:
        tseries.try_to_set("/info/commandlineArguments", picklenp(clargs))
    if ps is not None:
        tseries.try_to_set("/info/SolutionParameters", picklenp(ps))
    if sources is not None:
        tseries.try_to_set("/info/sources", picklenp(sources))


def make_save_monitor(tseries, every=1):
    """(monitor, closer) writing accepted steps into ``tseries``.

    The file is reopened and temp-closed around every write so an
    abort never leaves it corrupt (KSFD/ksfdts.py:481-496).

    every: minimum step-count spacing between snapshots (default 1 =
    every accepted step, the reference's behavior).  Large production
    runs (10^5 small steps at 1536^2 write ~56 MB/snapshot) thin the
    series with --save_every; the driver forces a final write after
    the loop so the last state is always on disk, and writes are
    k-deduplicated so the forced call never duplicates a snapshot.
    """
    every = max(1, int(every))
    last_saved = {"k": None}

    def save_monitor(solver, k, t, u, force=False):
        if last_saved["k"] == k:
            return
        if (
            not force
            and last_saved["k"] is not None
            and k - last_saved["k"] < every
        ):
            return
        if not tseries.tsFile:
            tseries.reopen()
        tseries.store(snapshot_block(u, tseries.ranges), t, k=k)
        tseries.save_solver_state(
            t=t,
            dt=solver.h,
            lastvart=solver.lastvart,
            rng_key=solver.rng_key,
            k=k,
        )
        tseries.temp_close()
        # marked only after the write lands: a failed store must not
        # block the driver's forced final-save retry for the same k
        last_saved["k"] = k

    def close_save_monitor():
        pass  # creator owns the TimeSeries

    return save_monitor, close_save_monitor


def make_checkpoint_monitor(prefix, grid, clargs=None, ps=None, sources=None,
                            retries=0, retry_interval=60,
                            size=1, rank=0, ranges=None):
    """Monitor writing a standalone one-snapshot TimeSeries per step.

    Checkpoint k is named '<prefix>_<k>_'.  If ``prefix`` ends with
    '.zip' each checkpoint file is appended to a per-process zip
    archive and removed (KSFD/ksfdts.py:370-452).  In a multi-process
    run pass size/rank/ranges so each process archives its own slab.
    """
    zipit = prefix.endswith(".zip")
    realpfx = prefix[:-4] if zipit else prefix

    def checkpoint_monitor(solver, k, t, u):
        cpname = realpfx + "_" + str(k) + "_"
        cpf = TimeSeries(
            cpname, grid=grid, mode="w",
            retries=retries, retry_interval=retry_interval,
            size=size, rank=rank, ranges=ranges,
        )
        write_info(cpf, clargs=clargs, ps=ps, sources=sources)
        cpf.save_solver_state(
            t=t, dt=solver.h, lastvart=solver.lastvart,
            rng_key=solver.rng_key, k=k,
        )
        cpf.store(snapshot_block(u, ranges), t, k=k)
        cpfname = cpf.filename
        cpf.close()
        if zipit:
            zfname = "{p}s{s}r{r}.zip".format(p=realpfx, s=size, r=rank)
            zfmode = "w" if k == 0 else "a"
            try:
                zf = zipfile.ZipFile(
                    zfname, mode=zfmode, compression=zipfile.ZIP_DEFLATED
                )
            except RuntimeError:
                zf = zipfile.ZipFile(
                    zfname, mode=zfmode, compression=zipfile.ZIP_STORED
                )
            with zf:
                zf.write(cpfname, arcname=os.path.basename(cpfname))
            try:
                os.remove(cpfname)
            except OSError:
                pass

    return checkpoint_monitor
