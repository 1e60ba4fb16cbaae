"""Solution: offline reader API for a stored run.

Reference parity: Solution in KSFD/ksfdsoln.py:349-431 — open by
prefix, reconstruct the full problem (command line, parameters,
sources, operators) from the file's '/info' metadata, and retrieve
interpolated snapshots with images(t).
"""

import collections
import os

from ..utils.debug import logger
from ..utils.exceptions import KSFDException
from .timeseries import TimeSeries
from .monitors import pickleunp

logMAIN = logger("MAIN")

__all__ = ["Solution"]


class Solution:
    def __init__(self, prefix):
        """Open a stored solution.

        prefix: the --save prefix the run was stored under.
        """
        prefix = os.path.expandvars(os.path.expanduser(prefix))
        self.prefix = prefix
        self.timeSeries = TimeSeries(prefix, mode="r")
        self.grid = self.timeSeries.grid
        info = self.timeSeries.info
        self.commandlineArguments = (
            pickleunp(info["commandlineArguments"][()])
            if "commandlineArguments" in info else None
        )
        self.solutionParameters = (
            pickleunp(info["SolutionParameters"][()])
            if "SolutionParameters" in info else None
        )
        self.sources = (
            pickleunp(info["sources"][()]) if "sources" in info else None
        )
        self.tstimes = self.timeSeries.sorted_times()
        if len(self.tstimes) == 0:
            # a run that crashed before its first monitor write leaves
            # a valid file with /info but no snapshots
            self.timeSeries.close()
            raise KSFDException(
                "series {p} contains no snapshots".format(p=prefix)
            )
        self.tmin, self.tmax = self.tstimes[0], self.tstimes[-1]
        self._derivatives = None

    @property
    def ps(self):
        return self.solutionParameters

    @property
    def tseries(self):
        return self.timeSeries

    @property
    def clargs(self):
        return self.commandlineArguments

    @property
    def derivatives(self):
        """PDEOperators rebuilt from the stored problem (lazy)."""
        if self._derivatives is None and self.solutionParameters is not None:
            ps = self.solutionParameters
            if self.grid.dof == ps.nligands + 2:
                # with-G run: trailing G field in the stored state
                from ..ops import WithGOperators

                self._derivatives = WithGOperators(
                    ps, self.grid, sources=self.sources
                )
            else:
                from ..ops import PDEOperators

                self._derivatives = PDEOperators(
                    ps, self.grid, sources=self.sources
                )
        return self._derivatives

    derivs = derivatives

    @property
    def ligands(self):
        return self.ps.Vgroups.ligands()

    def params(self, t):
        """All parameter values at time t."""
        return collections.OrderedDict(self.ps.values(t))

    def load(self, t):
        self.vec = self.tseries.retrieve_by_time(t)
        return self.vec

    def images(self, t=None):
        """Full field array at time t (linear interpolation)."""
        if t is None:
            t = self.tmax
        self.ims = self.load(t)
        assert self.ims.shape == self.grid.Vshape
        return self.ims

    def close(self):
        self.timeSeries.close()
