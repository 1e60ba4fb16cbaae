"""Ligand groups: the chemical-signal model of the Keller-Segel system.

Model semantics (reference: KSFD/ksfdligand.py:256-747):

Ligands are organized into groups.  Group ``g`` contributes

    V_g = -beta_g * log(alpha_g + sum_l weight_{g,l} * U_{g,l})

to the potential; the total signal potential is the sum over groups.
Separating ligands into groups lets a repellent be expressed with a
negative ``beta`` without risking a negative log argument.

Each ligand also carries a secretion rate ``s``, a decay rate
``gamma``, and a diffusion constant ``D``; its PDE is

    dU/dt = -gamma*U + s*rho + D*laplacian(U).

A ligand with ``series=n > 1`` is expanded into ``n`` Fourier
components in the depth direction (diffusion of the ligand into the
agar substrate): component i gets gamma += D*(pi*i/depth)**2 and s/n
secretion, with an optional steady-state total-concentration
adjustment.  (Reference: KSFD/ksfdligand.py:315-388.)
"""

import collections
import copy
import itertools

import sympy as sy

from ..utils.exceptions import KSFDException
from ..utils.params import Parameter, ParameterList
from ..utils.symbolic import safe_sympify

__all__ = ["Ligand", "LigandGroup", "LigandGroups"]


class Ligand(collections.OrderedDict):
    """Dict of ligand attributes, accessible as attributes."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as err:
            raise AttributeError(err)

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError as err:
            raise AttributeError(err)

    def name(self):
        """The ligand's field name, always ``U_<group>_<ligand>``."""
        return "U_%d_%d" % (self.groupnum, self.ligandnum)

    def params(self):
        """[(key, Parameter, default, help)] for this ligand.

        Keys have the form ``<name>_<group>_<ligand>``.
        """
        ps = []
        for name, d, h in LigandGroups.default_ligand_parameters:
            key = "%s_%d_%d" % (name, self.groupnum, self.ligandnum)

            def getter(name=name, lig=self):
                return lig[name]

            def setter(value, name=name, lig=self):
                lig[name] = value

            hstr = h.format(group=self.groupnum, ligand=self.ligandnum)
            ps.append((key, Parameter(getter, setter), d, hstr))
        return ps

    def fourier_series(self, adjust=True):
        """Expand this ligand into its depth-Fourier components.

        Returns a list of ``round(self.series)`` ligands (or [self-like]
        when series is absent/1).  Component i models the
        cos(i*pi*z/depth) depth mode: it decays faster by
        D*(pi*i/depth)**2 and is secreted at rate s/series.  With
        ``adjust``, all component secretion rates are rescaled so the
        local-steady-state total matches the unexpanded ligand's
        s/gamma.
        """
        try:
            n = round(self.series)
        except AttributeError:
            n = 1
        ligs = []
        for i in range(n):
            ligi = copy.deepcopy(self)
            ligi.fourier_term = i
            try:
                ligi.s /= n
                ligi.weight /= n
                ligi.omega = sy.pi * i / ligi.depth
                ligi.gamma += ligi.D * ligi.omega**2
            except AttributeError:
                pass  # fail gracefully if attributes are missing
            ligs.append(ligi)
        if adjust:
            single_ss = self.s / self.gamma
            series_ss = sum(lig.s / lig.gamma for lig in ligs)
            for lig in ligs:
                lig.s *= single_ss / series_ss
        return ligs


class LigandGroup:
    """One group of ligands sharing a log-potential."""

    def __init__(self, groupnum=1, nligands=0):
        self.groupnum = groupnum
        self.nligands = nligands
        self.ligands = []
        for i in range(1, nligands + 1):
            lig = Ligand(
                {n: d for n, d, h in LigandGroups.default_ligand_parameters}
            )
            lig.groupnum = groupnum
            lig.ligandnum = i
            lig.nligands = nligands
            self.ligands.append(lig)
        for n, d, h in LigandGroups.default_group_parameters:
            setattr(self, n, d)
        self.blank = True

    # alpha/beta setters propagate to the member ligands so that
    # per-ligand parameter listings stay consistent.
    @property
    def alpha(self):
        return self._alpha

    @alpha.setter
    def alpha(self, alpha):
        self._alpha = alpha
        for lig in self.ligands:
            lig.alpha = alpha

    @property
    def beta(self):
        return self._beta

    @beta.setter
    def beta(self, beta):
        self._beta = beta
        for lig in self.ligands:
            lig.beta = beta

    def params(self):
        ps = []
        for name, d, h in LigandGroups.default_group_parameters:
            key = "%s_%d" % (name, self.groupnum)

            def getter(name=name, group=self):
                return getattr(group, name)

            def setter(value, name=name, group=self):
                setattr(group, name, value)

            ps.append((key, Parameter(getter, setter), d, h.format(group=self.groupnum)))
        for lig in self.ligands:
            ps += lig.params()
        return ps

    def collect(self, gvals, name, groupnum=None):
        """Fill per-ligand parameter ``name`` from [(group, value)] pairs."""
        if groupnum is None:
            groupnum = self.groupnum
        else:
            if (not self.blank) and groupnum != self.groupnum:
                raise KSFDException(
                    "inconsistent group numbers %d and %d"
                    % (self.groupnum, groupnum)
                )
            self.groupnum = groupnum
        vals = [v for g, v in gvals if int(g) == groupnum]
        if self.blank:
            self.nligands = len(vals)
            self.ligands = []
            for i in range(self.nligands):
                lig = Ligand(
                    {n: d for n, d, h in
                     LigandGroups.default_ligand_parameters}
                )
                lig.groupnum = groupnum
                lig.ligandnum = i + 1
                lig.nligands = self.nligands
                for p in LigandGroups.group_defaults:
                    if hasattr(self, p):
                        lig[p] = getattr(self, p)
                self.ligands.append(lig)
        for i, lig in enumerate(self.ligands):
            try:
                lig[name] = vals[i]
            except IndexError:
                pass
        self.blank = False

    def fourier_series(self):
        for i, lig in enumerate(copy.deepcopy(self.ligands)):
            self.ligands[i : i + 1] = lig.fourier_series()
        self.nligands = len(self.ligands)
        for i, lig in enumerate(self.ligands):
            lig.ligandnum = i + 1
            lig.nligands = self.nligands

    def names(self):
        return [lig.name() for lig in self.ligands]

    def V(self, Us):
        """Group potential -beta*log(alpha + sum_l w_l*U_l)."""
        if len(Us) != self.nligands:
            raise KSFDException(
                "wrong number of ligands %d, should be %d"
                % (len(Us), self.nligands)
            )
        if self.nligands == 0:
            return 0.0
        sU = sum(lig.weight * U for lig, U in zip(self.ligands, Us))
        return -self.beta * sy.log(self.alpha + sU)


class LigandGroups:
    """All ligand groups of a problem.

    Constructed either from parsed command-line arguments (a Namespace
    with a ``params`` list) or programmatically with ``ngroups`` /
    ``nligands`` keyword arguments.
    """

    group_defaults = collections.OrderedDict({"alpha": 1.0, "beta": 1.0})

    default_group_parameters = [
        ("alpha", 1.0, "V = -beta*log(w.U + alpha) for group {group}"),
        ("beta", 1.0, "V = -beta*log(w.U + alpha) for group {group}"),
        ("nligands", 1, "number of ligands in group {group}"),
    ]

    default_ligand_parameters = [
        ("weight", 1.0, "weight of ligand {ligand} in group {group}"),
        ("s", 1.0, "secretion rate of ligand {ligand} in group {group}"),
        ("gamma", 1.0, "decay rate of ligand {ligand} in group {group}"),
        ("D", 1.0, "diffusion of ligand {ligand} in group {group}"),
        ("series", 1, "Fourier series component of ligand {ligand} in group {group}"),
        ("depth", 0.4, "depth for ligand {ligand} in group {group}"),
    ]

    def __init__(self, command_line_arguments=None, **kwargs):
        if command_line_arguments is None and not kwargs:
            self.groups = []
            return
        if command_line_arguments is not None:
            if kwargs:
                raise KSFDException(
                    "command_line_arguments and keyword parameters are "
                    "mutually exclusive"
                )
            kwargs = dict(command_line_arguments._get_kwargs())
        if kwargs.get("ngroups"):
            self.groups = []
            nldict = dict(kwargs.get("nligands", {}) or {})
            for g in range(1, kwargs["ngroups"] + 1):
                self.groups.append(
                    LigandGroup(groupnum=g, nligands=nldict.get(g, 1))
                )
            return
        if "params" in kwargs:
            # group/ligand counts are themselves parameters:
            # ngroups, nligands_<g>
            params = ParameterList()
            params.decode(kwargs["params"], allow_new=True)
            ngroups = int(params.get("ngroups", 1))
            self.groups = []
            for g in range(1, ngroups + 1):
                nligands = int(params.get("nligands_" + str(g), 1))
                self.groups.append(LigandGroup(groupnum=g, nligands=nligands))
            return
        raise KSFDException("cannot determine ligand groups from arguments")

    def nligands(self):
        return sum(group.nligands for group in self.groups)

    def ligands(self):
        return itertools.chain(*[group.ligands for group in self.groups])

    def names(self):
        return itertools.chain(*[group.names() for group in self.groups])

    def params(self):
        ps = []
        for group in self.groups:
            ps += group.params()
        return ps

    def fourier_series(self):
        for group in self.groups:
            group.fourier_series()

    def V(self, Us):
        """Total signal potential: sum of group potentials.

        ``Us`` lists the concentrations of all ligands in group order;
        entries may be numbers or sympy expressions.
        """
        Us = list(Us)
        if len(Us) != self.nligands():
            raise KSFDException(
                "provided {nUs} ligands, need {nl}".format(
                    nUs=len(Us), nl=self.nligands()
                )
            )
        if self.nligands() == 0:
            return 0.0
        sV = 0
        first = 0
        for group in self.groups:
            last = first + group.nligands
            sV = sV + group.V(Us[first:last])
            first = last
        return sV
