"""Parameter system: named, defaulted, sympy-valued parameters.

The user-facing parameter language is identical to the reference's
(KSFD/ksfdligand.py:14-254 and KSFD/ksfdargparse.py:11-55): parameters
are ``name=value`` strings where ``value`` is a sympy expression that
may reference other parameters and ``t`` (and, for spatially evaluated
parameters, ``x``/``y``/``z``).  Booleans and plain numbers are coerced
to Python bool/int/float at decode time.
"""

import collections

import sympy as sy

from .exceptions import KSFDException
from .symbolic import safe_sympify

__all__ = [
    "Parameter",
    "ParameterList",
    "find_duplicates",
    "default_parameters",
]


#: The canonical table of (name, default, help).  Values mirror the
#: reference defaults exactly (KSFD/ksfdargparse.py:11-55).
default_parameters = [
    ("degree", 3, "order of finite difference approximations"),
    ("dim", 1, "spatial dimensions"),
    ("nelements", 8, "number of grid points in each dimension"),
    ("nwidth", 8, "number of grid points in width"),
    ("nheight", 8, "number of grid points in height"),
    ("ndepth", 8, "number of grid points in depth"),
    ("randgridnw", 0, "random grid width"),
    ("randgridnh", 0, "random grid height"),
    ("randgridnd", 0, "random grid depth"),
    ("width", 1.0, "width of spatial domain"),
    ("height", 1.0, "height of spatial domain"),
    ("depth", 1.0, "depth of spatial domain"),
    ("CFL_safety_factor", 0.0, "CFL upper bound on timestep"),
    ("conserve_worms", False, "enforce conservation of worms"),
    ("variance_rate", 0.0, "rate of increase in random rho variance"),
    ("variance_interval", 100.0, "frequency of increase in random rho variance"),
    (
        "variance_timing_function",
        sy.sympify("t/variance_interval"),
        "when to inject noise",
    ),
    ("Umin", 1e-7, "minimum allowed value of U"),
    ("rhomin", 1e-7, "minimum allowed value of rho"),
    ("rhomax", 28000, "approximate max value of rho"),
    ("cushion", 2000, "cushion on rho"),
    ("maxscale", 2.0, "scale of cap potential"),
    ("s2", 5.56e-4, "random worm movement (sigma)"),
    ("Nworms", 0.0, "total number of worms"),
    ("srho0", 90.0, "standard deviation of rho(0)"),
    ("rho0", 9000.0, "function for rho0, added to random rho0"),
    ("U0_1_1", "", "function for U0_1_1"),
    ("ngroups", 1, "number of ligand groups"),
    ("nligands_1", 1, "number of ligands in group 1"),
    ("alpha_1", 1500.0, "alpha for ligand group 1"),
    ("beta_1", 5.56e-4, "beta for ligand group 1"),
    ("s_1_1", 0.01, "s for ligand group 1, ligand 1"),
    ("gamma_1_1", 0.01, "gamma for ligand group 1, ligand 1"),
    ("D_1_1", 1e-6, "D for ligand group 1, ligand 1"),
    ("maxsteps", 1000, "maximum number of time steps"),
    ("t0", 0.0, "initial time"),
    ("dt", 0.001, "first time step"),
    ("lastvart", 0.0, "last variance injection time"),
    ("tmax", 200000, "time to simulate"),
    ("rtol", 1e-5, "relative tolerance for step size adaptation"),
    ("atol", 1e-5, "absolute tolerance for step size adaptation"),
]


def find_duplicates(items):
    """Return the sorted list of duplicated entries in ``items``."""
    sitems = sorted(items)
    return [a for a, b in zip(sitems[1:], sitems[:-1]) if a == b]


class Parameter:
    """A getter/setter pair, so a parameter can live anywhere.

    ``p()`` reads, ``p(v)``/``p.set(v)``/``p.val = v`` write.
    """

    def __init__(self, getter, setter):
        self._get = getter
        self._set = setter

    def __call__(self, val=None):
        if val is not None:
            self._set(val)
        return self._get()

    def get(self):
        return self._get()

    def set(self, val):
        self._set(val)

    @property
    def val(self):
        return self._get()

    @val.setter
    def val(self, val):
        self._set(val)


def _coerce(v):
    """Coerce a sympified value to bool/int/float when it is one."""
    if v is None or isinstance(v, bool):
        return bool(v)
    if hasattr(v, "is_Boolean") and v.is_Boolean:
        return bool(v)
    if hasattr(v, "is_Integer") and v.is_Integer:
        return int(v)
    if hasattr(v, "is_Float") and v.is_Float:
        return float(v)
    return v


class ParameterList:
    """Ordered mapping of named parameters with defaults and help text.

    Accepts entries of form (key, default[, help]) for self-stored
    values, or (key, Parameter, default, help) for externally stored
    ones.  ``decode`` parses ``key=value`` command-line strings with
    sympy values.
    """

    def __init__(self, parameters=()):
        self.values = collections.OrderedDict()
        self.ps = collections.OrderedDict()
        self.defaults = collections.OrderedDict()
        self.helps = collections.OrderedDict()
        self.add(parameters)

    def keys(self):
        return self.ps.keys()

    def add(self, parameters):
        for param in parameters:
            if len(param) in (2, 3):
                k, d = param[:2]
                h = param[2] if len(param) == 3 else None
                if k in self:
                    p = self.ps[k]
                else:
                    p = self._make_storage(k)
                    p(d)
            elif len(param) == 4:
                k, p, d, h = param
            else:
                raise ValueError(
                    "parameter element has length %d, 2, 3 or 4 required"
                    % (len(param),)
                )
            self.ps[k] = p
            self.defaults[k] = d
            self.helps[k] = h

    def _make_storage(self, key):
        def getter(vd=self.values, key=key):
            return vd[key]

        def setter(val, vd=self.values, key=key):
            vd[key] = val

        return Parameter(getter, setter)

    def update(self, parameters):
        if hasattr(parameters, "items") and callable(parameters.items):
            parameters = parameters.items()
        for k, v in parameters:
            if k not in self:
                self.add([(k, v)])
            self[k] = v

    def items(self):
        for k, p in self.ps.items():
            yield (k, p())

    def __iter__(self):
        return self.items()

    def __len__(self):
        return len(self.ps)

    def __getitem__(self, key):
        return self.ps[key]()

    def __setitem__(self, key, value):
        if key not in self:
            self.values[key] = value
            self.ps[key] = self._make_storage(key)
            self.defaults.setdefault(key, None)
            self.helps.setdefault(key, None)
        return self.ps[key](value)

    def __delitem__(self, key):
        del self.ps[key]
        self.values.pop(key, None)
        self.defaults.pop(key, None)
        self.helps.pop(key, None)

    def __contains__(self, key):
        return key in self.ps

    def get(self, key, default=None):
        return self[key] if key in self else default

    def decode(self, params, allow_new=False):
        """Decode a list of 'key=value' strings (sympy values).

        Duplicated keys raise; unknown keys raise KeyError unless
        ``allow_new``.
        """
        keys = [arg.split("=", maxsplit=1)[0] for arg in params]
        dups = find_duplicates(keys)
        if dups:
            raise KSFDException("duplicated parameters: " + ", ".join(dups))
        for arg in params:
            if "=" not in arg:
                raise KSFDException(
                    "parameter argument {a!r} is not of form key=value".format(a=arg)
                )
            k, val = arg.split("=", maxsplit=1)
            v = _coerce(safe_sympify(val))
            if k in self.ps:
                self.ps[k](v)
            elif allow_new:
                self[k] = v
            else:
                raise KeyError(k)

    def params(self):
        """(key, Parameter, default, help) tuples for all parameters."""
        return [
            (k, self.ps[k], self.defaults.get(k), self.helps.get(k))
            for k in self.ps.keys()
        ]

    def __str__(self):
        return "".join(
            "{key}={val}\n".format(key=k, val=p()) for k, p in self.ps.items()
        )
