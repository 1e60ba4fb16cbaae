from .exceptions import KSFDException
from .debug import log, logger, enabled
from .symbolic import safe_sympify, jaxify, free_parameter_names
from .params import (
    Parameter,
    ParameterList,
    find_duplicates,
    default_parameters,
)
from .cli import Parser, NumericsOptions, decode_numerics

__all__ = [
    "KSFDException",
    "log",
    "logger",
    "enabled",
    "safe_sympify",
    "jaxify",
    "free_parameter_names",
    "Parameter",
    "ParameterList",
    "find_duplicates",
    "default_parameters",
    "Parser",
    "NumericsOptions",
    "decode_numerics",
]
