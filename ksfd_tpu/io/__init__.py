from .timeseries import TimeSeries, Gatherer, parse_filename
from .solution import Solution
from .monitors import (
    picklenp,
    pickleunp,
    make_save_monitor,
    make_checkpoint_monitor,
    write_info,
)

__all__ = [
    "TimeSeries",
    "Gatherer",
    "parse_filename",
    "Solution",
    "picklenp",
    "pickleunp",
    "make_save_monitor",
    "make_checkpoint_monitor",
    "write_info",
]
