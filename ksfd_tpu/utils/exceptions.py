"""Framework exception type.

Reference parity: KSFD/ksfdexception.py:1-4 (KSFDException(RuntimeError)).
"""


class KSFDException(RuntimeError):
    """Error raised for user-facing problem-specification mistakes."""
