"""ctypes wrapper for the native cyclic banded LU solver (banded.cpp).

The exact direct-solve path for 1D problems: the counterpart of the
reference's MUMPS LU stage solves and of its ksfdMat Jacobian
materialization (SURVEY §2 'Native components').  The shared object is
built on demand with g++ (no pybind11 dependency).
"""

import ctypes
import os
import subprocess

import numpy as np

from ..utils.exceptions import KSFDException
from ..utils.debug import logger

logLIN = logger("LINALG")

__all__ = ["CyclicBandedSolver", "band_storage_from_dense", "native_available"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_banded.so")
_lib = None


def _build():
    src = os.path.join(_HERE, "banded.cpp")
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-fPIC", "-shared", "-std=c++17",
        "-o", _SO, src,
    ]
    logLIN("building native banded solver:", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_HERE, "banded.cpp")
    if not os.path.exists(_SO) or (
        os.path.getmtime(_SO) < os.path.getmtime(src)
    ):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.cbanded_factor.restype = ctypes.c_void_p
    lib.cbanded_factor.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    lib.cbanded_solve.restype = None
    lib.cbanded_solve.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    lib.cbanded_free.restype = None
    lib.cbanded_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available():
    try:
        _load()
        return True
    except Exception as e:  # compiler missing etc.
        logLIN("native banded solver unavailable:", e)
        return False


def band_storage_from_dense(A, kl, ku):
    """Dense (n,n) -> LAPACK band storage (2*kl+ku+1, n), column-major
    semantics: band[kl+ku+i-j, j] = A[i, j].  Entries outside the band
    must be zero (the caller guarantees the band structure)."""
    n = A.shape[0]
    ldab = 2 * kl + ku + 1
    band = np.zeros((ldab, n), dtype=np.float64)
    for j in range(n):
        lo = max(0, j - ku)
        hi = min(n - 1, j + kl)
        for i in range(lo, hi + 1):
            band[kl + ku + i - j, j] = A[i, j]
    return band


class CyclicBandedSolver:
    """Factor/solve for A = banded(kl, ku) + periodic corner blocks.

    Construct from the full cyclic matrix entries given as:
    - band: LAPACK band storage of the non-periodic core, and
    - top_right (kl x kl) block A[0:kl, n-kl:] and
      bottom_left (ku x ku) block A[n-ku:, 0:ku]
    (for stencil operators kl == ku == bandwidth).
    """

    def __init__(self, n, kl, ku, band, top_right, bottom_left):
        lib = _load()
        self.n, self.kl, self.ku = n, kl, ku
        tr = np.atleast_2d(np.asarray(top_right, dtype=np.float64))
        bl = np.atleast_2d(np.asarray(bottom_left, dtype=np.float64))
        r = tr.shape[1] + bl.shape[1]
        U = np.zeros((n, r), dtype=np.float64)
        W = np.zeros((n, r), dtype=np.float64)
        c = 0
        # top-right: rows 0..tr.rows-1, cols n-tr.cols..n-1
        for a in range(tr.shape[1]):
            U[: tr.shape[0], c] = tr[:, a]
            W[n - tr.shape[1] + a, c] = 1.0
            c += 1
        # bottom-left: rows n-bl.rows..n-1, cols 0..bl.cols-1
        for a in range(bl.shape[1]):
            U[n - bl.shape[0]:, c] = bl[:, a]
            W[a, c] = 1.0
            c += 1
        band = np.ascontiguousarray(
            np.asarray(band, dtype=np.float64).T.reshape(-1)
        )  # column-major (ldab, n) -> flat col-major == C of transpose
        self._handle = lib.cbanded_factor(
            n, kl, ku, band, r,
            np.ascontiguousarray(U), np.ascontiguousarray(W),
        )
        if not self._handle:
            raise KSFDException("cyclic banded factorization failed "
                                "(zero pivot)")
        self._lib = lib

    @classmethod
    def from_dense_cyclic(cls, A, kl, ku):
        """Build from a dense cyclic-banded matrix (testing and small n).

        Splits A into the banded core + the two periodic corners.
        """
        A = np.asarray(A, dtype=np.float64)
        n = A.shape[0]
        core = A.copy()
        top_right = A[:kl, n - kl:].copy()
        bottom_left = A[n - ku:, :ku].copy()
        core[:kl, n - kl:] = 0.0
        core[n - ku:, :ku] = 0.0
        band = band_storage_from_dense(core, kl, ku)
        return cls(n, kl, ku, band, top_right, bottom_left)

    def solve(self, b):
        """Solve A x = b; b may be (n,) or (nrhs, n)."""
        b = np.ascontiguousarray(np.asarray(b, dtype=np.float64))
        single = b.ndim == 1
        if single:
            b = b[None]
        x = np.empty_like(b)
        self._lib.cbanded_solve(self._handle, b.shape[0], b, x)
        return x[0] if single else x

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.cbanded_free(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
