"""Random numbers and smooth random initial fields.

Generator: the process-wide reproducible RNG.  The reference spawns an
independent numpy Generator per MPI rank from a SeedSequence
(KSFD/ksfdrandom.py:13-60); in the single-controller JAX runtime there
is one logical program, so the Generator wraps a JAX PRNG key that is
split on every draw and saved in checkpoints (bit-exact resume — an
improvement over the reference, which restarts its stream from the
seed, SURVEY §5.4).

random_function: smooth random field built by drawing normals on a
coarse grid and interpolating with the compact C^1 bump
f(x) = 2x^3 - 3x^2 + 1 as a per-dimension product
(KSFD/ksfdrandom.py:108-220).  On a uniform periodic grid the kernel
support covers exactly the two nearest coarse vertices per axis
(f(u) + f(1-u) == 1, a partition of unity), so the reference's
KDTree search reduces to a separable 2^dim-corner gather.
"""

import numpy as np
import jax

from .utils.exceptions import KSFDException

__all__ = ["Generator", "random_function", "bump_kernel"]


def bump_kernel(x):
    """C^1 compact interpolation kernel 2x^3 - 3x^2 + 1 on [0, 1]."""
    return 2.0 * x**3 - 3.0 * x**2 + 1.0


class Generator:
    """Process-wide reproducible RNG over a JAX PRNG key."""

    _key = None
    _seed = None

    def __init__(self, seed=None):
        if seed is None and type(self)._key is not None:
            return  # already initialized
        if seed is None:
            seed = 793817931  # the driver's historical default seed
        type(self)._seed = seed
        type(self)._key = jax.random.PRNGKey(seed)

    def __call__(self):
        return self

    @classmethod
    def get_rng(cls):
        if cls._key is None:
            cls()
        return cls()

    @classmethod
    def key(cls):
        """Split off a fresh subkey (advances the stream)."""
        if cls._key is None:
            cls()
        cls._key, sub = jax.random.split(cls._key)
        return sub

    @classmethod
    def set_key(cls, key):
        """Restore the stream (checkpoint resume)."""
        cls._key = key

    @classmethod
    def current_key(cls):
        if cls._key is None:
            cls()
        return cls._key

    def normal(self, loc=0.0, scale=1.0, size=()):
        draw = jax.random.normal(self.key(), shape=tuple(size))
        return np.asarray(draw, dtype=float) * scale + loc


def _axis_weights(nfine, hfine, ncoarse, hcoarse):
    """Per-axis interpolation: fine index -> (i0, i1, w0, w1)."""
    x = np.arange(nfine) * hfine
    u = x / hcoarse
    i0 = np.floor(u + 1e-12).astype(int)
    frac = u - i0
    i0 = i0 % ncoarse
    i1 = (i0 + 1) % ncoarse
    w0 = bump_kernel(np.clip(frac, 0.0, 1.0))
    w1 = bump_kernel(np.clip(1.0 - frac, 0.0, 1.0))
    return i0, i1, w0, w1


def random_function(grid, randgrid=None, vals=None, mu=0.0, sigma=0.01):
    """Smooth random scalar field on ``grid``.

    randgrid: coarse Grid the random values live on (defaults to grid).
    vals: ndarray of shape randgrid.Sshape; drawn N(mu, sigma) from the
        process Generator when not supplied.

    Returns an ndarray of shape grid.Sshape.
    """
    if randgrid is None:
        randgrid = grid
    if grid.dim != randgrid.dim:
        raise KSFDException("randgrid and grid must have the same dimension")
    if vals is None:
        vals = Generator.get_rng().normal(
            loc=mu, scale=sigma, size=randgrid.Sshape
        )
    vals = np.asarray(vals).reshape(randgrid.Sshape)
    if tuple(randgrid.nps) == tuple(grid.nps) and np.allclose(
        randgrid.spacing, grid.spacing
    ):
        return vals.copy()
    dim = grid.dim
    axes = [
        _axis_weights(
            grid.nps[d], grid.spacing[d], randgrid.nps[d], randgrid.spacing[d]
        )
        for d in range(dim)
    ]
    out = np.zeros(grid.Sshape, dtype=float)
    # sum over the 2^dim corners of the coarse cell containing each point
    for corner in range(2**dim):
        idx = []
        w = 1.0
        for d in range(dim):
            i0, i1, w0, w1 = axes[d]
            take = i1 if (corner >> d) & 1 else i0
            wd = w1 if (corner >> d) & 1 else w0
            shape = [1] * dim
            shape[d] = -1
            idx.append(take.reshape(shape))
            w = w * wd.reshape(shape)
        out += w * vals[tuple(np.broadcast_arrays(*idx))] if dim > 1 else (
            w * vals[idx[0].reshape(-1)]
        )
    return out
