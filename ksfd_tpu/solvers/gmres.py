"""TPU-native preconditioned GMRES with batched Gram-Schmidt.

jax.scipy's GMRES builds its Arnoldi step from many small dependent
dot/axpy ops that serialize badly on TPU.  This implementation keeps
the Krylov basis as one (m+1, N) matrix so each orthogonalization is
a single (k x N) @ (N,) matmul pair (classical Gram-Schmidt with one
re-orthogonalization pass — CGS2, as stable as MGS in practice), and
runs a FIXED number of iterations under lax.fori_loop: no
data-dependent control flow, fully pipelined on device.  The caller's
step-error control (embedded Rosenbrock estimate) judges solve
quality, mirroring how the reference leaves solve failures to TS
rollback (SURVEY §5.3).

Left-preconditioned: solves M^{-1} W x = M^{-1} b.
"""

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["gmres_fixed"]


def gmres_fixed(op, b, M=None, iters=8, x0=None):
    """GMRES(iters) without restarts; returns the minimizer over the
    Krylov space K_iters(M^-1 W, M^-1 b).

    op, M: callables on arrays of any shape (flattened internally).
    """
    if M is None:
        M = lambda v: v
    shape = b.shape
    dtype = b.dtype
    n = b.size
    m = int(iters)

    flat = lambda v: v.reshape(-1)
    unflat = lambda v: v.reshape(shape)

    def A(v):
        return flat(M(op(unflat(v))))

    r0 = flat(M(b)) if x0 is None else flat(M(b - op(x0)))
    beta = jnp.linalg.norm(r0)
    # guard: zero RHS
    safe_beta = jnp.where(beta > 0, beta, 1.0)

    V = jnp.zeros((m + 1, n), dtype=dtype).at[0].set(r0 / safe_beta)
    H = jnp.zeros((m + 1, m), dtype=dtype)

    def body(j, carry):
        V, H = carry
        w = A(V[j])
        # CGS2: two passes of h = V w; w -= V^T h  (batched matmuls)
        h1 = V @ w                      # (m+1,) — rows > j are zero vecs
        w = w - V.T @ h1
        h2 = V @ w
        w = w - V.T @ h2
        h = h1 + h2
        nrm = jnp.linalg.norm(w)
        # mask: only entries 0..j are valid column entries
        idx = jnp.arange(m + 1)
        h = jnp.where(idx <= j, h, 0.0)
        H = H.at[:, j].set(h)
        H = H.at[j + 1, j].set(nrm)
        V = V.at[j + 1].set(w / jnp.where(nrm > 0, nrm, 1.0))
        return (V, H)

    V, H = jax.lax.fori_loop(0, m, body, (V, H))

    # least squares min || beta e1 - H y ||
    e1 = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta)
    y = jnp.linalg.lstsq(H, e1)[0]
    x = V[:m].T @ y
    if x0 is not None:
        x = x + flat(x0)
    return unflat(jnp.where(beta > 0, x, jnp.zeros_like(x)))
