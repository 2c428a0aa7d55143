'''Device-side sparse kernels: CSR matvec and Krylov solvers (jitted).

The TPU-native replacement for the reference's MKL Pardiso/FGMRES bindings
(reference: matrix/_mkl.py): a segment-sum CSR matvec feeding a
Jacobi-preconditioned CG under ``lax.while_loop``, so the entire Krylov
iteration stays on device with no host round-trips.
'''

import functools

import numpy


def _row_ids(indptr):
    '''Expand CSR indptr to a per-entry row id vector (host, cached).'''
    counts = numpy.diff(indptr)
    return numpy.repeat(numpy.arange(len(counts)), counts)


@functools.partial(lambda f: f)
def csr_matvec(data, indices, indptr, x, row_ids=None):
    import jax.numpy as jnp
    if row_ids is None:
        row_ids = _row_ids(indptr)
    prod = data * x[indices]
    n = len(indptr) - 1
    return jnp.zeros(n, dtype=prod.dtype).at[row_ids].add(prod)


def cg(data, indices, indptr, b, diag, *, atol, maxiter):
    '''Jacobi-preconditioned conjugate gradients; returns (x, resnorm, iters).'''
    import jax
    import jax.numpy as jnp
    row_ids = jnp.asarray(_row_ids(indptr))
    n = len(b)

    def matvec(x):
        prod = data * x[indices]
        return jnp.zeros(n, dtype=prod.dtype).at[row_ids].add(prod)

    Minv = jnp.where(diag != 0, 1.0 / diag, 1.0)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = matvec(p)
        alpha = rz / (p @ Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = Minv * r
        rz_new = r @ z
        beta = rz_new / rz
        p = z + beta * p
        return x, r, z, p, rz_new, k + 1

    def cond(state):
        x, r, z, p, rz, k = state
        return jnp.logical_and(jnp.linalg.norm(r) > atol, k < maxiter)

    @jax.jit
    def run(data, b, Minv):
        x0 = jnp.zeros_like(b)
        r0 = b
        z0 = Minv * r0
        state = (x0, r0, z0, z0, r0 @ z0, jnp.array(0, dtype=jnp.int32))
        x, r, z, p, rz, k = jax.lax.while_loop(cond, body, state)
        return x, jnp.linalg.norm(r), k

    return run(data, b, Minv)
