'''Pallas TPU kernel: variable-coefficient 9-point stencil matvec.

On structured grids the assembled FEM operator is a stencil: for bilinear
(P1) quads the stiffness row of node (i, j) couples only its 8 neighbors, so
``y = A x`` is

    y[i, j] = sum_{(dy, dx) in 3x3} w[3 dy + dx, i, j] * x[i + dy - 1, j + dx - 1]

This is the matrix-free TPU form of the reference's CSR matvec (reference:
matrix/_scipy.py CG, matrix/_mkl.py FGMRES): no gather/scatter, no CSR
indices — the nine shifted reads become in-register VMEM slices of row-band
blocks streamed through standard pallas pipelining, and the multiply-adds run
on the VPU at full lane width.  :func:`stencil_cg` runs whole
Jacobi-preconditioned CG iterations on device with this kernel as the matvec.

On-chip caveat for this environment (ENVIRONMENT_NOTES.md): the remote
Mosaic compile service rejects kernels traced under ``jax_enable_x64``; use
an x64-disabled (pure f32) pipeline on the TPU, or ``interpret=True``.
'''

import functools

import numpy

_OFFSETS = [(dy, dx) for dy in range(3) for dx in range(3)]


def _stencil_kernel(w_ref, x0_ref, x1_ref, x2_ref, y_ref):
    import jax.numpy as jnp
    Tb, nx = y_ref.shape
    rows = (x0_ref, x1_ref, x2_ref)
    acc = jnp.zeros((Tb, nx), dtype=y_ref.dtype)
    for k, (dy, dx) in enumerate(_OFFSETS):
        acc = acc + w_ref[k] * rows[dy][:, dx:dx + nx]
    y_ref[:] = acc


@functools.lru_cache(maxsize=None)
def _build(ny, nx, Tb, dtype_str, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    grid = (ny // Tb,)

    def run(w, xp):
        # three row-shifted views of the padded grid: view dy supplies the
        # x[i + dy - 1] rows of each band without overlapping block reads
        x0 = xp[0:ny, :]
        x1 = xp[1:ny + 1, :]
        x2 = xp[2:ny + 2, :]
        band = pl.BlockSpec((Tb, nx + 2), lambda i: (i, 0))
        return pl.pallas_call(
            _stencil_kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((9, Tb, nx), lambda i: (0, i, 0)), band, band, band],
            out_specs=pl.BlockSpec((Tb, nx), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((ny, nx), jnp.dtype(dtype_str)),
            interpret=bool(interpret),
        )(w, x0, x1, x2)
    return jax.jit(run)


def stencil_matvec(w, x, *, band=64, interpret=False):
    '''y = A x for the variable-coefficient 9-point stencil ``w [9, ny, nx]``
    acting on the grid vector ``x [ny, nx]`` (zero Dirichlet halo).'''
    import jax.numpy as jnp
    ny, nx = x.shape
    Tb = min(band, ny)
    while ny % Tb:
        Tb //= 2
    xp = jnp.pad(x, 1)
    fn = _build(int(ny), int(nx), int(Tb), str(jnp.asarray(x).dtype), interpret)
    return fn(w, xp)


def poisson_stencil(ny, nx, dtype=numpy.float32):
    '''The interior 9-point P1-quad Poisson stencil on a uniform grid
    (uniform coefficients; rows/cols at the boundary see the zero halo).'''
    base = numpy.array([[-1 / 3, -1 / 3, -1 / 3],
                        [-1 / 3, +8 / 3, -1 / 3],
                        [-1 / 3, -1 / 3, -1 / 3]], dtype=dtype)
    return numpy.broadcast_to(base.reshape(9, 1, 1), (9, ny, nx)).copy()


def stencil_cg(w, b, *, atol=1e-6, maxiter=1000, interpret=False):
    '''Matrix-free Jacobi-preconditioned CG in the stencil representation:
    the entire Krylov loop (matvec = pallas stencil kernel) runs under one
    ``lax.while_loop`` on device.'''
    import jax
    import jax.numpy as jnp
    diag = w[4]
    Minv = jnp.where(diag != 0, 1.0 / diag, 1.0)

    def matvec(x):
        return stencil_matvec(w, x, interpret=interpret)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = Minv * r
        rz_new = jnp.vdot(r, z)
        p = z + (rz_new / rz) * p
        return x, r, z, p, rz_new, k + 1

    def cond(state):
        x, r, z, p, rz, k = state
        return jnp.logical_and(jnp.linalg.norm(r) > atol, k < maxiter)

    @jax.jit
    def run(b):
        x0 = jnp.zeros_like(b)
        z0 = Minv * b
        state = (x0, b, z0, z0, jnp.vdot(b, z0), jnp.array(0, dtype=jnp.int32))
        x, r, z, p, rz, k = jax.lax.while_loop(cond, body, state)
        return x, jnp.linalg.norm(r), k

    return run(b)
