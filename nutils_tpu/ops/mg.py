'''Geometric multigrid preconditioner for grid-stencil operators.

f32 Krylov on its own cannot solve large second-order problems: at 263k dofs
(cond ~1e5) even scipy's f32 CG stagnates at O(1) true relative residual —
Lanczos orthogonality is gone long before the iteration count reaches
O(sqrt(cond)).  The cure is to make the preconditioned system O(1)
conditioned: a geometric V-cycle over the stencil grid.  Every ingredient is
a slice/reshape operation (smoothing = the stencil matvec, restriction =
full weighting via strided slices, prolongation = linear interpolation via
stack/reshape interleaving), so the whole cycle runs at the HBM roofline on
TPU like the stencil matvec itself (ops/stencil.py) — no gathers, no
scatters.

Setup is host-side and matrix-algebraic: coarse operators are Galerkin
products A_c = P^T A P computed with scipy sparse and re-detected as
stencils (zero room for rediscretization inconsistencies; the V-cycle with
nu1 == nu2 weighted-Jacobi smoothing is symmetric, so CG acceptance holds).
The coarsest level is inverted densely once and applied as a single matmul
(MXU).  The reference reaches the same systems through MKL Pardiso
(reference: matrix/_mkl.py:22); this is its TPU-native replacement for
structured operators.
'''

import functools

import numpy


class MGData:
    '''Per-matrix multigrid hierarchy: stencil weights per level, inverse
    diagonals, the dense coarsest inverse, and static grid shapes.'''

    __slots__ = ('ws', 'dinvs', 'coarse_inv', 'shapes', 'k')

    def __init__(self, ws, dinvs, coarse_inv, shapes, k):
        self.ws = ws                  # list of [m*m, ny, nx] device arrays
        self.dinvs = dinvs            # list of [ny, nx] device arrays
        self.coarse_inv = coarse_inv  # [nc, nc] dense inverse (device)
        self.shapes = shapes          # static [(ny, nx), ...]
        self.k = k                    # stencil halfwidth (1 for 9-point)


def _prolong_1d(n_fine):
    '''Sparse 1-D linear interpolation [n_fine, n_coarse] for a vertex grid
    (n_fine odd), coarse vertices at the even fine vertices.'''
    import scipy.sparse
    nc = (n_fine + 1) // 2
    rows, cols, vals = [], [], []
    for i in range(nc):
        rows.append(2 * i)
        cols.append(i)
        vals.append(1.0)
    for i in range(nc - 1):
        rows += [2 * i + 1, 2 * i + 1]
        cols += [i, i + 1]
        vals += [0.5, 0.5]
    return scipy.sparse.csr_matrix((vals, (rows, cols)), shape=(n_fine, nc))


def setup(form, data, indices, indptr, *, dtype=numpy.float32, min_coarse=1024, max_levels=12):
    '''Build the hierarchy for a StencilForm (ops/stencil.py) whose CSR
    arrays are given; returns MGData or None when the grid cannot coarsen
    (even pitch or too small).'''
    import jax.numpy as jnp
    import scipy.sparse
    from . import stencil as _st
    if form.k != 1:
        return None  # 9-point only for now; wider stencils fall back to Jacobi
    A = scipy.sparse.csr_matrix((numpy.asarray(data, dtype=numpy.float64),
                                 numpy.asarray(indices), numpy.asarray(indptr)),
                                shape=(form.ny * form.nx,) * 2)
    shapes = [(form.ny, form.nx)]
    ops = [A]
    while len(ops) < max_levels:
        ny, nx = shapes[-1]
        if ny * nx <= min_coarse or ny % 2 == 0 or nx % 2 == 0 or ny < 5 or nx < 5:
            break
        Py = _prolong_1d(ny)
        Px = _prolong_1d(nx)
        P = scipy.sparse.kron(Py, Px).tocsr()
        Ac = (P.T @ ops[-1] @ P).tocsr()
        Ac.sum_duplicates()
        shapes.append(((ny + 1) // 2, (nx + 1) // 2))
        ops.append(Ac)
    if len(ops) == 1:
        return None
    ws, dinvs = [], []
    for (ny, nx), Al in zip(shapes[:-1], ops[:-1]):
        fl = _st.from_csr(Al.data, Al.indices, Al.indptr, ny * nx, max_k=1)
        if fl is None:
            return None  # Galerkin operator left the 9-point window: bail out
        ws.append(jnp.asarray(fl.w.astype(dtype)))
        d = Al.diagonal()
        d[d == 0] = 1.0
        dinvs.append(jnp.asarray((1.0 / d).reshape(ny, nx).astype(dtype)))
    coarse_inv = jnp.asarray(numpy.linalg.inv(ops[-1].toarray()).astype(dtype))
    return MGData(tuple(ws), tuple(dinvs), coarse_inv, tuple(shapes), 1)


# ------------------------------------------------------------ device cycle

def _restrict(f, nyc, nxc):
    '''Full weighting (P^T of linear interpolation) [ny, nx] -> [nyc, nxc];
    pure strided slices.'''
    import jax.numpy as jnp
    ny, nx = f.shape
    fp = jnp.pad(f, 1)  # [ny+2, nx+2]
    # 1-D P^T along axis 0: c[i] = f[2i] + .5 f[2i-1] + .5 f[2i+1]
    g = fp[1:ny + 1:2, :] + 0.5 * (fp[0:ny:2, :] + fp[2:ny + 2:2, :])  # [nyc, nx+2]
    c = g[:, 1:nx + 1:2] + 0.5 * (g[:, 0:nx:2] + g[:, 2:nx + 2:2])     # [nyc, nxc]
    return c


def _prolong(c, ny, nx):
    '''Linear interpolation [nyc, nxc] -> [ny, nx]; stack/reshape
    interleaving, no scatters.'''
    import jax.numpy as jnp
    nyc, nxc = c.shape

    def interleave_rows(a):
        # [m, w] coarse rows -> [2m-1, w] with averaged odd rows
        odd = 0.5 * (a[:-1] + a[1:])
        odd = jnp.concatenate([odd, jnp.zeros((1, a.shape[1]), a.dtype)])
        out = jnp.stack([a, odd], axis=1).reshape(2 * a.shape[0], a.shape[1])
        return out[:2 * a.shape[0] - 1]

    f = interleave_rows(c)[:ny]
    f = interleave_rows(f.T)[:nx].T
    return f


@functools.lru_cache(maxsize=32)
def _vcycle_fn(shapes, k, nu):
    '''Jitted-on-use V(nu, nu) cycle with weighted-Jacobi smoothing for the
    static shape tuple; level arrays arrive as runtime operands.'''
    import jax.numpy as jnp
    from . import stencil as _st
    omega = 0.8
    nlev = len(shapes) - 1  # shapes includes the coarsest
    mv = [_st._matvec_fn(k, ny, nx) for ny, nx in shapes[:-1]]

    def cycle(level, r, ws, dinvs, coarse_inv):
        if level == nlev:
            nyc, nxc = shapes[-1]
            return (coarse_inv @ r.reshape(-1)).reshape(nyc, nxc)
        w = ws[level]
        dinv = dinvs[level]
        x = omega * dinv * r
        for _ in range(nu - 1):
            x = x + omega * dinv * (r - mv[level](w, x))
        rc = _restrict(r - mv[level](w, x), *shapes[level + 1])
        xc = cycle(level + 1, rc, ws, dinvs, coarse_inv)
        x = x + _prolong(xc, *shapes[level])
        for _ in range(nu):
            x = x + omega * dinv * (r - mv[level](w, x))
        return x

    def apply(mg_ops, r2d):
        ws, dinvs, coarse_inv = mg_ops
        return cycle(0, r2d, ws, dinvs, coarse_inv)
    return apply


def apply_vcycle(mg, r):
    '''z = M^-1 r for flat r; traceable (used inside the Krylov loops).'''
    ny, nx = mg.shapes[0]
    fn = _vcycle_fn(mg.shapes, mg.k, 2)
    return fn((mg.ws, mg.dinvs, mg.coarse_inv), r.reshape(ny, nx)).reshape(-1)
