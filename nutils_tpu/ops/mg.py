'''Geometric multigrid preconditioner for grid-stencil operators,
dimension-generic (1-D/2-D/3-D grids, any stencil width the slice matvec
supports).

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
products A_c = P^T A P computed with scipy sparse and re-expressed as
stencils over the KNOWN coarse grid (zero room for rediscretization
inconsistencies; the V-cycle with nu1 == nu2 weighted-Jacobi smoothing is
symmetric, so CG acceptance holds; for nonsymmetric stencil operators the
same cycle serves as a GMRES preconditioner).  The coarsest level is
inverted densely once and applied as a single matmul (MXU).  The reference
reaches the same systems through MKL Pardiso (reference: matrix/_mkl.py:22);
this is its TPU-native replacement for structured operators.
'''

import functools

import numpy


class MGData:
    '''Per-matrix multigrid hierarchy: stencil weights per level, inverse
    diagonals, the dense coarsest inverse, and static per-level
    (ks, shape) metadata.'''

    __slots__ = ('ws', 'dinvs', 'coarse_inv', 'levels')

    def __init__(self, ws, dinvs, coarse_inv, levels):
        self.ws = ws                  # list of [W, *shape] device arrays
        self.dinvs = dinvs            # list of [*shape] device arrays
        self.coarse_inv = coarse_inv  # [nc, nc] dense inverse (device)
        self.levels = levels          # static ((ks, shape), ...) incl. coarsest

    @property
    def shapes(self):
        return tuple(lev[1] for lev in self.levels)


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


def _coarsen_flags(shape, periodic, min_coarse):
    '''Per-axis semi-coarsening flags: odd non-periodic vertex axes >= 5
    coarsen, short/even/periodic axes (vector components, wrapped pitches)
    are kept — returns None when nothing coarsens or the level is already
    small.'''
    flags = tuple(s >= 5 and s % 2 == 1 and not per for s, per in zip(shape, periodic))
    if not any(flags) or int(numpy.prod(shape)) <= min_coarse:
        return None
    return flags


def setup(form, data, indices, indptr, *, dtype=numpy.float32, min_coarse=1024, max_levels=12):
    '''Build the hierarchy for a StencilForm (ops/stencil.py) whose CSR
    arrays are given; returns MGData or None when the grid cannot coarsen
    (even pitch or too small).'''
    import jax.numpy as jnp
    import scipy.sparse
    from . import stencil as _st
    n = int(numpy.prod(form.shape))
    A = scipy.sparse.csr_matrix((numpy.asarray(data, dtype=numpy.float64),
                                 numpy.asarray(indices), numpy.asarray(indptr)),
                                shape=(n, n))
    shapes = [form.shape]
    ops = [A]
    while len(ops) < max_levels:
        flags = _coarsen_flags(shapes[-1], form.periodic, min_coarse)
        if flags is None:
            break
        P = None
        for s, f in zip(shapes[-1], flags):
            P1 = _prolong_1d(s) if f else scipy.sparse.eye(s, format='csr')
            P = P1 if P is None else scipy.sparse.kron(P, P1)
        P = P.tocsr()
        Ac = (P.T @ ops[-1] @ P).tocsr()
        Ac.sum_duplicates()
        shapes.append(tuple((s + 1) // 2 if f else s for s, f in zip(shapes[-1], flags)))
        ops.append(Ac)
    if len(ops) == 1:
        return None
    ws, dinvs, levels = [], [], []
    for shape, Al in zip(shapes[:-1], ops[:-1]):
        fl = _st.from_csr_grid(Al.data, Al.indices, Al.indptr, shape)
        if fl is None:
            return None  # Galerkin operator left the window: bail out
        ws.append(jnp.asarray(fl.w.astype(dtype)))
        d = Al.diagonal()
        d[d == 0] = 1.0
        dinvs.append(jnp.asarray((1.0 / d).reshape(shape).astype(dtype)))
        levels.append((fl.ks, fl.shape, fl.periodic))
    levels.append(((0,) * len(shapes[-1]), shapes[-1], form.periodic))
    coarse_inv = jnp.asarray(numpy.linalg.inv(ops[-1].toarray()).astype(dtype))
    return MGData(tuple(ws), tuple(dinvs), coarse_inv, tuple(levels))


# ------------------------------------------------------------ device cycle

def _restrict_1d(f):
    '''Full weighting (P^T of linear interpolation) along axis 0,
    n odd -> (n+1)//2; pure strided slices.'''
    import jax.numpy as jnp
    n = f.shape[0]
    fp = jnp.pad(f, [(1, 1)] + [(0, 0)] * (f.ndim - 1))
    return fp[1:n + 1:2] + 0.5 * (fp[0:n:2] + fp[2:n + 2:2])


def _restrict(f, cshape):
    '''Full weighting on every coarsened axis (axes whose target size in
    ``cshape`` differs) [*shape] -> [*cshape].'''
    import jax.numpy as jnp
    for ax in range(f.ndim):
        if f.shape[ax] != cshape[ax]:
            f = jnp.moveaxis(_restrict_1d(jnp.moveaxis(f, ax, 0)), 0, ax)
    return f


def _interleave_1d(a, n_fine):
    '''Linear interpolation along axis 0 [nc, ...] -> [n_fine, ...];
    stack/reshape interleaving, no scatters.'''
    import jax.numpy as jnp
    odd = 0.5 * (a[:-1] + a[1:])
    odd = jnp.concatenate([odd, jnp.zeros((1,) + a.shape[1:], a.dtype)])
    out = jnp.stack([a, odd], axis=1).reshape((2 * a.shape[0],) + a.shape[1:])
    return out[:n_fine]


def _prolong(c, shape):
    '''Linear interpolation [*coarse] -> [*shape] on the coarsened axes.'''
    import jax.numpy as jnp
    for ax, nf in enumerate(shape):
        if c.shape[ax] != nf:
            c = jnp.moveaxis(_interleave_1d(jnp.moveaxis(c, ax, 0), nf), 0, ax)
    return c


@functools.lru_cache(maxsize=32)
def _vcycle_fn(levels, nu):
    '''Jitted-on-use V(nu, nu) cycle with weighted-Jacobi smoothing for the
    static ((ks, shape), ...) tuple; level arrays arrive as runtime
    operands.'''
    from . import stencil as _st
    omega = 0.8
    nlev = len(levels) - 1  # levels includes the coarsest
    mv = [_st._matvec_fn(ks, shape, per) for ks, shape, per in levels[:-1]]

    def cycle(level, r, ws, dinvs, coarse_inv):
        if level == nlev:
            cshape = levels[-1][1]
            return (coarse_inv @ r.reshape(-1)).reshape(cshape)
        w = ws[level]
        dinv = dinvs[level]
        x = omega * dinv * r
        for _ in range(nu - 1):
            x = x + omega * dinv * (r - mv[level](w, x))
        rc = _restrict(r - mv[level](w, x), levels[level + 1][1])
        xc = cycle(level + 1, rc, ws, dinvs, coarse_inv)
        x = x + _prolong(xc, levels[level][1])
        for _ in range(nu):
            x = x + omega * dinv * (r - mv[level](w, x))
        return x

    def apply(mg_ops, r_nd):
        ws, dinvs, coarse_inv = mg_ops
        return cycle(0, r_nd, ws, dinvs, coarse_inv)
    return apply


def apply_vcycle(mg, r):
    '''z = M^-1 r for flat r; traceable (used inside the Krylov loops).'''
    shape = mg.levels[0][1]
    fn = _vcycle_fn(mg.levels, 2)
    return fn((mg.ws, mg.dinvs, mg.coarse_inv), r.reshape(shape)).reshape(-1)
