'''Sparse matrices: host-built CSR pattern, device-resident values and Krylov.

The reference's matrix layer (reference: matrix/) wraps numpy/scipy/MKL; its
key architectural insight — the sparsity pattern is argument-independent and
can be built once while only values change (reference: solver.py:256,
is_constant_matrix) — becomes the core design here: ``SparsePattern`` is
computed host-side from constant dof tables, and per-iteration assembly is a
jitted scatter of quadrature values into the fixed CSR layout.

Solve backends:

* ``direct`` — scipy sparse LU on host (small systems, verification;
  replaces the reference's MKL Pardiso role, matrix/_mkl.py:22).
* ``cg`` — on-device jacobi-preconditioned conjugate gradients under
  ``lax.while_loop`` (the TPU-native production path).
* ``gmres`` — scipy gmres host fallback for nonsymmetric systems.
'''

import numpy

from .utils import _log as log
from .utils import config


class MatrixError(Exception):
    pass


class ToleranceNotReached(MatrixError):

    def __init__(self, best):
        super().__init__('solver failed to reach tolerance')
        self.best = best


class SparsePattern:
    '''Deduplicated CSR pattern from concatenated COO chunks, with the map
    from original entry order to CSR slots for device-side value scatter.'''

    def __init__(self, rows, cols, shape):
        rows = numpy.asarray(rows)
        cols = numpy.asarray(cols)
        self.shape = shape
        native = None
        if len(rows) > 2 ** 16:
            from . import native as _native
            native = _native.build_pattern(rows, cols, shape)
        if native is not None:
            indptr, indices, slot, urows, nnz = native
            self.nnz = nnz
            self.indices = indices.astype(config.int_dtype())
            self.indptr = indptr
            self.slot = slot
            self.urows = urows
            return
        order = numpy.lexsort((cols, rows))
        rs, cs = rows[order], cols[order]
        if len(rs):
            newpair = numpy.empty(len(rs), dtype=bool)
            newpair[0] = True
            numpy.logical_or(rs[1:] != rs[:-1], cs[1:] != cs[:-1], out=newpair[1:])
        else:
            newpair = numpy.zeros(0, dtype=bool)
        slot_sorted = numpy.cumsum(newpair) - 1
        self.nnz = int(slot_sorted[-1]) + 1 if len(rs) else 0
        urows = rs[newpair]
        self.indices = cs[newpair].astype(config.int_dtype())
        self.indptr = numpy.concatenate([[0], numpy.cumsum(numpy.bincount(urows, minlength=shape[0]))]).astype(numpy.int64)
        # slot id per original (pre-sort) entry
        self.slot = numpy.empty(len(rows), dtype=numpy.int64)
        self.slot[order] = slot_sorted
        self.urows = urows

    def scatter(self, values):
        '''Device: accumulate a flat entry-value vector into CSR data.'''
        import jax.numpy as jnp
        return jnp.zeros(self.nnz, dtype=values.dtype).at[self.slot].add(values)


def assemble_csr(data, indices, indptr, shape):
    '''CSR constructor with validation (reference: matrix/__init__.py:30).'''
    return Matrix(indptr, indices, numpy.asarray(data), shape)


def assemble_coo(data, rows, cols, shape):
    '''COO constructor, deduplicating into CSR (reference:
    matrix/__init__.py:73).'''
    pattern = SparsePattern(numpy.asarray(rows), numpy.asarray(cols), shape)
    out = numpy.zeros(pattern.nnz)
    numpy.add.at(out, pattern.slot, numpy.asarray(data, dtype=float))
    return Matrix.from_pattern(pattern, out)


def empty(shape):
    return Matrix(numpy.zeros(shape[0] + 1, dtype=int), numpy.zeros(0, dtype=int), numpy.zeros(0), shape)


def diag(d):
    d = numpy.asarray(d, dtype=float)
    n = len(d)
    return Matrix(numpy.arange(n + 1), numpy.arange(n), d, (n, n))


def eye(n):
    return diag(numpy.ones(n))


class Matrix:
    '''Square or rectangular CSR matrix with constraint-aware solve
    (reference: matrix/_base.py:33).'''

    def __init__(self, indptr, indices, data, shape):
        self.indptr = numpy.asarray(indptr)
        self.indices = numpy.asarray(indices)
        self.data = data  # numpy or jax array
        self.shape = tuple(shape)

    @classmethod
    def from_pattern(cls, pattern, data):
        return cls(pattern.indptr, pattern.indices, data, pattern.shape)

    def _scipy(self):
        import scipy.sparse
        return scipy.sparse.csr_matrix((numpy.asarray(self.data), self.indices, self.indptr), shape=self.shape)

    def export(self, form):
        if form == 'csr':
            return numpy.asarray(self.data), self.indices, self.indptr
        if form == 'dense':
            return self._scipy().toarray()
        if form == 'coo':
            m = self._scipy().tocoo()
            return numpy.asarray(m.data), (m.row, m.col)
        raise ValueError(form)

    def __matmul__(self, vec):
        return self._scipy() @ numpy.asarray(vec)

    @classmethod
    def _from_scipy(cls, m):
        m = m.tocsr()
        return cls(m.indptr, m.indices, m.data, m.shape)

    def __add__(self, other):
        if not isinstance(other, Matrix):
            return NotImplemented
        return self._from_scipy(self._scipy() + other._scipy())

    def __sub__(self, other):
        if not isinstance(other, Matrix):
            return NotImplemented
        return self._from_scipy(self._scipy() - other._scipy())

    def __mul__(self, scale):
        if not numpy.isscalar(scale):
            return NotImplemented
        return Matrix(self.indptr, self.indices, numpy.asarray(self.data) * scale, self.shape)

    __rmul__ = __mul__

    def __truediv__(self, scale):
        return self * (1. / scale)

    def __neg__(self):
        return self * -1.

    @property
    def T(self):
        import scipy.sparse
        t = self._scipy().T.tocsr()
        return Matrix(t.indptr, t.indices, t.data, (self.shape[1], self.shape[0]))

    def diagonal(self):
        return self._scipy().diagonal()

    def submatrix(self, rows, cols):
        '''Restrict to boolean-masked rows/cols (reference: matrix/_base.py:261).'''
        m = self._scipy()[numpy.asarray(rows)][:, numpy.asarray(cols)].tocsr()
        return Matrix(m.indptr, m.indices, m.data, m.shape)

    def solve(self, rhs=None, *, constrain=None, lhs0=None, solver=None, atol=0., rtol=0., symmetric=False, precon=None, **kwargs):
        '''Solve A x = b with optional constraints.

        ``constrain``: boolean mask (True = x fixed to 0) or float vector with
        NaN marking free entries and finite values prescribing x.
        '''
        rhs = numpy.zeros(self.shape[0]) if rhs is None else numpy.asarray(rhs, dtype=float)
        if constrain is None:
            x = self._solve_free(rhs, solver, atol, rtol, symmetric, precon, **kwargs)
            return x
        constrain = numpy.asarray(constrain)
        if constrain.dtype == bool:
            isfree = ~constrain
            xfix = numpy.zeros(self.shape[1])
        else:
            isfree = numpy.isnan(constrain)
            xfix = numpy.where(isfree, 0.0, constrain)
        sub = self.submatrix(isfree, isfree)
        b = rhs[isfree] - (self @ xfix)[isfree]
        xf = sub._solve_free(b, solver, atol, rtol, symmetric, precon, **kwargs)
        x = xfix.copy()
        x[isfree] = xf
        return x

    def solve_leniently(self, *args, **kwargs):
        try:
            return self.solve(*args, **kwargs)
        except ToleranceNotReached as e:
            log.warning('solver failed to reach tolerance; continuing with best iterate')
            return e.best

    def _solve_free(self, rhs, solver, atol, rtol, symmetric, precon, **kwargs):
        if not len(rhs):
            return numpy.zeros(0)
        if solver is None:
            solver = config.matrix.value
            if solver == 'auto':
                solver = 'direct' if self.shape[0] < 100000 or not symmetric else 'cg'
        if solver in ('direct', 'scipy', 'dense'):
            return self._solve_direct(rhs)
        if solver == 'cg':
            return self._solve_cg(rhs, atol=atol, rtol=rtol or 1e-11, **kwargs)
        if solver == 'gmres':
            return self._solve_gmres(rhs, atol=atol, rtol=rtol or 1e-11, **kwargs)
        raise ValueError(f'unknown solver {solver!r}')

    def _solve_direct(self, rhs):
        import scipy.sparse.linalg
        try:
            return scipy.sparse.linalg.spsolve(self._scipy().tocsc(), rhs)
        except RuntimeError as e:
            raise MatrixError(str(e)) from e

    def _solve_cg(self, rhs, *, atol, rtol, maxiter=None):
        '''Jacobi-preconditioned CG, jitted, fully on device.'''
        import jax
        import jax.numpy as jnp
        from .ops.sparse import csr_matvec, cg
        data = jnp.asarray(self.data)
        indices = jnp.asarray(self.indices)
        indptr = self.indptr
        diag = jnp.asarray(self.diagonal())
        b = jnp.asarray(rhs)
        x, resnorm, it = cg(data, indices, indptr, b, diag, atol=max(atol, rtol * float(numpy.linalg.norm(rhs))),
                            maxiter=maxiter or 4 * self.shape[0])
        x = numpy.asarray(x)
        target = max(atol, rtol * float(numpy.linalg.norm(rhs)))
        if float(resnorm) > target * 1.001:
            raise ToleranceNotReached(x)
        log.debug(f'cg converged in {int(it)} iterations (resnorm {float(resnorm):.1e})')
        return x

    def _solve_gmres(self, rhs, *, atol, rtol, maxiter=None):
        import scipy.sparse.linalg
        A = self._scipy()
        M = scipy.sparse.linalg.LinearOperator(A.shape, lambda v: v / A.diagonal())
        x, info = scipy.sparse.linalg.gmres(A, rhs, atol=max(atol, rtol * numpy.linalg.norm(rhs)), maxiter=maxiter, M=M)
        if info != 0:
            raise ToleranceNotReached(x)
        return x


def assemble_csr(values, rowptr, colidx, ncols):
    nrows = len(rowptr) - 1
    return Matrix(rowptr, colidx, values, (nrows, ncols))


def assemble_block_csr(blocks):
    '''Stitch a dense 2-D grid of Matrix blocks into one CSR matrix
    (reference: matrix/__init__.py:103).'''
    import scipy.sparse
    grid = [[b._scipy() for b in row] for row in blocks]
    out = scipy.sparse.bmat(grid, format='csr')
    return Matrix(out.indptr, out.indices, out.data, out.shape)


def empty(shape):
    return Matrix(numpy.zeros(shape[0] + 1, dtype=int), numpy.zeros(0, dtype=int), numpy.zeros(0), shape)


def diag(d):
    d = numpy.asarray(d)
    n = len(d)
    return Matrix(numpy.arange(n + 1), numpy.arange(n), d, (n, n))


def eye(n):
    return diag(numpy.ones(n))
