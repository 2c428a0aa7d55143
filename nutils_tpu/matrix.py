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
* ``cg`` — on-device preconditioned conjugate gradients under
  ``lax.while_loop`` (symmetric production path).
* ``gmres`` — on-device left-preconditioned restarted GMRES(m)
  (nonsymmetric production path; the role of the reference's MKL FGMRES,
  matrix/_mkl.py:205).
* ``bicg``/``bicgstab``/``cgs``/``lgmres``/``scipy:gmres``/``scipy:cg`` —
  host scipy iterative family (reference: matrix/_scipy.py:67-92).

Preconditioners are obtained through :meth:`Matrix.getprecon` (reference:
matrix/_base.py:316): device-side ``diag``/``block`` feed the jitted Krylov
loops; host-side ``direct``/``splu``/``spilu``/``spilu0`` feed the scipy
solvers.
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
    '''CSR constructor with validation (reference: matrix/__init__.py:30).

    >>> import numpy
    >>> from nutils_tpu import matrix
    >>> A = matrix.assemble_csr(numpy.array([2., -1., -1., 2.]),
    ...                         numpy.array([0, 1, 0, 1]),
    ...                         numpy.array([0, 2, 4]), (2, 2))
    >>> x = A.solve(numpy.array([1., 1.]))
    >>> numpy.round(x, 12).tolist()
    [1.0, 1.0]
    '''
    return Matrix(indptr, indices, numpy.asarray(data), shape)


def assemble_coo(data, rows, cols, shape):
    '''COO constructor, deduplicating into CSR (reference:
    matrix/__init__.py:73).

    >>> import numpy
    >>> from nutils_tpu import matrix
    >>> A = matrix.assemble_coo(numpy.array([1., 1., 3.]),
    ...                         numpy.array([0, 0, 1]),
    ...                         numpy.array([0, 0, 1]), (2, 2))
    >>> A.export('dense').tolist()
    [[2.0, 0.0], [0.0, 3.0]]
    '''
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
        m = cls(pattern.indptr, pattern.indices, data, pattern.shape)
        m._pattern = pattern  # device-op structure plans cache here across
        return m              # Newton steps (constant pattern, fresh values)

    def _scipy(self):
        import scipy.sparse
        return scipy.sparse.csr_matrix((numpy.asarray(self.data), self.indices, self.indptr), shape=self.shape)

    def _device_data(self):
        '''CSR value array as a device array (no host round-trip when the
        values already live on device).'''
        import jax.numpy as jnp
        return jnp.asarray(self.data)

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

    @staticmethod
    def _from_scipy(m):
        m = m.tocsr()
        return Matrix(m.indptr, m.indices, m.data, m.shape)

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
        '''Restrict to boolean-masked rows/cols (reference: matrix/_base.py:261).

        All-true masks return the matrix itself; the symmetric square case
        returns a lazy view whose ``solve`` runs as a masked solve on the
        FULL operator — Dirichlet-constrained structured systems keep their
        stencil form and multigrid preconditioner this way, where an eager
        submatrix would collapse them to unstructured CSR.'''
        rows = numpy.asarray(rows)
        cols = numpy.asarray(cols)
        if rows.dtype == bool and cols.dtype == bool:
            if rows.all() and cols.all():
                return self
            if self.shape[0] == self.shape[1] and numpy.array_equal(rows, cols):
                return _SubMatrix(self, rows)
        m = self._scipy()[rows][:, cols].tocsr()
        return Matrix(m.indptr, m.indices, m.data, m.shape)

    def _device_op(self):
        '''(mv_kind, operands) for the device Krylov drivers, best structure
        first (cached):

        * ``('stencil', ks, shape)`` when the pattern is a verified grid
          stencil (any rank) — shifted-slice matvec at the HBM roofline
          (measured 64 us/mv at 1M dofs f32 on a v5e);
        * ``('bell', R)`` unstructured rows grouped into shared-column row
          blocks — one gather per block column feeding a dense [R, Wb]
          contraction, cutting the serializing per-element gathers ~R-fold
          versus ELL;
        * ``('ell',)`` per-row gather + dense reduce (config spmv='ell');
        * ``('csr',)`` scatter-add fallback for pathologically wide rows.
        '''
        from . import parallel
        cached = getattr(self, '_device_op_cache', None)
        if cached is not None and cached[0] == parallel.mesh_token():
            return cached[1]
        import jax.numpy as jnp
        from .ops import stencil as _stencil
        from .ops import sparse as _sparse
        from .utils import config
        n = self.shape[0]
        data = numpy.asarray(self.data)
        # structure plans depend only on the sparsity pattern; Newton steps
        # reassemble fresh values on a constant pattern, so the (possibly
        # expensive) detection caches on the SparsePattern and each new
        # matrix only refills values
        pat = getattr(self, '_pattern', None)
        plan = getattr(pat, '_device_op_plan', None) if pat is not None else None
        if plan is None:
            grids = getattr(self, '_field_grids', None)
            form = None
            if self.shape[0] == self.shape[1]:
                if grids is not None and len(grids) == 1 and grids[0] is not None:
                    # exact dof-grid hint from the solver: no inference
                    form = _stencil.from_csr_grid(data, self.indices, self.indptr, grids[0][0])
                if form is None:
                    form = _stencil.from_csr(data, self.indices, self.indptr, n)
            bgform = None
            if form is None and self.shape[0] == self.shape[1] \
                    and getattr(self, '_field_offsets', None) is not None:
                from .ops import blockgrid as _bg
                bgform = _bg.detect(data, self.indices, self.indptr, self._field_offsets,
                                    grids=grids)
            if form is not None:
                plan = ('stencil', (form.ks, form.shape, form.slot, form.rows, form.periodic))
            elif bgform is not None:
                plan = ('blockgrid', (bgform.meta, bgform.fill))
            else:
                counts = numpy.diff(self.indptr)
                W = int(counts.max()) if n else 0
                spmv = config.spmv.value
                if spmv == 'auto':
                    spmv = 'bell' if W and n * W <= 8 * len(data) else 'csr'
                if spmv == 'bell':
                    plan = ('bell', _sparse.bell_plan(self.indices, self.indptr,
                                                      config.spmv_blockrows.value))
                elif spmv == 'ell' and W:
                    plan = ('ell', None)
                else:
                    plan = ('csr', _sparse._row_ids(self.indptr))
            if pat is not None:
                pat._device_op_plan = plan
        kindname, payload = plan
        if kindname == 'stencil':
            ks, gshape, slot, rows, per = payload
            w = _stencil.refill(ks, gshape, slot, rows, data)
            out = (('stencil', ks, gshape, per), (jnp.asarray(w),))
        elif kindname == 'blockgrid':
            from .ops import blockgrid as _bg
            meta, fill = payload
            ws = _bg.refill(fill, data, meta)
            out = (('blockgrid', meta), tuple(jnp.asarray(w) for w in ws))
        elif kindname == 'bell':
            out = (('bell', payload[4]),
                   (jnp.asarray(_sparse.bell_fill(payload, data)), jnp.asarray(payload[0])))
        elif kindname == 'ell':
            vals, cols = _sparse.csr_to_ell(data, self.indices, self.indptr)
            out = (('ell',), (jnp.asarray(vals), jnp.asarray(cols)))
        else:
            out = (('csr',), (jnp.asarray(data), jnp.asarray(self.indices),
                              jnp.asarray(payload)))
        mesh = parallel.default_mesh()
        if mesh is not None:
            out = (out[0], parallel.shard_device_op(out[0], out[1], mesh))
        self._device_op_cache = (parallel.mesh_token(), out)
        return out

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

        # masked-operator constraint handling for the device solvers: solve
        # M A M y = M (b - A xfix) with identity on fixed rows, keeping the
        # operator structure (stencil/ell) intact — a submatrix would destroy
        # the grid pattern and force the slow scatter matvec (SURVEY 7.3
        # "masked solves").
        eff = solver if solver is not None else config.matrix.value
        if eff == 'auto':
            eff = ('cg' if symmetric else 'gmres') \
                if self.shape[0] >= config.device_solve_min.value else 'direct'
            auto = True
        else:
            auto = False
        if eff in ('cg', 'gmres', 'bicgstab') and self.shape[0] == self.shape[1]:
            # build the masked operator M A M + (I - M) explicitly: identity
            # rows keep the matrix inside the stencil window, so constrained
            # structured systems retain the roofline matvec AND the multigrid
            # preconditioner (a submatrix would destroy the grid).  Cached per
            # mask so repeated solves (Newton iterations) reuse the stencil
            # detection and MG hierarchy.
            key = isfree.tobytes()
            cached = getattr(self, '_masked_solve_cache', None)
            if cached is not None and cached[0] == key:
                Mm = cached[1]
            else:
                import scipy.sparse
                mf = isfree.astype(float)
                Dm = scipy.sparse.diags(mf)
                Am = (Dm @ self._scipy() @ Dm + scipy.sparse.diags(1.0 - mf)).tocsr()
                Am.sum_duplicates()
                Mm = Matrix(Am.indptr, Am.indices,
                            Am.data.astype(numpy.asarray(self.data).dtype), Am.shape)
                if getattr(self, '_field_offsets', None) is not None:
                    Mm._field_offsets = self._field_offsets
                if getattr(self, '_field_grids', None) is not None:
                    Mm._field_grids = self._field_grids
                self._masked_solve_cache = (key, Mm)
            b = numpy.where(isfree, rhs - (self @ xfix), 0.0)
            try:
                fn = {'cg': Mm._solve_cg, 'gmres': Mm._solve_gmres,
                      'bicgstab': Mm._solve_bicgstab}[eff]
                y = fn(b, atol=atol, rtol=rtol or 1e-11, precon=precon, **kwargs)
                return numpy.where(isfree, y, xfix)
            except ToleranceNotReached:
                if not auto:
                    raise
                log.warning(f'device {eff} failed to reach tolerance; '
                            'falling back to host direct solve')

        sub = self.submatrix(isfree, isfree)
        b = rhs[isfree] - (self @ xfix)[isfree]
        xf = sub._solve_free(b, 'direct' if eff in ('cg', 'gmres', 'bicgstab') else solver,
                             atol, rtol, symmetric, precon, **kwargs)
        x = xfix.copy()
        x[isfree] = xf
        return x

    def solve_leniently(self, *args, **kwargs):
        try:
            return self.solve(*args, **kwargs)
        except ToleranceNotReached as e:
            log.warning('solver failed to reach tolerance; continuing with best iterate')
            return e.best

    def getprecon(self, precon='diag', **args):
        '''Construct (and cache) a preconditioner (reference:
        matrix/_base.py:316).

        Device preconditioners (feed the jitted Krylov loops):

        * ``diag`` — inverse diagonal (reference: matrix/_base.py:338).
        * ``block`` — block-Jacobi with ``blocksize`` dense diagonal blocks,
          inverted host-side once and applied as a batched matmul.

        Host preconditioners (returned as callables, fed to scipy solvers):
        ``direct``/``splu`` (factorized sparse LU), ``spilu``/``spilu0``
        (incomplete LU; reference: matrix/_scipy.py:94-103).
        '''
        key = (precon, tuple(sorted(args.items())))
        cached = getattr(self, '_precon_cache', None)
        if cached is not None and cached[0] == key:
            return cached[1]
        if self.shape[0] != self.shape[1]:
            raise MatrixError('matrix must be square')
        if precon == 'diag':
            d = self.diagonal()
            if not d.all():
                raise MatrixError("building 'diag' preconditioner: diagonal has zero entries")
            obj = _Precon('diag', minv=1.0 / d)
        elif precon in ('schurdiag', 'schur-diag'):
            from .ops.sparse import schur_diag_inverse
            obj = _Precon('diag', minv=schur_diag_inverse(
                numpy.asarray(self.data), self.indices, self.indptr, self.shape[0]))
        elif precon == 'block':
            from .ops.sparse import block_jacobi_inverse
            bs = int(args.get('blocksize', 4))
            obj = _Precon('block', minv=block_jacobi_inverse(
                numpy.asarray(self.data), self.indices, self.indptr, self.shape[0], bs))
        elif precon in ('direct', 'splu'):
            import scipy.sparse.linalg
            try:
                obj = _Precon('host', apply=scipy.sparse.linalg.factorized(self._scipy().tocsc()))
            except RuntimeError as e:
                raise MatrixError(f'failed to create preconditioner: {e}') from e
        elif precon in ('spilu', 'spilu0'):
            import scipy.sparse.linalg
            if precon == 'spilu0':
                args = dict(args, fill_factor=1.)
            try:
                obj = _Precon('host', apply=scipy.sparse.linalg.spilu(self._scipy().tocsc(), **args).solve)
            except RuntimeError as e:
                raise MatrixError(f'failed to create preconditioner: {e}') from e
        else:
            raise MatrixError(f'unknown preconditioner {precon!r}')
        self._precon_cache = (key, obj)
        return obj

    def _solve_free(self, rhs, solver, atol, rtol, symmetric, precon, **kwargs):
        if not len(rhs):
            return numpy.zeros(0)
        fallback = False
        if solver is None:
            solver = config.matrix.value
        if solver == 'auto':
            if self.shape[0] < config.device_solve_min.value:
                solver = 'direct'
            else:
                solver = 'cg' if symmetric else 'gmres'
                fallback = True  # auto mode: demote to host direct on failure
        if solver in ('direct', 'scipy', 'dense'):
            return self._solve_direct(rhs)
        try:
            if solver == 'cg':
                return self._solve_cg(rhs, atol=atol, rtol=rtol or 1e-11, precon=precon, **kwargs)
            if solver == 'gmres':
                return self._solve_gmres(rhs, atol=atol, rtol=rtol or 1e-11, precon=precon, **kwargs)
            if solver == 'bicgstab' and precon not in ('direct', 'splu', 'spilu', 'spilu0'):
                return self._solve_bicgstab(rhs, atol=atol, rtol=rtol or 1e-11, precon=precon, **kwargs)
        except ToleranceNotReached:
            if not fallback:
                raise
            log.warning(f'device {solver} failed to reach tolerance; falling back to host direct solve')
            return self._solve_direct(rhs)
        if solver.startswith('scipy:'):
            return self._solver_scipy(rhs, solver[6:], atol=atol, rtol=rtol, precon=precon, **kwargs)
        if solver in ('bicg', 'bicgstab', 'cgs', 'lgmres'):  # host-precon bicgstab lands here
            return self._solver_scipy(rhs, solver, atol=atol, rtol=rtol, precon=precon, **kwargs)
        raise ValueError(f'unknown solver {solver!r}')

    def _solve_direct(self, rhs):
        import scipy.sparse.linalg
        try:
            return scipy.sparse.linalg.spsolve(self._scipy().tocsc(), rhs)
        except RuntimeError as e:
            raise MatrixError(str(e)) from e

    def _device_precon(self, precon, preconargs):
        '''Resolve the precon argument into (kind, minv array) for the device
        Krylov drivers.  The default is the Schur-aware diagonal
        (:func:`ops.sparse.schur_diag_inverse`): plain Jacobi on rows with a
        healthy diagonal, a diagonal Schur-complement estimate on rows whose
        diagonal is negligible (the pressure block of saddle-point systems),
        which keeps GMRES iteration counts near mesh-independent where naive
        Jacobi diverges with size.

        The default is computed ON DEVICE (ops/sparse.schur_diag_inverse_device)
        from device-resident values and pattern-cached index tables, and cached
        per matrix: a fresh Newton jacobian costs one O(nnz) jitted pass, not a
        full weight transfer plus two host scatter passes per solve.  Under a
        device mesh the host version stays (the sharded drivers expect
        host-side minv they can lay out themselves).'''
        if precon is None:
            from . import parallel
            cached = getattr(self, '_device_precon_cache', None)
            if cached is not None and cached[0] == parallel.mesh_token():
                return cached[1]
            if parallel.default_mesh() is not None:
                from .ops.sparse import schur_diag_inverse
                out = 'diag', schur_diag_inverse(
                    numpy.asarray(self.data), self.indices, self.indptr, self.shape[0])
            else:
                import jax.numpy as jnp
                from .ops.sparse import schur_diag_inverse_device
                pat = getattr(self, '_pattern', None)
                holder = pat if pat is not None else self
                tabs = getattr(holder, '_precon_tables', None)
                if tabs is None:
                    counts = numpy.diff(self.indptr)
                    rows = numpy.repeat(numpy.arange(self.shape[0]), counts)
                    tabs = holder._precon_tables = (jnp.asarray(self.indices), jnp.asarray(rows))
                out = 'diag', schur_diag_inverse_device(
                    self._device_data(), tabs[0], tabs[1], self.shape[0])
            self._device_precon_cache = (parallel.mesh_token(), out)
            return out
        if isinstance(precon, _Precon):
            obj = precon
        else:
            obj = self.getprecon(precon, **(preconargs or {}))
        if obj.kind == 'host':
            raise MatrixError(f'host preconditioner cannot feed the device solver')
        return obj.kind, obj.minv

    def _masked_op(self, mv_kind, op, isfree, dt):
        import jax.numpy as jnp
        mfree = jnp.asarray(numpy.asarray(isfree, dtype=dt))
        return ('masked', mv_kind), (mfree,) + tuple(op)

    def _mg(self):
        '''Cached geometric-multigrid hierarchy for stencil-form matrices
        (None when the grid cannot coarsen); see ops/mg.py.'''
        cached = getattr(self, '_mg_cache', '?')
        if cached != '?':
            return cached
        from .ops import mg as _mg
        from .ops import stencil as _stencil
        form = None
        if getattr(self, '_ks', None) is not None:
            # stencil-form assembled matrix: exact metadata, zero inference
            W = int(numpy.prod([2 * k + 1 for k in self._ks]))
            form = _stencil.StencilForm(numpy.asarray(self._w).reshape((W,) + self._grid),
                                        self._ks, self._grid, None, None, self._periodic)
        elif self.shape[0] == self.shape[1]:
            grids = getattr(self, '_field_grids', None)
            if grids is not None and len(grids) == 1 and grids[0] is not None:
                form = _stencil.from_csr_grid(numpy.asarray(self.data), self.indices,
                                              self.indptr, grids[0][0])
            if form is None:
                form = _stencil.from_csr(numpy.asarray(self.data), self.indices,
                                         self.indptr, self.shape[0])
        out = None
        if form is not None:
            dt = numpy.asarray(self.data).dtype
            out = _mg.setup(form, self.data, self.indices, self.indptr, dtype=dt)
        self._mg_cache = out
        return out

    def _fieldsplit(self):
        '''Cached block-diagonal (fieldsplit) preconditioner for multi-field
        systems: each diagonal field block that is a coarsenable grid
        stencil gets a geometric-multigrid V-cycle, the rest get the
        Schur-aware inverse diagonal — the standard segregated precondition
        for saddle-point systems (velocity MG + pressure scaling), built
        from the same slice-only ingredients as ops/mg.py.  Returns
        (kind, operands) or None when no field coarsens.'''
        cached = getattr(self, '_fieldsplit_cache', '?')
        if cached != '?':
            return cached
        import jax.numpy as jnp
        from .ops import stencil as _st
        from .ops import mg as _mgmod
        from .ops.sparse import schur_diag_inverse
        offsets = tuple(int(o) for o in self._field_offsets)
        A = self._scipy()
        dt = numpy.asarray(self.data).dtype
        minv_full = schur_diag_inverse(numpy.asarray(self.data), self.indices,
                                       self.indptr, self.shape[0])
        # strong-diagonal test against the FULL row norm: a saddle-point
        # pressure block (diagonal = eps-stabilization only) must keep the
        # Schur-complement scaling — exactly inverting eps*M with MG is the
        # wrong operator and destroys convergence (measured: 7.6k vs 300
        # GMRES iterations on a Taylor-Hood step)
        d_full = A.diagonal()
        rownorm = numpy.sqrt(numpy.asarray(A.multiply(A).sum(axis=1)).ravel())
        strong = numpy.abs(d_full) > 1e-3 * numpy.maximum(rownorm, 1e-300)
        grids = getattr(self, '_field_grids', None)
        kinds, ops = [], []
        any_mg = False
        for i in range(len(offsets) - 1):
            lo, hi = offsets[i], offsets[i + 1]
            Ab = A[lo:hi, lo:hi].tocsr()
            mg = None
            if strong[lo:hi].mean() > 0.9 and Ab.nnz:
                hint = grids[i] if grids is not None else None
                form = _st.from_csr_grid(Ab.data, Ab.indices, Ab.indptr, hint[0]) \
                    if hint is not None else None
                if form is None:
                    form = _st.from_csr(Ab.data, Ab.indices, Ab.indptr, hi - lo)
                if form is not None:
                    mg = _mgmod.setup(form, Ab.data, Ab.indices, Ab.indptr, dtype=dt)
            if mg is not None:
                kinds.append(('mg', mg.levels))
                ops.append((mg.ws, mg.dinvs, mg.coarse_inv))
                any_mg = True
            else:
                kinds.append('diag')
                ops.append(jnp.asarray(minv_full[lo:hi].astype(dt)))
        out = (('fieldsplit', offsets, tuple(kinds)), tuple(ops)) if any_mg else None
        self._fieldsplit_cache = out
        return out

    def _inf_norm(self):
        cached = getattr(self, '_inf_norm_cache', None)
        if cached is None:
            counts = numpy.diff(self.indptr)
            rows = numpy.repeat(numpy.arange(self.shape[0]), counts)
            sums = numpy.zeros(self.shape[0])
            numpy.add.at(sums, rows, numpy.abs(numpy.asarray(self.data, dtype=numpy.float64)))
            cached = self._inf_norm_cache = float(sums.max(initial=0.0))
        return cached

    def _accept(self, x, resnorm, target, dt):
        '''True residual acceptance with the attainable floating-point floor:
        ||b - A x|| cannot drop below ~eps ||A|| ||x|| no matter the solver
        (the direct solve shares the same floor), so a target beneath it is
        granted at the floor.'''
        if not numpy.isfinite(x).all():
            return False
        if float(resnorm) <= target * 1.001:
            return True  # short-circuit: the floor (which costs an _inf_norm
            # pass over the data, a device transfer on fresh jacobians) only
            # matters when the target was missed
        floor = 16 * numpy.finfo(dt).eps * self._inf_norm() * max(1.0, float(numpy.linalg.norm(x)))
        return float(resnorm) <= floor

    def _device_krylov(self, method, rhs, *, atol, rtol, maxiter=None, restart=100,
                       precon=None, preconargs=None, _isfree=None):
        '''Mixed-precision iteratively-refined device Krylov solve.

        The inner CG/GMRES loop runs fully on device in the ASSEMBLY dtype
        (float64 traces on a TPU at best crawl through emulation and on this
        toolchain crash the worker), and an outer iterative-refinement loop
        recomputes the TRUE residual in float64 on the host and re-solves for
        the correction: ``A d = b - A x`` contracts the error by whatever
        factor the low-precision inner solve achieves (measured ~1e-2..1e-4
        per round for f32), so reference-class tolerances (1e-10) are reached
        at f32 device speed — the standard mixed-precision HPC pattern, and
        the honest replacement for a recursive-residual "convergence" that
        hides O(1e-3) true error.  ``_isfree`` switches to masked-operator
        constraint handling, preserving the stencil/ell operator structure.
        '''
        import jax.numpy as jnp
        from .ops.sparse import bicgstab_op, cg_op, gmres_op
        b64 = numpy.asarray(rhs, dtype=numpy.float64)
        target = max(atol, rtol * float(numpy.linalg.norm(b64)))
        mv_kind, op = self._device_op()
        # read the dtype off the operand metadata: numpy.asarray here would
        # pull the full weight buffer over the interconnect just for .dtype
        dt = numpy.dtype(str(op[0].dtype))
        # stencil operators get a geometric-multigrid V-cycle preconditioner
        # by default: f32 Krylov alone stagnates at O(1) true residual for
        # cond >~1e4 (measured: scipy f32 CG at 263k dofs ends at 0.63
        # relative), while MG-preconditioned CG converges in O(10) iterations
        # independent of size (ops/mg.py).  The same (symmetric) cycle also
        # preconditions GMRES on nonsymmetric stencil systems
        # (convection-diffusion class); divergent cases are caught by the
        # refinement loop's contraction test and fall through to the
        # diagonal/host paths.
        kind = minv = None
        if method in ('cg', 'gmres', 'bicgstab') and precon is None and _isfree is None \
                and mv_kind[0] == 'stencil':
            mg = self._mg()
            if mg is not None:
                kind = ('mg', mg.levels)
                minv = (mg.ws, mg.dinvs, mg.coarse_inv)
        elif precon == 'fieldsplit' and getattr(self, '_field_offsets', None) is not None:
            # opt-in segregated preconditioner (velocity-block MG + Schur
            # diagonal): halves iteration counts on Taylor-Hood steps but a
            # V(2,2) cycle costs ~6 matvec-equivalents, so it only pays when
            # the diagonal blocks are stiff (viscous/steady regimes); the
            # mass-dominant time-stepping default stays schur-diag
            fs = self._fieldsplit()
            if fs is not None:
                kind, minv = fs
            else:
                precon = None
        if kind is None:
            kind, minv = self._device_precon(precon, preconargs)
            # cast/mask on device: a numpy round-trip here pulls the minv
            # vector (and on fresh jacobians the whole data array) to host
            minv = jnp.asarray(minv, dtype=dt)
            if _isfree is not None and kind == 'diag':
                minv = jnp.where(jnp.asarray(_isfree), minv, jnp.asarray(1.0, dtype=dt))
        base_kind, base_op = mv_kind, op
        fused_x = None
        fused_it = 0
        if _isfree is not None:
            mv_kind, op = self._masked_op(mv_kind, op, _isfree, dt)
        # hot path: the whole refinement contraction as ONE device
        # program (the f32 inner Krylov nested in an on-device f64
        # true-residual loop over the exactly-widened operator).  The
        # host loop below moves two full-length vectors over the
        # interconnect per round, which dominated the measured 1M-dof
        # solve wall-clock on this environment's tunnelled TPU
        # (ops/sparse._refined_driver).  The device f64 is an f32-pair
        # emulation whose matvec floors ~20x above true float64
        # (measured: 4e-15/entry vs 2e-16), so when the target sits
        # below that floor the host loop polishes the fused iterate
        # with genuine-f64 residuals — paying its per-round transfer
        # cost only for the final decade.  Constrained solves run it on
        # the masked operator (previously they skipped straight to the
        # host loop, whose f32-only inner solves floor at the
        # f32-operator limit — the cylinderflow div(u) gap).
        n = self.shape[0]
        cap0 = maxiter or max(1024, int(16 * numpy.sqrt(n)))
        from .ops.sparse import refined_solve_op
        op64_cache = getattr(self, '_op64_cache', None)
        from .parallel import mesh_token
        op64_key = (mv_kind, mesh_token())
        if op64_cache is None or op64_cache[0] != op64_key:
            import jax.numpy as jnp
            # widen only floating operands: index arrays (csr indices,
            # ell/bell cols, row ids) must keep their integer dtype
            op64_cache = (op64_key, tuple(
                jnp.asarray(o, dtype=jnp.float64)
                if jnp.issubdtype(jnp.asarray(o).dtype, jnp.floating)
                else jnp.asarray(o) for o in op))
            self._op64_cache = op64_cache
        import time as _time
        _t0 = _time.perf_counter()
        fused_x, resnorm, fused_it, rounds = refined_solve_op(
            method, mv_kind, op, b64, target=target, maxiter=cap0,
            restart=restart, minv=minv, precon=kind, op64=op64_cache[1])
        # attribution record for benches/logs: which operator form, precon,
        # and iteration counts this solve actually used (the reference logs
        # the same through treelog, solver.py:495)
        self._solve_stats = {
            'method': method,
            'op_form': mv_kind[0] if not isinstance(mv_kind[0], tuple) else 'masked',
            'precon': kind if isinstance(kind, str) else kind[0],
            'iters': int(fused_it), 'rounds': int(rounds),
            't_fused': _time.perf_counter() - _t0,
            'accepted_on_device': False,
        }
        norm_b = float(numpy.linalg.norm(b64))
        if not numpy.isfinite(fused_x).all():
            fused_x = None
        elif resnorm <= target:
            if target > 1e-8 * norm_b:
                # the emulated-f64 device matvec floors ~20x above true
                # float64 (~4e-15/entry relative): at targets >= 1e-8 |b|
                # that floor is six decades of margin, so the device-computed
                # residual IS the true residual to working precision — accept
                # without a host verification matvec (which would otherwise
                # materialize/transfer the full operator per solve: the
                # dominant cost of the measured 983k-dof Newton sub-solve)
                log.debug(f'{method} converged in {fused_it} device iterations / '
                          f'{rounds} rounds (device resnorm {resnorm:.1e}, accepted '
                          f'at loose target {target:.1e})')
                self._solve_stats['accepted_on_device'] = True
                return fused_x
            # tight targets: do NOT accept on the device-computed f64
            # residual; fall through to the host loop, which recomputes the
            # residual once via apply64 (one transfer) and routes through
            # _accept
            log.debug(f'{method} fused pass reached device resnorm {resnorm:.1e} '
                      f'in {fused_it} iterations / {rounds} rounds; verifying on host')
        if base_kind[0] == 'stencil':
            # float64 refinement residual through the host stencil matvec:
            # the CSR face of the operator is never materialized on the
            # device solve path (ops/stencil.matvec_numpy)
            from .ops import stencil as _st
            w64 = getattr(self, '_w64_host', None)
            if w64 is None:
                w64 = self._w64_host = numpy.asarray(base_op[0], dtype=numpy.float64)
            _sk, _ks, _shape, _per = base_kind

            def apply_raw(x):
                return _st.matvec_numpy(w64, x, _ks, _shape, _per)
        else:
            A64 = self._scipy().astype(numpy.float64)

            def apply_raw(x):
                return A64 @ x

        def apply64(x):
            if _isfree is None:
                return apply_raw(x)
            return numpy.where(_isfree, apply_raw(numpy.where(_isfree, x, 0.0)), x)

        inner = {'cg': cg_op, 'gmres': gmres_op, 'bicgstab': bicgstab_op}[method]
        n = self.shape[0]
        # per-round iteration budget: O(sqrt(n)) covers a healthy
        # Jacobi-preconditioned CG on second-order problems; anything the
        # round leaves on the table is picked up by the next refinement
        # round (warm restart from the true residual), so capping cannot
        # lose convergence — it only bounds the time wasted when the inner
        # recursion grinds below its precision floor
        cap = maxiter or max(1024, int(16 * numpy.sqrt(n)))
        inner_kwargs = dict(minv=minv if isinstance(minv, tuple) else jnp.asarray(minv),
                            precon=kind, maxiter=cap)
        if method == 'gmres':
            inner_kwargs['restart'] = restart
        eps_dt = float(numpy.finfo(dt).eps)
        if fused_x is not None:
            x = fused_x
            r = b64 - apply64(x)
        else:
            x = numpy.zeros(n)
            r = b64
        total_it = fused_it
        for outer in range(30):
            rn = float(numpy.linalg.norm(r))
            if rn <= target or not numpy.isfinite(rn):
                break
            # the inner system is solved for the NORMALIZED residual r/|r|
            # (and the correction rescaled): low-precision Krylov at O(1)
            # magnitudes avoids the underflow blow-ups observed when a
            # late-round residual of ~1e-8 entered the f32 loop.  Ask only
            # for what the precision can deliver this round; deeper targets
            # are reached by later rounds.
            # sqrt(eps) per round is reliably reachable (f32: 3.5e-4) and
            # exits the inner loop by convergence instead of stall detection;
            # three rounds of it already overshoot a 1e-10 target
            inner_atol = max(target / rn, float(numpy.sqrt(eps_dt)))
            d, _rnin, it = inner(mv_kind, op, jnp.asarray(r / rn, dtype=dt),
                                 atol=inner_atol, **inner_kwargs)
            d = rn * numpy.asarray(d, dtype=numpy.float64)
            total_it += int(it)
            if not numpy.isfinite(d).all():
                break
            x_new = x + d
            r_new = b64 - apply64(x_new)
            if float(numpy.linalg.norm(r_new)) >= 0.95 * rn:
                # inner solve no longer contracts the error: floor reached
                if float(numpy.linalg.norm(r_new)) < rn:
                    x, r = x_new, r_new
                break
            x, r = x_new, r_new
        resnorm = float(numpy.linalg.norm(r))
        if not self._accept(x, resnorm, target, numpy.float64):
            if precon is None and _isfree is None \
                    and getattr(self, '_field_offsets', None) is not None \
                    and self._fieldsplit() is not None:
                # second tier before the host-direct demotion: stiff
                # (diffusion-dominant) multi-field systems defeat the
                # diagonal scaling but converge under the segregated
                # velocity-MG preconditioner (measured on Stokes: diag
                # stalls, fieldsplit reaches 1e-8)
                log.debug(f'{method} with diagonal scaling stalled; retrying with fieldsplit')
                return self._device_krylov(method, rhs, atol=atol, rtol=rtol,
                                           maxiter=maxiter, restart=restart,
                                           precon='fieldsplit')
            raise ToleranceNotReached(numpy.where(numpy.isfinite(x), x, 0.0))
        log.debug(f'{method} converged in {total_it} device iterations / {outer + 1} '
                  f'refinement rounds (resnorm {resnorm:.1e})')
        return x

    def _solve_cg(self, rhs, *, atol, rtol, maxiter=None, precon=None, preconargs=None, _isfree=None):
        '''Preconditioned CG: jitted device inner loop + float64 iterative
        refinement (see _device_krylov).'''
        return self._device_krylov('cg', rhs, atol=atol, rtol=rtol, maxiter=maxiter,
                                   precon=precon, preconargs=preconargs, _isfree=_isfree)

    def _solve_gmres(self, rhs, *, atol, rtol, maxiter=None, restart=100, precon=None, preconargs=None, _isfree=None):
        '''Restarted GMRES(m): jitted device inner loop + float64 iterative
        refinement (the reference's MKL FGMRES role, matrix/_mkl.py:205).'''
        return self._device_krylov('gmres', rhs, atol=atol, rtol=rtol, maxiter=maxiter,
                                   restart=restart, precon=precon, preconargs=preconargs,
                                   _isfree=_isfree)

    def _solve_bicgstab(self, rhs, *, atol, rtol, maxiter=None, precon=None, preconargs=None, _isfree=None):
        '''Device BiCGStab + float64 iterative refinement: the
        short-recurrence nonsymmetric alternative when restarted GMRES
        stalls (reference scipy family: matrix/_scipy.py:67-72).'''
        return self._device_krylov('bicgstab', rhs, atol=atol, rtol=rtol, maxiter=maxiter,
                                   precon=precon, preconargs=preconargs, _isfree=_isfree)

    def _solver_scipy(self, rhs, method, *, atol, rtol, maxiter=None, precon=None, preconargs=None, **kwargs):
        '''Host scipy iterative family (reference: matrix/_scipy.py:74-92).'''
        import scipy.sparse.linalg
        A = self._scipy()
        M = None
        if precon is not None:
            obj = precon if isinstance(precon, _Precon) else self.getprecon(precon, **(preconargs or {}))
            apply = obj.apply_host()
            # rmatvec: exact for the symmetric diag/block kinds, and the
            # customary same-operator approximation for ILU (bicg requires it)
            M = scipy.sparse.linalg.LinearOperator(A.shape, apply, rmatvec=apply, dtype=float)
        solverfun = getattr(scipy.sparse.linalg, method)
        target = max(atol, rtol * float(numpy.linalg.norm(rhs)))
        if maxiter is None and method == 'lgmres':
            maxiter = 1000
        x, info = solverfun(A, rhs, M=M, atol=target, rtol=0., maxiter=maxiter, **kwargs)
        if info != 0:
            raise ToleranceNotReached(x)
        return x


class _SubMatrix(Matrix):
    '''Lazy symmetric-mask submatrix view: ``solve`` runs as a masked solve
    on the parent (keeping stencil structure and the MG preconditioner);
    CSR arrays materialize only when some other operation needs them.'''

    def __init__(self, parent, mask):
        self._parent = parent
        self._mask = numpy.asarray(mask, dtype=bool)
        nf = int(self._mask.sum())
        self.shape = (nf, nf)

    def __getattr__(self, name):
        if name in ('indptr', 'indices', 'data'):
            m = self._parent._scipy()[self._mask][:, self._mask].tocsr()
            self.indptr = m.indptr
            self.indices = m.indices
            self.data = m.data
            return getattr(self, name)
        raise AttributeError(name)

    def solve(self, rhs=None, *, constrain=None, **kwargs):
        if constrain is None:
            full = numpy.zeros(self._parent.shape[0])
            if rhs is not None:
                full[self._mask] = numpy.asarray(rhs, dtype=float)
            x = self._parent.solve(full, constrain=~self._mask, **kwargs)
            return x[self._mask]
        return super().solve(rhs, constrain=constrain, **kwargs)


class _StencilMatrix(Matrix):
    '''Matrix whose device payload is a verified grid-stencil weight array
    w[prod(2k_i+1) * prod(shape)] (solver stencil-form jacobian assembly):
    the device solvers consume the stencil directly with zero copies, and
    the CSR data array materializes lazily (host gather) only when some
    other operation needs it.'''

    def __init__(self, pattern, w_flat, ks, grid_shape, csr_map, periodic=None):
        self._pattern_src = pattern  # solver._LazyPattern or SparsePattern
        self.shape = tuple(pattern.shape)
        self._w = w_flat
        self._ks = tuple(int(k) for k in ks)
        self._grid = tuple(int(s) for s in grid_shape)
        self._csr_map = csr_map  # index array, or 0-arg callable (deferred)
        self._periodic = tuple(bool(p) for p in periodic) if periodic is not None \
            else (False,) * len(self._grid)

    def __getattr__(self, name):
        # the CSR face of the operator materializes on first touch only: the
        # device solve path consumes the stencil weights directly
        if name in ('indptr', 'indices'):
            pat = self._pattern_src
            self.indptr = pat.indptr
            self.indices = pat.indices
            return getattr(self, name)
        if name == 'data':
            if callable(self._csr_map):
                self._csr_map = self._csr_map()
            self.data = numpy.asarray(self._w)[self._csr_map]
            return self.data
        raise AttributeError(name)

    def __matmul__(self, vec):
        from .ops import stencil as _st
        v = numpy.asarray(vec)
        return _st.matvec_numpy(numpy.asarray(self._w, dtype=numpy.float64), v,
                                self._ks, self._grid, self._periodic).astype(v.dtype, copy=False)

    def diagonal(self):
        # the center window slot (zero shift on every axis) holds the
        # diagonal: mixed-radix digit k_i of radix 2k_i+1 per axis = (W-1)/2
        w = numpy.asarray(self._w)
        W = int(numpy.prod([2 * k + 1 for k in self._ks]))
        return w.reshape(W, -1)[(W - 1) // 2][:self.shape[0]].astype(numpy.float64)

    def _device_op(self):
        from . import parallel
        cached = getattr(self, '_device_op_cache', None)
        if cached is not None and cached[0] == parallel.mesh_token():
            return cached[1]
        import jax.numpy as jnp
        W = int(numpy.prod([2 * k + 1 for k in self._ks]))
        out = (('stencil', self._ks, self._grid, self._periodic),
               (jnp.asarray(self._w).reshape((W,) + self._grid),))
        mesh = parallel.default_mesh()
        if mesh is not None:
            out = (out[0], parallel.shard_device_op(out[0], out[1], mesh))
        self._device_op_cache = (parallel.mesh_token(), out)
        return out


class _BlockGridMatrix(Matrix):
    '''Matrix whose device payload is the concatenated block-grid weight
    buffer (solver blockgrid-form jacobian assembly of multi-field
    structured systems): the device solvers consume the per-(block, phase)
    weight arrays directly with zero copies, and the CSR data array
    materializes lazily (host gather) only when some other operation needs
    it.'''

    def __init__(self, pattern, w_flat, meta, sizes, csr_map, woff=None):
        self.indptr = pattern.indptr
        self.indices = pattern.indices
        self.shape = tuple(pattern.shape)
        self._pattern = pattern  # pattern-level device-table caches persist across Newton steps
        self._w = w_flat
        self._meta = meta
        self._sizes = tuple(int(s) for s in sizes)
        self._woff = tuple(int(o) for o in woff) if woff is not None \
            else tuple(numpy.concatenate([[0], numpy.cumsum(self._sizes)[:-1]]))
        self._csr_map = csr_map

    def __getattr__(self, name):
        if name == 'data':
            self.data = numpy.asarray(self._w)[self._csr_map]
            return self.data
        raise AttributeError(name)

    def _device_data(self):
        '''CSR values gathered from the device weight buffer via a pattern-
        cached device copy of the csr map — no host materialization.'''
        import jax.numpy as jnp
        holder = getattr(self, '_pattern', None)
        if holder is None:
            holder = self
        cmap = getattr(holder, '_csr_map_dev', None)
        if cmap is None:
            cmap = holder._csr_map_dev = jnp.asarray(self._csr_map)
        return jnp.asarray(self._w)[cmap]

    def _device_op(self):
        from . import parallel
        cached = getattr(self, '_device_op_cache', None)
        if cached is not None and cached[0] == parallel.mesh_token():
            return cached[1]
        import jax.numpy as jnp
        from .ops import blockgrid as _bg
        w = jnp.asarray(self._w)
        shapes = _bg._w_shapes(self._meta)
        ws = [w[o:o + s].reshape(shp)
              for o, s, shp in zip(self._woff, self._sizes, shapes)]
        out = (('blockgrid', self._meta), tuple(ws))
        mesh = parallel.default_mesh()
        if mesh is not None:
            out = (out[0], parallel.shard_device_op(out[0], out[1], mesh))
        self._device_op_cache = (parallel.mesh_token(), out)
        return out


class _Precon:
    '''Preconditioner handle: device kinds carry an ``minv`` array consumed by
    the jitted Krylov drivers; host kind carries an apply callable.'''

    def __init__(self, kind, minv=None, apply=None):
        self.kind = kind
        self.minv = minv
        self.apply = apply

    def apply_host(self):
        if self.kind == 'host':
            return self.apply
        if self.kind == 'diag':
            minv = self.minv
            return lambda v: minv * v
        if self.kind == 'block':
            from .ops.sparse import _apply_block
            minv = numpy.asarray(self.minv)
            nb, bs, _ = minv.shape
            def apply(v):
                n = len(v)
                vp = numpy.pad(v, (0, nb * bs - n))
                return numpy.einsum('bij,bj->bi', minv, vp.reshape(nb, bs)).ravel()[:n]
            return apply
        raise MatrixError(self.kind)


def assemble_block_csr(blocks):
    '''Stitch a dense 2-D grid of Matrix blocks into one CSR matrix
    (reference: matrix/__init__.py:103).'''
    import scipy.sparse
    grid = [[b._scipy() for b in row] for row in blocks]
    out = scipy.sparse.bmat(grid, format='csr')
    return Matrix(out.indptr, out.indices, out.data, out.shape)
