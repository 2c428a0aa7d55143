'''Device-side sparse kernels: CSR matvec and Krylov solvers (jitted).

The TPU-native replacement for the reference's MKL Pardiso/FGMRES bindings
(reference: matrix/_mkl.py:205 ``_solver_fgmres``, matrix/_scipy.py:67-92
cg/gmres family): a segment-sum CSR matvec feeding

* Jacobi/block-Jacobi-preconditioned conjugate gradients under
  ``lax.while_loop`` (symmetric systems), and
* left-preconditioned restarted GMRES(m) with CGS2 orthogonalization and
  Givens rotations, inner Arnoldi under ``lax.while_loop``,

so the entire Krylov iteration stays on device with no host round-trips.
The jitted drivers live at module level and are re-entered through JAX's
shape-keyed jit cache, so repeated Newton sub-solves of the same system
do not retrace.

Preconditioner application is fused into the loop body; the two supported
device preconditioners are

* ``diag``  — elementwise multiply by 1/diag(A) (reference:
  matrix/_base.py:338 ``_precon_diag``), and
* ``block`` — block-Jacobi: host-extracted dense diagonal blocks are
  inverted once (numpy) and applied as one batched matmul, the natural
  MXU-friendly generalization for vector-valued fields.
'''

import functools

import numpy


def _row_ids(indptr):
    '''Expand CSR indptr to a per-entry row id vector (host, cached).'''
    counts = numpy.diff(indptr)
    return numpy.repeat(numpy.arange(len(counts)), counts)


def csr_to_ell(data, indices, indptr):
    '''Convert CSR arrays to the padded ELL layout (vals [N, W], cols [N, W],
    zero-padded): FEM rows have a bounded nonzero count, so the matvec
    becomes a regular statically-shaped gather + dense reduce.'''
    data = numpy.asarray(data)
    indices = numpy.asarray(indices)
    indptr = numpy.asarray(indptr)
    counts = numpy.diff(indptr)
    N = len(counts)
    W = int(counts.max()) if N else 0
    vals = numpy.zeros((N, W), dtype=data.dtype)
    cols = numpy.zeros((N, W), dtype=numpy.int32)
    pos = numpy.arange(len(data)) - numpy.repeat(indptr[:-1], counts)
    rows = numpy.repeat(numpy.arange(N), counts)
    vals[rows, pos] = data
    cols[rows, pos] = indices
    return vals, cols


def bell_plan(indices, indptr, blockrows=32):
    '''Pattern-only part of the block-ELL conversion (cacheable per sparsity
    pattern): returns (cols [nb, Wb], rb, rmod, slotcol) where fresh CSR
    values refill as vals[rb, rmod, slotcol] = data.'''
    indices = numpy.asarray(indices).astype(numpy.int64)
    indptr = numpy.asarray(indptr)
    n = len(indptr) - 1
    R = int(blockrows)
    nb = -(-n // R)
    counts = numpy.diff(indptr)
    rows = numpy.repeat(numpy.arange(n), counts)
    rb = rows // R
    # unique (block, column) pairs and each entry's slot within its block —
    # one global sort instead of a per-block python loop
    key = rb * n + indices
    ukey, inv = numpy.unique(key, return_inverse=True)
    ub = ukey // n
    uc = ukey % n
    widths = numpy.bincount(ub, minlength=nb)
    Wb = int(widths.max()) if len(ukey) else 1
    block_start = numpy.concatenate([[0], numpy.cumsum(widths)[:-1]])
    pos_u = numpy.arange(len(ukey)) - block_start[ub]
    cols = numpy.zeros((nb, Wb), dtype=numpy.int32)
    cols[ub, pos_u] = uc
    return cols, rb, rows % R, pos_u[inv], R


def bell_fill(plan, data):
    '''Value part of the block-ELL conversion: vals [nb, R, Wb].'''
    data = numpy.asarray(data)
    cols, rb, rmod, slotcol, R = plan
    nb, Wb = cols.shape
    vals = numpy.zeros((nb, R, Wb), dtype=data.dtype)
    vals[rb, rmod, slotcol] = data
    return vals


def csr_to_bell(data, indices, indptr, blockrows=32):
    '''Convert CSR arrays to the shared-column block-ELL layout: rows are
    grouped into blocks of R = ``blockrows``, each block gathers its UNIQUE
    column set once (padded to the widest block, Wb) and applies a dense
    [R, Wb] value matrix.  FEM rows that are neighbors in dof order share
    most of their columns, so the per-element gathers — the serializing cost
    on this toolchain (~7 ns each, see the measurement record in
    ops/stencil.py) — drop by roughly R/(Wb/W) while the added dense work
    rides the MXU/VPU at roofline.  Returns (vals [nb, R, Wb], cols [nb, Wb]).'''
    plan = bell_plan(indices, indptr, blockrows)
    return bell_fill(plan, data), plan[0]


def csr_matvec(data, indices, indptr, x, row_ids=None):
    import jax.numpy as jnp
    if row_ids is None:
        row_ids = _row_ids(indptr)
    prod = data * x[indices]
    n = len(indptr) - 1
    return jnp.zeros(n, dtype=prod.dtype).at[row_ids].add(prod)


# ------------------------------------------------------------ precon apply

def _apply_diag(minv, r):
    return minv * r


def _apply_block(minv, r):
    # minv: [nb, bs, bs] inverted diagonal blocks; r: [n] with n <= nb*bs
    import jax.numpy as jnp
    nb, bs, _ = minv.shape
    n = r.shape[0]
    pad = nb * bs - n
    rp = jnp.pad(r, (0, pad)) if pad else r
    out = jnp.einsum('bij,bj->bi', minv, rp.reshape(nb, bs)).ravel()
    return out[:n] if pad else out


_PRECON_APPLY = {'diag': _apply_diag, 'block': _apply_block}


def _precon_apply(kind):
    '''Resolve a precon kind — a name, ('mg', levels) with the static
    per-level (ks, shape) tuple, or ('fieldsplit', offsets, subkinds) — to
    an apply(operand, r) callable.'''
    if isinstance(kind, tuple) and kind[0] == 'mg':
        from . import mg as _mg
        levels = kind[1]
        fn = _mg._vcycle_fn(levels, 2)
        shape = levels[0][1]

        def apply(operand, r):
            return fn(operand, r.reshape(shape)).reshape(-1)
        return apply
    if isinstance(kind, tuple) and kind[0] == 'fieldsplit':
        import jax.numpy as jnp
        offs, subkinds = kind[1], kind[2]
        subs = [_precon_apply(k) for k in subkinds]

        def apply(operand, r):
            return jnp.concatenate([sub(op_i, r[lo:hi]) for sub, op_i, lo, hi
                                    in zip(subs, operand, offs[:-1], offs[1:])])
        return apply
    return _PRECON_APPLY[kind]


def schur_diag_inverse(data, indices, indptr, n, weak_rel=1e-3):
    '''Host: Schur-aware inverse-diagonal scaling for general CSR systems.

    Rows with a healthy diagonal get plain Jacobi ``1/d_i``.  Rows whose
    diagonal is negligible against the row norm (e.g. the pressure block of a
    saddle-point system, where the diagonal is only a small stabilization
    term) instead get the inverse of a diagonal Schur-complement estimate

        s_i = sum_k A_ik^2 / |d_k|   (over columns k with a healthy diagonal)

    — the exact diagonal of ``B diag(F)^-1 B^T`` for a [F B; B^T 0] block
    system.  Computable in O(nnz) with no block-structure information, and
    reducing to plain Jacobi for any matrix with a healthy diagonal, which
    makes it a safe default.  Measured on a Taylor-Hood Navier-Stokes time
    step this turns diag-preconditioned GMRES from O(n)-growing thousands of
    iterations into a near-mesh-independent ~30 (see tests/test_matrix.py).
    '''
    data = numpy.asarray(data, dtype=numpy.float64)
    indices = numpy.asarray(indices)
    counts = numpy.diff(indptr)
    rows = numpy.repeat(numpy.arange(n), counts)
    d = numpy.zeros(n, dtype=data.dtype)
    isdiag = indices == rows
    d[rows[isdiag]] = data[isdiag]
    sq = data * data
    rownorm2 = numpy.zeros(n, dtype=data.dtype)
    numpy.add.at(rownorm2, rows, sq)
    strong = numpy.abs(d) > weak_rel * numpy.sqrt(rownorm2)
    dsafe = numpy.where(strong, numpy.abs(d), 1.0)
    schur = numpy.zeros(n, dtype=data.dtype)
    numpy.add.at(schur, rows, sq / dsafe[indices])
    minv = numpy.where(strong, numpy.divide(1.0, numpy.where(strong, d, 1.0)),
                       numpy.where(schur > 0, numpy.divide(1.0, numpy.where(schur > 0, schur, 1.0)), 1.0))
    return minv


@functools.lru_cache(maxsize=None)
def _schur_diag_kernel(n, weak_rel):
    import jax
    import jax.numpy as jnp

    def kern(data, indices, rows):
        sq = data * data
        d = jax.ops.segment_sum(jnp.where(indices == rows, data, 0), rows,
                                num_segments=n, indices_are_sorted=True)
        rownorm2 = jax.ops.segment_sum(sq, rows, num_segments=n, indices_are_sorted=True)
        strong = jnp.abs(d) > weak_rel * jnp.sqrt(rownorm2)
        dsafe = jnp.where(strong, jnp.abs(d), 1.0)
        schur = jax.ops.segment_sum(sq / dsafe[indices], rows,
                                    num_segments=n, indices_are_sorted=True)
        return jnp.where(strong, 1.0 / jnp.where(strong, d, 1.0),
                         jnp.where(schur > 0, 1.0 / jnp.where(schur > 0, schur, 1.0), 1.0))
    return jax.jit(kern)


def schur_diag_inverse_device(data, indices, rows, n, weak_rel=1e-3):
    '''Device: :func:`schur_diag_inverse` as one jitted O(nnz) pass over
    device-resident CSR values and pattern tables (``rows`` = per-nnz row
    ids, sorted).  Keeps the default-preconditioner build of a fresh Newton
    jacobian on device — the host version costs two ``numpy.add.at`` passes
    plus a full data transfer over the device interconnect per solve.'''
    return _schur_diag_kernel(int(n), float(weak_rel))(data, indices, rows)


def block_jacobi_inverse(data, indices, indptr, n, blocksize):
    '''Host: extract dense diagonal blocks from CSR and invert them.

    Returns [nb, bs, bs] float array; rows/cols beyond n are padded with the
    identity so the apply is a pure batched matmul.
    '''
    import scipy.sparse
    bs = int(blocksize)
    nb = -(-n // bs)
    A = scipy.sparse.csr_matrix((numpy.asarray(data), numpy.asarray(indices), numpy.asarray(indptr)), shape=(n, n))
    blocks = numpy.tile(numpy.eye(bs, dtype=numpy.asarray(data).dtype), (nb, 1, 1))
    for b in range(nb):
        lo, hi = b * bs, min((b + 1) * bs, n)
        blk = A[lo:hi, lo:hi].toarray()
        blocks[b, :hi - lo, :hi - lo] = blk
    # guard singular blocks by falling back to diagonal
    out = numpy.empty_like(blocks)
    for b in range(nb):
        try:
            out[b] = numpy.linalg.inv(blocks[b])
        except numpy.linalg.LinAlgError:
            d = numpy.diag(blocks[b]).copy()
            d[d == 0] = 1.0
            out[b] = numpy.diag(1.0 / d)
    return out


# ------------------------------------------------------------ operator kinds
#
# The Krylov drivers are parameterized over the matvec form:
#
# * ('csr',)                 op = (data, indices, row_ids)   — scatter-add
# * ('ell',)                 op = (vals [n,W], cols [n,W])   — gather + dense
# * ('bell', R)              op = (vals [nb,R,Wb], cols [nb,Wb]) — shared-
#                            column row blocks: one gather per block column
#                            feeding a dense [R,Wb]@[Wb] contraction, cutting
#                            the serializing per-element gathers ~R-fold
# * ('stencil', ks, shape)   op = (w [prod(2k_i+1), *shape],) — shifted slices
#
# and each kind may be wrapped with a constraint mask: ('masked', kind) adds
# a leading mfree [n] (1.0 = free) operand and applies m*A(m*x) + (1-m)*x,
# the masked-solve constraint handling that keeps the operator structure
# intact (no submatrix; SURVEY 7.3).  Measured on a v5e at 1024^2 dofs, f32,
# 100 chained matvecs per dispatch: stencil 64 us/mv (~HBM roofline), ell
# 69 ms, csr scatter 145 ms — element-granular gathers serialize on this
# toolchain, so the stencil form is selected whenever the pattern permits
# (matrix.Matrix._device_op).


def _make_matvec(mv_kind):
    import jax.numpy as jnp
    if mv_kind[0] == 'masked':
        inner = _make_matvec(mv_kind[1])

        def mv(op, x):
            mfree = op[0]
            return mfree * inner(op[1:], mfree * x) + (1.0 - mfree) * x
        return mv
    if mv_kind[0] == 'csr':
        def mv(op, x):
            data, indices, row_ids = op
            prod = data * x[indices]
            return jnp.zeros(x.shape[0], dtype=prod.dtype).at[row_ids].add(prod)
        return mv
    if mv_kind[0] == 'ell':
        def mv(op, x):
            vals, cols = op
            return (vals * jnp.take(x, cols, axis=0)).sum(1)
        return mv
    if mv_kind[0] == 'bell':
        def mv(op, x):
            vals, cols = op            # [nb, R, Wb], [nb, Wb]
            xs = jnp.take(x, cols, axis=0)   # [nb, Wb] — one gather per block col
            return jnp.einsum('brw,bw->br', vals, xs).reshape(-1)[:x.shape[0]]
        return mv
    if mv_kind[0] == 'stencil':
        from . import stencil as _st
        _kind, ks, shape, periodic = mv_kind
        fn = _st._matvec_fn(ks, shape, periodic)

        def mv(op, x):
            (w,) = op
            return fn(w, x.reshape(shape)).reshape(-1)
        return mv
    if mv_kind[0] == 'blockgrid':
        from . import blockgrid as _bg
        fn = _bg._matvec_fn(mv_kind[1])

        def mv(op, x):
            return fn(op, x)
        return mv
    raise ValueError(f'unknown matvec kind {mv_kind!r}')


# ------------------------------------------------------------ CG

@functools.lru_cache(maxsize=32)
def _cg_driver(precon_kind, mv_kind=('csr',)):
    import jax
    import jax.numpy as jnp
    apply_m = _precon_apply(precon_kind)
    matvec_op = _make_matvec(mv_kind)

    def run(op, b, minv, atol, maxiter):
        def matvec(x):
            return matvec_op(op, x)

        def body(state):
            x, r, z, p, rz, k, stall, lastres = state
            Ap = matvec(p)
            alpha = rz / (p @ Ap)
            x = x + alpha * p
            r_rec = r - alpha * Ap
            # true-residual refresh: the recursive residual drifts from
            # b - A x in low precision (f32 runs otherwise report convergence
            # at ~1e-3 true relative residual).  Refresh on a 64-iteration
            # schedule and whenever the recursion claims convergence, so the
            # loop only ever EXITS on a true residual; stagnating refreshes
            # (the attainable floor) end the loop instead of livelocking.
            claimed = jnp.linalg.norm(r_rec) <= atol
            need = ((k + 1) % 64 == 0) | claimed
            r = jax.lax.cond(need, lambda: b - matvec(x), lambda: r_rec)
            rnorm = jnp.linalg.norm(r)
            # stagnation: no meaningful progress of the TRUE residual across
            # refresh windows means the attainable floor has been hit (even
            # cond ~1e8 CG improves >1% per 64 iterations when healthy)
            stall = jnp.where(need & (rnorm > 0.99 * lastres), stall + 1,
                              jnp.where(need, 0, stall))
            lastres = jnp.where(need, rnorm, lastres)
            z = apply_m(minv, r)
            rz_new = r @ z
            # SCHEDULED replacements keep the direction recursion (van der
            # Vorst: r_refresh ~ r_rec, conjugacy degrades only by the
            # drift); a CLAIMED-but-refuted convergence however replaces the
            # residual by a much larger true one, and continuing the
            # recursion there diverges (observed) — restart the direction
            # (beta = 0) on those rare events instead
            beta = jnp.where(claimed, 0.0, rz_new / rz)
            p = z + beta * p
            return x, r, z, p, rz_new, k + 1, stall, lastres

        def cond(state):
            x, r, z, p, rz, k, stall, lastres = state
            return (jnp.linalg.norm(r) > atol) & (k < maxiter) & (stall < 4)

        x0 = jnp.zeros_like(b)
        z0 = apply_m(minv, b)
        state = (x0, b, z0, z0, b @ z0, jnp.array(0, dtype=jnp.int32),
                 jnp.array(0, dtype=jnp.int32), jnp.linalg.norm(b))
        x, r, z, p, rz, k, stall, lastres = jax.lax.while_loop(cond, body, state)
        return x, jnp.linalg.norm(r), k

    return jax.jit(run, static_argnames=())


def cg_op(mv_kind, op, b, *, atol, maxiter, minv, precon='diag'):
    '''Preconditioned CG over an operator-kind/operand pair; returns
    (x, resnorm, iters).'''
    import jax.numpy as jnp
    run = _cg_driver(precon, mv_kind)
    m = minv if isinstance(minv, tuple) else jnp.asarray(minv)
    return run(tuple(op), b, m, jnp.asarray(atol, dtype=b.dtype),
               jnp.asarray(maxiter, dtype=jnp.int32))


def cg(data, indices, indptr, b, diag=None, *, atol, maxiter, minv=None, precon='diag'):
    '''Preconditioned conjugate gradients; returns (x, resnorm, iters).

    ``precon='diag'`` takes ``diag`` (the matrix diagonal) or ``minv``
    (its elementwise inverse); ``precon='block'`` takes ``minv`` as
    [nb, bs, bs] inverted diagonal blocks from :func:`block_jacobi_inverse`.
    '''
    import jax.numpy as jnp
    row_ids = jnp.asarray(_row_ids(indptr))
    if precon == 'diag' and minv is None:
        minv = jnp.where(diag != 0, 1.0 / diag, 1.0)
    return cg_op(('csr',), (data, indices, row_ids), b,
                 atol=atol, maxiter=maxiter, minv=minv, precon=precon)


# ------------------------------------------------------------ GMRES(m)

@functools.lru_cache(maxsize=32)
def _gmres_driver(precon_kind, restart, mv_kind=('csr',)):
    import jax
    import jax.numpy as jnp
    apply_m = _precon_apply(precon_kind)
    matvec_op = _make_matvec(mv_kind)
    m = int(restart)

    def run(op, b, minv, atol, maxiter):
        n = b.shape[0]
        dtype = b.dtype
        eps = jnp.asarray(numpy.finfo(numpy.dtype(str(dtype))).tiny * 16, dtype)

        def matvec(x):
            return matvec_op(op, x)

        def inner_body(state):
            V, R, g, cs, sn, j, res, inner_tol = state
            w = apply_m(minv, matvec(V[j]))
            # CGS2 orthogonalization against V[0..j] (static full contraction,
            # masked to the active columns)
            mask = (jnp.arange(m + 1) <= j).astype(dtype)
            h1 = (V @ w) * mask
            w = w - h1 @ V
            h2 = (V @ w) * mask
            w = w - h2 @ V
            h = h1 + h2
            hnorm = jnp.linalg.norm(w)
            h = h.at[j + 1].set(hnorm)
            V = V.at[j + 1].set(jnp.where(hnorm > eps, w / jnp.maximum(hnorm, eps), 0.0))

            # apply previous Givens rotations 0..j-1 to h
            def rot(i, h):
                t = cs[i] * h[i] + sn[i] * h[i + 1]
                h = h.at[i + 1].set(-sn[i] * h[i] + cs[i] * h[i + 1])
                return h.at[i].set(t)
            h = jax.lax.fori_loop(0, j, rot, h)

            # new rotation annihilating h[j+1]
            denom = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
            denom_safe = jnp.maximum(denom, eps)
            c_new, s_new = h[j] / denom_safe, h[j + 1] / denom_safe
            cs, sn = cs.at[j].set(c_new), sn.at[j].set(s_new)
            h = h.at[j].set(denom).at[j + 1].set(0.0)
            R = R.at[:, j].set(h[:m])
            g = g.at[j + 1].set(-s_new * g[j])
            g = g.at[j].set(c_new * g[j])
            res = jnp.abs(g[j + 1])
            return V, R, g, cs, sn, j + 1, res, inner_tol

        def inner_cond(state):
            V, R, g, cs, sn, j, res, inner_tol = state
            return jnp.logical_and(j < m, res > inner_tol)

        def outer_body(state):
            x, resnorm, stall, it = state
            r = b - matvec(x)
            z = apply_m(minv, r)
            beta = jnp.linalg.norm(z)
            beta_safe = jnp.maximum(beta, eps)
            # map the true-residual tolerance into the preconditioned scale
            inner_tol = 0.25 * atol * beta_safe / jnp.maximum(jnp.linalg.norm(r), eps)
            V = jnp.zeros((m + 1, n), dtype).at[0].set(z / beta_safe)
            R = jnp.zeros((m, m), dtype)
            g = jnp.zeros(m + 1, dtype).at[0].set(beta)
            cs = jnp.zeros(m, dtype)
            sn = jnp.zeros(m, dtype)
            V, R, g, cs, sn, j, res, _ = jax.lax.while_loop(
                inner_cond, inner_body, (V, R, g, cs, sn, jnp.array(0, jnp.int32), beta, inner_tol))
            # solve R[:j,:j] y = g[:j]; inactive columns get unit diagonal
            active = jnp.arange(m) < j
            Rsolve = R + jnp.diag(jnp.where(active, 0.0, 1.0))
            gsolve = jnp.where(active, g[:m], 0.0)
            y = jax.scipy.linalg.solve_triangular(Rsolve, gsolve, lower=False)
            x = x + y @ V[:m]
            new_resnorm = jnp.linalg.norm(b - matvec(x))
            # stagnation detection: restart cycles that essentially stop
            # reducing the true residual mean Krylov has stalled — exit
            # early instead of spinning to maxiter
            stall = jnp.where(new_resnorm > 0.999 * resnorm, stall + 1, 0)
            return x, new_resnorm, stall, it + j

        def outer_cond(state):
            x, resnorm, stall, it = state
            return (resnorm > atol) & (it < maxiter) & (stall < 5)

        x0 = jnp.zeros_like(b)
        state = (x0, jnp.linalg.norm(b), jnp.array(0, jnp.int32), jnp.array(0, jnp.int32))
        x, resnorm, stall, it = jax.lax.while_loop(outer_cond, outer_body, state)
        return x, resnorm, it

    return jax.jit(run)


def gmres_op(mv_kind, op, b, *, atol, maxiter, restart=60, minv, precon='diag'):
    '''Left-preconditioned restarted GMRES(m) over an operator-kind/operand
    pair; returns (x, resnorm, iters).'''
    import jax.numpy as jnp
    restart = max(2, min(int(restart), int(len(b))))
    run = _gmres_driver(precon, restart, mv_kind)
    m = minv if isinstance(minv, tuple) else jnp.asarray(minv)
    return run(tuple(op), b, m, jnp.asarray(atol, dtype=b.dtype),
               jnp.asarray(maxiter, dtype=jnp.int32))


def gmres(data, indices, indptr, b, diag=None, *, atol, maxiter, restart=60,
          minv=None, precon='diag'):
    '''Left-preconditioned restarted GMRES(m); returns (x, resnorm, iters).

    The convergence check is on the TRUE residual ``|b - Ax|`` at restart
    boundaries; the inner Arnoldi stops early on the rotated-residual
    estimate. Same precon conventions as :func:`cg`.
    '''
    import jax.numpy as jnp
    row_ids = jnp.asarray(_row_ids(indptr))
    if precon == 'diag' and minv is None:
        minv = jnp.where(diag != 0, 1.0 / diag, 1.0)
    return gmres_op(('csr',), (data, indices, row_ids), b, atol=atol,
                    maxiter=maxiter, restart=restart, minv=minv, precon=precon)


# ------------------------------------------------------------ BiCGStab

@functools.lru_cache(maxsize=32)
def _bicgstab_driver(precon_kind, mv_kind=('csr',)):
    '''Right-preconditioned BiCGStab under ``lax.while_loop``: the
    short-recurrence nonsymmetric Krylov method (2 matvecs + 2 precon
    applies per iteration, O(8 n) state) — the device counterpart of the
    reference's scipy bicgstab (matrix/_scipy.py:67-72) and the memory-lean
    alternative when restarted GMRES stalls.  Same true-residual refresh and
    stagnation discipline as the CG driver above; ``rho``/``omega``
    breakdowns restart the recurrence from the current true residual.'''
    import jax
    import jax.numpy as jnp
    apply_m = _precon_apply(precon_kind)
    matvec_op = _make_matvec(mv_kind)

    def run(op, b, minv, atol, maxiter):
        def matvec(x):
            return matvec_op(op, x)

        eps = jnp.finfo(b.dtype).tiny * 16

        def body(state):
            x, r, rhat, p, v, rho, alpha, omega, k, stall, lastres = state
            phat = apply_m(minv, p)
            v = matvec(phat)
            rv = rhat @ v
            alpha = rho / jnp.where(jnp.abs(rv) > eps, rv, 1.0)
            s = r - alpha * v
            shat = apply_m(minv, s)
            t = matvec(shat)
            tt = t @ t
            omega = (t @ s) / jnp.where(tt > eps, tt, 1.0)
            x = x + alpha * phat + omega * shat
            r_rec = s - omega * t
            claimed = jnp.linalg.norm(r_rec) <= atol
            need = ((k + 1) % 64 == 0) | claimed
            r = jax.lax.cond(need, lambda: b - matvec(x), lambda: r_rec)
            rnorm = jnp.linalg.norm(r)
            stall = jnp.where(need & (rnorm > 0.99 * lastres), stall + 1,
                              jnp.where(need, 0, stall))
            lastres = jnp.where(need, rnorm, lastres)
            rho_new = rhat @ r
            # rho/omega breakdown or refuted convergence: restart the
            # recurrence from the true residual (rhat = r, p = r)
            breakdown = (jnp.abs(rho_new) <= eps) | (jnp.abs(omega) <= eps) | claimed
            beta = (rho_new / jnp.where(jnp.abs(rho) > eps, rho, 1.0)) \
                * (alpha / jnp.where(jnp.abs(omega) > eps, omega, 1.0))
            p_new = r + beta * (p - omega * v)
            p = jnp.where(breakdown, r, p_new)
            rhat = jnp.where(breakdown, r, rhat)
            rho = jnp.where(breakdown, r @ r, rho_new)
            return x, r, rhat, p, v, rho, alpha, omega, k + 1, stall, lastres

        def cond(state):
            x, r, rhat, p, v, rho, alpha, omega, k, stall, lastres = state
            return (jnp.linalg.norm(r) > atol) & (k < maxiter) & (stall < 4)

        x0 = jnp.zeros_like(b)
        one = jnp.asarray(1.0, dtype=b.dtype)
        state = (x0, b, b, b, jnp.zeros_like(b), b @ b, one, one,
                 jnp.array(0, dtype=jnp.int32), jnp.array(0, dtype=jnp.int32),
                 jnp.linalg.norm(b))
        out = jax.lax.while_loop(cond, body, state)
        x, r = out[0], out[1]
        return x, jnp.linalg.norm(r), out[8]

    return jax.jit(run, static_argnames=())


def bicgstab_op(mv_kind, op, b, *, atol, maxiter, minv, precon='diag'):
    '''Right-preconditioned BiCGStab over an operator-kind/operand pair;
    returns (x, resnorm, iters).'''
    import jax.numpy as jnp
    run = _bicgstab_driver(precon, mv_kind)
    m = minv if isinstance(minv, tuple) else jnp.asarray(minv)
    return run(tuple(op), b, m, jnp.asarray(atol, dtype=b.dtype),
               jnp.asarray(maxiter, dtype=jnp.int32))


def bicgstab(data, indices, indptr, b, diag=None, *, atol, maxiter, minv=None,
             precon='diag'):
    '''Right-preconditioned BiCGStab; returns (x, resnorm, iters).  Same
    precon conventions as :func:`cg`.'''
    import jax.numpy as jnp
    row_ids = jnp.asarray(_row_ids(indptr))
    if precon == 'diag' and minv is None:
        minv = jnp.where(diag != 0, 1.0 / diag, 1.0)
    return bicgstab_op(('csr',), (data, indices, row_ids), b,
                       atol=atol, maxiter=maxiter, minv=minv, precon=precon)


# ---------------------------------------- fused iterative refinement (device)

@functools.lru_cache(maxsize=32)
def _refined_driver(method, precon_kind, mv_kind, restart):
    '''One jitted program for the WHOLE mixed-precision refined solve: the
    low-precision inner Krylov loop (cg/gmres/bicgstab above) nested inside a
    float64 outer refinement loop whose true residual is computed on device
    with the operator weights widened to f64 (exact, since they were
    assembled in the lower precision).

    This replaces the host-orchestrated refinement of
    ``matrix._device_krylov`` on its hot path: that loop moves the residual
    and correction vectors host<->device once per round, which dominates
    wall-clock whenever the interconnect is slow (measured on the tunnelled
    v5e of this environment: 1.2 s of a 1.5 s warm 1M-dof solve was vector
    transfers; the fused program runs the same 4 rounds in ~0.2 s and
    transfers one vector each way).  The reference's counterpart is the MKL
    RCI FGMRES host loop (matrix/_mkl.py:205) — on TPU the right design is
    a single compiled program.
    '''
    import jax
    import jax.numpy as jnp
    matvec_op = _make_matvec(mv_kind)
    if method == 'cg':
        inner = _cg_driver(precon_kind, mv_kind)
    elif method == 'gmres':
        inner = _gmres_driver(precon_kind, restart, mv_kind)
    elif method == 'bicgstab':
        inner = _bicgstab_driver(precon_kind, mv_kind)
    else:
        raise ValueError(method)

    def run(op32, op64, b64, minv, target, inner_floor, cap, maxrounds):
        dt32 = op32[0].dtype

        def body(carry):
            x, r, rn, prevrn, rounds, total_it = carry
            inner_atol = jnp.maximum(target / rn, inner_floor).astype(dt32)
            d, _rnin, it = inner(op32, (r / rn).astype(dt32), minv,
                                 inner_atol, cap)
            x_new = x + rn * d.astype(jnp.float64)
            r_new = b64 - matvec_op(op64, x_new)
            rn_new = jnp.linalg.norm(r_new)
            # keep the better iterate even when the round failed to contract
            better = (rn_new < rn) & jnp.isfinite(rn_new)
            x = jnp.where(better, x_new, x)
            r = jnp.where(better, r_new, r)
            return x, r, jnp.where(better, rn_new, rn), rn, rounds + 1, total_it + it

        def cond(carry):
            x, r, rn, prevrn, rounds, total_it = carry
            # continue while above target, under the round budget, and still
            # contracting by >5% per round (the host loop's 0.95 floor test;
            # a round that cannot manage that is at the precision floor, and
            # on-device rounds are cheap enough to give slow tails a chance)
            return (rn > target) & (rounds < maxrounds) \
                & ((rounds == 0) | (rn < 0.95 * prevrn)) & jnp.isfinite(rn)

        rn0 = jnp.linalg.norm(b64)
        x0 = jnp.zeros_like(b64)
        carry = (x0, b64, rn0, jnp.asarray(numpy.inf, jnp.float64),
                 jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
        x, r, rn, prevrn, rounds, total_it = jax.lax.while_loop(cond, body, carry)
        return x, rn, total_it, rounds

    return jax.jit(run, static_argnames=())


def refined_solve_op(method, mv_kind, op, b, *, target, maxiter, restart=100,
                     minv, precon, op64=None, maxrounds=30):
    '''Fused device refined solve; returns (x64, resnorm, iters, rounds) as
    host values.  ``op64`` defaults to widening ``op`` on device.'''
    import jax.numpy as jnp
    if method == 'gmres':
        restart = max(2, min(int(restart), int(len(b))))
    run = _refined_driver(method, precon, mv_kind, restart)
    if op64 is None:
        # widen only floating operands: csr/ell/bell index arrays must stay
        # integer or the gathered matvec rejects them
        op64 = tuple(jnp.asarray(o, dtype=jnp.float64)
                     if jnp.issubdtype(jnp.asarray(o).dtype, jnp.floating)
                     else jnp.asarray(o) for o in op)
    m = minv if isinstance(minv, tuple) else jnp.asarray(minv)
    b64 = jnp.asarray(b, dtype=jnp.float64)
    dt32 = numpy.dtype(str(numpy.asarray(op[0]).dtype)) if not hasattr(op[0], 'dtype') else numpy.dtype(str(op[0].dtype))
    inner_floor = float(numpy.sqrt(numpy.finfo(dt32).eps))
    x, rn, it, rounds = run(tuple(op), tuple(op64), b64, m,
                            jnp.asarray(target, jnp.float64),
                            jnp.asarray(inner_floor, jnp.float64),
                            jnp.asarray(int(maxiter), jnp.int32),
                            jnp.asarray(int(maxrounds), jnp.int32))
    return (numpy.asarray(x, dtype=numpy.float64), float(rn), int(it), int(rounds))
