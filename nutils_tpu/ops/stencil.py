'''Stencil (DIA-on-a-grid) operator form: detection from CSR and a
roofline shifted-slice matvec, dimension-generic.

On structured grids the assembled FEM operator couples each dof only with a
prod_i (2k_i+1) window of grid neighbors, so the CSR matrix is losslessly a
stencil:

    y[i1..id] = sum_{|a_i| <= k_i} w[a, i1..id] * x[i1 + a_1, ..., id + a_d]

The matvec is then independent of gather/scatter: the window's shifted reads
are contiguous d-D slices of the padded grid, which XLA fuses into a single
full-bandwidth pass.  Measured on a v5e (1024^2 grid, f32, 100 chained
matvecs in one dispatch, min-of-6): 64 us/matvec (~720 GB/s, at the HBM
roofline) versus 145 ms for the XLA scatter-add CSR matvec and 113 us for a
hand-written pallas stencil kernel — element-granular gathers and scatters
lower to ~7 ns/element serial loops on this toolchain, while the slice form
and XLA's own fusion are optimal.  This module is therefore the TPU-native
fast path of the device Krylov solvers (the role MKL's bandwise kernels play
for the reference, reference: matrix/_mkl.py:90), and the pallas variants
were deleted after losing the measurement.

Detection (:func:`from_csr`) is pattern-verified: grid pitches are inferred
from the set of column offsets by iterative smallest-uncovered-offset
search, then EVERY nonzero must decompose as j - i = sum_i a_i * pitch_i
with |a_i| <= k_i and in-grid target coordinates on every axis — zero false
positives, unstructured or periodic matrices simply return None.  Works for
any grid rank (1-D bands, 2-D quads, 3-D hexes) and anisotropic windows
(e.g. degree 2 in x, degree 1 in y gives ks = (1, 2)).
'''

import functools
import itertools

import numpy


class StencilForm:
    '''w [prod(2k_i+1), *shape] stencil weights plus grid metadata.

    ``shape``/``ks`` are outermost-axis-first (row-major flat index =
    coords . pitches with the largest pitch first); slot s of the leading w
    axis is the row-major index of the window offset (a_1 + k_1, ...,
    a_d + k_d) over window dims (2k_i + 1).'''

    __slots__ = ('w', 'ks', 'shape')

    def __init__(self, w, ks, shape):
        self.w = w
        self.ks = tuple(int(k) for k in ks)
        self.shape = tuple(int(s) for s in shape)

    # 2-D convenience accessors (legacy callers/tests)
    @property
    def k(self):
        return max(self.ks)

    @property
    def ny(self):
        assert len(self.shape) == 2
        return self.shape[0]

    @property
    def nx(self):
        assert len(self.shape) == 2
        return self.shape[1]


def _decompose(d, pitches, dims, rows):
    '''Canonically decompose column offsets d (int64) over descending
    ``pitches`` with grid dims ``dims`` (same order); returns (ok, A) where
    A[axis] holds per-axis window shifts and ok flags every entry whose
    target coordinate stays on the grid.'''
    rem = d.astype(numpy.int64)
    A = []
    ok = numpy.ones(len(d), dtype=bool)
    r = rows.astype(numpy.int64)
    for p, dim in zip(pitches, dims):
        a = numpy.floor_divide(rem + (p >> 1), p)
        rem = rem - a * p
        coord = (r // p) % dim
        ok &= (coord + a >= 0) & (coord + a < dim)
        A.append(a)
    ok &= rem == 0
    return ok, A


def _pitch_dims(pitches_desc, n):
    '''Grid dims (outermost first) for descending pitches; None when the
    pitch tower is not a divisor chain of n.'''
    dims = []
    prev = n
    for p in pitches_desc:
        if prev % p:
            return None
        dims.append(prev // p)
        prev = p
    if prev != 1:
        # innermost pitch > 1: dofs within a pitch-1 residue never couple;
        # expose them as an extra innermost axis with zero window
        dims.append(prev)
        return dims, list(pitches_desc) + [1]
    return dims, list(pitches_desc)


def from_csr(data, indices, indptr, n, max_k=3, max_dim=4, sample=8192):
    '''Detect a d-dimensional grid-stencil layout of an n x n CSR matrix;
    returns a StencilForm or None.  O(nnz) vectorized host work; pitch
    candidates are pre-screened on the (small) set of unique offsets and a
    row sample so unstructured matrices reject cheaply.'''
    data = numpy.asarray(data)
    indices = numpy.asarray(indices)
    if n == 0 or len(data) == 0:
        return None
    counts = numpy.diff(indptr)
    rows = numpy.repeat(numpy.arange(n), counts)
    d = indices.astype(numpy.int64) - rows
    offs = numpy.unique(numpy.abs(d))
    offs = offs[offs > 0]
    if len(offs) == 0:
        return None  # pure diagonal: Jacobi handles it better than a stencil
    step = max(1, len(d) // sample)
    d_s, rows_s = d[::step], rows[::step]

    def covered(o, pitches_desc):
        rem = int(o)
        for p in pitches_desc:
            a = (rem + (p >> 1)) // p
            if abs(a) > max_k:
                return False
            rem -= a * p
        return rem == 0

    def verify(pitches_desc):
        pd = _pitch_dims(pitches_desc, n)
        if pd is None:
            return None
        dims, pitches = pd
        if len(dims) > max_dim:
            return None
        ok, _ = _decompose(d_s, pitches, dims, rows_s)
        if not ok.all():
            return None
        ok, A = _decompose(d, pitches, dims, rows)
        if not ok.all():
            return None
        ks = [int(numpy.abs(a).max(initial=0)) for a in A]
        if max(ks, default=0) > max_k:
            return None
        return dims, pitches, ks, A

    def search(pitches_desc):
        # smallest positive offset not representable with current pitches
        unc = [o for o in offs if not covered(o, pitches_desc)]
        if not unc:
            res = verify(pitches_desc)
            return (pitches_desc, res) if res is not None else None
        if len(pitches_desc) + 1 > max_dim:
            return None
        o = int(unc[0])
        span = max_k * sum(pitches_desc) if pitches_desc else 0
        # a new outermost pitch p satisfies o = a*p + c for some covered
        # combination c (|c| <= span) and a in [1, max_k]
        cands = set()
        for a in range(1, max_k + 1):
            for c in range(-span, span + 1):
                if (o - c) % a == 0:
                    p = (o - c) // a
                    if p > 2 * span and p > (pitches_desc[0] if pitches_desc else 0):
                        cands.add(p)
        for p in sorted(cands):
            hit = search([p] + pitches_desc)
            if hit is not None:
                return hit
        return None

    hit = search([])
    if hit is None:
        return None
    _pitches_in, (dims, pitches, ks, A) = hit
    windows = [2 * k + 1 for k in ks]
    W = int(numpy.prod(windows))
    if W > (2 * max_k + 1) ** 3:
        return None  # window too large to slice-enumerate profitably
    slot = numpy.zeros(len(d), dtype=numpy.int64)
    for a, k, wdim in zip(A, ks, windows):
        slot = slot * wdim + (a + k)
    w = numpy.zeros((W, n), dtype=data.dtype)
    w[slot, rows] = data
    return StencilForm(w.reshape([W] + dims), tuple(ks), tuple(dims))


def from_csr_grid(data, indices, indptr, shape, max_k=3):
    '''Stencil form of a CSR matrix over a KNOWN grid ``shape`` (outermost
    first); returns StencilForm or None when some nonzero leaves the window
    or the grid.  Used by the multigrid setup, where the coarse grids are
    known geometrically and re-inference could pick an aliased
    factorization.'''
    data = numpy.asarray(data)
    indices = numpy.asarray(indices)
    shape = [int(s) for s in shape]
    n = int(numpy.prod(shape))
    if n != len(indptr) - 1 or len(data) == 0:
        return None
    counts = numpy.diff(indptr)
    rows = numpy.repeat(numpy.arange(n), counts)
    d = indices.astype(numpy.int64) - rows
    pitches = [int(numpy.prod(shape[i + 1:])) for i in range(len(shape))]
    ok, A = _decompose(d, pitches, shape, rows)
    if not ok.all():
        return None
    ks = [int(numpy.abs(a).max(initial=0)) for a in A]
    if max(ks, default=0) > max_k:
        return None
    windows = [2 * k + 1 for k in ks]
    W = int(numpy.prod(windows))
    slot = numpy.zeros(len(d), dtype=numpy.int64)
    for a, k, wdim in zip(A, ks, windows):
        slot = slot * wdim + (a + k)
    w = numpy.zeros((W, n), dtype=data.dtype)
    w[slot, rows] = data
    return StencilForm(w.reshape([W] + shape), tuple(ks), tuple(shape))


@functools.lru_cache(maxsize=64)
def _matvec_fn(ks, shape):
    import jax.numpy as jnp
    from jax import lax
    windows = [2 * k + 1 for k in ks]

    def matvec(w, x):          # w [W, *shape], x [*shape]
        xp = jnp.pad(x, [(k, k) for k in ks]) if any(ks) else x
        acc = jnp.zeros_like(x)
        for s, shifts in enumerate(itertools.product(*[range(m) for m in windows])):
            acc = acc + w[s] * lax.dynamic_slice(xp, shifts, shape)
        return acc
    return matvec


def matvec(form, w_dev, x):
    '''y = A x for x of shape [prod(shape)] (flat) or [*shape]; same shape
    out.'''
    flat = x.ndim == 1
    xg = x.reshape(form.shape) if flat else x
    y = _matvec_fn(form.ks, form.shape)(w_dev, xg)
    return y.reshape(-1) if flat else y
