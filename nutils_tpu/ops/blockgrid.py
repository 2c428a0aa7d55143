'''Block-grid operator form: mixed-field structured systems as a grid of
inter-grid stencils, matvec'd entirely with (strided) slices.

A multi-field structured system (Taylor-Hood Navier-Stokes, mixed
Cahn-Hilliard, ...) concatenates dof vectors living on DIFFERENT grids —
e.g. degree-2 velocity on a (2n+1)^2 x ncomp grid and degree-1 pressure on
(n+1)^2 — so the assembled matrix is not a single stencil (ops/stencil.py)
and previously fell back to gather-based SpMV, whose element-granular
gathers serialize at ~7 ns each on this toolchain (measurement record in
ops/stencil.py).  But each (row-field, col-field) BLOCK is still perfectly
structured: basis supports overlap only within a bounded window of grid
positions, so with per-axis pitch ratio qr:qc between the row and column
grids every nonzero decomposes as

    col_ax = qc * (row_ax // qr) + a_ax,   |a_ax| bounded,

i.e. a PHASED rectangular stencil: rows split into qr phases per axis
(row_ax = qr * m + phi), and within a phase the matvec is

    y[m] += sum_s  w_s[m] * x[qc * m + a_s]     (strided slice of x),

with the per-phase outputs interleaved back by stack/reshape — the same
slice-only machinery as the multigrid transfer operators (ops/mg.py).  The
full matvec is then sum of per-block phased stencils: zero gathers, zero
scatters, HBM-roofline class on TPU.

Detection is exact and conservative: per-field grids come from the diagonal
blocks (ops/stencil.from_csr), per-axis ratios are chosen from a small
coprime candidate set by minimizing the observed window, and every nonzero
must land in a bounded window — anything else returns None and the caller
keeps the gather fallback.  The reference reaches these systems through MKL
Pardiso on the monolithic CSR (reference: matrix/_mkl.py:22); this is the
TPU-native operator form replacing it for structured multi-field problems.
'''

import functools
import itertools

import numpy

_RATIOS = ((1, 1), (2, 1), (1, 2), (3, 1), (1, 3), (3, 2), (2, 3), (4, 1), (1, 4), (4, 3), (3, 4))


class BlockGridForm:
    '''Static meta + per-(block, phase) weight arrays + value-refill plan.'''

    __slots__ = ('meta', 'ws', 'fill')

    def __init__(self, meta, ws, fill):
        self.meta = meta    # hashable: (offsets, fieldshapes, blocks)
        self.ws = ws        # list of [S, *pshape] arrays (enumeration order)
        self.fill = fill    # (sizes, windex, wpos): ws[i].flat refill plan


def _align(gr, gc):
    '''Pad the lower-rank grid shape with 1s (left or right) to the common
    rank; returns candidate (gr, gc) pairs to try.'''
    dr, dc = len(gr), len(gc)
    if dr == dc:
        return [(gr, gc)]
    pad = (1,) * abs(dr - dc)
    if dr < dc:
        return [(pad + gr, gc), (gr + pad, gc)]
    return [(gr, pad + gc), (gr, gc + pad)]


def _axis_shift(r_ax, c_ax, qr, qc, dimc, max_shift):
    '''Per-axis shifts a = c - qc*(r//qr), retried with periodic wrap (the
    column grid is read modulo its size) when the plain form exceeds the
    window; returns (a, wrap) or None.'''
    a = c_ax - qc * (r_ax // qr)
    if len(a) and int(numpy.abs(a).max(initial=0)) > max_shift:
        # periodic wrap: the read position qc*m + a is taken modulo the
        # column-grid size, so canonicalize the shift modulo dimc
        if dimc > 2 * max_shift + 3:
            aw = (a + dimc // 2) % dimc - dimc // 2
            if int(numpy.abs(aw).max(initial=0)) <= max_shift:
                return aw, True
        return None
    return a, False


def _axis_ratio(r_ax, c_ax, dimc, max_shift):
    '''Pick the (qr, qc) pitch ratio for one axis by minimizing the observed
    shift window; returns (qr, qc, a, amin, amax, wrap) or None.'''
    best = None
    for qr, qc in _RATIOS:
        hit = _axis_shift(r_ax, c_ax, qr, qc, dimc, max_shift)
        if hit is None:
            continue
        a, wrap = hit
        amin, amax = int(a.min(initial=0)), int(a.max(initial=0))
        width = amax - amin
        if best is None or (wrap, qr * qc, width) < (best[5], best[0] * best[1], best[4] - best[3]):
            best = (qr, qc, a, amin, amax, wrap)
    return best


def detect(data, indices, indptr, offsets, grids=None, max_shift=4, max_phase_terms=128):
    '''Detect the block-grid form of an n x n CSR matrix whose dof vector is
    partitioned at ``offsets`` (field boundaries); returns a BlockGridForm
    or None.  ``grids`` optionally carries per-field (shape, periodic)
    layout hints registered by the solver (exact, alias-free); fields
    without a hint infer their grid from the diagonal block.  O(nnz)
    vectorized host work.'''
    from . import stencil as _stencil
    data = numpy.asarray(data)
    indices = numpy.asarray(indices).astype(numpy.int64)
    indptr = numpy.asarray(indptr)
    offsets = tuple(int(o) for o in offsets)
    n = len(indptr) - 1
    F = len(offsets) - 1
    if F < 2 or offsets[0] != 0 or offsets[-1] != n:
        return None
    counts = numpy.diff(indptr)
    rows = numpy.repeat(numpy.arange(n), counts)

    # field grids: solver hints, else inferred from the diagonal blocks
    import scipy.sparse
    A = scipy.sparse.csr_matrix((data, indices, indptr), shape=(n, n))
    fieldshapes = []
    for i in range(F):
        hint = grids[i] if grids is not None and i < len(grids) else None
        if hint is not None:
            fieldshapes.append(tuple(hint[0]))
            continue
        lo, hi = offsets[i], offsets[i + 1]
        Ab = A[lo:hi, lo:hi].tocsr()
        form = _stencil.from_csr(Ab.data, Ab.indices, Ab.indptr, hi - lo) \
            if Ab.nnz else None
        if form is None:
            return None
        fieldshapes.append(form.shape)

    rfield = numpy.searchsorted(offsets, rows, side='right') - 1
    cfield = numpy.searchsorted(offsets, indices, side='right') - 1

    blocks = []
    ws = []
    sizes, windex, wpos = [], numpy.zeros(len(data), dtype=numpy.int64), numpy.zeros(len(data), dtype=numpy.int64)
    for i in range(F):
        for j in range(F):
            sel = numpy.nonzero((rfield == i) & (cfield == j))[0]
            if not len(sel):
                continue
            r = rows[sel] - offsets[i]
            c = indices[sel] - offsets[j]
            # ratio selection on a sample, exact verification on all entries
            step = max(1, len(sel) // 16384)
            hit = None
            for gr, gc in _align(fieldshapes[i], fieldshapes[j]):
                pr = [int(numpy.prod(gr[ax + 1:])) for ax in range(len(gr))]
                pc = [int(numpy.prod(gc[ax + 1:])) for ax in range(len(gc))]
                per_axis = [_axis_ratio((r[::step] // p1) % s1, (c[::step] // p2) % s2, s2, max_shift)
                            for p1, s1, p2, s2 in zip(pr, gr, pc, gc)]
                if all(p is not None for p in per_axis):
                    hit = (gr, gc, pr, pc, per_axis)
                    break
            if hit is None:
                return None
            gr, gc, pr, pc, per_axis = hit
            d = len(gr)
            qr = tuple(p[0] for p in per_axis)
            qc = tuple(p[1] for p in per_axis)
            # full exact pass with the sampled choice
            rc = [(r // p) % s for p, s in zip(pr, gr)]
            cc = [(c // p) % s for p, s in zip(pc, gc)]
            # axis permutation: order the block's grid axes so the largest
            # extents end up MINOR.  TPU tiles the two minor dims of every
            # materialized buffer to (8, 128); a trailing size-2 component
            # axis (vectorized Taylor-Hood velocity) otherwise pads the
            # [S, *grid] weight buffers 64x (measured: 250 MB -> 15.7 GB at
            # 983k dofs).  All downstream layout (w buffers, fill plan,
            # csr_map, matvec slicing) is computed in the permuted order;
            # the matvec transposes x/y at the block boundary.
            perm = tuple(sorted(range(d), key=lambda ax: max(gr[ax], gc[ax]))) \
                if d > 2 else tuple(range(d))
            if perm != tuple(range(d)):
                gr = tuple(gr[ax] for ax in perm)
                gc = tuple(gc[ax] for ax in perm)
                qr = tuple(qr[ax] for ax in perm)
                qc = tuple(qc[ax] for ax in perm)
                rc = [rc[ax] for ax in perm]
                cc = [cc[ax] for ax in perm]
            per_axis = []
            for ax in range(d):
                hit_ax = _axis_shift(rc[ax], cc[ax], qr[ax], qc[ax], gc[ax], max_shift)
                if hit_ax is None:
                    return None
                a, wrap_ax = hit_ax
                per_axis.append((qr[ax], qc[ax], a, int(a.min(initial=0)),
                                 int(a.max(initial=0)), wrap_ax))
            amin = tuple(p[3] for p in per_axis)
            awid = tuple(p[4] - p[3] + 1 for p in per_axis)
            wrap = tuple(p[5] for p in per_axis)
            # phase id (row-major over qr) and within-phase slot (row-major
            # over the shift window)
            phase = numpy.zeros(len(sel), dtype=numpy.int64)
            slot = numpy.zeros(len(sel), dtype=numpy.int64)
            for ax in range(d):
                phase = phase * qr[ax] + rc[ax] % qr[ax]
                slot = slot * awid[ax] + (per_axis[ax][2] - amin[ax])
            nphase = int(numpy.prod(qr))
            pshapes = []
            for ph in range(nphase):
                # phase multi-index (row-major over qr)
                phi, rem = [], ph
                for q in reversed(qr):
                    phi.append(rem % q)
                    rem //= q
                phi = phi[::-1]
                pshapes.append(tuple(-(-(gr[ax] - phi[ax]) // qr[ax]) for ax in range(d)))
            # within-phase grid coordinate (m) of each entry
            m_per_ax = [rc[ax] // qr[ax] for ax in range(d)]
            phshape_arr = numpy.array([pshapes[ph] for ph in range(nphase)])  # [nphase, d]
            mloc = numpy.zeros(len(sel), dtype=numpy.int64)
            for ax in range(d):
                mloc = mloc * phshape_arr[phase, ax] + m_per_ax[ax]
            S = int(numpy.prod(awid))
            if S > max_phase_terms:
                return None
            shifts = [tuple(a + amin[ax] for ax, a in enumerate(sh))
                      for sh in itertools.product(*[range(wd) for wd in awid])]
            phmeta = []
            for ph in range(nphase):
                psel = phase == ph
                npix = int(numpy.prod(pshapes[ph]))
                w = numpy.zeros(S * npix, dtype=data.dtype)
                lin = slot[psel] * npix + mloc[psel]
                w[lin] = data[sel[psel]]
                wi = len(ws)
                ws.append(w.reshape((S,) + pshapes[ph]))
                sizes.append(S * npix)
                windex[sel[psel]] = wi
                wpos[sel[psel]] = lin
                phi, rem = [], ph
                for q in reversed(qr):
                    phi.append(rem % q)
                    rem //= q
                phmeta.append((tuple(phi[::-1]), pshapes[ph]))
            blocks.append((i, j, gr, gc, qr, qc, tuple(amin), tuple(awid), wrap,
                           tuple(phmeta), perm))
    meta = (offsets, tuple(tuple(s) for s in fieldshapes), tuple(blocks))
    return BlockGridForm(meta, ws, (tuple(sizes), windex, wpos))


def refill(form_or_fill, data, meta=None):
    '''Rebuild the weight arrays from fresh CSR values (constant pattern).'''
    if isinstance(form_or_fill, BlockGridForm):
        sizes, windex, wpos = form_or_fill.fill
        meta = form_or_fill.meta
    else:
        sizes, windex, wpos = form_or_fill
    data = numpy.asarray(data)
    flat = [numpy.zeros(s, dtype=data.dtype) for s in sizes]
    order = numpy.argsort(windex, kind='stable')
    wi_sorted = windex[order]
    bounds = numpy.searchsorted(wi_sorted, numpy.arange(len(sizes) + 1))
    for wi in range(len(sizes)):
        sl = order[bounds[wi]:bounds[wi + 1]]
        flat[wi][wpos[sl]] = data[sl]
    shapes = _w_shapes(meta)
    return [f.reshape(s) for f, s in zip(flat, shapes)]


def _w_shapes(meta):
    shapes = []
    for i, j, gr, gc, qr, qc, amin, awid, wrap, phmeta, perm in meta[2]:
        S = int(numpy.prod(awid))
        for phi, pshape in phmeta:
            shapes.append((S,) + tuple(pshape))
    return shapes


@functools.lru_cache(maxsize=16)
def _matvec_fn(meta):
    import jax.numpy as jnp
    from jax import lax
    offsets, fieldshapes, blocks = meta
    F = len(fieldshapes)

    def interleave(parts, gr, qr):
        '''Merge per-phase outputs [pshape...] back to the full row grid.'''
        d = len(gr)
        # parts indexed row-major by phase; merge axis by axis (last first)
        for ax in reversed(range(d)):
            q = qr[ax]
            if q == 1:
                continue
            merged = []
            for base in range(0, len(parts), q):
                grp = parts[base:base + q]
                m = max(p.shape[ax] for p in grp)
                grp = [jnp.pad(p, [(0, m - p.shape[a]) if a == ax else (0, 0)
                                   for a in range(p.ndim)]) for p in grp]
                st = jnp.stack(grp, axis=ax + 1)
                shp = list(grp[0].shape)
                shp[ax] = m * q
                out = st.reshape(shp)
                sl = [slice(None)] * out.ndim
                sl[ax] = slice(0, gr[ax])
                merged.append(out[tuple(sl)])
            parts = merged
        assert len(parts) == 1
        return parts[0]

    def mv(ws, x):
        xs = [x[offsets[j]:offsets[j + 1]].reshape(fieldshapes[j]) for j in range(F)]
        # flat accumulators: a grid-shaped accumulator with a small minor
        # axis (e.g. [661, 661, 2]) would materialize (8, 128)-tile padded
        ys = [jnp.zeros(offsets[i + 1] - offsets[i], x.dtype) for i in range(F)]
        wi = 0
        for i, j, gr, gc, qr, qc, amin, awid, wrap, phmeta, perm in blocks:
            d = len(gr)
            if perm == tuple(range(d)):
                xg = xs[j].reshape(gc)
            else:
                # gc is stored in permuted axis order; reshape the flat field
                # vector in its natural order, then transpose into it
                gc0 = [None] * d
                for k, ax in enumerate(perm):
                    gc0[ax] = gc[k]
                xg = xs[j].reshape(gc0).transpose(perm)
            shifts = list(itertools.product(*[range(a0, a0 + wd)
                                              for a0, wd in zip(amin, awid)]))
            padlo = [max(0, -amin[ax]) for ax in range(d)]
            # per-axis read extent: start qc*0+a .. qc*(pmax-1)+a
            pmax = [max(pm[1][ax] for pm in phmeta) for ax in range(d)]
            padhi = [max(0, qc[ax] * (pmax[ax] - 1) + amin[ax] + awid[ax] - 1 - (gc[ax] - 1))
                     for ax in range(d)]
            xp = xg
            for ax in range(d):  # periodic axes pad with wrapped copies
                if wrap[ax] and (padlo[ax] or padhi[ax]):
                    sl = [slice(None)] * d
                    sl[ax] = slice(gc[ax] - padlo[ax], gc[ax])
                    front = xp[tuple(sl)]
                    sl[ax] = slice(0, padhi[ax])
                    back = xp[tuple(sl)]
                    xp = jnp.concatenate([front, xp, back], axis=ax)
            zpad = [(0, 0) if wrap[ax] else (padlo[ax], padhi[ax]) for ax in range(d)]
            if any(p != (0, 0) for p in zpad):
                xp = jnp.pad(xp, zpad)
            parts = []
            for phi, pshape in phmeta:
                w = ws[wi]
                wi += 1
                acc = jnp.zeros(pshape, x.dtype)
                for s, sh in enumerate(shifts):
                    starts = [padlo[ax] + sh[ax] for ax in range(d)]
                    limits = [starts[ax] + qc[ax] * (pshape[ax] - 1) + 1 for ax in range(d)]
                    acc = acc + w[s] * lax.slice(xp, starts, limits, list(qc))
                parts.append(acc)
            yb = interleave(parts, gr, qr)
            if perm != tuple(range(d)):
                inv = [0] * d
                for k, ax in enumerate(perm):
                    inv[ax] = k
                yb = yb.transpose(inv)
            ys[i] = ys[i] + yb.reshape(-1)
        return jnp.concatenate(ys)
    return mv


def matvec(form, ws_dev, x):
    '''y = A x for flat x; ws_dev = device copies of form.ws.'''
    return _matvec_fn(form.meta)(tuple(ws_dev), x)
