'''Solver layer: System, iterative methods, constraint handling.

Re-design of the reference's solver (reference: solver.py:189 ``System``).
The reference differentiates the residual symbolically per IR node to obtain
sparse jacobian blocks (solver.py:238-258 via evaluable.derivative).  Here we
exploit FEM locality directly with JAX AD:

* Every appearance of a trial/test argument in a lowered integral is a
  *localized gather* ``GatherAlong(broadcast(arg), dofs)`` produced by the
  IR's contraction rules — per-element local dof values.  Each such node is
  replaced by a Leaf (a "localization").

* Residual vectors are unified into the energy form: a residual tuple (R_t)
  becomes the scalar E = sum_t R_t . v*_t with synthetic test arguments v*_t,
  whose gathers localize through the same rules.  The residual is then always
  ``jax.grad`` of the compiled scalar with respect to each test Leaf,
  scattered by the (constant) dof tables.

* Jacobian blocks are seeded ``jax.jvp`` passes of those residual chunks with
  respect to each trial Leaf: tangent seeds enumerate local dofs, broadcast
  over the element axis (valid because every integral is elementwise in its
  element batch), yielding exact per-element dense blocks [E, P, L_t, L_u]
  that scatter into a host-precomputed CSR pattern (matrix.SparsePattern).

The whole assemble step is one jitted function: gather -> einsum quadrature
-> AD -> segment scatter, entirely on device.
'''

import functools

import numpy

from . import evaluable as ev
from . import cache
from . import function, matrix
from .utils import _log as log


class SolverError(Exception):
    pass


# ------------------------------------------------------------ line search

class NormBased:
    '''Line-search strategy minimizing a cubic model of the squared residual
    norm (reference: solver.py:57).

    Given the residual and directional derivative at relaxation 0 and at the
    candidate point, fit |res(x + r dx)|^2 ~ A + B r + C r^2 + D r^3 and pick
    the relaxation scale at which the model is minimal.  Returns ``(scale,
    accept)``: the multiplicative update for the relaxation value, and whether
    the candidate point is acceptable.
    '''

    def __init__(self, minscale=.01, acceptscale=2/3., maxscale=2.):
        assert 0 < minscale < acceptscale < 1 < maxscale
        self.minscale = minscale
        self.acceptscale = acceptscale
        self.maxscale = maxscale

    def __call__(self, res0, dres0, res1, dres1):
        import math
        if not numpy.isfinite(res1).all():
            return self.minscale, False
        # squared-norm samples and slopes at r=0 and r=1
        p0 = float(res0 @ res0)
        q0 = 2 * float(res0 @ dres0)
        p1 = float(res1 @ res1)
        q1 = 2 * float(res1 @ dres1)
        if q0 >= 0:
            raise SolverError('search vector does not reduce the residual')
        # cubic fit P(r) = p0 + q0 r + c r^2 + d r^3 through both samples
        c = math.fsum([-3 * p0, 3 * p1, -2 * q0, -q1])
        d = math.fsum([2 * p0, -2 * p1, q0, q1])
        # stationary points of P solve q0 + 2 c r + 3 d r^2 = 0; use the
        # numerically stable (Citardauq) root since q0 < 0
        disc = c**2 - 3 * q0 * d
        scale = -q0 / (c + math.sqrt(disc)) if disc > 0 and (c > 0 or d > 0) else math.inf
        if scale >= 1 and p1 > p0:
            return self.minscale, False
        return min(max(scale, self.minscale), self.maxscale), scale >= self.acceptscale and p1 < p0


class MedianBased:
    '''Line-search strategy placing the chosen quantile of per-entry optimal
    relaxations beyond the current one (reference: solver.py:118).  Invariant
    to per-equation scaling of the residual, unlike :class:`NormBased`.'''

    def __init__(self, minscale=.01, acceptscale=2/3., maxscale=2., quantile=.5):
        assert 0 < minscale < acceptscale < 1 < maxscale
        assert 0 < quantile < 1
        self.minscale = minscale
        self.acceptscale = acceptscale
        self.maxscale = maxscale
        self.quantile = quantile

    def __call__(self, res0, dres0, res1, dres1):
        if not numpy.isfinite(res1).all():
            return self.minscale, False
        # per-entry cubic models of the squared residual components
        dp = res1**2 - res0**2
        q0 = 2 * res0 * dres0
        q1 = 2 * res1 * dres1
        decreasing = q0 <= 0  # entries whose model decreases at r=0
        n = round(len(res0) * self.quantile) - int((~decreasing).sum())
        if n < 0:
            raise SolverError(f'search vector fails to reduce more than the {self.quantile}-quantile of the residual')
        c = 3 * dp - 2 * q0 - q1
        d = -2 * dp + q0 + q1
        disc = c**2 - 3 * q0 * d
        ok = decreasing & (disc > 0)
        numer = -q0[ok]
        denom = c[ok] + numpy.sqrt(disc[ok])
        pos = denom > 0
        if n < int(pos.sum()):
            scales = numpy.sort(numer[pos] / denom[pos])
            scale = float(scales[n])
        else:
            scale = numpy.inf
        return min(max(scale, self.minscale), self.maxscale), scale >= self.acceptscale


# ------------------------------------------------------------ localization

def _pack_complex(v):
    '''Pack a complex ndarray into the real backing layout (..., 2); NaN in
    the real part (free-dof marker) propagates to the imag part.'''
    v = numpy.asarray(v)
    if v.dtype.kind == 'c':
        im = numpy.where(numpy.isnan(v.real), numpy.nan, v.imag)
        return numpy.stack([v.real, im], axis=-1)
    return v


def _grid_plan(idx, N):
    '''Detect the structured-grid affine layout of a constant index table:

        idx[e, t...] == base[t] + sum_ax coord_ax(e) * stride_ax

    with the element index e unraveled row-major over an element grid of any
    rank — the shape of every dof table a structured (tensor-product) basis
    produces, in 1-D through 3-D (and beyond).  Returns
    (eshape, strides, bases [T]) or None; ``strides`` are outermost-first
    and form a divisor chain, so gathers and scatter-adds become static
    unit-stride slices of a nested grid view (which XLA runs at the HBM
    roofline where element-granular gathers serialize).  The match is
    verified exactly over the whole table, so the fast paths can never
    change results.'''
    idx = numpy.asarray(idx)
    if idx.ndim < 2 or idx.shape[0] < 4:
        return None
    E = idx.shape[0]
    flatT = idx.reshape(E, -1)
    col = flatT[:, 0].astype(numpy.int64)
    dims, strides = [], []   # innermost-first factorization of the e axis
    seg = col
    while len(seg) > 1:
        d0 = numpy.diff(seg)
        s = int(d0[0])
        if s < 1:
            return None
        jumps = numpy.nonzero(d0 != s)[0]
        n0 = int(jumps[0] + 1) if len(jumps) else len(seg)
        if len(seg) % n0:
            return None
        dims.append(n0)
        strides.append(s)
        seg = seg[::n0]
    if not dims:
        return None
    eshape = tuple(reversed(dims))
    strides_o = tuple(reversed(strides))
    for a, b in zip(strides_o[:-1], strides_o[1:]):
        if a % b:
            return None  # no nested unit-stride view exists
    e = numpy.arange(E)
    coords = numpy.stack(numpy.unravel_index(e, eshape), axis=1)
    grid = coords @ numpy.array(strides_o, dtype=numpy.int64)
    if not numpy.array_equal(flatT, flatT[:1] + (grid - grid[0])[:, None]):
        return None
    bases = (flatT[0] - grid[0]).astype(numpy.int64)
    if len(bases) and bases.min() < 0:
        return None
    for b in bases:  # slices must not wrap within the nested view
        cs = _view_coords(int(b), strides_o)
        for i in range(1, len(eshape)):
            if cs[i] + eshape[i] > strides_o[i - 1] // strides_o[i]:
                return None
    return eshape, strides_o, bases


def _view_coords(b, strides_o):
    '''Mixed-radix coordinates of flat offset b in the nested view: one
    coordinate per element axis plus the innermost residual.'''
    cs = []
    rem = b
    for s in strides_o:
        cs.append(rem // s)
        rem -= cs[-1] * s
    cs.append(rem)
    return cs


def _grid_view(flat, plan, jnp):
    '''Padded nested-grid view of the flat dof vector plus its slice
    geometry: (view, vshape, m0).'''
    eshape, strides, bases = plan
    s0 = strides[0]
    top = max((int(b) // s0 for b in bases), default=0) + eshape[0]
    m0 = max(top, -(-flat.shape[0] // s0))
    pad = m0 * s0 - flat.shape[0]
    v = (jnp.pad(flat, (0, pad)) if pad else flat)
    vshape = (m0,) + tuple(strides[i - 1] // strides[i] for i in range(1, len(strides))) \
        + (strides[-1],)
    return v.reshape(vshape), vshape, m0


def _slice_gather(flat, plan, trailing_shape):
    '''[N] -> [E, *trailing] through static unit-stride slices of the padded
    nested grid view (the slice-form counterpart of flat[idx]).'''
    import jax.numpy as jnp
    eshape, strides, bases = plan
    view, vshape, m0 = _grid_view(flat, plan, jnp)
    E = int(numpy.prod(eshape))
    parts = []
    for b in bases:
        cs = _view_coords(int(b), strides)
        sl = tuple(slice(cs[i], cs[i] + eshape[i]) for i in range(len(eshape))) \
            + (slice(cs[-1], cs[-1] + 1),)
        parts.append(view[sl].reshape(-1))
    out = jnp.stack(parts, axis=-1) if len(parts) > 1 else parts[0][:, None]
    return out.reshape((E,) + tuple(trailing_shape))


def _slice_scatter_add(r, plan, v):
    '''r[idx] += v via static unit-stride slice adds; v [E, *trailing]
    (C-order trailing matching the plan's bases).'''
    import jax.numpy as jnp
    eshape, strides, bases = plan
    n = r.shape[0]
    view, vshape, m0 = _grid_view(r, plan, jnp)
    vf = v.reshape(v.shape[0], -1)
    for t, b in enumerate(bases):
        cs = _view_coords(int(b), strides)
        sl = tuple(slice(cs[i], cs[i] + eshape[i]) for i in range(len(eshape))) \
            + (slice(cs[-1], cs[-1] + 1),)
        view = view.at[sl].add(vf[:, t].reshape(tuple(eshape) + (1,)))
    return view.reshape(-1)[:n]


def _grouped_plan(ts, gk, total):
    '''Per-column-group affine plans (phased buffers with different row
    pitches have a per-column-constant group key), or None.'''
    if gk is None or not len(ts) or not (gk == gk[:1]).all():
        return None
    groups = {}
    for j in range(gk.shape[1]):
        groups.setdefault(int(gk[0, j]), []).append(j)
    if len(groups) == 1:
        return None  # single group == the whole table, already tried
    out = []
    for wi, cols in sorted(groups.items()):
        p = _grid_plan(ts[:, cols], total)
        if p is None:
            return None
        out.append((numpy.asarray(cols), p))
    return out


def _grid_row_candidates(tseg):
    '''Candidate element-grid row lengths: jump spacings of sampled target
    columns (the mode of the distances between stride breaks), plus the
    exact whole-table period when one exists.'''
    E, C = tseg.shape
    cands = []
    for j in range(0, C, max(1, C // 8)):
        col = tseg[:, j]
        d = numpy.diff(col)
        if not len(d):
            continue
        vals, counts = numpy.unique(d, return_counts=True)
        s = vals[numpy.argmax(counts)]
        jumps = numpy.nonzero(d != s)[0]
        if not len(jumps):
            continue
        spacing = numpy.diff(jumps)
        p = int(numpy.bincount(spacing).argmax()) if len(spacing) else int(jumps[0]) + 1
        if 2 <= p < E and E % p == 0 and p not in cands:
            cands.append(p)
    for p in range(2, E // 2 + 1):
        if E % p:
            continue
        d = tseg[p:] - tseg[:-p]
        if (d == d[:1]).all():
            if p not in cands:
                cands.append(p)
            break
    return cands


def _plan_value_table(tseg, groupkey, total, depth=2):
    '''Accumulation plan for a constant target table [E, C] into a flat
    buffer of size ``total``: ('slice', plan) when the whole table is
    grid-affine, ('grouped', [(cols, plan), ...]) when targets split into
    per-column affine groups, ('banded', (ny, nx, inner?, bands)) when the
    element grid splits into bands that plan recursively — outer bands for
    boundary-row anomalies (e.g. masked-basis fallback dofs on edge
    elements), inner per-column-of-the-grid bands for periodic seams (the
    seam pattern repeats every grid row) — or ('scatter', flat) as the
    element-granular fallback.  Bands are reached by pure reshapes/slices
    of the value tensor; a small scatter remainder (<=1/4 of the entries)
    is tolerated inside a banding.'''
    E, C = tseg.shape
    if E >= 4:
        plan = _grid_plan(tseg, total)
        if plan is not None:
            return 'slice', plan
    g = _grouped_plan(tseg, groupkey, total)
    if g is not None:
        return 'grouped', g
    if depth > 0 and E >= 8:
        for nx in _grid_row_candidates(tseg):
            ny = E // nx
            if ny < 2:
                continue
            t3 = tseg.reshape(ny, nx, C)
            g3 = None if groupkey is None else groupkey.reshape(ny, nx, C)

            def subplan(ts, gk):
                sp = _plan_value_table(ts, gk, total, depth - 1)
                return sp, (ts.size if sp[0] == 'scatter' else 0)

            # outer bands: runs of grid rows with identical intra-row shape
            sigs = [(t3[r] - t3[r, :1, :1]).tobytes() for r in range(ny)]
            runs = []
            lo = 0
            for r in range(1, ny + 1):
                if r == ny or sigs[r] != sigs[lo]:
                    runs.append((lo, r))
                    lo = r
            if 1 < len(runs) <= 12:
                bands, scat = [], 0
                for rlo, rhi in runs:
                    sp, s = subplan(t3[rlo:rhi].reshape(-1, C),
                                    None if g3 is None else g3[rlo:rhi].reshape(-1, C))
                    bands.append((rlo, rhi, sp))
                    scat += s
                if scat * 4 <= tseg.size:
                    return 'banded', (ny, nx, False, bands)
            elif len(runs) == 1:
                # all grid rows alike (periodic seams): per-inner-index bands,
                # greedily merged
                bands, scat = [], 0
                lo = 0
                while lo < nx:
                    hi = lo + 1
                    best, s = subplan(t3[:, lo:hi].reshape(-1, C),
                                      None if g3 is None else g3[:, lo:hi].reshape(-1, C))
                    while hi < nx and best[0] != 'scatter':
                        cand, cs = subplan(t3[:, lo:hi + 1].reshape(-1, C),
                                           None if g3 is None else g3[:, lo:hi + 1].reshape(-1, C))
                        if cand[0] == 'scatter':
                            break
                        best, s = cand, cs
                        hi += 1
                    bands.append((lo, hi, best))
                    scat += s
                    lo = hi
                if scat * 4 <= tseg.size and len(bands) <= 16:
                    return 'banded', (ny, nx, True, bands)
    return 'scatter', tseg.ravel()


def _apply_value_plan(w, skind, payload, V):
    '''Apply a _plan_value_table plan inside the jit: accumulate the value
    table V (leading element axis) into the flat buffer w.'''
    import jax.numpy as jnp
    Vf = V.reshape(V.shape[0], -1)
    if skind == 'slice':
        return _slice_scatter_add(w, payload, Vf)
    if skind == 'grouped':
        for cols, p in payload:
            w = _slice_scatter_add(w, p, Vf[:, jnp.asarray(cols)])
        return w
    if skind == 'banded':
        ny, nx, inner, bands = payload
        V3 = Vf.reshape(ny, nx, -1)
        for lo, hi, sp in bands:
            sub = V3[:, lo:hi] if inner else V3[lo:hi]
            w = _apply_value_plan(w, sp[0], sp[1], sub.reshape(-1, V3.shape[2]))
        return w
    return w.at[jnp.asarray(payload)].add(Vf.ravel())


class _LazyPattern:
    '''Deferred CSR pattern: holds the raw per-segment COO index streams and
    builds the deduplicated :class:`matrix.SparsePattern` (a ~10M-entry sort
    at ~1M dofs) only when some consumer actually touches a CSR attribute.
    The stencil-form device path (assembly through slice adds, MG-CG on the
    weight grid) never does — CSR becomes an export format, not the
    operator.'''

    def __init__(self, rows_list, cols_list, shape):
        self.shape = tuple(shape)
        self._rows_list = rows_list
        self._cols_list = cols_list
        self._pat = None

    def get(self):
        if self._pat is None:
            rows = numpy.concatenate([r.ravel() for r in self._rows_list]) \
                if self._rows_list else numpy.zeros(0, dtype=numpy.int64)
            cols = numpy.concatenate([c.ravel() for c in self._cols_list]) \
                if self._cols_list else numpy.zeros(0, dtype=numpy.int64)
            self._pat = matrix.SparsePattern(rows, cols, self.shape)
            self._rows_list = self._cols_list = None
        return self._pat

    def __getattr__(self, name):
        if name.startswith('_'):
            raise AttributeError(name)
        return getattr(self.get(), name)


class _Loc:
    '''One localized appearance of an argument in an expression.

    ``leaf`` replaces the gather node; ``argidx`` is a numpy int array
    (broadcastable to leaf.shape) holding the flat argument index of each leaf
    entry; ``seed_axes`` are the leaf axes that enumerate distinct argument
    entries per element (axes > 0 where argidx varies).  ``dense`` marks a
    non-localized (whole-argument) appearance with no element axis.
    '''

    def __init__(self, name, argshape, leaf, argidx, dense=False):
        self.name = name
        self.argshape = argshape
        self.leaf = leaf
        self.argidx = argidx
        self.dense = dense
        if dense:
            self.seed_axes = tuple(range(argidx.ndim))
        else:
            self.seed_axes = tuple(ax for ax in range(1, argidx.ndim) if argidx.shape[ax] > 1)
        self.nseeds = int(numpy.prod([leaf.shape[ax] for ax in self.seed_axes], dtype=numpy.int64)) if self.seed_axes else 1

    def leaf_value(self, args):
        import jax.numpy as jnp
        from .utils import config
        flat = jnp.asarray(args[self.name], dtype=config.float_dtype()).reshape(-1)
        plan = getattr(self, '_gplan', '?')
        if plan == '?':
            N = int(numpy.prod(self.argshape, dtype=numpy.int64))
            plan = self._gplan = None if self.dense else _grid_plan(self.argidx, N)
        if plan is not None:
            out = _slice_gather(flat, plan, self.argidx.shape[1:])
            return jnp.broadcast_to(out, self.leaf.shape)
        return jnp.broadcast_to(flat[self.argidx], self.leaf.shape)

    def seeds(self):
        '''[S, *leaf.shape] tangent basis: identity over the seed axes,
        broadcast over element/point axes.'''
        import jax.numpy as jnp
        from .utils import config
        S = self.nseeds
        shape = [S] + [self.leaf.shape[ax] if ax in self.seed_axes else 1 for ax in range(len(self.leaf.shape))]
        eye = jnp.eye(S, dtype=config.float_dtype()).reshape(shape)
        return jnp.broadcast_to(eye, (S,) + self.leaf.shape)

    def cols(self):
        '''[E, S] (or [1, S] for dense) flat argument index per (element, seed).'''
        sq = self.argidx
        assert all(sq.shape[ax] == 1 for ax in range(sq.ndim) if ax not in self.seed_axes and (self.dense or ax != 0))
        if self.dense:
            return sq.reshape(1, -1)
        keep = [sq.shape[0]] + [sq.shape[ax] for ax in self.seed_axes]
        sq = sq.reshape(keep)
        return sq.reshape(sq.shape[0], -1)


_loc_counter = [0]


def _arg_indices(node, names):
    '''Resolve a node that is a (possibly nested) constant gather of a
    broadcast argument: returns (Argument, flat-index array broadcastable to
    node.shape), or None.  Handles GatherAlong chains (tensor-product bases
    contracted per factor) by composing the index tables host-side.'''
    if isinstance(node, ev.GatherAlong):
        if node.dofs.arguments or node.dofs.leafdeps:
            return None
        inner = _arg_indices(node.func, names)
        if inner is None:
            return None
        arg, idx = inner
        dofs_np = _eval_const(node.dofs).astype(numpy.int64)
        # compose: out[..., l, ...] = idx[..., dofs[..., l, ...], ...]
        # (take_along_axis broadcasts unit axes, keeping memory small)
        return arg, numpy.take_along_axis(idx, dofs_np, node.axis)
    core = _argcore(node)
    if core is None:
        return None
    arg, axmap, table = core
    if arg.name not in names:
        return None
    arg_axes = {core_ax: leaf_ax for leaf_ax, core_ax in enumerate(axmap) if core_ax is not None}
    strides = numpy.cumprod([1] + list(arg.shape[::-1][:-1]))[::-1].astype(numpy.int64)
    shape0 = [1] * len(node.shape)
    ax0 = arg_axes.get(0)
    assert ax0 is not None, 'argument axis lost in broadcast'
    base = (table if table is not None else numpy.arange(arg.shape[0])).astype(numpy.int64) * strides[0]
    shape0[ax0] = len(base)
    idx = base.reshape(shape0)
    for core_ax in range(1, len(arg.shape)):
        leaf_ax = arg_axes.get(core_ax)
        assert leaf_ax is not None, 'argument axis lost in broadcast'
        n = arg.shape[core_ax]
        shape = [1] * len(node.shape)
        shape[leaf_ax] = n
        idx = idx + numpy.arange(n, dtype=numpy.int64).reshape(shape) * strides[core_ax]
    return arg, idx


def _seed_from(orig, name, direction):
    '''Route ``direction`` (an evaluable of the argument's shape) through the
    same index-structural gather chain as the original argument appearance
    ``orig``.  Elementwise factors of the direction are split first so that a
    plain-argument factor stays localizable (gather(a*b) = gather(a)*gather(b)
    holds because the chain is a pure index selection).'''
    if isinstance(direction, ev.Multiply):
        a, b = direction.children
        return ev.multiply(_seed_from(orig, name, a), _seed_from(orig, name, b))
    argnodes = ev.find(orig, lambda n: isinstance(n, ev.Argument) and n.name == name)
    assert len(argnodes) == 1, 'gather chain must contain the argument exactly once'
    return ev.replace(orig, {argnodes[0]: direction})


def _split_const_gathers(e, names):
    '''Rewrite gather(arg_expr * const, dofs) -> gather(arg_expr) *
    gather(const): masked trial/test arguments (e.g. the reference's
    ``dtest * dfluid`` restriction, examples/turek.py:261,327) keep the
    constant mask outside the gather so the argument gather itself stays
    localizable per element batch.'''
    while True:
        repl = {}
        for node in ev.find(e, lambda n: isinstance(n, ev.GatherAlong)):
            chain = []
            core = node.func
            while isinstance(core, ev.InsertAxis):
                chain.append((core.axis, core.length))
                core = core.func
            if not isinstance(core, ev.Multiply):
                continue
            a, b = core.children
            for witharg, constpart in ((a, b), (b, a)):
                if any(arg.name in names for arg in witharg.arguments) \
                        and not constpart.arguments and not constpart.leafdeps:
                    def rebuild(x):
                        for ax, ln in reversed(chain):
                            x = ev.insertaxis(x, ax, ln)
                        return ev.GatherAlong(x, node.dofs, node.axis)
                    repl[node] = ev.multiply(rebuild(witharg), rebuild(constpart))
                    break
        if not repl:
            return e
        e = ev.replace(e, repl)


def _localize(expr, names):
    '''Replace localized gathers (and remaining direct appearances) of the
    named arguments by Leafs.  ArgGrad nodes over the named arguments
    (function.linearize directions) are expanded into LeafGrads whose seeds
    ride the same gather tables, so directional derivatives stay
    element-batched.  Returns (new_expr, {name: [_Loc]}).'''
    expr = _split_const_gathers(expr, names)
    locs = {name: [] for name in names}
    leafinfo = {}  # leaf key -> (argument name, original gather node or None)

    def collect_and_replace(e):
        candidates = []
        for node in ev.find(e, lambda n: isinstance(n, ev.GatherAlong)):
            res = _arg_indices(node, names)
            if res is not None:
                candidates.append((node, res))
        # keep outermost candidates only (nested gathers are consumed by their parent)
        nodes = [n for n, _ in candidates]
        repl = {}
        for node, (arg, idx) in candidates:
            inner_of_other = any(other is not node and node in set(ev.find(other, lambda n: n is node))
                                 for other in nodes)
            if inner_of_other:
                continue
            _loc_counter[0] += 1
            leaf = ev.Leaf(('loc', _loc_counter[0]), node.shape, float)
            repl[node] = leaf
            locs[arg.name].append(_Loc(arg.name, arg.shape, leaf, idx))
            leafinfo[leaf.key] = (arg.name, node)
        return ev.replace(e, repl) if repl else e

    new_expr = collect_and_replace(expr)

    for _ in range(4):  # nested linearizations expand one level per round
        ags = ev.find(new_expr, lambda n: isinstance(n, ev.ArgGrad) and n.name in names)
        if not ags:
            break
        repl = {}
        for ag in ags:
            func = ag.func
            # dense (unlocalized) appearances of the differentiated argument:
            # localize here so the directional derivative flows through a leaf
            for argnode in [a for a in func.arguments if a.name == ag.name]:
                _loc_counter[0] += 1
                leaf = ev.Leaf(('loc', _loc_counter[0]), argnode.shape, float)
                func = ev.replace(func, {argnode: leaf})
                idx = numpy.arange(int(numpy.prod(argnode.shape, dtype=numpy.int64)), dtype=numpy.int64).reshape(argnode.shape)
                locs[ag.name].append(_Loc(ag.name, argnode.shape, leaf, idx, dense=True))
                leafinfo[leaf.key] = (ag.name, None)
            out = None
            for leaf in sorted(func.leafdeps, key=lambda l: l.key):
                info = leafinfo.get(leaf.key)
                if info is None or info[0] != ag.name:
                    continue
                orig = info[1]
                seed = ag.direction if orig is None else _seed_from(orig, ag.name, ag.direction)
                term = ev.LeafGrad(func, leaf.key, seed)
                out = term if out is None else ev.add(out, term)
            if out is None:  # argument absent from func: derivative is zero
                out = ev.Zeros(ag.shape, float)
            repl[ag] = out
        new_expr = ev.replace(new_expr, repl)
        new_expr = _split_const_gathers(new_expr, names)
        new_expr = collect_and_replace(new_expr)  # localize the seed gathers

    for name in names:  # remaining direct (dense) appearances
        for argnode in [a for a in new_expr.arguments if a.name == name]:
            _loc_counter[0] += 1
            leaf = ev.Leaf(('loc', _loc_counter[0]), argnode.shape, float)
            new_expr = ev.replace(new_expr, {argnode: leaf})
            idx = numpy.arange(int(numpy.prod(argnode.shape, dtype=numpy.int64)), dtype=numpy.int64).reshape(argnode.shape)
            locs[name].append(_Loc(name, argnode.shape, leaf, idx, dense=True))

    return new_expr, locs


def _argcore(node):
    '''If node is a pure broadcast (InsertAxis/Transpose) of an Argument — or
    of a constant re-indexing Take of one (block/vectorized bases) — return
    (argument, axismap node_axis -> arg_axis or None, index_table or None).'''
    factors = ev._decompose_product(node)
    if len(factors) != 1:
        return None
    core = factors[0].core
    if isinstance(core, ev.Argument):
        return core, factors[0].axismap, None
    if isinstance(core, ev.Take) and core.axis == 0 and isinstance(core.children[0], ev.Argument) \
            and isinstance(core.children[1], ev.Constant) and core.children[1].ndim == 1:
        return core.children[0], factors[0].axismap, core.children[1].value
    return None


def _eval_const(node):
    if isinstance(node, ev.Constant):
        return node.value
    assert not node.arguments and not node.leafdeps, 'dof table is not constant'
    return ev.eval_once(node, on_host=True)


def _additive_terms(expr):
    if isinstance(expr, ev.Add):
        return _additive_terms(expr.children[0]) + _additive_terms(expr.children[1])
    if isinstance(expr, ev.Multiply):
        # distribute constant scalar factors (e.g. a global tolerance scaling)
        # over sums so per-term sparsity analysis sees the individual integrals
        a, b = expr.children
        for x, y in ((a, b), (b, a)):
            if isinstance(x, ev.Add) and not y.arguments and not y.leafdeps:
                return [t for u in _additive_terms(x) for t in _additive_terms(ev.multiply(u, y))]
    return [expr]


def _scalarize(res_array, testname):
    '''Contract a residual vector with a synthetic test argument *inside* each
    integral: sum_t integral(R_t) . v becomes sum_t integral(R_t . v), keeping
    every term's test/trial gathers on the same element batch so that
    localization-based jacobian assembly stays per-element.'''
    from .sample import _Integral
    v = function.Argument(testname, res_array.shape)

    def walk(arr, sign):
        if isinstance(arr, function._Add):
            return walk(arr.operands[0], sign) + walk(arr.operands[1], sign)
        if isinstance(arr, function._Neg):
            return walk(arr.operands[0], -sign)
        return [(arr, sign)]

    out = None
    for term, sign in walk(res_array, 1):
        if isinstance(term, function._Derivative) and term.func.shape == ():
            # residual built as energy.derivative(trial): contracting with the
            # synthetic test v gives exactly the directional derivative
            # (linearize) of the energy toward v, which the localized-AD
            # machinery assembles sparsely — no dense ndofs x ndofs jacobian
            # intermediate ever exists (reference: function.py:2021 derivative
            # feeding solver.System, solver.py:238)
            e = function._Linearized(term.func, term.name, v, term.argshape)
        elif isinstance(term, _Integral) and term.integrand.ndim == res_array.ndim:
            inner = function.sum_(function.multiply(term.integrand, v), tuple(range(res_array.ndim)))
            e = term.sample.integral(inner)
        else:
            e = function.sum_(function.multiply(term, v), tuple(range(res_array.ndim)))
        if sign < 0:
            e = function.negative(e)
        out = e if out is None else function.add(out, e)
    return out if out is not None else function.asarray(0.0)


def _chunk_rewrite(expr, mapping, E, ce):
    '''ev.replace plus rewriting of element-axis broadcasts: InsertAxis nodes
    of length E (constants broadcast over the element batch) become length-ce
    inserts so the rebuilt expression is uniformly chunk-sized.'''
    memo = {}

    def rec(node):
        if node in mapping:
            return mapping[node]
        hit = memo.get(node)
        if hit is not None:
            return hit
        if not node.children:
            out = node
        else:
            newc = tuple(rec(c) for c in node.children)
            if isinstance(node, ev.InsertAxis) and node.length == E:
                out = ev.insertaxis(newc[0], node.axis, ce)
            elif all(a is b for a, b in zip(newc, node.children)):
                out = node
            else:
                out = ev._rebuild(node, newc)
        memo[node] = out
        return out
    return rec(expr)


class _Chunk:
    '''One additive contribution to a residual block: a grad-values function,
    constant broadcastable flat row indices, and the trial localizations the
    values can depend on.'''

    def __init__(self, rows, fn, leafdeps, shape):
        self.rows = rows
        self.fn = fn
        self.leafdeps = leafdeps
        self.shape = shape


class System:
    '''A linear or nonlinear system of equations (reference: solver.py:189).

    Built from a scalar functional (energy minimization; the test space is
    the trial space) or a residual with explicit trial/test argument names:

    >>> import numpy
    >>> from nutils_tpu import mesh, function
    >>> from nutils_tpu.solver import System
    >>> topo, geom = mesh.rectilinear([4])
    >>> u = topo.field('u', btype='std', degree=1)
    >>> g = function.grad(u, geom)
    >>> energy = topo.integral((g @ g / 2 - u) * function.J(geom), degree=2)
    >>> cons = {'u': numpy.array([0.0] + [numpy.nan] * 4)}  # clamp the left end
    >>> args = System(energy, trial='u').solve(constrain=cons)
    >>> numpy.round(numpy.asarray(args['u']), 10).tolist()  # u = 4x - x^2/2 at x=0,1,..,4
    [0.0, 3.5, 6.0, 7.5, 8.0]
    '''

    def __init__(self, residual, /, trial, test=None):
        self.trials = tuple(trial.split(',') if isinstance(trial, str) else trial)

        # a complex residual R is equivalent to the real functional Re(R):
        # stationarity in the packed (re, im) test dofs is exactly R == 0
        # componentwise (reference: complex dtype support, examples/coil.py);
        # complex trial arguments are backed by real (..., 2) arrays
        if isinstance(residual, (tuple, list)):
            residual = [function.asarray(r).real if function.iscomplex(function.asarray(r)) else r for r in residual]
        else:
            res_a = function.asarray(residual)
            if function.iscomplex(res_a):
                residual = res_a.real

        # a sum of function.linearize terms over one functional is the energy
        # formulation in disguise: unwrap so assembly uses localized AD
        if test is None and not isinstance(residual, (tuple, list)):
            lin = function._unwrap_linearized(residual, self.trials)
            if lin is not None:
                residual = lin

        if isinstance(residual, (tuple, list)):
            if test is not None:
                raise ValueError('test arguments are not allowed with residual vectors')
            res_arrays = [function.asarray(r) for r in residual]
            assert len(res_arrays) == len(self.trials), 'one residual vector per trial argument'
            self.is_symmetric = False
            tests = tuple(f'__test_{i}__' for i in range(len(res_arrays)))
            value = None
            for r, tname in zip(res_arrays, tests):
                term = _scalarize(r, tname)
                value = term if value is None else function.add(value, term)
            self._synthetic_tests = tests
            linear_degree = 1
        else:
            value = function.asarray(residual)
            if value.ndim != 0:
                raise ValueError('System requires a scalar functional')
            tests = self.trials if test is None else tuple(test.split(',') if isinstance(test, str) else test)
            self.is_symmetric = tests == self.trials
            self._synthetic_tests = ()
            # a true energy (no explicit tests) is linear when quadratic in the
            # trials; with explicit test functions the functional already
            # carries the test factor, so the residual is linear iff the
            # functional is linear in the trials
            linear_degree = 2 if test is None else 1

        argspecs = dict(value.arguments)
        self.argshapes = {n: spec[0] for n, spec in argspecs.items()}
        self.argdtypes = {n: spec[1] for n, spec in argspecs.items()}
        for t in self.trials:
            assert t in self.argshapes, f'trial argument {t!r} does not appear in the residual'
        for t in tests:
            assert t in self.argshapes, f'test argument {t!r} does not appear in the residual'
        self.tests = tests
        self.trial_shapes = tuple(self.argshapes[t] for t in self.trials)
        self.test_shapes = tuple(self.argshapes[t] for t in tests)
        trial_sizes = [int(numpy.prod(s, dtype=numpy.int64)) for s in self.trial_shapes]
        test_sizes = [int(numpy.prod(s, dtype=numpy.int64)) for s in self.test_shapes]
        toffs = numpy.cumsum([0] + trial_sizes)
        roffs = numpy.cumsum([0] + test_sizes)
        self._trial_slices = [slice(int(a), int(b)) for a, b in zip(toffs[:-1], toffs[1:])]
        self._test_slices = [slice(int(a), int(b)) for a, b in zip(roffs[:-1], roffs[1:])]
        self._ntrial = int(toffs[-1])
        self._ntest = int(roffs[-1])
        assert self._ntrial == self._ntest, 'jacobian must be square'

        # ---- localize and build chunks
        E_ir = ev.astype(value.lower(function.EMPTY_LOWER_ARGS), float)
        deg = ev.poly_degree(E_ir, frozenset(self.trials))
        self.is_linear = deg <= linear_degree
        resargs = {a.name for a in E_ir.arguments} - set(self._synthetic_tests)
        self.is_constant_matrix = self.is_linear and resargs <= set(self.trials) | set(tests)
        self.arguments = frozenset(resargs)

        names = frozenset(tests) | frozenset(self.trials)
        E_loc, locs = _localize(E_ir, names)
        E_loc = ev._promote_big_constants([E_loc])[0]
        self._expr = E_loc
        self._comp = ev.compile(E_loc)
        self._locs = locs
        self._trial_locs = {u: locs[u] for u in self.trials}

        terms = _additive_terms(E_loc)
        lockeys = {loc.leaf.key for ll in locs.values() for loc in ll}
        term_lockeys = [frozenset(l.key for l in t.leafdeps if l.key in lockeys) for t in terms]

        self._blocks = []
        for ti, t in enumerate(tests):
            chunks = []
            for loc in locs[t]:
                # trial leaves that share an additive term with this test leaf
                deps = frozenset().union(*(tk for tk in term_lockeys if loc.leaf.key in tk)) if term_lockeys else frozenset()
                trial_keys = deps & {l.leaf.key for u in self.trials for l in self._trial_locs[u]}

                # compile only the terms this test localization appears in:
                # the gradient is identical (other terms are constant in the
                # leaf), the traced graph is much smaller, and — crucially —
                # unrelated integrals never share an XLA fusion with this
                # gradient (wide fusions across unrelated element batches have
                # been observed to miscompute on some CPU backends)
                dep_terms = [tm for tm, tk in zip(terms, term_lockeys) if loc.leaf.key in tk]
                expr_dep = dep_terms[0] if dep_terms else E_loc
                for tm in dep_terms[1:]:
                    expr_dep = ev.add(expr_dep, tm)
                comp_dep = ev.compile(expr_dep)

                def fn(args, overrides, tables, _loc=loc, _comp=comp_dep):
                    import jax
                    leaves = self._bound_leaves(args, overrides, tables)

                    def scalar(x):
                        lv = dict(leaves)
                        lv[_loc.leaf.key] = x
                        return _comp.trace(args, lv)
                    return jax.grad(scalar)(leaves[_loc.leaf.key])
                chunks.append(_Chunk(loc.argidx, fn, trial_keys, loc.leaf.shape))
            self._blocks.append(chunks)

        self._cache = {}

    # -------------------------------------------------------- helpers

    def _bound_leaves(self, args, overrides, tables):
        leaves = dict(tables)
        for ll in self._locs.values():
            for loc in ll:
                key = loc.leaf.key
                v = overrides.get(key)
                leaves[key] = v if v is not None else loc.leaf_value(args)
        return leaves

    def _tables(self):
        '''Default bindings (sample coordinate / promoted constant tables) of
        the compiled functional, passed through the jit boundary as runtime
        inputs; device-committed once and reused.  Under the multi-device
        execution mode (``NUTILS_TPU_MESH=N``, config.mesh) the element-batch
        axis of every table is sharded over the default mesh, turning
        assembly into element-parallel SPMD with GSPMD-inserted collectives
        (the reference's default-on element loop, parallel.py:21).'''
        from . import parallel
        mesh = parallel.default_mesh()
        cached = self._cache.get('tables')
        if cached is None or self._cache.get('tables_mesh', ()) != parallel.mesh_token():
            import jax
            cached = {}
            for key, node in self._comp.leafnodes.items():
                if node.value is not None:
                    cached[key] = node.value if not isinstance(node.value, numpy.ndarray) \
                        else parallel.put_table(node.value.astype(
                            ev._concrete_dtype(node.dtype), copy=False), mesh)
            self._cache['tables'] = cached
            self._cache['tables_mesh'] = parallel.mesh_token()
        return cached

    def _clean(self, arguments):
        out = {}
        for name, shape in self.argshapes.items():
            v = arguments.get(name)
            if v is None and (name in self._synthetic_tests or name in self.tests):
                # test-function values never influence the residual/jacobian
                # (the residual IS the derivative with respect to them)
                out[name] = numpy.ones(shape)
            else:
                assert v is not None, f'missing argument {name!r}'
                out[name] = numpy.asarray(_pack_complex(v), dtype=float)
        # pass through any extra arguments the expressions may close over
        for name, v in arguments.items():
            if name not in out and not isinstance(v, str):
                out[name] = numpy.asarray(v, dtype=float)
        return out

    # -------------------------------------------------------- traces

    def _residual_trace(self, args, tables):
        import jax.numpy as jnp
        from .utils import config
        parts = []
        for chunks, sl in zip(self._blocks, self._test_slices):
            n = sl.stop - sl.start
            r = jnp.zeros(n, dtype=config.float_dtype())
            for c in chunks:
                v = c.fn(args, {}, tables)
                plan = getattr(c, '_row_plan', '?')
                if plan == '?':
                    rows_np = numpy.asarray(c.rows)
                    # sum v over axes the row table broadcasts along, then
                    # plan the structured slice-scatter layout (whole-affine,
                    # phase-grouped, or seam-banded for periodic meshes)
                    bcast = tuple(ax for ax in range(len(c.shape))
                                  if rows_np.shape[ax] == 1 and c.shape[ax] > 1)
                    sq = rows_np
                    for ax in reversed(bcast):
                        sq = numpy.squeeze(sq, ax)
                    if sq.ndim >= 2 and sq.shape[0] > 1:
                        plan = c._row_plan = (bcast, _plan_value_table(
                            sq.reshape(sq.shape[0], -1), None, n))
                    else:
                        plan = c._row_plan = (None, None)
                bcast, vplan = plan
                if vplan is not None and vplan[0] != 'scatter':
                    vv = v.sum(bcast) if bcast else v
                    r = _apply_value_plan(r, vplan[0], vplan[1], vv)
                else:
                    rows = jnp.broadcast_to(jnp.asarray(c.rows), c.shape)
                    r = r.at[rows.ravel()].add(v.ravel())
            parts.append(r)
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    def _value_trace(self, args, tables):
        return self._comp.trace(args, self._bound_leaves(args, {}, tables))

    def _compiled_value(self):
        '''Per-additive-term jitted value with host-side summation and a
        one-time jit-vs-eager consistency check.  Fused whole-functional XLA
        programs have been observed to MISCOMPUTE (NaN) on this toolchain when
        unrelated element batches share a fusion (see _compiled_split and
        ENVIRONMENT_NOTES.md); the value is only needed outside the hot
        assembly loop (Minimize line searches), so on the first call the
        jitted result is validated against the eager evaluation and the jitted
        path is disabled if they disagree.'''
        import jax
        terms = _additive_terms(self._expr)
        comps = [ev.compile(t) for t in terms]
        jitted = [jax.jit(lambda args, tables, _c=c: _c.trace(args, self._bound_leaves(args, {}, tables)))
                  for c in comps]
        state = {'use_jit': None}

        def eager(args, tables):
            return sum(float(c.trace(args, self._bound_leaves(args, {}, tables))) for c in comps)

        def fn(args):
            tables = self._tables()
            if state['use_jit'] is None:
                jv = sum(float(j(args, tables)) for j in jitted)
                evv = eager(args, tables)
                ok = numpy.isnan(jv) == numpy.isnan(evv) and (numpy.isnan(evv) or abs(jv - evv) <= 1e-9 * (1 + abs(evv)))
                state['use_jit'] = bool(ok)
                if not ok:
                    log.warning(f'jitted functional value ({jv!r}) disagrees with eager evaluation ({evv!r}); '
                                'falling back to eager value evaluation (toolchain miscompile, see ENVIRONMENT_NOTES.md)')
                return evv
            if state['use_jit']:
                return sum(float(j(args, tables)) for j in jitted)
            return eager(args, tables)
        return fn

    @functools.cached_property
    def _jac_layout(self):
        '''(chunk_meta, SparsePattern): one meta entry per (chunk, trial loc)
        pair, aligned with the value order of _jacobian_trace.'''
        chunk_meta = []
        rows_all = []
        cols_all = []
        segs2d = []
        for bi, chunks in enumerate(self._blocks):
            row_off = self._test_slices[bi].start
            for ci, c in enumerate(chunks):
                for u in self.trials:
                    col_off = self._trial_slices[self.trials.index(u)].start
                    for li, loc in enumerate(self._trial_locs[u]):
                        if loc.leaf.key not in c.leafdeps:
                            continue
                        S = loc.nseeds
                        vshape = c.shape + (S,)
                        rows_b = c.rows.reshape(c.rows.shape + (1,))
                        cols_es = loc.cols()  # [E, S] or [1, S]
                        if loc.dense or cols_es.shape[0] == 1:
                            cols_b = cols_es.reshape((1,) * len(c.shape) + (S,))
                        else:
                            assert len(c.shape) and c.shape[0] == cols_es.shape[0], (
                                f'row chunk and trial localization live on different element batches: '
                                f'chunk shape {c.shape} (block {bi}, chunk {ci}) vs cols {cols_es.shape} '
                                f'for trial {u!r} loc {li}')
                            cols_b = cols_es.reshape((cols_es.shape[0],) + (1,) * (len(c.shape) - 1) + (S,))
                        reduce_axes = tuple(ax for ax in range(len(vshape))
                                            if rows_b.shape[ax] == 1 and cols_b.shape[ax] == 1 and vshape[ax] > 1)
                        sel = tuple(0 if ax in reduce_axes else slice(None) for ax in range(len(vshape)))
                        rows_k = numpy.broadcast_to(rows_b, vshape)[sel].astype(numpy.int32) + numpy.int32(row_off)
                        cols_k = numpy.broadcast_to(cols_b, vshape)[sel].astype(numpy.int32) + numpy.int32(col_off)
                        rows_all.append(rows_k.ravel())
                        cols_all.append(cols_k.ravel())
                        segs2d.append((rows_k.reshape(rows_k.shape[0], -1),
                                       cols_k.reshape(cols_k.shape[0], -1)))
                        chunk_meta.append((bi, ci, u, li, reduce_axes, rows_k.size))
        pattern = _LazyPattern(rows_all, cols_all, (self._ntest, self._ntrial))
        jplan = self._plan_stencil_jacobian(segs2d, pattern)
        if jplan is None:
            jplan = self._plan_blockgrid_jacobian(segs2d, pattern)
        return chunk_meta, pattern, jplan

    def _plan_stencil_jacobian(self, segs2d, pattern):
        '''Try to assemble the jacobian directly in stencil form
        w[(2k+1)^2, nyd, nxd]: every (row, col) entry must decompose as
        col - row = a*nxd + b with |a|,|b| <= k and no grid-row wrap, and the
        dof pitch nxd must be consistent across all (chunk, loc) segments.
        Segments whose target tables are grid-affine scatter through static
        slices (solver._slice_scatter_add); the few that are not (boundary
        batches etc.) keep an element-granular add into the same w buffer.
        Replaces the per-iteration CSR value scatter — the last
        element-granular device op of structured assembly.'''
        n = self._ntest
        if n != self._ntrial or not segs2d:
            return None
        # dof grid: the registered layout of the single trial field (exact,
        # any rank, periodic-aware); fall back to 2-D pitch inference from
        # the grid-affine volume-batch row tables for unregistered fields
        grid = per = None
        if len(self.trials) == 1:
            hint = function.field_grid(self.trials[0], n)
            if hint is not None:
                grid, per = hint
        if grid is None:
            nxd = None
            for rowsT, colsT in segs2d:
                rp = _grid_plan(rowsT, n)
                if rp is not None and len(rp[0]) == 2 and rp[0][0] > 1:
                    (ny_e, nx_e), (pitch, sx), _bases = rp
                    if pitch % sx == 0:
                        cand = pitch // sx
                        if nxd is None:
                            nxd = cand
                        elif nxd != cand:
                            return None
            if nxd is None or n % nxd:
                return None
            grid, per = (n // nxd, nxd), (False, False)
        grid = tuple(int(g) for g in grid)
        if int(numpy.prod(grid)) != n:
            return None
        d = len(grid)
        pitches = [int(numpy.prod(grid[ax + 1:])) for ax in range(d)]

        def shifts_of(rowsT, colsT):
            '''Per-axis window shifts (periodic axes wrap) or None.  Index
            arithmetic runs in int32 (dof counts < 2^31): numpy's int64
            floor-division is scalar (~130x slower than the vectorized int32
            path) and dominated System planning at ~1M dofs.'''
            rowsT = rowsT.astype(numpy.int32, copy=False)
            colsT = colsT.astype(numpy.int32, copy=False)
            A = []
            for ax in range(d):
                rc = (rowsT // pitches[ax]) % grid[ax]
                cc = (colsT // pitches[ax]) % grid[ax]
                a = cc - rc
                if numpy.abs(a).max(initial=0) > 3:
                    if per[ax] and grid[ax] > 9:
                        a = (a + grid[ax] // 2) % grid[ax] - grid[ax] // 2
                        if numpy.abs(a).max(initial=0) > 3:
                            return None
                    else:
                        return None
                A.append(a)
            return A

        deltas = []
        for rowsT, colsT in segs2d:
            A = shifts_of(rowsT, colsT)
            if A is None:
                return None
            deltas.append(A)
        ks = [max(int(numpy.abs(A[ax]).max(initial=0)) for A in deltas)
              for ax in range(d)]
        windows = [2 * k + 1 for k in ks]
        W = int(numpy.prod(windows))
        segs = []
        for (rowsT, colsT), A in zip(segs2d, deltas):
            widx = numpy.zeros(rowsT.shape, dtype=numpy.int64)
            for a, k, wdim in zip(A, ks, windows):
                widx = widx * wdim + (a + k)
            tgt = widx * n + rowsT
            segs.append(_plan_value_table(tgt, widx, W * n))
        # CSR materialization map: slot l holds w[widx_l * n + row_l].
        # Deferred: every pattern entry comes from a seg that passed
        # shifts_of, so the pattern-level decomposition cannot fail; building
        # it eagerly would force the CSR pattern (a ~10M-entry sort) that the
        # stencil-form device path otherwise never needs.
        _cm = []  # memo: resolved once, shared by every Newton-step matrix

        def csr_map():
            if not _cm:
                A = shifts_of(numpy.asarray(pattern.urows), numpy.asarray(pattern.indices))
                assert A is not None, 'stencil decomposition failed on the deduplicated pattern'
                widx = numpy.zeros(len(pattern.indices), dtype=numpy.int64)
                for a, k, wdim in zip(A, ks, windows):
                    widx = widx * wdim + (a + k)
                _cm.append(widx * n + pattern.urows)
            return _cm[0]
        return dict(form='stencil', ks=tuple(ks), grid=grid, total=W * n, segs=segs,
                    csr_map=csr_map, periodic=tuple(bool(p) for p in per))

    def _field_partition(self):
        '''(offsets, grids): the dof vector partitioned into registered
        field parts — one per trial for plain fields, several for composite
        (vectorized) fields; fields without a registered layout contribute a
        single part with grid None.'''
        offsets = [0]
        grids = []
        for t, sl in zip(self.trials, self._trial_slices):
            size = sl.stop - sl.start
            parts = function.field_parts(t, size)
            if parts is None:
                offsets.append(offsets[-1] + size)
                grids.append(None)
            else:
                for psize, grid, per in parts:
                    offsets.append(offsets[-1] + psize)
                    grids.append((grid, per))
        return tuple(offsets), tuple(grids)

    def _plan_blockgrid_jacobian(self, segs2d, pattern):
        '''Assemble the jacobian of a multi-field structured system directly
        in block-grid form (ops/blockgrid.py): values land in the
        concatenated per-(block, phase) weight buffers through static slice
        adds — no CSR value scatter in the jit, and the device Krylov
        operands come out of assembly with zero copies (the multi-field
        counterpart of the single-field stencil-form assembly above).'''
        from .ops import blockgrid as bg
        if self._ntest != self._ntrial or not segs2d:
            return None
        offsets, grids = self._field_partition()
        if len(grids) < 2 or any(g is None for g in grids):
            return None
        form = bg.detect(numpy.ones(pattern.nnz), pattern.indices, pattern.indptr,
                         offsets, grids=grids)
        if form is None:
            return None
        sizes, windex, wpos = form.fill
        # buffer offsets aligned to each buffer's own grid size, so the
        # mixed-radix slice layouts of the nested views start at a grid-row
        # boundary (a mid-row base defeats the no-wrap check of _grid_plan)
        shapes = bg._w_shapes(form.meta)
        woff = numpy.zeros(len(sizes) + 1, dtype=numpy.int64)
        for i, (s, shp) in enumerate(zip(sizes, shapes)):
            npix = int(numpy.prod(shp[1:]))
            woff[i] = -(-woff[i] // npix) * npix if npix else woff[i]
            woff[i + 1] = woff[i] + s
        tgt_slot = woff[windex] + wpos          # per CSR slot
        tgt_entry = tgt_slot[pattern.slot]      # per original assembly entry
        wind_entry = windex[pattern.slot]
        total = int(woff[-1])
        segs = []
        pos = 0
        for rowsT, colsT in segs2d:
            m = rowsT.size
            tseg = tgt_entry[pos:pos + m].reshape(rowsT.shape[0], -1)
            wseg = wind_entry[pos:pos + m].reshape(rowsT.shape[0], -1)
            pos += m
            segs.append(_plan_value_table(tseg, wseg, total))
        assert pos == len(tgt_entry)
        return dict(form='blockgrid', meta=form.meta, sizes=tuple(int(s) for s in sizes),
                    woff=tuple(int(o) for o in woff[:-1]), total=total, segs=segs,
                    csr_map=tgt_slot, field_offsets=tuple(offsets),
                    field_grids=tuple(grids))

    def _jacobian_trace(self, args, tables):
        import jax
        import jax.numpy as jnp
        from .utils import config
        chunk_meta, pattern, _jplan = self._jac_layout
        vals = []
        for bi, ci, u, li, reduce_axes, _size in chunk_meta:
            c = self._blocks[bi][ci]
            loc = self._trial_locs[u][li]
            x0 = loc.leaf_value(args)

            # linearize once (primal + grad pass traced a single time), then
            # push all seed tangents through the linear map — versus the
            # previous vmap-of-jvp which recomputed the nonlinear
            # forward/backward pass per seed (round-1 profiling put the
            # assembly bottleneck in exactly those duplicated grad-pass
            # intermediates)
            _, f_lin = jax.linearize(lambda x, _c=c, _loc=loc: _c.fn(args, {_loc.leaf.key: x}, tables), x0)
            seeds = loc.seeds()
            block = config.seed_block.value
            if block and seeds.shape[0] > block:
                # bound HBM: vmap over seed blocks, loop blocks sequentially
                from jax import lax
                S = seeds.shape[0]
                nb = -(-S // block)
                pad = nb * block - S
                seeds_b = jnp.concatenate([seeds, jnp.zeros((pad,) + seeds.shape[1:], seeds.dtype)]) \
                    .reshape((nb, block) + seeds.shape[1:]) if pad else seeds.reshape((nb, block) + seeds.shape[1:])
                V = lax.map(jax.vmap(f_lin), seeds_b)        # [nb, block, *cshape]
                V = V.reshape((nb * block,) + V.shape[2:])[:S]
            else:
                V = jax.vmap(f_lin)(seeds)   # [S, *cshape]
            V = jnp.moveaxis(V, 0, -1)       # [*cshape, S]
            if reduce_axes:
                V = V.sum(axis=reduce_axes)
            vals.append(V)
        if _jplan is not None:
            # direct stencil-form assembly: values land in w[(2k+1)^2 * n]
            # through static slice adds (grid-affine segments) or small
            # constant-table adds — no CSR value scatter in the jit
            w = jnp.zeros(_jplan['total'], dtype=config.float_dtype())
            for (skind, payload), V in zip(_jplan['segs'], vals):
                w = _apply_value_plan(w, skind, payload, V)
            return w
        flat = jnp.concatenate([V.ravel() for V in vals]) if len(vals) > 1 else vals[0].ravel()
        return pattern.scatter(flat)

    # ------------------------------------------- element-chunked assembly

    def _scan_plan(self):
        '''Element-chunked assembly plan for huge element batches, or None.

        When the dominant sample's element count exceeds config.assembly_chunk,
        the localized functional is split into the additive terms living on
        that batch (rebuilt with chunk-sized leaves and evaluated under
        lax.scan, so quadrature intermediates of only one chunk are live at a
        time) plus the remaining small terms (evaluated once).'''
        if 'scanplan' not in self._cache:
            from .utils import config
            chunk = getattr(self, '_chunk_override', None) or min(
                int(config.assembly_chunk.value), self._chunk_for_hbm())
            try:
                self._cache['scanplan'] = self._build_scan_plan(int(chunk))
            except Exception as e:  # pragma: no cover - conservative fallback
                log.info(f'chunked assembly disabled: {e!r}')
                self._cache['scanplan'] = None
        return self._cache['scanplan']

    def _chunk_for_hbm(self):
        '''Elements per chunk keeping the estimated largest linearization
        intermediate under config.assembly_max_bytes on the TPU backend (the
        remote compiler reports HBM exhaustion only as an opaque HTTP 500, so
        high-order multi-field systems must be chunked up front; see
        config.assembly_max_bytes).  Returns a huge sentinel when full-batch
        assembly is fine.'''
        import jax
        from .utils import config
        NOCAP = 2**62
        max_bytes = int(config.assembly_max_bytes.value)
        if not max_bytes or jax.default_backend() != 'tpu':
            return NOCAP
        leaf_nodes = list(ev.find(self._expr, lambda n: isinstance(n, ev.Leaf)))
        sizes = [n.shape[0] for n in leaf_nodes if n.value is not None and len(n.shape)]
        if not sizes:
            return NOCAP
        E = max(sizes)
        # P from float tables only (quadrature coords/weights/jacobians):
        # integer tables are dof/slot maps whose minor dims are not
        # per-point quadrature intermediates
        P = max((n.shape[1] for n in leaf_nodes
                 if n.value is not None and len(n.shape) >= 2 and n.shape[0] == E
                 and numpy.issubdtype(numpy.asarray(n.value).dtype, numpy.floating)), default=1)
        S = max((loc.nseeds for u in self.trials for loc in self._trial_locs[u]), default=1)
        C = max((loc.nseeds for t in self.tests for loc in self._locs[t]), default=1)
        # f32 bytes of the [S, E, P, <test dofs>] jvp buffer per element, times
        # a 4x allowance for XLA's (8, 128)-tile padding of whatever minor-dim
        # layout the materialized intermediates end up with (measured: the
        # 330^2 Taylor-Hood step fits at ~12k elements/chunk but not at ~36k)
        per_elem = 4 * P * S * C
        if per_elem * E <= max_bytes:
            return NOCAP
        chunk = max(1, max_bytes // per_elem // 4)
        log.info(f'assembly pre-chunked for HBM: estimated {per_elem * E / 1e9:.1f} GB '
                 f'full-batch linearization intermediate; {chunk} elements per chunk')
        return chunk

    def _build_scan_plan(self, chunk):
        if chunk <= 0:
            return None
        leaf_nodes = [n for n in ev.find(self._expr, lambda n: isinstance(n, ev.Leaf))]
        sizes = [n.shape[0] for n in leaf_nodes if n.value is not None and len(n.shape)]
        if not sizes:
            return None
        E = max(sizes)
        if E <= chunk:
            return None
        ce = next(d for d in range(chunk, 0, -1) if E % d == 0)
        nc = E // ce
        if nc == 1:
            return None
        locleafs = {loc.leaf: loc for ll in self._locs.values() for loc in ll}
        chunk_nodes = set()
        for n in leaf_nodes:
            if len(n.shape) and n.shape[0] == E:
                if n.value is None and n not in locleafs:
                    raise ValueError(f'unrecognized element-batched leaf {n.key!r}')
                chunk_nodes.add(n)
        terms = _additive_terms(self._expr)
        big_terms = [t for t in terms if set(t.leafdeps) & chunk_nodes]
        if not big_terms:
            return None
        small_terms = [t for t in terms if not (set(t.leafdeps) & chunk_nodes)]
        Ebig = big_terms[0]
        for t in big_terms[1:]:
            Ebig = ev.add(Ebig, t)
        Esmall = None
        for t in small_terms:
            Esmall = t if Esmall is None else ev.add(Esmall, t)
        mapping = {}
        ckey = {}
        for n in chunk_nodes:
            nk = ('ck',) + (n.key if isinstance(n.key, tuple) else (n.key,))
            mapping[n] = ev.Leaf(nk, (ce,) + tuple(n.shape[1:]), n.dtype)
            ckey[n.key] = nk
        comp_big = ev.compile(_chunk_rewrite(Ebig, mapping, E, ce))
        comp_small = ev.compile(Esmall) if Esmall is not None else None
        # classify localizations
        chunk_lockeys = {n.key for n in chunk_nodes if n in locleafs}
        chunk_tabkeys = {n.key for n in chunk_nodes if n.value is not None}
        return dict(E=E, ce=ce, nc=nc, comp_big=comp_big, comp_small=comp_small,
                    ckey=ckey, chunk_lockeys=chunk_lockeys, chunk_tabkeys=chunk_tabkeys)

    def _scan_xs(self, plan):
        '''Static per-chunk scan inputs: chunked tables, localization index
        windows, residual row maps and jacobian slot maps (device arrays).'''
        import jax
        import jax.numpy as jnp
        cached = self._cache.get('scanxs')
        if cached is not None:
            return cached
        E, ce, nc = plan['E'], plan['ce'], plan['nc']
        chunk_meta, pattern, _jplan = self._jac_layout
        xs = {}
        fixed = {}
        for key, val in self._tables().items():
            if key in plan['chunk_tabkeys']:
                xs['t', plan['ckey'][key]] = jnp.reshape(val, (nc, ce) + val.shape[1:])
            else:
                fixed[key] = val
        idx_dtype = numpy.int32 if self._ntrial < 2**31 and E * 64 < 2**31 else numpy.int64
        locinfo = {}
        for name, ll in self._locs.items():
            for li, loc in enumerate(ll):
                if loc.leaf.key not in plan['chunk_lockeys']:
                    continue
                ai = loc.argidx
                if ai.shape[0] == E:
                    xs['i', plan['ckey'][loc.leaf.key]] = jax.device_put(
                        ai.reshape((nc, ce) + ai.shape[1:]).astype(idx_dtype))
                    locinfo[loc.leaf.key] = ('x', name, (ce,) + tuple(loc.leaf.shape[1:]))
                else:
                    fixed['i', plan['ckey'][loc.leaf.key]] = jax.device_put(ai.astype(idx_dtype))
                    locinfo[loc.leaf.key] = ('f', name, (ce,) + tuple(loc.leaf.shape[1:]))
        # residual rows per big test loc
        rowmaps = {}
        for bi, t in enumerate(self.tests):
            off = self._test_slices[bi].start
            for ci, loc in enumerate(self._locs[t]):
                if loc.leaf.key not in plan['chunk_lockeys']:
                    continue
                rows = numpy.broadcast_to(loc.argidx, loc.leaf.shape) + off
                xs['r', bi, ci] = jax.device_put(rows.reshape((nc, ce) + rows.shape[1:]).astype(idx_dtype))
                rowmaps[bi, ci] = True
        # jacobian slot segments per big meta entry
        offs = numpy.cumsum([0] + [m[-1] for m in chunk_meta])
        bigmeta = []
        for mi, (bi, ci, u, li, reduce_axes, size) in enumerate(chunk_meta):
            loc_t = self._locs[self.tests[bi]][ci]
            if loc_t.leaf.key not in plan['chunk_lockeys']:
                continue
            assert size % E == 0, 'jacobian entry is not element-major'
            slots = pattern.slot[offs[mi]:offs[mi + 1]].reshape(E, size // E)
            xs['s', mi] = jax.device_put(slots.reshape(nc, ce, size // E).astype(idx_dtype))
            bigmeta.append((mi, bi, ci, u, li, reduce_axes))
        smallmeta = [(mi,) + m[:-1] for mi, m in enumerate(chunk_meta)
                     if self._locs[self.tests[m[0]]][m[1]].leaf.key not in plan['chunk_lockeys']]
        cached = dict(xs=xs, fixed=fixed, locinfo=locinfo, rowmaps=rowmaps,
                      bigmeta=bigmeta, smallmeta=smallmeta, offs=offs)
        self._cache['scanxs'] = cached
        return cached

    def _scan_assemble(self, args, xs, fixed, want_jac, want_res, want_val=False):
        '''Residual / jacobian-values / value via lax.scan over element chunks
        of the dominant sample, plus the unchunked small-term remainder.
        ``xs``/``fixed`` are the precomputed per-chunk and whole tables passed
        through the jit boundary (see _scan_xs).'''
        import jax
        import jax.numpy as jnp
        from jax import lax
        from .utils import config
        plan = self._scan_plan()
        sx = dict(self._cache['scanxs'], xs=xs, fixed=fixed)
        chunk_meta, pattern, _jplan = self._jac_layout
        comp_big, comp_small = plan['comp_big'], plan['comp_small']
        fdt = config.float_dtype()
        flats = {name: jnp.asarray(args[name], dtype=fdt).reshape(-1) for name in self.argshapes}

        def loc_value(key, xslice, fixedmap):
            kind, name, shape = sx['locinfo'][key]
            idx = xslice[('i', plan['ckey'][key])] if kind == 'x' else fixedmap[('i', plan['ckey'][key])]
            return jnp.broadcast_to(flats[name][idx], shape)

        def big_leaves(xsl):
            leaves = {}
            for key, val in sx['fixed'].items():
                if isinstance(key, tuple) and key and key[0] == 'i':
                    continue
                leaves[key] = val
            for k in xsl:
                if k[0] == 't':
                    leaves[k[1]] = xsl[k]
            for key in plan['chunk_lockeys']:
                leaves[plan['ckey'][key]] = loc_value(key, xsl, sx['fixed'])
            for name, ll in self._locs.items():
                for loc in ll:
                    if loc.leaf.key not in plan['chunk_lockeys']:
                        leaves[loc.leaf.key] = loc.leaf_value(args)
            return leaves

        def body(carry, xsl):
            data, r, val = carry
            leaves = big_leaves(xsl)

            def scalar_at(key, x):
                lv = dict(leaves)
                lv[key] = x
                return comp_big.trace(args, lv)
            if want_val:
                val = val + comp_big.trace(args, leaves)
            if want_res:
                for bi, t in enumerate(self.tests):
                    for ci, loc in enumerate(self._locs[t]):
                        if (bi, ci) not in sx['rowmaps']:
                            continue
                        key = plan['ckey'][loc.leaf.key]
                        g = jax.grad(lambda x: scalar_at(key, x))(leaves[key])
                        r = r.at[xsl[('r', bi, ci)].ravel()].add(g.ravel())
            if want_jac:
                for mi, bi, ci, u, li, reduce_axes in sx['bigmeta']:
                    loc_t = self._locs[self.tests[bi]][ci]
                    loc_u = self._trial_locs[u][li]
                    tkey = plan['ckey'][loc_t.leaf.key]
                    ukey = plan['ckey'][loc_u.leaf.key] if loc_u.leaf.key in plan['chunk_lockeys'] else None
                    if ukey is None:
                        x0 = loc_u.leaf_value(args)
                        base_key = loc_u.leaf.key
                    else:
                        x0 = leaves[ukey]
                        base_key = ukey

                    def one(seed):
                        def inner(x):
                            lv = dict(leaves)
                            lv[base_key] = x
                            return jax.grad(lambda y: (lambda l2: comp_big.trace(args, l2))(
                                {**lv, tkey: y}))(lv[tkey])
                        return jax.jvp(inner, (x0,), (seed,))[1]
                    seeds = loc_u.seeds()
                    if ukey is not None:
                        seeds = jnp.broadcast_to(
                            seeds[(slice(None), slice(0, 1)) + (slice(None),) * (seeds.ndim - 2)],
                            (seeds.shape[0], plan['ce']) + seeds.shape[2:])
                    V = jax.vmap(one)(seeds)          # [S, ce, ...]
                    V = jnp.moveaxis(V, 0, -1)        # [ce, ..., S]
                    red = tuple(ax for ax in reduce_axes)
                    if red:
                        V = V.sum(axis=red)
                    data = data.at[xsl[('s', mi)].ravel()].add(V.reshape(-1))
            return (data, r, val), None

        data0 = jnp.zeros(pattern.nnz if want_jac else 0, dtype=fdt)
        r0 = jnp.zeros(self._ntest if want_res else 0, dtype=fdt)
        v0 = jnp.zeros((), dtype=fdt)
        (data, r, val), _ = lax.scan(body, (data0, r0, v0), sx['xs'])

        # ---- small-term remainder, evaluated once at full size
        if comp_small is not None:
            sleaves = {}
            for key, v in sx['fixed'].items():
                if not (isinstance(key, tuple) and key and key[0] == 'i'):
                    sleaves[key] = v
            for name, ll in self._locs.items():
                for loc in ll:
                    if loc.leaf.key not in plan['chunk_lockeys']:
                        sleaves[loc.leaf.key] = loc.leaf_value(args)

            def sscalar_at(key, x):
                lv = dict(sleaves)
                lv[key] = x
                return comp_small.trace(args, lv)
            if want_val:
                val = val + comp_small.trace(args, sleaves)
            if want_res:
                for bi, t in enumerate(self.tests):
                    off = self._test_slices[bi].start
                    for ci, loc in enumerate(self._locs[t]):
                        if (bi, ci) in sx['rowmaps']:
                            continue
                        g = jax.grad(lambda x: sscalar_at(loc.leaf.key, x))(sleaves[loc.leaf.key])
                        rows = jnp.broadcast_to(jnp.asarray(loc.argidx + off), loc.leaf.shape)
                        r = r.at[rows.ravel()].add(g.ravel())
            if want_jac:
                offs = sx['offs']
                for mi, bi, ci, u, li, reduce_axes in sx['smallmeta']:
                    loc_t = self._locs[self.tests[bi]][ci]
                    loc_u = self._trial_locs[u][li]
                    x0 = sleaves.get(loc_u.leaf.key, None)
                    if x0 is None:
                        x0 = loc_u.leaf_value(args)

                    def one(seed):
                        def inner(x):
                            lv = dict(sleaves)
                            lv[loc_u.leaf.key] = x
                            return jax.grad(lambda y: comp_small.trace(args, {**lv, loc_t.leaf.key: y}))(lv[loc_t.leaf.key])
                        return jax.jvp(inner, (x0,), (seed,))[1]
                    V = jax.vmap(one)(loc_u.seeds())
                    V = jnp.moveaxis(V, 0, -1)
                    if reduce_axes:
                        V = V.sum(axis=tuple(reduce_axes))
                    slots = jnp.asarray(pattern.slot[offs[mi]:offs[mi + 1]])
                    data = data.at[slots].add(V.reshape(-1))
        return data, r, val

    # -------------------------------------------------------- public assembly

    def _compiled_split(self, which):
        '''Per-chunk jitted assembly with host-side accumulation.  Used on the
        CPU backend: compiling every residual/jacobian chunk into one fused
        XLA program has been observed to MISCOMPUTE (NaN) on some hosts —
        jit(f) != f(deoptimized) — when unrelated element batches share a
        fusion.  Per-chunk programs sidestep the bad fusions; on TPU the
        single fused program is kept (config.fuse_assembly overrides).'''
        import jax
        import numpy as np
        from .utils import config
        fdt = config.float_dtype()

        res_fns = []  # (jitted, rows, slice)
        for chunks, sl in zip(self._blocks, self._test_slices):
            for c in chunks:
                jf = jax.jit(lambda args, tables, _c=c: _c.fn(args, {}, tables))
                res_fns.append((jf, np.broadcast_to(c.rows, c.shape).ravel() + sl.start, c.shape))

        chunk_meta, pattern, _jplan = self._jac_layout
        offs = np.cumsum([0] + [m[-1] for m in chunk_meta])

        jac_fns = []  # (jitted, slot segment)
        for mi, (bi, ci, u, li, reduce_axes, _size) in enumerate(chunk_meta):
            c = self._blocks[bi][ci]
            loc = self._trial_locs[u][li]

            def jfn(args, tables, _c=c, _loc=loc, _red=tuple(reduce_axes)):
                import jax as _jax
                import jax.numpy as jnp
                x0 = _loc.leaf_value(args)

                def one(seed):
                    return _jax.jvp(lambda x: _c.fn(args, {_loc.leaf.key: x}, tables), (x0,), (seed,))[1]
                V = _jax.vmap(one)(_loc.seeds())
                V = jnp.moveaxis(V, 0, -1)
                if _red:
                    V = V.sum(axis=_red)
                return V.ravel()
            jac_fns.append((jax.jit(jfn), pattern.slot[offs[mi]:offs[mi + 1]]))

        def residual(clean):
            tables = self._tables()
            r = np.zeros(self._ntest, dtype=fdt)
            for jf, rows, _shape in res_fns:
                np.add.at(r, rows, np.asarray(jf(clean, tables), dtype=fdt).ravel())
            return r

        def jacobian(clean):
            tables = self._tables()
            data = np.zeros(pattern.nnz, dtype=fdt)
            for jf, slots in jac_fns:
                np.add.at(data, slots, np.asarray(jf(clean, tables), dtype=fdt))
            return data

        value = None
        if which in ('value',):
            import jax as _jax
            jv = _jax.jit(self._value_trace)
            value = lambda clean: jv(clean, self._tables())

        return {'residual': residual,
                'jacobian': jacobian,
                'value': value,
                'jacres': lambda clean: (jacobian(clean), residual(clean))}[which]

    def _compiled(self, which):
        import jax
        fn = self._cache.get(which)
        if fn is None:
            from .utils import config
            plan = self._scan_plan()
            if which == 'value' and plan is None:
                fn = self._compiled_value()
                self._cache[which] = fn
                return fn
            if plan is None and not config.fuse_assembly.value and jax.default_backend() == 'cpu':
                self._jacform = 'csr'
                fn = self._compiled_split(which)
                self._cache[which] = fn
                return fn
            if plan is not None:
                import jax.numpy as jnp
                _jp = self._jac_layout[2]
                if _jp is not None:
                    # chunked assembly still lands in stencil/blockgrid
                    # w-form: the scan scatters into CSR value slots, and one
                    # final permutation (csr_map: slot -> w position, injective)
                    # moves them into the zero-copy device-Krylov operand
                    self._jacform = _jp['form']
                    cmap = _jp['csr_map']
                    if callable(cmap):  # stencil plans defer the slot map
                        cmap = cmap()
                    cmap = jnp.asarray(numpy.asarray(cmap).astype(
                        numpy.int32 if _jp['total'] < 2**31 else numpy.int64))
                    total = int(_jp['total'])

                    def to_w(data):
                        return jnp.zeros(total, dtype=data.dtype).at[cmap].add(data)
                else:
                    self._jacform = 'csr'
                    to_w = lambda data: data
                sx = self._scan_xs(plan)
                trace = {
                    'residual': lambda args, xs, fx: self._scan_assemble(args, xs, fx, False, True)[1],
                    'jacobian': lambda args, xs, fx: to_w(self._scan_assemble(args, xs, fx, True, False)[0]),
                    'value': lambda args, xs, fx: self._scan_assemble(args, xs, fx, False, False, want_val=True)[2],
                    'jacres': lambda args, xs, fx: (lambda dr: (to_w(dr[0]), dr[1]))(
                        self._scan_assemble(args, xs, fx, True, True)),
                }[which]
                jitted = jax.jit(trace)
                fn = lambda args: jitted(args, sx['xs'], sx['fixed'])
            else:
                _jp = self._jac_layout[2]
                self._jacform = _jp['form'] if _jp is not None else 'csr'
                trace = {'residual': self._residual_trace,
                         'jacobian': self._jacobian_trace,
                         'value': self._value_trace,
                         'jacres': lambda args, tables: (self._jacobian_trace(args, tables),
                                                         self._residual_trace(args, tables))}[which]
                jitted = jax.jit(trace)
                fn = lambda args: jitted(args, self._tables())
            fn = self._with_oom_fallback(which, fn)
            self._cache[which] = fn
        return fn

    def _with_oom_fallback(self, which, fn):
        '''Re-compile with element-chunked assembly when the full-batch
        program exceeds device memory: the default keeps the zero-scatter
        full-batch form (fastest, and fine up to ~1M low-order elements),
        and high-order/high-degree systems that blow the HBM budget fall
        back to the lax.scan pipeline instead of failing (observed: a
        degree-6 Taylor-Hood step at ~1M dofs exceeds a v5e's 16 GB).'''
        def wrapped(clean, _fn=fn):
            try:
                import jax
                # block before returning: jax dispatch is async, so a runtime
                # HBM exhaustion otherwise surfaces at the caller's first use
                # of the result, outside this try
                return jax.block_until_ready(_fn(clean))
            except Exception as e:
                msg = str(e)
                if not any(k in msg for k in ('exceed memory', 'RESOURCE_EXHAUSTED', 'Out of memory',
                                              # the axon remote-compile service reports HBM
                                              # exhaustion (and only compile-time failures)
                                              # as an opaque HTTP 500; retrying chunked is
                                              # cheap relative to giving up
                                              'remote_compile', 'tpu_compile_helper')):
                    raise
                if getattr(self, '_chunk_override', None):
                    raise  # already chunked: genuine capacity failure
                log.warning('assembly program exceeds device memory; '
                            're-compiling with element-chunked (lax.scan) assembly')
                self._chunk_override = 2 ** 14
                for key in (which, 'scanplan', 'scanxs', 'residual', 'jacobian', 'jacres', 'value'):
                    self._cache.pop(key, None)
                return self._compiled(which)(clean)
        return wrapped

    def fused_step_op(self, *, solver='gmres', rtol=1e-3, restart=100, maxiter=None,
                      maxrounds=30):
        '''ONE-dispatch Newton sub-step for unconstrained blockgrid systems:
        fused jacobian+residual assembly, the on-device Schur-aware diagonal
        preconditioner, and the mixed-precision refined Krylov solve compiled
        into a single jitted program ``clean_args -> (dx, resnorm, iters)``.

        This is the production shape of a time-stepping loop on hardware
        with high dispatch latency: the per-step host<->device round trips
        (assembly call, preconditioner build, solve call) collapse into one
        program launch; only the state update and convergence decision stay
        on host.  The reference's counterpart is the per-iteration
        assemble+solve of Newton (reference: solver.py:655-661), which is
        host-orchestrated by construction.  Target = ``rtol * |res|``; the
        returned ``resnorm`` is the device-computed f64 true residual of the
        fused refinement (exact to ~1e-12 relative — see
        matrix._device_krylov for the acceptance reasoning).
        '''
        import jax
        import jax.numpy as jnp
        from .ops import blockgrid as _bg
        from .ops.sparse import _refined_driver, _schur_diag_kernel
        from .utils import config
        self._compiled('jacres')  # establish the jacobian form / scan plan
        chunk_meta, pattern, jplan = self._jac_layout
        if jplan is None or jplan['form'] != 'blockgrid':
            raise NotImplementedError('fused_step_op requires the blockgrid jacobian form')
        meta = jplan['meta']
        shapes = _bg._w_shapes(meta)
        woff, sizes = jplan['woff'], jplan['sizes']
        cmap = jplan['csr_map']
        if callable(cmap):
            cmap = cmap()
        n = int(pattern.shape[0])
        counts = numpy.diff(pattern.indptr)
        run = _refined_driver(solver, 'diag', ('blockgrid', meta),
                              max(2, min(int(restart), n)))
        schur = _schur_diag_kernel(n, 1e-3)
        cap = int(maxiter or max(1024, int(16 * numpy.sqrt(n))))
        dt32 = config.float_dtype()
        inner_floor = float(numpy.sqrt(numpy.finfo(dt32).eps))
        # every large operand rides the jit boundary as an ARGUMENT: embedded
        # as closure constants they serialize into the program body, which
        # the axon remote-compile service rejects wholesale (HTTP 413 at
        # ~1M dofs)
        aux = {
            'cmap': jnp.asarray(numpy.asarray(cmap)),
            'idx': jnp.asarray(numpy.asarray(pattern.indices)),
            'rows': jnp.asarray(numpy.repeat(numpy.arange(n), counts)),
        }
        plan = self._scan_plan()
        if plan is not None:
            sx = self._scan_xs(plan)
            total = int(jplan['total'])
            aux['xs'] = sx['xs']
            aux['fixed'] = sx['fixed']

            def jacres(args, aux):
                dr = self._scan_assemble(args, aux['xs'], aux['fixed'], True, True)
                data, res = dr[0], dr[1]
                return jnp.zeros(total, dtype=data.dtype).at[aux['cmap']].add(data), res
        else:
            aux['tables'] = self._tables()

            def jacres(args, aux):
                return (self._jacobian_trace(args, aux['tables']),
                        self._residual_trace(args, aux['tables']))

        def step(clean, aux):
            w, res = jacres(clean, aux)
            ws = tuple(w[o:o + s].reshape(shp) for o, s, shp in zip(woff, sizes, shapes))
            minv = schur(w[aux['cmap']], aux['idx'], aux['rows']).astype(ws[0].dtype)
            b64 = jnp.asarray(res, jnp.float64)
            target = jnp.asarray(rtol, jnp.float64) * jnp.linalg.norm(b64)
            op64 = tuple(x.astype(jnp.float64) for x in ws)
            x, rn, it, _rounds = run(ws, op64, b64, minv, target,
                                     jnp.asarray(inner_floor, jnp.float64),
                                     jnp.asarray(cap, jnp.int32),
                                     jnp.asarray(maxrounds, jnp.int32))
            return x, rn, it
        jitted = jax.jit(step)
        return lambda clean: jitted(clean, aux)

    @log.withcontext
    def assemble_residual(self, arguments, x=None):
        arguments, free = self.construct(arguments, x, return_free=True)
        r = numpy.asarray(self._compiled('residual')(self._clean(arguments)))
        return r[free]

    @log.withcontext
    def assemble_jacobian(self, arguments, x=None):
        arguments, free = self.construct(arguments, x, return_free=True)
        jac = self._jac_matrix(self._clean(arguments))
        return jac.submatrix(free, free)

    def _jac_matrix(self, clean):
        if self.is_constant_matrix and 'jacmat' in self._cache:
            return self._cache['jacmat']
        _, pattern, jplan = self._jac_layout
        data = self._compiled('jacobian')(clean)
        jac = self._wrap_matrix(pattern, jplan, data)
        if self.is_constant_matrix:
            self._cache['jacmat'] = jac
        return jac

    def _wrap_matrix(self, pattern, jplan, data):
        jf = getattr(self, '_jacform', 'csr')
        if jplan is not None and jf == 'stencil':
            return matrix._StencilMatrix(pattern, data, jplan['ks'], jplan['grid'],
                                         jplan['csr_map'], jplan.get('periodic'))
        if jplan is not None and jf == 'blockgrid':
            m = matrix._BlockGridMatrix(pattern, data, jplan['meta'], jplan['sizes'],
                                        jplan['csr_map'], jplan['woff'])
            m._field_offsets = jplan['field_offsets']
            m._field_grids = jplan['field_grids']
            return m
        m = matrix.Matrix.from_pattern(pattern, numpy.asarray(data))
        # field partition + registered dof-grid layouts: multi-field
        # structured systems (Taylor-Hood etc.) become block-grid operators
        # with a fieldsplit MG preconditioner, and single-field CSR
        # fallbacks skip grid inference (matrix._device_op/_fieldsplit).
        # Composite fields (vectorized sub-bases, e.g. Raviart-Thomas
        # velocity components on staggered grids) expand into their parts.
        offsets, grids = self._field_partition()
        m._field_grids = tuple(grids)
        if len(grids) > 1:
            m._field_offsets = tuple(offsets)
        return m

    @log.withcontext
    def assemble_jacobian_residual(self, arguments, x=None):
        arguments, free = self.construct(arguments, x, return_free=True)
        clean = self._clean(arguments)
        if self.is_constant_matrix and 'jacmat' in self._cache:
            jac = self._cache['jacmat']
            r = numpy.asarray(self._compiled('residual')(clean))
        else:
            data, r = self._compiled('jacres')(clean)
            _, pattern, jplan = self._jac_layout
            jac = self._wrap_matrix(pattern, jplan, data)
            r = numpy.asarray(r)
            if self.is_constant_matrix:
                self._cache['jacmat'] = jac
        return jac.submatrix(free, free), r[free]

    def assemble(self, arguments, x=None):
        jac, res = self.assemble_jacobian_residual(arguments, x)
        val = self.assemble_value(arguments, x) if self.is_symmetric else None
        return jac, res, val

    @log.withcontext
    def assemble_value(self, arguments, x=None):
        if not self.is_symmetric:
            raise SolverError('value is not defined for unsymmetric systems')
        arguments = self.construct(arguments, x)
        return float(self._compiled('value')(self._clean(arguments)))

    # -------------------------------------------------------- dof packing

    def deconstruct(self, arguments, constrain):
        '''Split trial arguments into NaN-marked templates plus the free-dof
        vector (reference: solver.py:275).'''
        arguments = dict(arguments)
        xparts = []
        for t, shape in zip(self.trials, self.trial_shapes):
            a = arguments.get(t)
            c = constrain.get(t)
            if a is not None:
                a = _pack_complex(a)
            if c is not None and numpy.asarray(c).dtype.kind == 'c':
                c = _pack_complex(c)
            if a is None:
                if c is None:
                    a = numpy.full(shape, numpy.nan)
                elif numpy.asarray(c).dtype == bool:
                    a = numpy.full(shape, numpy.nan)
                    a[numpy.asarray(c)] = 0.
                else:
                    a = numpy.asarray(c, dtype=float)
                x = numpy.zeros(int(numpy.isnan(a).sum()))
            else:
                a = numpy.asarray(a, dtype=float)
                if c is None:
                    x = a.ravel().copy()
                    a = numpy.full(shape, numpy.nan)
                elif numpy.asarray(c).dtype == bool:
                    c = numpy.asarray(c)
                    x = a[~c]
                    a = a.copy()
                    a[~c] = numpy.nan
                else:
                    c = numpy.asarray(c, dtype=float)
                    x = a[numpy.isnan(c)]
                    a = c
                assert numpy.isfinite(x).all(), 'non-finite initial guess'
            arguments[t] = a
            xparts.append(numpy.asarray(x, dtype=float).ravel())
        return arguments, numpy.concatenate(xparts) if xparts else numpy.zeros(0)

    def construct(self, arguments, x=None, return_free=False):
        v = numpy.concatenate([numpy.asarray(arguments[t], dtype=float).ravel() for t in self.trials])
        free = numpy.isnan(v)
        if x is None:
            assert not free.any(), 'unresolved free dofs'
            free = numpy.ones_like(free)
        else:
            v = v.copy()
            v[free] = x
            arguments = dict(arguments) | {
                t: v[sl].reshape(shape) for t, shape, sl in zip(self.trials, self.trial_shapes, self._trial_slices)}
        return (arguments, free) if return_free else arguments

    def _user_args(self, arguments):
        '''Unpack complex trial arguments from the real backing layout.'''
        out = dict(arguments)
        for t in self.trials:
            if self.argdtypes.get(t) is complex and t in out:
                a = numpy.asarray(out[t])
                if a.dtype.kind != 'c':
                    out[t] = a[..., 0] + 1j * a[..., 1]
        return out

    # -------------------------------------------------------- solving

    @log.withcontext
    def solve(self, *, arguments=None, constrain=None, tol=0., miniter=0, maxiter=None, method=None):
        arguments = dict(arguments or {})
        constrain = dict(constrain or {})
        if method is None:
            method = (Direct if self.is_linear else Newton)()
        # disk memoization of the solve, keyed by a process-stable content
        # hash of the localized residual expression plus the call data
        # (reference: @cache.function on System.solve, solver.py:440)
        cachekey = None
        if cache._cachedir[0] is not None:
            import hashlib
            import pickle
            try:
                payload = pickle.dumps((sorted(arguments.items()), sorted(constrain.items()),
                                        tol, miniter, maxiter, str(method)), protocol=4)
                cachekey = 'solve-' + hashlib.sha1(
                    (self._expr_digest + hashlib.sha1(payload).hexdigest()).encode()).hexdigest()
            except Exception:
                cachekey = None
            if cachekey is not None:
                hit = cache.load(cachekey)
                if hit is not None:
                    log.info(f'cache hit: solve for {",".join(self.trials)}')
                    return hit
        out = self._solve_impl(arguments=arguments, constrain=constrain, tol=tol,
                               miniter=miniter, maxiter=maxiter, method=method)
        if cachekey is not None:
            cache.store(cachekey, out)
        return out

    @functools.cached_property
    def _expr_digest(self):
        return ev.stable_digest(self._expr)

    def _solve_impl(self, *, arguments, constrain, tol, miniter, maxiter, method):
        log.info(f'{"optimizing" if self.is_symmetric else "solving"} for {",".join(self.trials)} using {method}')
        m = method(self, arguments=arguments, constrain=constrain)
        if isinstance(m, tuple):
            arguments, resnorm = m
            log.info(f'residual norm: {resnorm:.1e}')
            if not numpy.isfinite(resnorm):
                raise SolverError('residual is not finite')
            if resnorm > tol > 0:
                raise SolverError(f'failed to reach tolerance {tol:.0e} (residual {resnorm:.1e})')
            return self._user_args(arguments)
        if tol <= 0:
            raise ValueError('nonlinear solve requires a positive tolerance')
        arguments, resnorm = next(m)
        log.info(f'iter 0: residual norm {resnorm:.1e}')
        if not numpy.isfinite(resnorm):
            raise SolverError('residual is not finite')
        iiter = 0
        while iiter < miniter or resnorm > tol:
            if maxiter is not None and iiter >= maxiter:
                raise SolverError(f'failed to converge in {maxiter} iterations')
            iiter += 1
            arguments, resnorm = next(m)
            log.info(f'iter {iiter}: residual norm {resnorm:.1e}')
            if not numpy.isfinite(resnorm):
                raise SolverError('residual diverged')
        return self._user_args(arguments)

    def step(self, *, arguments, suffix, timearg=None, timesteparg=None, timestep=None, maxretry=2, **solveargs):
        '''Advance one time step with timestep-halving retry
        (reference: solver.py:503-558).'''
        arguments = dict(arguments)
        for t in self.trials:
            if t in arguments:
                arguments[t + suffix] = arguments[t]
        if timearg or timesteparg:
            if timestep is None:
                raise ValueError('timearg/timesteparg require timestep')
            if timesteparg:
                arguments[timesteparg] = timestep
            if timearg:
                tval = arguments.get(timearg, 0.)
                arguments[timearg + suffix] = tval
                arguments[timearg] = tval + timestep
        try:
            return self.solve(arguments=arguments, **solveargs)
        except (SolverError, matrix.MatrixError) as e:
            if (timearg not in self.arguments and timesteparg not in self.arguments) or maxretry <= 0:
                raise
            log.error(f'error: {e}; retrying with timestep {timestep/2}')
            half = dict(solveargs, timestep=timestep / 2, timearg=timearg, timesteparg=timesteparg,
                        suffix=suffix, maxretry=maxretry - 1)
            halfway = self.step(arguments=arguments, **half)
            return self.step(arguments=halfway, **half)

    @log.withcontext
    def solve_constraints(self, *, droptol, arguments=None, constrain=None, linargs=None):
        '''Solve a possibly singular linear system, returning NaN for dofs
        that do not participate (reference: solver.py:562).'''
        arguments = dict(arguments or {})
        constrain = dict(constrain or {})
        if not self.is_linear:
            raise SolverError('system is not linear')
        arguments, x = self.deconstruct(arguments, constrain)
        jac, res = self.assemble_jacobian_residual(arguments, x)
        data, colidx, _ = jac.export('csr')
        mycons = numpy.ones(res.shape, dtype=bool)
        mycons[colidx[numpy.abs(data) > droptol]] = False
        dx = -jac.solve(res, constrain=mycons, symmetric=self.is_symmetric, **(linargs or {}))
        log.info(f'constrained {int(mycons.sum())} of {len(mycons)} dofs; residual norm '
                 f'{numpy.linalg.norm((jac @ dx + res)[~mycons]):.1e}')
        x = x + dx
        x[mycons] = numpy.nan
        arguments = self._user_args(self.construct(arguments, x))
        return dict(constrain) | {t: arguments[t] for t in self.trials}


# ------------------------------------------------------------ methods

class Direct:

    def __init__(self, **linargs):
        self.linargs = linargs

    def __str__(self):
        return 'direct'

    def __call__(self, system, *, arguments, constrain):
        if not system.is_linear:
            raise SolverError('problem is not linear')
        arguments, x = system.deconstruct(arguments, constrain)
        jac, res = system.assemble_jacobian_residual(arguments, x)
        dx = jac.solve(res, symmetric=system.is_symmetric, **self.linargs)
        x = x - dx
        return system.construct(arguments, x), float(numpy.linalg.norm(res - jac @ dx))


class Newton:

    def __init__(self, **linargs):
        self.linargs = dict(linargs)
        # adaptive (Eisenstat-Walker) inner tolerance unless the caller pins
        # rtol: eta_k = 0.9 (|r_k|/|r_{k-1}|)^2, clamped to [1e-10, 1e-3].
        # Early steps keep the reference's lenient 1e-3 (solver.py:657); near
        # quadratic convergence the last update is solved tightly, so
        # iterative linear backends reproduce the direct solver's exactness
        # of linear constraint rows (e.g. the compatible-space velocity
        # divergence of examples/cylinderflow.py, checked at 1e-13).
        self._adaptive = 'rtol' not in self.linargs
        self.linargs.setdefault('rtol', 1e-3)

    def __str__(self):
        return 'newton'

    def __call__(self, system, *, arguments, constrain):
        arguments, x = system.deconstruct(arguments, constrain)
        prev = None
        while True:
            jac, res = system.assemble_jacobian_residual(arguments, x)
            resnorm = float(numpy.linalg.norm(res))
            yield system.construct(arguments, x), resnorm
            linargs = dict(self.linargs)
            if self._adaptive and prev:
                eta = 0.9 * (resnorm / prev) ** 2
                linargs['rtol'] = float(min(1e-3, max(eta, 1e-10)))
            prev = resnorm
            dx = jac.solve_leniently(res, symmetric=system.is_symmetric, **linargs)
            x = x - dx


class ReuseNewton:
    '''Newton reusing the previous Jacobian for as long as the residual norm
    keeps shrinking by the ``require`` factor (reference: solver.py:664).'''

    def __init__(self, require=.5, **linargs):
        self.require = require
        self.linargs = dict(linargs)
        self.linargs.setdefault('rtol', 1e-3)

    def __str__(self):
        return 'reuse-newton'

    def __call__(self, system, *, arguments, constrain):
        arguments, x = system.deconstruct(arguments, constrain)
        res = system.assemble_residual(arguments, x)
        resnorm = float(numpy.linalg.norm(res))
        yield system.construct(arguments, x), resnorm
        fresh = True
        jac = None
        while True:
            if fresh:
                log.info('updating jacobian matrix')
                jac = system.assemble_jacobian(arguments, x)
            newx = x - jac.solve_leniently(res, symmetric=system.is_symmetric, **self.linargs)
            newres = system.assemble_residual(arguments, newx)
            newresnorm = float(numpy.linalg.norm(newres))
            if fresh or newresnorm < self.require * resnorm:
                x, res, resnorm = newx, newres, newresnorm
                yield system.construct(arguments, x), resnorm
                fresh = False
            else:
                fresh = True


class LinesearchNewton:
    '''Newton with strategy-driven relaxation (reference: solver.py:719).

    Iterates ``x <- x - relax J(x)^-1 r(x)``; the relaxation value starts at
    ``relax0`` and is updated by ``strategy`` (default :class:`NormBased`)
    from the residuals and directional derivatives before/after each trial
    step.  Raises SolverError when relaxation falls below ``failrelax``.'''

    def __init__(self, strategy=None, failrelax=1e-6, relax0=1., **linargs):
        self.strategy = strategy if strategy is not None else NormBased()
        assert callable(self.strategy)
        self.failrelax = failrelax
        self.relax0 = relax0
        self.linargs = dict(linargs)
        self.linargs.setdefault('rtol', 1e-3)

    def __str__(self):
        return 'linesearch-newton'

    def __call__(self, system, *, arguments, constrain):
        arguments, x = system.deconstruct(arguments, constrain)
        jac, res = system.assemble_jacobian_residual(arguments, x)
        relax = self.relax0
        while True:
            yield system.construct(arguments, x), float(numpy.linalg.norm(res))
            dx = -jac.solve_leniently(res, symmetric=system.is_symmetric, **self.linargs)
            res0 = res
            jac0dx = jac @ dx  # equals -res0 up to linear-solver tolerance
            while True:
                newx = x + dx * relax
                jac, res = system.assemble_jacobian_residual(arguments, newx)
                scale, accept = self.strategy(res0, jac0dx * relax, res, (jac @ dx) * relax)
                if accept:
                    log.debug(f'update accepted at relaxation {relax:.5f}')
                    relax = min(relax * scale, 1.)
                    break
                assert scale < 1
                relax *= scale
                if relax <= self.failrelax:
                    raise SolverError('stuck in local minimum')
            x = newx


class Minimize:
    '''Steepest-descent energy minimization for symmetric systems
    (reference: solver.py:773).

    Starting from the Newton update, the two leading Ritz values of the
    Jacobian on span{dx, res} define an approximate steepest-descent curve
    x(r) = x_newton - V exp(-r L); the relaxation exponent ramps up while the
    energy decreases along the curve and down otherwise.'''

    def __init__(self, rampup=.5, rampdown=-1., failrelax=-10., **linargs):
        self.rampup = rampup
        self.rampdown = rampdown
        self.failrelax = failrelax
        self.linargs = dict(linargs)
        self.linargs.setdefault('rtol', 1e-3)

    def __str__(self):
        return 'minimize'

    def __call__(self, system, *, arguments, constrain):
        if not system.is_symmetric:
            raise SolverError('minimize requires a symmetric system')
        arguments, x = system.deconstruct(arguments, constrain)
        jac, res = system.assemble_jacobian_residual(arguments, x)
        val = system.assemble_value(arguments, x)
        relax = 0.
        while True:
            yield system.construct(arguments, x), float(numpy.linalg.norm(res))
            dx = -jac.solve_leniently(res, symmetric=True, **self.linargs)
            x = x + dx  # vanilla Newton baseline
            # two-dimensional Lanczos on span{dx, jac dx}: the Ritz pair gives
            # the local spectrum that shapes the descent curve
            dxnorm = numpy.linalg.norm(dx)
            if dxnorm == 0:
                jac, res = system.assemble_jacobian_residual(arguments, x)
                val = system.assemble_value(arguments, x)
                continue
            k0 = dx / dxnorm
            k1 = -res / dxnorm  # = jac @ k0 up to solver tolerance
            a = float(k1 @ k0)
            k1 = k1 - k0 * a
            c = float(numpy.linalg.norm(k1))
            if c == 0:
                jac, res = system.assemble_jacobian_residual(arguments, x)
                val = system.assemble_value(arguments, x)
                continue
            k1 = k1 / c
            b = float(k1 @ (jac @ k1))
            D = numpy.hypot(b - a, 2 * c)
            L = numpy.array([a + b - D, a + b + D]) / 2  # Ritz values
            v0, v1 = res + dx * L[:, numpy.newaxis]
            V = numpy.stack([v1, -v0], axis=1) / D  # satisfies V @ L = -res, V.sum(1) = dx
            log.debug('spectrum: {:.1e}..{:.1e} ({}definite)'.format(
                L[0], L[1], 'positive ' if L[0] > 0 else 'negative ' if L[-1] < 0 else 'in'))
            val0 = val
            while True:  # line search along the descent curve
                r = numpy.exp(relax) / D
                eL = numpy.exp(-r * L)
                newx = x - V @ eL
                jac, res = system.assemble_jacobian_residual(arguments, newx)
                val = system.assemble_value(arguments, newx)
                slope = float(res @ (V @ (eL * L)))
                log.debug(f'energy {val - val0:+.2e} / e{relax:+.1f} and {"in" if slope > 0 else "de"}creasing')
                # epsilon slack keeps the acceptance test meaningful once the
                # energy decrement falls below f64 resolution near convergence
                tiny = 1e-14 * (1 + abs(val0))
                if numpy.isfinite(val) and numpy.isfinite(res).all() and val <= val0 + tiny and slope <= tiny:
                    relax += self.rampup
                    break
                relax += self.rampdown
                if relax <= self.failrelax:
                    raise SolverError('stuck in local minimum')
            x = newx


class Arnoldi:
    '''Linear solve with subspace recycling across parameter changes
    (reference: solver.py:836).

    First use is a direct solve.  On reuse with a changed matrix A(y), the
    previous factorized matrix P acts as a preconditioner: the solution is
    projected on the growing subspace [P b, P (A P) b, ...] until tolerance or
    ``maxiter``, after which the new matrix is solved directly and cached.'''

    def __init__(self, maxiter=2, **linargs):
        self.maxiter = maxiter
        self.linargs = linargs
        self._cached = None

    def __str__(self):
        return 'arnoldi'

    def __call__(self, system, *, arguments, constrain):
        if not system.is_linear:
            raise SolverError('problem is not linear')
        arguments, x = system.deconstruct(arguments, constrain)
        jac, res = system.assemble_jacobian_residual(arguments, x)
        yield system.construct(arguments, x), float(numpy.linalg.norm(res))

        approx = self._cached
        if approx is not None and approx.shape == jac.shape:
            dx_space = numpy.empty((self.maxiter, len(res)))
            dres_space = numpy.empty((self.maxiter, len(res)))
            for i in range(self.maxiter):
                try:
                    dx_space[i] = approx.solve(res, solver='direct', symmetric=system.is_symmetric, **self.linargs)
                    dres_space[i] = jac @ dx_space[i]
                    w, res2, *_ = numpy.linalg.lstsq(dres_space[:i + 1].T, res, rcond=None)
                    resnorm = float(numpy.sqrt(res2[0])) if len(res2) else float(
                        numpy.linalg.norm(res - w @ dres_space[:i + 1]))
                except Exception as e:
                    log.warning(f'subspace solve failed: {e}')
                    break
                x = x - w @ dx_space[:i + 1]
                yield system.construct(arguments, x), resnorm
                res = res - w @ dres_space[:i + 1]

        log.info('updating cached jacobian')
        self._cached = jac
        dx = jac.solve(res, symmetric=system.is_symmetric, **self.linargs)
        x = x - dx
        yield system.construct(arguments, x), float(numpy.linalg.norm(res - jac @ dx))


class Pseudotime:
    '''Inertia-assisted Newton: solves ``(J(x) + dJ/dt) dx = r(x)`` with the
    timestep growing as the residual shrinks (reference: solver.py:895).

    ``inertia`` is given in the same form as the system residual: a scalar
    functional carrying the system's test arguments, or a list of residual
    vectors (entries may be None) aligned with the trial arguments.'''

    def __init__(self, inertia, timestep, **linargs):
        self.inertia = inertia
        self.timestep = timestep
        self.linargs = dict(linargs)
        self.linargs.setdefault('rtol', 1e-3)

    def __str__(self):
        return 'pseudotime'

    def _inertia_jacobian(self, system, arguments, free):
        '''Assemble the inertia jacobian over the full trial space, embedding
        sub-blocks for trials the inertia does not reference.'''
        import scipy.sparse
        inertia = self.inertia
        if isinstance(inertia, (tuple, list)) and system._synthetic_tests:
            pairs = [(i, f) for i, f in enumerate(inertia) if f is not None]
            isys = System([f for _, f in pairs], trial=[system.trials[i] for i, _ in pairs])
            rowmap = [i for i, _ in pairs]
        else:
            if isinstance(inertia, (tuple, list)):
                val = None
                for f in inertia:
                    if f is not None:
                        val = f if val is None else function.add(val, f)
                inertia = val
            present = set(function.arguments_for(inertia))
            idx = [i for i, (t, s) in enumerate(zip(system.trials, system.tests)) if t in present and s in present]
            isys = System(inertia, trial=[system.trials[i] for i in idx], test=[system.tests[i] for i in idx])
            rowmap = idx
        full = system.construct(arguments, numpy.zeros(int(free.sum())))
        sub = isys._jac_matrix(isys._clean({k: v for k, v in full.items() if k in isys.arguments})) \
            if set(isys.arguments) <= set(full) else isys.assemble_jacobian(full)
        m = sub._scipy().tocoo()
        # embed at the full system's (row, col) offsets
        roff = numpy.array([system._test_slices[i].start for i in rowmap])
        coff = numpy.array([system._trial_slices[i].start for i in rowmap])
        rstart = numpy.cumsum([0] + [int(numpy.prod(isys.test_shapes[j], dtype=numpy.int64)) for j in range(len(rowmap))])
        cstart = numpy.cumsum([0] + [int(numpy.prod(isys.trial_shapes[j], dtype=numpy.int64)) for j in range(len(rowmap))])
        rows = m.row.copy()
        cols = m.col.copy()
        for j in range(len(rowmap)):
            rsel = (m.row >= rstart[j]) & (m.row < rstart[j + 1])
            rows[rsel] += roff[j] - rstart[j]
            csel = (m.col >= cstart[j]) & (m.col < cstart[j + 1])
            cols[csel] += coff[j] - cstart[j]
        n = system._ntrial
        emb = scipy.sparse.coo_matrix((m.data, (rows, cols)), shape=(n, n)).tocsr()
        emb = matrix.Matrix(emb.indptr, emb.indices, emb.data, emb.shape)
        return emb.submatrix(free, free)

    def __call__(self, system, *, arguments, constrain):
        arguments, x = system.deconstruct(arguments, constrain)
        _, free = system.construct(arguments, x, return_free=True)
        djac = self._inertia_jacobian(system, arguments, free)
        resnorm0 = None
        while True:
            jac, res = system.assemble_jacobian_residual(arguments, x)
            resnorm = float(numpy.linalg.norm(res))
            yield system.construct(arguments, x), resnorm
            if resnorm0 is None:
                resnorm0 = resnorm
            timestep = self.timestep * (resnorm0 / resnorm)
            log.debug(f'timestep: {timestep:.0e}')
            x = x - (jac + djac * (1. / timestep)).solve_leniently(res, **self.linargs)


# ------------------------------------------------------------ legacy wrappers

def _split_trial_test(target):
    '''Split 'u:v,p:q' / ['u:v'] / 'u,p' targets into (trial, test)
    (reference: solver.py:1323).'''
    if isinstance(target, str):
        target = target.rstrip(',')
        target = target.split(',') if target else []
    if not target:
        raise ValueError('no targets specified')
    parts = [item.split(':') if isinstance(item, str) else list(item) for item in target]
    n = len(parts[0])
    if not all(len(p) == n for p in parts):
        raise ValueError('inconsistent targets')
    if n == 1:
        return [p[0] for p in parts], None
    if n == 2:
        return [p[0] for p in parts], [p[1] for p in parts]
    raise ValueError('invalid targets')


def _is_single(target):
    return isinstance(target, str) and ',' not in target


def _as_cons(target, constrain):
    if constrain is None:
        return {}
    if isinstance(constrain, dict):
        return constrain
    name = target.split(':')[0] if isinstance(target, str) else target
    return {name: constrain}


def _make_system(target, residual):
    trial, test = _split_trial_test(target)
    if test is not None:
        if isinstance(residual, (tuple, list)):
            # list of scalar functionals sharing the test arguments: sum them
            val = None
            for r in residual:
                if r is not None:
                    val = r if val is None else function.add(val, r)
            residual = val
        return System(residual, trial=trial, test=test)
    if not isinstance(residual, (tuple, list)):
        residual = [residual]
    return System(list(residual), trial=trial)


def _strip_lin(kwargs):
    '''Extract 'lin'-prefixed keyword arguments (reference: solver.py:1320).'''
    lin = {key[3:]: kwargs.pop(key) for key in list(kwargs) if key.startswith('lin')}
    if kwargs:
        raise TypeError('unexpected keyword arguments: {}'.format(', '.join(kwargs)))
    return lin


class _with_solve:
    '''Iterator over (arguments, resnorm) pairs with a ``.solve`` method
    (reference: solver.py:1366).'''

    def __init__(self, system, method, arguments, constrain, item=None):
        self.system = system
        self.method = method
        self.arguments = arguments
        self.constrain = constrain
        self.item = item

    def __getitem__(self, item):
        assert self.item is None
        return _with_solve(self.system, self.method, self.arguments, self.constrain, item)

    def __iter__(self):
        class _info:
            def __init__(self, resnorm):
                self.resnorm = resnorm
        for arguments, resnorm in self.method(self.system, arguments=self.arguments, constrain=self.constrain):
            yield (arguments if self.item is None else arguments[self.item]), _info(resnorm)

    def solve(self, tol, maxiter=float('inf'), miniter=0):
        lhs, info = self.solve_withinfo(tol, maxiter=maxiter, miniter=miniter)
        return lhs

    def solve_withinfo(self, tol, maxiter=float('inf'), miniter=0):
        if miniter > maxiter:
            raise ValueError('miniter cannot exceed maxiter')
        it = enumerate(iter(self))
        iiter, (lhs, info) = next(it)
        while info.resnorm > tol or iiter < miniter:
            if iiter >= maxiter:
                raise SolverError(f'failed to reach target tolerance in {maxiter} iterations')
            iiter, (lhs, info) = next(it)
        log.info(f'converged in {iiter} iterations to residual {info.resnorm:.1e}')
        info.niter = iiter
        return lhs, info


def solve_linear(target, residual, *, constrain=None, arguments=None, **kwargs):
    '''Legacy functional API (reference: solver.py:940).'''
    if _is_single(target):
        name = target.split(':')[0]
        sys_ = _make_system(target, residual)
        return sys_.solve(constrain=_as_cons(target, constrain), arguments=arguments or {}, method=Direct(**_strip_lin(kwargs)))[name]
    sys_ = _make_system(target, residual)
    return sys_.solve(constrain=constrain or {}, arguments=arguments or {}, method=Direct(**_strip_lin(kwargs)))


def newton(target, residual, *, relax0=1., constrain=None, linesearch='normbased', failrelax=1e-6, arguments=None, **kwargs):
    '''Iteratively solve a nonlinear problem by Newton descent; returns an
    iterator with a ``.solve(tol)`` method (reference: solver.py:975).'''
    if linesearch == 'normbased':
        linesearch = NormBased()
    linargs = _strip_lin(kwargs)
    system = _make_system(target, residual)
    method = Newton(**linargs) if not linesearch \
        else LinesearchNewton(strategy=linesearch, relax0=relax0, failrelax=failrelax, **linargs)
    ws = _with_solve(system, method, arguments or {}, _as_cons(target, constrain))
    return ws[target] if _is_single(target) and ':' not in target else ws


def minimize(target, energy, *, constrain=None, rampup=.5, rampdown=-1., failrelax=-10., arguments=None, **kwargs):
    '''Iteratively minimize a scalar functional; returns an iterator with a
    ``.solve(tol)`` method (reference: solver.py:1037).'''
    trial, test = _split_trial_test(target)
    assert test is None, 'minimize does not accept test targets'
    system = System(energy, trial=trial)
    method = Minimize(rampup=rampup, rampdown=rampdown, failrelax=failrelax, **_strip_lin(kwargs))
    ws = _with_solve(system, method, arguments or {}, _as_cons(target, constrain))
    return ws[target] if _is_single(target) else ws


def pseudotime(target, residual, inertia, timestep, *, constrain=None, arguments=None, **kwargs):
    '''Iteratively solve a nonlinear problem by pseudo-time stepping; returns
    an iterator with a ``.solve(tol)`` method (reference: solver.py:1090).'''
    system = _make_system(target, residual)
    method = Pseudotime(inertia=inertia, timestep=timestep, **_strip_lin(kwargs))
    ws = _with_solve(system, method, arguments or {}, _as_cons(target, constrain))
    return ws[target] if _is_single(target) and ':' not in target else ws


def thetamethod(target, residual, inertia, timestep, theta, *, constrain=None, newtontol=1e-10,
                arguments=None, newtonargs=None, timetarget='_thetamethod_time', time0=0., historysuffix='0'):
    '''Time stepping by the theta method: theta=1 implicit Euler, theta=.5
    Crank-Nicolson (reference: solver.py:1134).  Yields the argument dict per
    timestep, starting with the initial condition.'''
    trial, test = _split_trial_test(target)
    residuals = list(residual) if isinstance(residual, (tuple, list)) else [residual]
    inertias = list(inertia) if isinstance(inertia, (tuple, list)) else [inertia]
    assert len(residuals) == len(inertias), 'one inertia term per residual'

    argspecs = function.arguments_for(*[f for f in residuals + inertias if f is not None])
    targ = function.Argument(timetarget, ())
    subs0 = {t: function.Argument(t + historysuffix, argspecs[t].shape, argspecs[t].dtype) for t in trial if t in argspecs}
    subs0[timetarget] = function.Argument(timetarget + historysuffix, ())
    dt = function.subtract(targ, subs0[timetarget])

    combined = []
    for res, inert in zip(residuals, inertias):
        term = function.add(function.multiply(function.asarray(theta), res),
                            function.multiply(function.asarray(1. - theta), function.replace_arguments(res, subs0)))
        if inert is not None:
            term = function.add(term, function.divide(
                function.subtract(inert, function.replace_arguments(inert, subs0)), dt))
        combined.append(term)

    if test is not None:
        value = None
        for term in combined:
            value = term if value is None else function.add(value, term)
        system = System(value, trial=trial, test=test)
    else:
        system = System(combined, trial=trial)

    arguments = dict(arguments or {})
    arguments.setdefault(timetarget, time0)
    newtonargs = dict(newtonargs or {})
    linesearch = newtonargs.pop('linesearch', NormBased())
    method = None if system.is_linear else Newton() if linesearch is None \
        else LinesearchNewton(strategy=linesearch, **newtonargs)
    constrain = _as_cons(target, constrain)
    single = _is_single(target)
    name = target.split(':')[0] if isinstance(target, str) else None

    def steps(arguments):
        while True:
            yield arguments[name] if single else arguments
            arguments = system.step(arguments=arguments, timestep=timestep, timearg=timetarget,
                                    suffix=historysuffix, constrain=constrain, tol=newtontol, method=method)
    return steps(arguments)


impliciteuler = functools.partial(thetamethod, theta=1.)
cranknicolson = functools.partial(thetamethod, theta=.5)


def optimize(target, functional, *, tol=0., droptol=None, constrain=None, arguments=None,
             relax0=1., linesearch='normbased', failrelax=1e-6, **kwargs):
    '''Find the minimizer of a functional (reference: solver.py:1213).'''
    single = _is_single(target)
    trial, test = _split_trial_test(target)
    constrain = _as_cons(target, constrain)
    arguments = arguments or {}
    present = set(function.arguments_for(functional))
    missing = [t for t in trial if t not in present]
    if missing:
        if not droptol:
            raise ValueError(f'target {", ".join(missing)} does not occur in the functional; consider setting droptol>0')
        keep = [i for i, t in enumerate(trial) if t not in missing]
        trial = [trial[i] for i in keep]
        if test is not None:
            test = [test[i] for i in keep]
        if not trial:
            return {}
    linargs = _strip_lin(kwargs)
    sys_ = System(functional, trial=trial, test=test)
    if droptol is not None:
        cons = sys_.solve_constraints(droptol=droptol, arguments=arguments, constrain=constrain, linargs=linargs or None)
        return cons[target] if single else cons
    if linesearch == 'normbased':
        linesearch = NormBased()
    method = Direct(**linargs) if sys_.is_linear \
        else Newton(**linargs) if linesearch is None \
        else LinesearchNewton(strategy=linesearch, relax0=relax0, failrelax=failrelax, **linargs)
    out = sys_.solve(constrain=constrain, arguments=arguments, tol=tol, method=method)
    return out[target] if single else out
