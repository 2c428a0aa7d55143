'''Samples: batched point sets over a topology, and integral lowering.

The reference's ``Sample`` (reference: sample.py:34) enumerates per-element
point sets lazily and lowers integrals to element loops (sample.py:944-956).
Here a sample IS a set of tables: root coordinates [E, P, d], weights [E, P],
parent element indices [E], parent-coordinate affine maps, boundary normals —
and an integral lowers to one batched weighted contraction whose sparsity
rules (evaluable.py) turn basis scatters into segment-sums.

>>> import numpy
>>> from nutils_tpu import mesh, function
>>> topo, geom = mesh.rectilinear([2])
>>> smp = topo.sample('gauss', 2)
>>> smp.npoints
4
>>> float(smp.integrate(geom[0] * function.J(geom), {}))
2.0±1e-12
>>> bez = topo.sample('bezier', 3)
>>> numpy.asarray(bez.eval(geom[0], {})).round(6).tolist()
[0.0, 0.5, 1.0, 1.0, 1.5, 2.0]
>>> bez.tri.shape  # within/cross-element triangulation of the point set
(4, 2)
'''

import itertools

import numpy

from . import evaluable as ev
from . import function

_token = itertools.count()


class _ChartSpec:
    '''Per-space tables of a sample (see function.Chart).'''

    __slots__ = 'space', 'coords', 'index', 'p_linear', 'p_offset', 'tangents', 'normal_root', 'origin_topo', 'lineage'

    def __init__(self, space, coords, index, p_linear, p_offset, tangents, normal_root, origin_topo, lineage=None):
        self.space = space
        self.coords = numpy.asarray(coords, dtype=float)      # [E, P, d] root coords
        self.index = numpy.asarray(index)                     # [E] parent element ids
        self.p_linear = numpy.asarray(p_linear, dtype=float)  # [E, dp, d]: xi = p_linear @ X + p_offset
        self.p_offset = numpy.asarray(p_offset, dtype=float)  # [E, dp]
        self.tangents = numpy.asarray(tangents, dtype=float)  # [E, d, ds]
        self.normal_root = None if normal_root is None else numpy.asarray(normal_root, dtype=float)
        self.origin_topo = origin_topo
        self.lineage = lineage  # (family, levels [E], elems [E]) or None


class Sample:

    def __init__(self, space, coords, weights, index, p_linear, p_offset, tangents,
                 normal_root=None, tri_local=None, hull_local=None, opposite=None, part_ids=None,
                 part_topos=None, batch_key=None, origin_topo=None, specs=None, lineage=None):
        self.opposite = opposite    # Sample for the other side of an interface
        self.part_ids = part_ids    # int [E]: originating part in a union topology
        self.part_topos = part_topos  # list of topologies aligned with part_ids
        self.batch_key = batch_key  # batching compatibility token (parent ref type)
        if specs is not None:
            self.specs = list(specs)
            E, P, _ = self.specs[0].coords.shape
        else:
            self.specs = [_ChartSpec(space, coords, index, p_linear, p_offset, tangents, normal_root, origin_topo, lineage)]
            E, P, _ = self.specs[0].coords.shape
        self.weights = None if weights is None else numpy.asarray(weights, dtype=float)  # [E, P]
        self.tri_local = tri_local                            # [ntl, ds+1] within-element triangulation
        self.hull_local = hull_local
        self._tri_global = None   # explicit override (zipped samples)
        self._hull_global = None
        self.nelems = E
        self.npoints_per_elem = P
        self.npoints = E * P
        self.ndims = sum(s.tangents.shape[-1] for s in self.specs)  # intrinsic dimension
        self._token = next(_token)
        self._lower_args = None

    # single-space accessors (compat)
    @property
    def space(self):
        return self.specs[0].space

    @property
    def coords(self):
        return self.specs[0].coords

    @property
    def index(self):
        return self.specs[0].index

    @property
    def p_linear(self):
        return self.specs[0].p_linear

    @property
    def p_offset(self):
        return self.specs[0].p_offset

    @property
    def tangents(self):
        return self.specs[0].tangents

    @property
    def normal_root(self):
        return self.specs[0].normal_root

    @property
    def origin_topo(self):
        return self.specs[0].origin_topo

    @property
    def spaces(self):
        return frozenset(s.space for s in self.specs)

    def lower_args(self):
        if self._lower_args is None:
            charts = {}
            E, P = self.nelems, self.npoints_per_elem
            for i, spec in enumerate(self.specs):
                d = spec.coords.shape[-1]
                dp = spec.p_linear.shape[1]
                X = ev.Leaf(('X', self._token, spec.space), (E, P, d), float, value=spec.coords)
                pl = ev.insertaxis(ev.constant(spec.p_linear), 1, P)   # [E,P,dp,d]
                Xx = ev.insertaxis(X, 2, dp)                            # [E,P,dp,d]
                xi = ev.sum_(ev.multiply(pl, Xx), 3)                    # [E,P,dp]
                xi = ev.add(xi, ev.insertaxis(ev.constant(spec.p_offset), 1, P))
                charts[spec.space] = function.Chart(X, spec.index, xi, spec.tangents,
                                                    spec.normal_root, spec.origin_topo, spec.lineage)
            self._lower_args = function.LowerArgs(
                points_shape=(E, P), charts=charts,
                opposite=self.opposite.lower_args() if self.opposite is not None else None,
                part_ids=self.part_ids, part_topos=self.part_topos)
        return self._lower_args

    def zip(self, *others):
        '''Join samples with identical point counts over disjoint spaces into
        one sample able to evaluate functions of any constituent space
        (reference: sample.py:333).  The first sample provides the quadrature
        weights and the triangulation; the points of all samples must be
        aligned (e.g. via ``topo2.locate(geom2, sample1.eval(geom1))``).'''
        samples = (self,) + tuple(others)
        N = self.npoints
        assert all(s.npoints == N for s in samples), 'zipped samples must have equal point counts'
        spaces = set()
        specs = []
        for s in samples:
            assert not (s.spaces & spaces), 'zipped samples must live on disjoint spaces'
            spaces |= s.spaces
            P = s.npoints_per_elem
            for sp in s.specs:
                specs.append(_ChartSpec(
                    sp.space,
                    sp.coords.reshape(N, 1, sp.coords.shape[-1]),
                    numpy.repeat(sp.index, P),
                    numpy.repeat(sp.p_linear, P, axis=0),
                    numpy.repeat(sp.p_offset, P, axis=0),
                    numpy.repeat(sp.tangents, P, axis=0),
                    None if sp.normal_root is None else numpy.repeat(sp.normal_root, P, axis=0),
                    sp.origin_topo,
                    None if sp.lineage is None else (sp.lineage[0], numpy.repeat(sp.lineage[1], P),
                                                     numpy.repeat(sp.lineage[2], P))))
        weights = None if self.weights is None else self.weights.reshape(N, 1)
        out = Sample(None, None, weights, None, None, None, None, specs=specs)
        if self.tri_local is not None:
            out._tri_global = self.tri
        if self.hull_local is not None:
            out._hull_global = self.hull
        return out

    def __mul__(self, other):
        '''Tensor-product sample over disjoint spaces (reference: sample
        tensorization via _Mul, sample.py:698).'''
        if isinstance(other, ChainedSample):
            return ChainedSample([self * s for s in other.samples])
        assert isinstance(other, Sample)
        assert not (self.spaces & other.spaces), 'tensor product requires disjoint spaces'
        E1, P1 = self.nelems, self.npoints_per_elem
        E2, P2 = other.nelems, other.npoints_per_elem

        def expand1(a, along_points):
            out = numpy.repeat(a, E2, axis=0)
            if along_points:
                out = numpy.repeat(out, P2, axis=1)
            return out

        def expand2(a, along_points):
            out = numpy.tile(a, (E1,) + (1,) * (a.ndim - 1))
            if along_points:
                out = numpy.tile(out, (1, P1) + (1,) * (a.ndim - 2))
            return out

        specs = [
            *[_ChartSpec(s.space, expand1(s.coords, True), expand1(s.index, False),
                         expand1(s.p_linear, False), expand1(s.p_offset, False),
                         expand1(s.tangents, False),
                         None if s.normal_root is None else expand1(s.normal_root, False),
                         s.origin_topo) for s in self.specs],
            *[_ChartSpec(s.space, expand2(s.coords, True), expand2(s.index, False),
                         expand2(s.p_linear, False), expand2(s.p_offset, False),
                         expand2(s.tangents, False),
                         None if s.normal_root is None else expand2(s.normal_root, False),
                         s.origin_topo) for s in other.specs],
        ]
        if self.weights is not None and other.weights is not None:
            weights = (numpy.repeat(self.weights, E2, axis=0)[:, :, None]
                       * numpy.tile(other.weights, (E1, 1))[:, None, :]).reshape(E1 * E2, P1 * P2)
        else:
            weights = None
        tri_local, hull_local = _product_tri(self.tri_local, P1, self.ndims,
                                             other.tri_local, P2, other.ndims,
                                             self.hull_local, other.hull_local)
        return Sample(None, None, weights, None, None, None, None,
                      tri_local=tri_local, hull_local=hull_local, specs=specs)

    # ------------------------------------------------------------ integration

    def integral(self, func):
        assert self.weights is not None, 'sample has no weights; use eval'
        func = function.asarray(func)
        if function.iscomplex(func):
            return function._Complex(self.integral(func.real), self.integral(func.imag))
        if isinstance(func, _Integral) and not (self.spaces & func.sample.spaces):
            # nested integral over a disjoint space (reference: sample.py:178
            # via LowerArgs.__mul__): integrate over the product sample
            return (func.sample * self).integral(func.integrand)
        if isinstance(func, function._Multiply):
            # factor times a nested integral over a disjoint space: fold the
            # factor into the inner integrand and integrate over the product
            # sample (valid because the factor cannot depend on the inner
            # sample's spaces; e.g. ``X.integral(J(x) * Y.integral(g))``)
            a, b = func.operands
            for inner, other in ((a, b), (b, a)):
                if isinstance(inner, _Integral) and not (self.spaces & inner.sample.spaces) \
                        and not (other.spaces & inner.sample.spaces):
                    return (inner.sample * self).integral(function.multiply(other, inner.integrand))
        if isinstance(func, (function._Add, function._Neg)) and self._has_toplevel_disjoint_integral(func):
            # distribute over sums/negations ONLY when a nested integral over a
            # disjoint space sits at the additive top level, so it reaches the
            # product-sample rewrite above (e.g. chained samples of trimmed
            # subdomains in the coil example); ordinary integrands stay as one
            # _Integral so residual assembly remains a single fused loop
            if isinstance(func, function._Neg):
                return function.negative(self.integral(func.operands[0]))
            a, b = func.operands
            return function.add(self.integral(a), self.integral(b))
        return _Integral(func, self)

    def _has_toplevel_disjoint_integral(self, func):
        '''True if a :class:`_Integral` over a space disjoint from this sample
        appears in the additive spine (sums/negations) of ``func``.'''
        if isinstance(func, _Integral):
            return not (self.spaces & func.sample.spaces)
        if isinstance(func, (function._Add, function._Neg)):
            return any(self._has_toplevel_disjoint_integral(op) for op in func.operands)
        return False

    def integrate(self, funcs, arguments=None, /, **kwargs):
        single = not isinstance(funcs, (list, tuple))
        flist = [funcs] if single else list(funcs)
        out = function.eval([self.integral(f) for f in flist], arguments, **kwargs)
        return out[0] if single else out

    # ------------------------------------------------------------ evaluation

    def bind(self, func):
        func = function.asarray(func)
        if function.iscomplex(func):
            return function._Complex(self.bind(func.real), self.bind(func.imag))
        return _AtSample(func, self)

    def eval(self, funcs, arguments=None, /, **kwargs):
        single = not isinstance(funcs, (list, tuple))
        flist = [funcs] if single else list(funcs)
        out = function.eval([self.bind(f) for f in flist], arguments, **kwargs)
        return out[0] if single else out

    def asfunction(self, values):
        '''Piecewise function taking the given per-point values on this
        sample and undefined elsewhere (reference: sample.py asfunction).'''
        return _SampleValues(self, numpy.asarray(values, dtype=float))

    def basis(self):
        '''Basis with one dof per sample point, equal to one at that point
        (reference: sample.py basis); evaluable on this sample only.'''
        eye = numpy.eye(self.npoints_per_elem)
        return _SampleValues(self, numpy.tile(eye, (self.nelems, 1)), npoints_axis=True)

    # ------------------------------------------------------------ structure

    @property
    def tri(self):
        '''Global triangulation: per-element local tri offset by element.'''
        if self._tri_global is not None:
            return self._tri_global
        assert self.tri_local is not None, 'sample has no triangulation'
        P = self.npoints_per_elem
        offsets = numpy.arange(self.nelems)[:, None, None] * P
        return (self.tri_local[None, :, :] + offsets).reshape(-1, self.tri_local.shape[1])

    @property
    def hull(self):
        if self._hull_global is not None:
            return self._hull_global
        assert self.hull_local is not None, 'sample has no hull'
        P = self.npoints_per_elem
        offsets = numpy.arange(self.nelems)[:, None, None] * P
        return (self.hull_local[None, :, :] + offsets).reshape(-1, self.hull_local.shape[1])

    def subset(self, mask):
        '''Row subset of this sample by point mask or element indices
        (reference: sample.py:306).'''
        mask = numpy.asarray(mask)
        if mask.dtype == bool and mask.size == self.npoints:
            keep = mask.reshape(self.nelems, self.npoints_per_elem).any(axis=1)
            rows = numpy.nonzero(keep)[0]
        elif mask.dtype == bool:
            rows = numpy.nonzero(mask)[0]
        else:
            rows = mask.astype(int)
        return take_rows(self, rows)

    @staticmethod
    def concatenate(samples):
        '''Concatenate samples with identical point structure (same space,
        reference type and point count) into one batch.'''
        s0 = samples[0]
        assert all(s.space == s0.space and s.npoints_per_elem == s0.npoints_per_elem
                   and s.ndims == s0.ndims and s.batch_key == s0.batch_key for s in samples)
        part_ids = numpy.concatenate([numpy.full(s.nelems, i) for i, s in enumerate(samples)])
        part_topos = [(s.part_topos or [None])[0] for s in samples]
        opposite = None
        if all(s.opposite is not None for s in samples):
            opposite = Sample.concatenate([s.opposite for s in samples])
        lineages = [s.specs[0].lineage for s in samples]
        lineage = None
        if lineages[0] is not None and all(lg is not None and lg[0] is lineages[0][0] for lg in lineages):
            lineage = (lineages[0][0],
                       numpy.concatenate([numpy.broadcast_to(lg[1], (s.nelems,)) for lg, s in zip(lineages, samples)]),
                       numpy.concatenate([lg[2] for lg in lineages]))
        return Sample(
            s0.space,
            numpy.concatenate([s.coords for s in samples]),
            None if any(s.weights is None for s in samples) else numpy.concatenate([s.weights for s in samples]),
            numpy.concatenate([s.index for s in samples]),
            numpy.concatenate([s.p_linear for s in samples]),
            numpy.concatenate([s.p_offset for s in samples]),
            numpy.concatenate([s.tangents for s in samples]),
            None if s0.normal_root is None else numpy.concatenate([s.normal_root for s in samples]),
            s0.tri_local, s0.hull_local, opposite, part_ids, part_topos, s0.batch_key,
            s0.origin_topo if all(s.origin_topo is s0.origin_topo for s in samples) else None,
            lineage=lineage)


def take_rows(s, rows, lineage=None):
    '''Row (element) subset of a single-space sample, preserving tables.'''
    sp = s.specs[0]
    return Sample(sp.space, sp.coords[rows],
                  None if s.weights is None else s.weights[rows],
                  sp.index[rows], sp.p_linear[rows], sp.p_offset[rows], sp.tangents[rows],
                  None if sp.normal_root is None else sp.normal_root[rows],
                  s.tri_local, s.hull_local, batch_key=s.batch_key,
                  origin_topo=sp.origin_topo,
                  lineage=lineage if lineage is not None else (
                      None if sp.lineage is None else
                      (sp.lineage[0], numpy.broadcast_to(sp.lineage[1], (s.nelems,))[rows], sp.lineage[2][rows])))


def _product_tri(tri1, P1, nd1, tri2, P2, nd2, hull1, hull2):
    '''Local triangulation of a tensor-product point set (point index
    p1 * P2 + p2).  Supported: anything x point, point x anything, and
    segment x segment (quads split into triangles).'''
    if tri1 is None or tri2 is None:
        return None, None
    if nd2 == 0:  # [*, k] x point
        return tri1 * P2, None if hull1 is None else hull1 * P2
    if nd1 == 0:
        return tri2.copy(), hull2
    if nd1 == 1 and nd2 == 1:
        tris = []
        for a, b in tri1:
            for c, d in tri2:
                v00 = a * P2 + c
                v01 = a * P2 + d
                v10 = b * P2 + c
                v11 = b * P2 + d
                tris.append([v00, v01, v10])
                tris.append([v11, v10, v01])
        hull = []
        if hull1 is not None and hull2 is not None:
            for (a,) in hull1:
                for c, d in tri2:
                    hull.append([a * P2 + c, a * P2 + d])
            for a, b in tri1:
                for (c,) in hull2:
                    hull.append([a * P2 + c, b * P2 + c])
        return numpy.asarray(tris), numpy.asarray(hull) if hull else None
    return None, None


class ReorderedSample:
    '''Presents a parent sample's points in a permuted order: evaluation row i
    is parent point ``perm[i]``.  Used by ``locate`` on topologies that bucket
    points (per patch / per element type) so the returned sample still follows
    the caller's input coordinate order (reference: the located sample of
    topology.py:777 preserves point order by construction).  Integrals are
    order-independent and delegate unchanged.'''

    def __init__(self, parent, perm):
        self.parent = parent
        self.perm = numpy.asarray(perm, dtype=int)
        assert len(self.perm) == parent.npoints
        self.space = parent.space
        self.ndims = parent.ndims
        self.nelems = parent.nelems
        self.npoints = parent.npoints

    @property
    def spaces(self):
        return frozenset({self.space})

    def integral(self, func):
        return self.parent.integral(func)

    def integrate(self, funcs, arguments=None, /, **kwargs):
        return self.parent.integrate(funcs, arguments, **kwargs)

    def bind(self, func):
        return function._Take(self.parent.bind(func), self.perm, 0)

    def eval(self, funcs, arguments=None, /, **kwargs):
        single = not isinstance(funcs, (list, tuple))
        flist = [funcs] if single else list(funcs)
        out = function.eval([self.bind(f) for f in flist], arguments, **kwargs)
        return out[0] if single else out


class ChainedSample:
    '''Sample over a mixed-element topology: one uniform Sample per element
    bucket, chained (reference: element batching via elementseq._Chain).
    Integrals sum per-bucket contributions; evaluations concatenate.'''

    def __init__(self, samples):
        self.samples = list(samples)
        self.space = self.samples[0].space
        self.ndims = self.samples[0].ndims
        self.nelems = sum(s.nelems for s in self.samples)
        self.npoints = sum(s.npoints for s in self.samples)
        # sample row (element) -> original element position, for mask alignment
        self.elem_index = numpy.concatenate([s.index for s in self.samples])

    @property
    def spaces(self):
        return frozenset({self.space})

    def __mul__(self, other):
        others = other.samples if isinstance(other, ChainedSample) else [other]
        return ChainedSample([a * b for a in self.samples for b in others])

    def integral(self, func):
        out = None
        for s in self.samples:
            term = s.integral(func)
            out = term if out is None else function.add(out, term)
        return out

    def integrate(self, funcs, arguments=None, /, **kwargs):
        single = not isinstance(funcs, (list, tuple))
        flist = [funcs] if single else list(funcs)
        out = function.eval([self.integral(f) for f in flist], arguments, **kwargs)
        return out[0] if single else out

    def bind(self, func):
        return function.concatenate([s.bind(func) for s in self.samples], axis=0)

    def eval(self, funcs, arguments=None, /, **kwargs):
        single = not isinstance(funcs, (list, tuple))
        flist = [funcs] if single else list(funcs)
        out = function.eval([self.bind(f) for f in flist], arguments, **kwargs)
        return out[0] if single else out

    @property
    def tri(self):
        parts = []
        offset = 0
        for s in self.samples:
            parts.append(s.tri + offset)
            offset += s.npoints
        return numpy.concatenate([p for p in parts if len(p)])

    @property
    def hull(self):
        parts = []
        offset = 0
        for s in self.samples:
            parts.append(s.hull + offset)
            offset += s.npoints
        return numpy.concatenate([p for p in parts if len(p)])


class _SampleValues(function.Array):
    '''Values bound to the points of a specific sample, identified at lowering
    time by the sample's coordinate-leaf token.'''

    def __init__(self, sample, values, npoints_axis=False):
        self.sample = sample
        E, P = sample.nelems, sample.npoints_per_elem
        if npoints_axis:  # sample.basis(): per-point indicator, dof axis last
            self.values = values.reshape(E, P, P)
            shape = (sample.npoints,)
        else:
            self.values = values.reshape((E, P) + values.shape[1:])
            shape = values.shape[1:]
        self._npoints_axis = npoints_axis
        super().__init__(shape, float, frozenset({sample.space}), {})

    def lower(self, args):
        chart = args.chart(next(iter(self.spaces)))
        key = getattr(chart.X, 'key', None)
        assert key is not None and key[:2] == ('X', self.sample._token), \
            'sample-bound values can only be evaluated on their own sample'
        if not self._npoints_axis:
            return ev.constant(self.values)
        # scatter the per-point indicators into the global point numbering
        E, P = self.sample.nelems, self.sample.npoints_per_elem
        dofs = (numpy.arange(E)[:, None, None] * P + numpy.arange(P)[None, None, :])
        vals = ev.constant(numpy.broadcast_to(numpy.eye(P), (E, P, P)).copy())
        return ev.inflate(vals, ev.constant(dofs), E * P, 2)


class _ElemIntegral(function.Array):
    '''Per-element integrals: [nelems, *shape] (reference:
    topology.py:406 integrate_elementwise).'''

    def __init__(self, integrand, sample):
        self.integrand = integrand
        self.sample = sample
        super().__init__((sample.nelems,) + integrand.shape, float, frozenset(), integrand.arguments)

    def lower(self, args):
        sargs = self.sample.lower_args()
        expr = ev.astype(self.integrand.lower(sargs), float)  # [E,P,*shape]
        w = ev.constant(self.sample.weights)
        for i in range(self.integrand.ndim):
            w = ev.insertaxis(w, 2 + i, self.integrand.shape[i])
        out = ev.sum_(ev.multiply(expr, w), (1,))
        return function._prefix_broadcast(out, args.points_shape)


class _Integral(function.Array):
    '''Lazy integral over a sample (reference: sample.py:944 ``_Integral``).

    The integrand includes the jacobian measure (dV/dS) by nutils convention;
    lowering contracts quadrature weights and sums the element and point axes,
    which the IR's sparsity rules fuse into a single segment-scatter for
    basis-valued (residual) integrands.
    '''

    def __init__(self, integrand, sample):
        self.integrand = integrand
        self.sample = sample
        self._cache = None
        super().__init__(integrand.shape, float, frozenset(), integrand.arguments)

    def _lowered(self):
        if self._cache is None:
            args = self.sample.lower_args()
            expr = ev.astype(self.integrand.lower(args), float)  # [E,P,*shape]
            w = ev.constant(self.sample.weights)  # [E,P]
            for i in range(self.integrand.ndim):
                w = ev.insertaxis(w, 2 + i, self.integrand.shape[i])
            self._cache = ev.sum_(ev.multiply(expr, w), (0, 1))
        return self._cache

    def lower(self, args):
        expr = self._lowered()
        return function._prefix_broadcast(expr, args.points_shape)


class _AtSample(function.Array):
    '''Function sampled at all points, flattened to [npoints, ...].'''

    def __init__(self, func, sample):
        self.func = func
        self.sample = sample
        super().__init__((sample.npoints,) + func.shape, func.dtype, frozenset(), func.arguments)

    def lower(self, args):
        sargs = self.sample.lower_args()
        expr = self.func.lower(sargs)  # [E,P,*shape]
        expr = ev.ravel(expr, 0)
        return function._prefix_broadcast(expr, args.points_shape)


# unit-carrying integrands dispatch through the function layer
Sample.integral = function._dispatchable(Sample.integral)
Sample.bind = function._dispatchable(Sample.bind)
ChainedSample.integral = function._dispatchable(ChainedSample.integral)
ChainedSample.bind = function._dispatchable(ChainedSample.bind)
ReorderedSample.integral = function._dispatchable(ReorderedSample.integral)
ReorderedSample.bind = function._dispatchable(ReorderedSample.bind)
