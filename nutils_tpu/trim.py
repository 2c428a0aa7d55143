'''Levelset trimming (finite cell method), dimension-generic.

TPU-native counterpart of the reference's trim machinery (reference:
topology.py:1603 trim, element.py:195 Reference.trim/slice, element.py:912
MosaicReference): the levelset is evaluated in ONE batched pass on the
depth-``maxrefine`` vertex grid of every element; per element a host-side
quad/octree recursion produces flat tables of integration cells — full
sub-boxes plus mosaic simplices star-shaped around a snapped midpoint —
interface facets, and retained boundary pieces.  Samples over the trimmed
topology are plain batched tables whose charts carry *base* element indices,
so every existing basis and geometry lowers unchanged; the trimmed basis is
the base basis with the dof axis pruned (function.PrunedBasis).

The cut geometry follows the reference's dimension-recursive slice
(element.py:209-271): every face of the cell is sliced recursively, a
midpoint is chosen on the cut hull (the first new face-slice vertex, with
cut positions snapped to a ``2**ndivisions`` grid per leaf edge), kept
face pieces are coned from the midpoint into the volume triangulation, face
interface pieces are coned into interface facets, and ribs — (d-2)-subfaces
whose two incident faces disagree about retention after snapping — are
promoted to interface facets (element.py:994-1002).

>>> import numpy
>>> from nutils_tpu import mesh, function
>>> topo, geom = mesh.rectilinear([numpy.linspace(-1, 1, 9)] * 2)
>>> disc = topo.trim(0.7**2 - (geom**2).sum(-1), maxrefine=2)
>>> area = float(disc.integrate(function.J(geom), degree=2))
>>> bool(abs(area - numpy.pi * 0.49) < 5e-3)
True
>>> rim = disc.boundary['trimmed']
>>> per = float(rim.integrate(function.J(geom), degree=2))
>>> bool(abs(per - 2 * numpy.pi * 0.7) < 2e-2)
True
'''

import functools
import itertools

import numpy

from . import element, function, sample as _sample
from .topology import Topology, UnionTopology, StructuredTopology, _StructuredBoundary, _WithGroupsTopology
from .unstructured import UnstructuredTopology, UnstructuredBoundary

_TOL = 1e-12


def _is_hier(topo):
    from .hierarchical import HierarchicalTopology
    return isinstance(topo, HierarchicalTopology)


def _plain_rows(plain, s):
    '''Element ids of a sample part in ``plain``'s own element numbering
    (hierarchical samples carry level-local ids plus a lineage).'''
    if _is_hier(plain):
        lg = s.specs[0].lineage
        return plain._hier_index(lg[1], s.index)
    return s.index


def _plain_ref(plain, e):
    if _is_hier(plain):
        l, el = plain._row_level_elem([int(e)])
        return plain.family.ref_of(int(l[0]), int(el[0]))
    return plain.ref if isinstance(plain, StructuredTopology) else plain._refs[e]


def _apply(lin, off, pts):
    '''Affine map of a point table [..., df] -> [..., d].'''
    return numpy.asarray(pts, dtype=float) @ numpy.asarray(lin, dtype=float).T + off


def _ref_simplices(ref):
    '''Triangulation of a reference into its own-dimension simplices, as a
    list of [d+1, d] vertex-coordinate arrays (reference analogue:
    Reference.simplices, element.py:413/739).'''
    if isinstance(ref, element.PointReference):
        return [numpy.zeros((1, 0))]
    if isinstance(ref, element.LineReference):
        return [numpy.array([[0.0], [1.0]])]
    if isinstance(ref, (element.TriangleReference, element.TetReference)):
        return [ref.vertices.copy()]
    if isinstance(ref, element.QuadReference):
        return [numpy.array([[0.0, 0.0], [0.0, 1.0], [1.0, 0.0]]),
                numpy.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])]
    raise NotImplementedError(type(ref))


def _facet_normal(span):
    '''Unnormalized normal of a (d-1)-simplex with spanning rows span
    [d-1, d], by determinant cofactors (generalized cross product).'''
    span = numpy.asarray(span, dtype=float)
    d = span.shape[1]
    n = numpy.empty(d)
    for i in range(d):
        cols = [j for j in range(d) if j != i]
        n[i] = (-1) ** i * numpy.linalg.det(span[:, cols]) if d > 1 else 1.0
    return n


def _piece_key(S):
    return frozenset(tuple(numpy.round(v, 12)) for v in numpy.asarray(S, dtype=float))


def _contains_point(S, p):
    return bool((((numpy.asarray(S) - p) ** 2).sum(1) < _TOL ** 2).any())


@functools.cache
def _ribs_of(refname):
    '''Pairs ((k1, j1), (k2, j2)) of coinciding (face, face-edge) locations of
    the named reference (the analogue of Reference._ribs): every (d-2)-subface
    is shared by exactly two faces.'''
    ref = {'QuadReference': element.QuadReference, 'HexReference': element.HexReference,
           'TriangleReference': element.TriangleReference, 'TetReference': element.TetReference,
           'LineReference': element.LineReference}[refname]()
    groups = {}
    for k, (lin, off, _nrm, eref) in enumerate(ref.edges):
        if eref.ndims == 0:
            continue
        for j, (elin, eoff, _enrm, eeref) in enumerate(eref.edges):
            verts_face = _apply(elin, eoff, eeref.vertices) if eeref.ndims else eoff[None]
            verts_cell = _apply(lin, off, verts_face)
            groups.setdefault(_piece_key(verts_cell), []).append((k, j))
    out = []
    for key, locs in groups.items():
        assert len(locs) == 2, f'rib {key} shared by {len(locs)} faces of {refname}'
        out.append(tuple(locs))
    return tuple(out)


def _slice_edge(l0, l1, nbins):
    '''1D slice with binning (reference: element.py:221-236): returns
    ('full',), ('empty',) or ('cut', t, keep_low).'''
    if l0 >= 0 and l1 >= 0:
        return ('full',)
    if l0 <= 0 and l1 <= 0:
        return ('empty',)
    xi = numpy.round(l0 / (l0 - l1) * nbins)
    if xi == 0:
        return ('empty',) if l1 < 0 else ('full',)
    if xi == nbins:
        return ('empty',) if l0 < 0 else ('full',)
    return ('cut', xi / nbins, l0 > 0)


def _slice_ref(ref, levels, nbins):
    '''Slice a reference along the linear interpolant of its vertex levels
    (reference: element.py:209 Reference.slice), dimension-recursively.

    Returns ('full',), ('empty',) or ('cut', data) with data a dict holding,
    all in ref-local coordinates:

    * midpoint [d] — the snapped cone apex on the cut hull;
    * vol — kept d-simplices, list of [d+1, d];
    * iface — interface (d-1)-simplices, list of [d, d] (unoriented);
    * face_kept — per original face k, the kept (d-1)-simplices on that face,
      list of lists of [d, d].
    '''
    lv = numpy.asarray(levels, dtype=float)
    if (lv >= 0).all():
        return ('full',)
    if (lv <= 0).all():
        return ('empty',)
    d = ref.ndims

    if d == 1:
        st = _slice_edge(lv[0], lv[1], nbins)
        if st[0] != 'cut':
            return st
        t, keep_low = st[1], st[2]
        midpoint = numpy.array([t])
        vol = [numpy.array([[0.0], [t]])] if keep_low else [numpy.array([[t], [1.0]])]
        iface = [numpy.array([[t]])]
        # line edge order: edge 0 at x=1, edge 1 at x=0 (element.py edges)
        face_kept = [[numpy.array([[1.0]])] if not keep_low else [],
                     [numpy.array([[0.0]])] if keep_low else []]
        return ('cut', dict(midpoint=midpoint, vol=vol, iface=iface, face_kept=face_kept))

    edges = ref.edges
    evids = ref.edge_vertex_ids
    face_res = [_slice_ref(eref, lv[list(vids)], nbins)
                for (lin, off, nrm, eref), vids in zip(edges, evids)]

    def face_pieces(k):
        '''Kept (d-1)-simplices of face k, in ref coords.'''
        st = face_res[k]
        lin, off, _nrm, eref = edges[k]
        if st[0] == 'full':
            return [_apply(lin, off, S) for S in _ref_simplices(eref)]
        if st[0] == 'empty':
            return []
        return [_apply(lin, off, S) for S in st[1]['vol']]

    midpoint = None
    for k, st in enumerate(face_res):
        if st[0] == 'cut':
            lin, off, _nrm, _eref = edges[k]
            midpoint = _apply(lin, off, st[1]['midpoint'][None])[0]
            break
    if midpoint is None:
        # no new face intersections (all faces snapped to full/empty):
        # reference element.py:254-262
        if sum(st[0] != 'full' for st in face_res) < d:
            return ('full',)
        if sum(st[0] != 'empty' for st in face_res) < d:
            return ('empty',)
        count = numpy.zeros(ref.nverts, dtype=int)
        for k, st in enumerate(face_res):
            if st[0] == 'full':
                count[list(evids[k])] += 1
        midpoint = ref.vertices[count == 1][0].astype(float)

    vol = []
    face_kept = []
    for k in range(len(edges)):
        pieces = face_pieces(k)
        face_kept.append(pieces)
        for S in pieces:
            if _contains_point(S, midpoint):
                continue
            if abs(numpy.linalg.det(S - midpoint)) < 1e-14:
                continue
            vol.append(numpy.concatenate([midpoint[None], S], axis=0))

    iface = []

    def add_iface(piece_cell):
        '''Cone a (d-2)-simplex [d-1, d] to the midpoint.'''
        if _contains_point(piece_cell, midpoint):
            return
        facet = numpy.concatenate([midpoint[None], piece_cell], axis=0)
        if numpy.linalg.norm(_facet_normal(facet[1:] - facet[0])) < 1e-15:
            return
        iface.append(facet)

    for k, st in enumerate(face_res):
        if st[0] != 'cut':
            continue
        lin, off, _nrm, _eref = edges[k]
        for F in st[1]['iface']:
            add_iface(_apply(lin, off, F))

    def rib_pieces(k, j):
        '''Kept (d-2)-simplices of face k on its own edge j, in ref coords.'''
        st = face_res[k]
        lin, off, _nrm, eref = edges[k]
        elin, eoff, _enrm, eeref = eref.edges[j]
        if st[0] == 'full':
            pf = [_apply(elin, eoff, S) if eeref.ndims else eoff[None] for S in _ref_simplices(eeref)]
        elif st[0] == 'empty':
            pf = []
        else:
            pf = st[1]['face_kept'][j]
        return [_apply(lin, off, P) for P in pf]

    # ribs: (d-2)-subfaces whose two incident faces disagree about retention
    # (snapping can pull a cut onto a rib from one side only); the
    # disagreement pieces are new exterior and get pulled to the midpoint
    # (reference: element.py:994-1002)
    for (k1, j1), (k2, j2) in _ribs_of(type(ref).__name__):
        p1 = {(_piece_key(P)): P for P in rib_pieces(k1, j1)}
        p2 = {(_piece_key(P)): P for P in rib_pieces(k2, j2)}
        for key in set(p1) ^ set(p2):
            add_iface(p1.get(key, p2.get(key)))

    return ('cut', dict(midpoint=midpoint, vol=vol, iface=iface, face_kept=face_kept))


class _ElemTrim:
    '''Per-element trim result in element-local coordinates.'''

    __slots__ = 'status', 'boxes', 'simps', 'iface', 'iface_normal', 'hull'

    def __init__(self):
        self.status = None
        self.boxes = []   # (A [d,d], b [d]): ref-shaped sub-cells
        self.simps = []   # [d+1, d] kept simplex vertices
        self.iface = []   # [d, d] interface facet vertices
        self.iface_normal = []  # [d] outward normals (away from kept side)
        self.hull = []    # [d, d] retained (d-1)-simplices of the element hull


def _trim_element(ref, grid, m, nbins):
    '''Quad/octree trim of one element given its levelset values on the
    depth-m vertex grid (``grid[gi]`` at local coords gi/2**m).'''
    out = _ElemTrim()
    n = (1 << m)
    d = ref.ndims
    children = element.children(ref)

    def grid_at(x):
        g = numpy.asarray(x, dtype=float) * n
        gi = numpy.round(g).astype(int)
        assert numpy.abs(g - gi).max() < 1e-9
        return grid[tuple(gi.T)] if gi.ndim == 2 else grid[tuple(gi)]

    def subtree_vals(A, b, rem):
        s = 1 << rem
        pts, _t, _h = ref.bezier(s + 1)  # lattice of the reference at depth rem
        return grid_at(pts @ A.T + b)

    def add_hull(A, b):
        for lin, off, _nrm, eref in ref.edges:
            for S in _ref_simplices(eref):
                out.hull.append(_apply(lin, off, S) @ A.T + b)

    def rec(A, b, rem):
        vals = subtree_vals(A, b, rem)
        if (vals >= 0).all():
            out.boxes.append((A, b))
            add_hull(A, b)
            return
        if (vals <= 0).all():
            return
        if rem > 0:
            for clin, coff in children:
                rec(A @ clin, A @ coff + b, rem - 1)
            return
        lv = grid_at(ref.vertices @ A.T + b)
        res = _slice_ref(ref, lv, nbins)
        if res[0] == 'full':
            out.boxes.append((A, b))
            add_hull(A, b)
            return
        if res[0] == 'empty':
            return
        data = res[1]
        Ainv_T = numpy.linalg.inv(A).T
        # linear levelset gradient for interface orientation
        V = numpy.concatenate([ref.vertices, numpy.ones((len(ref.vertices), 1))], axis=1)
        gfit = numpy.linalg.lstsq(V, numpy.asarray(lv, dtype=float), rcond=None)[0][:d]
        for S in data['vol']:
            out.simps.append(S @ A.T + b)
        for F in data['iface']:
            nrm_loc = _facet_normal(F[1:] - F[0])
            if nrm_loc @ gfit > 0:
                nrm_loc = -nrm_loc
            nrm2 = Ainv_T @ nrm_loc
            nn = numpy.linalg.norm(nrm2)
            if nn < 1e-15:
                continue
            out.iface.append(F @ A.T + b)
            out.iface_normal.append(nrm2 / nn)
        for pieces in data['face_kept']:
            for S in pieces:
                out.hull.append(S @ A.T + b)

    vals0 = subtree_vals(numpy.eye(d), numpy.zeros(d), m)
    if (vals0 >= 0).all():
        out.status = 'full'
    elif (vals0 <= 0).all():
        out.status = 'empty'
    else:
        rec(numpy.eye(d), numpy.zeros(d), m)
        if not out.boxes and not out.simps:
            out.status = 'empty'
        else:
            out.status = 'cut'
    return out


def trim(topo, levelset, maxrefine, ndivisions=8, name='trimmed', *, arguments=None):
    '''Trim a topology along a levelset, keeping the positive side
    (reference: topology.py:1603 TransformChainsTopology.trim).

    Trimming an already-trimmed topology composes the levelsets (the kept
    region {ls1>0} ∩ {ls2>0} is the positive region of min(ls1, ls2)) and
    re-trims the original base; the trimmed rim is split back into the
    per-trim named groups by which levelset vanishes on each facet
    (reference: topology.py:2615 SubsetTopology.trim supports the same
    sequential-trim pattern through leveltopo recursion).'''
    levelset = function.asarray(levelset)
    if isinstance(topo, TrimmedTopology):
        specs = topo._trim_specs + [(levelset, maxrefine, name, arguments or {})]
        combined = specs[0][0]
        merged_args = dict(specs[0][3])
        for ls, _mr, _nm, ar in specs[1:]:
            combined = function.min_(combined, ls)
            for key, val in ar.items():
                if key in merged_args and not numpy.array_equal(
                        numpy.asarray(merged_args[key]), numpy.asarray(val)):
                    raise ValueError(f'conflicting values for argument {key!r} '
                                     'across sequential trims: earlier levelsets '
                                     'would be re-evaluated with the later value')
                merged_args[key] = val
        result = trim(topo.basetopo, combined, max(s[1] for s in specs),
                      ndivisions, name, arguments=merged_args)
        result._trim_specs = specs
        # rim classification: boundary() evaluates each constituent levelset
        # EXACTLY (the function, not a lattice interpolant) at the facet
        # vertices+centroid, so group assignment does not degrade with coarse
        # maxrefine the way post-hoc lattice interpolation did
        result._rim_eval = merged_args
        return result
    plain = topo
    while isinstance(plain, _WithGroupsTopology):
        plain = plain.parent
    n = 2 ** maxrefine + 1
    smp = plain.sample('bezier', n)
    vals = numpy.asarray(smp.eval(levelset, arguments or {}))
    if numpy.isnan(vals).any():
        raise Exception('levelset function evaluated to NaN values')
    nbins = 2 ** ndivisions

    grids = _grids_per_element(plain, smp, vals, n)
    data = [None] * len(plain)
    for e, grid in enumerate(grids):
        data[e] = _trim_element(_plain_ref(plain, e), grid, maxrefine, nbins)
    result = TrimmedTopology(topo, data, name)
    result._trim_specs = [(levelset, maxrefine, name, arguments or {})]
    return result


def _grids_per_element(plain, smp, vals, n):
    '''Per-element [n]*d lattices of levelset values over local [0,1]^d,
    rebuilt from a bezier-n sample of the plain topology.'''
    grids = [None] * len(plain)
    parts = smp.samples if isinstance(smp, _sample.ChainedSample) else [smp]
    pos = 0
    for s in parts:
        v = vals[pos:pos + s.npoints].reshape(s.nelems, s.npoints_per_elem)
        pos += s.npoints
        eids = _plain_rows(plain, s)
        for row in range(s.nelems):
            e = int(eids[row])
            ref = _plain_ref(plain, e)
            d = ref.ndims
            pts, _t, _h = ref.bezier(n)
            gi = numpy.round(pts * (n - 1)).astype(int)
            assert numpy.abs(pts * (n - 1) - gi).max() < 1e-9
            grid = numpy.full((n,) * d, numpy.nan)
            grid[tuple(gi.T)] = v[row]
            grids[e] = grid
    return grids


class TrimmedTopology(Topology):
    '''Topology of the kept (levelset-positive) region: full elements plus
    mosaic cells of cut elements (reference: topology.py:2615 SubsetTopology
    with trimmed references).'''

    def __init__(self, basetopo, data, name='trimmed'):
        self.basetopo = basetopo
        plain = basetopo
        while isinstance(plain, _WithGroupsTopology):
            plain = plain.parent
        self.plain = plain
        super().__init__(plain.space, plain.ndims)
        self.data = data
        self.name = name
        self.full_elems = numpy.asarray([e for e, t in enumerate(data) if t.status == 'full'], dtype=int)
        self.cut_elems = numpy.asarray([e for e, t in enumerate(data) if t.status == 'cut'], dtype=int)
        self.kept_elems = numpy.union1d(self.full_elems, self.cut_elems)

    def __len__(self):
        return len(self.kept_elems)

    def __repr__(self):
        return f'TrimmedTopology({len(self.full_elems)} full + {len(self.cut_elems)} cut)'

    # ------------------------------------------------------------ frame maps

    def _frame(self, elems):
        '''Affine maps element-local -> frame coordinates, [E,d,d], [E,d].'''
        d = self.ndims
        if _is_hier(self.plain):
            levels, els = self.plain._row_level_elem(numpy.asarray(elems, dtype=int))
            return self.plain.family.frame_affine(levels, els)
        if isinstance(self.plain, StructuredTopology):
            h = self.plain.root_h
            lin = numpy.broadcast_to(numpy.eye(d) * h, (len(elems), d, d))
            return lin, self.plain._origins[elems]
        lin = numpy.broadcast_to(numpy.eye(d), (len(elems), d, d))
        return lin, numpy.zeros((len(elems), d))

    def _to_local(self, elems):
        d = self.ndims
        if _is_hier(self.plain):
            levels, els = self.plain._row_level_elem(numpy.asarray(elems, dtype=int))
            return self.plain.family.to_local(levels, els)
        if isinstance(self.plain, StructuredTopology):
            h = self.plain.root_h
            lin = numpy.broadcast_to(numpy.eye(d) / h, (len(elems), d, d))
            return lin, -self.plain._origins[elems] / h
        lin = numpy.broadcast_to(numpy.eye(d), (len(elems), d, d))
        return lin, numpy.zeros((len(elems), d))

    def _ref_of(self, e):
        return _plain_ref(self.plain, e)

    def _chart_of(self, elems):
        '''(index, origin_topo, lineage) for Sample charts over the given
        plain-element rows: hierarchical plains carry level-local ids plus a
        lineage (resolved through Basis._resolve_chart / HierarchicalBasis),
        flat plains their own ids.'''
        elems = numpy.asarray(elems, dtype=int)
        if _is_hier(self.plain):
            levels, els = self.plain._row_level_elem(elems)
            return els, None, (self.plain.family, levels, els)
        return elems, self.plain, None

    # ------------------------------------------------------------ sampling

    def sample(self, ischeme, degree=None):
        parts = []
        # full elements: the base topology's own sample, row-restricted
        if len(self.full_elems):
            base = self.plain.sample(ischeme, degree)
            for s in (base.samples if isinstance(base, _sample.ChainedSample) else [base]):
                rows = numpy.nonzero(numpy.isin(_plain_rows(self.plain, s), self.full_elems))[0]
                if len(rows):
                    parts.append(_sample.take_rows(s, rows))
        # cut elements: per-subcell batches, bucketed by subcell shape
        cells = {}  # key -> list of (elem, A [d,d], b [d], ref)
        for e in self.cut_elems:
            t = self.data[e]
            ref = self._ref_of(e)
            d = ref.ndims
            for A, b in t.boxes:
                cells.setdefault(('box', type(ref).__name__), []).append((e, A, b, ref))
            for S in t.simps:
                v0 = S[0]
                F = numpy.stack([S[i] - v0 for i in range(1, d + 1)], axis=1)
                cells.setdefault(('simplex',), []).append((e, F, v0, element.simplex(d)))
        for key, items in cells.items():
            ref = items[0][3]
            tri_local = hull_local = None
            if ischeme == 'gauss':
                pts, wts = ref.gauss(degree)
            elif ischeme == 'bezier':
                pts, tri_local, hull_local = ref.bezier(degree)
                wts = None
            elif ischeme == '_centroid':
                pts = ref.vertices.mean(0, keepdims=True)
                wts = None
            else:
                raise ValueError(f'unknown sample scheme {ischeme!r}')
            E, P = len(items), len(pts)
            elems = numpy.asarray([it[0] for it in items])
            A = numpy.asarray([it[1] for it in items])   # [E,d,d]
            b = numpy.asarray([it[2] for it in items])   # [E,d]
            flin, foff = self._frame(elems)
            # x_frame = flin @ (A p + b) + foff
            lin = numpy.einsum('eij,ejk->eik', flin, A)
            off = numpy.einsum('eij,ej->ei', flin, b) + foff
            coords = numpy.einsum('eij,pj->epi', lin, pts) + off[:, None, :]
            p_lin, p_off = self._to_local(elems)
            weights = None if wts is None else numpy.broadcast_to(wts, (E, P)).copy()
            index, otopo, lineage = self._chart_of(elems)
            parts.append(_sample.Sample(
                self.space, coords, weights, index, p_lin, p_off, lin,
                None, tri_local, hull_local,
                part_ids=numpy.zeros(E, dtype=int), part_topos=[self],
                batch_key=('trimcell',) + key, origin_topo=otopo, lineage=lineage))
        if len(parts) == 1:
            return parts[0]
        return _sample.ChainedSample(parts)

    # ------------------------------------------------------------ bases

    def basis(self, btype='std', degree=1, **kwargs):
        parent = self.basetopo.basis(btype, degree, **kwargs)
        return function.PrunedBasis(parent, self.kept_elems)

    # ------------------------------------------------------------ boundary

    @functools.cached_property
    def boundary(self):
        parts = {}
        # trimmed (interface) part
        facets, nrms, selems = [], [], []
        for e in self.cut_elems:
            t = self.data[e]
            for F, nn in zip(t.iface, t.iface_normal):
                facets.append(F)
                nrms.append(nn)
                selems.append(e)
        # exposures: faces of kept elements whose neighbor element disappeared
        # entirely join the trimmed group (reference: topology.py:2688-2696)
        for e, S, nrm in self._exposure_pieces():
            facets.append(S)
            nrms.append(nrm)
            selems.append(e)
        if facets:
            specs = getattr(self, '_trim_specs', None)
            if specs is not None and len(specs) > 1:
                # sequential-trim rims: name each facet after the levelset
                # that vanishes on it, scored by the EXACT levelset functions
                # sampled at the facet vertices + centroid (mean |ls| per
                # facet, argmin over constituents) — second-order accurate in
                # the facet position rather than first-order in the combined
                # min() lattice
                margs = getattr(self, '_rim_eval', {})
                d = self.ndims
                elems = numpy.asarray(selems)
                Fv = numpy.asarray(facets, dtype=float)              # [F, d, d]
                pts = numpy.concatenate([Fv, Fv.mean(axis=1, keepdims=True)], axis=1)  # [F, d+1, d]
                flin, foff = self._frame(elems)
                coords = numpy.einsum('eij,epj->epi', flin, pts) + foff[:, None, :]
                p_lin, p_off = self._to_local(elems)
                index, otopo, lineage = self._chart_of(elems)
                smp = _sample.Sample(self.space, coords, None, index, p_lin,
                                     p_off, flin, origin_topo=otopo, lineage=lineage)
                scores = numpy.stack([
                    numpy.abs(numpy.asarray(smp.eval(ls, margs))
                              .reshape(len(elems), d + 1)).mean(axis=1)
                    for ls, _mr, _nm, _ar in specs])                 # [nspec, F]
                which = numpy.argmin(scores, axis=0)
                buckets = {}
                for i, (e, F, nn) in enumerate(zip(selems, facets, nrms)):
                    nm = specs[int(which[i])][2]
                    b = buckets.setdefault(nm, ([], [], []))
                    b[0].append(e)
                    b[1].append(F)
                    b[2].append(nn)
                for nm, (se, fa, nr) in buckets.items():
                    parts[nm] = _TrimFacetPart(self, se, fa, nr)
            else:
                parts[self.name] = _TrimFacetPart(self, selems, facets, nrms)
        # base boundary groups, restricted to kept elements and trimmed pieces
        if _is_hier(self.plain):
            from .hierarchical import _HierBoundaryPart
            for name, bpart in self.plain.boundary.parts.items():
                assert isinstance(bpart, _HierBoundaryPart)
                full_items, pieces = [], []
                for (l, e, k) in bpart.items:
                    row = int(self.plain._hier_index([l], [e])[0])
                    t = self.data[row]
                    if t.status == 'full':
                        full_items.append((l, e, k))
                    elif t.status == 'cut':
                        ref = self._ref_of(row)
                        nrm = ref.edges[k][2]
                        for S in t.hull:
                            if self._edge_matches(ref, k, S):
                                pieces.append((row, S, nrm.astype(float)))
                sub = []
                if full_items:
                    sub.append(_HierBoundaryPart(self.plain, full_items))
                if pieces:
                    sub.append(_TrimFacetPart(self, [p[0] for p in pieces],
                                              [p[1] for p in pieces], [p[2] for p in pieces]))
                if len(sub) == 1:
                    parts[name] = sub[0]
                elif sub:
                    parts[name] = UnionTopology(self.space, self.ndims - 1, {f'_{i}': s for i, s in enumerate(sub)})
        elif isinstance(self.plain, StructuredTopology):
            for name, bpart in self.plain.boundary.parts.items():
                fsub, pieces = self._structured_group(bpart)
                sub = []
                if len(fsub):
                    sub.append(_StructuredBoundary(self.plain, bpart.idim, bpart.side, fsub))
                if pieces:
                    sub.append(_TrimFacetPart(self, [p[0] for p in pieces],
                                              [p[1] for p in pieces], [p[2] for p in pieces]))
                if len(sub) == 1:
                    parts[name] = sub[0]
                elif sub:
                    parts[name] = UnionTopology(self.space, self.ndims - 1, {f'_{i}': s for i, s in enumerate(sub)})
        else:
            groups = {}
            if isinstance(self.basetopo, _WithGroupsTopology):
                groups = self.basetopo._bgroups
            else:
                groups = {'_boundary': self.plain.boundary}
            for name, bpart in groups.items():
                assert isinstance(bpart, UnstructuredBoundary)
                fsub, pieces = self._unstructured_group(bpart)
                sub = []
                if len(fsub):
                    sub.append(bpart[fsub])
                if pieces:
                    sub.append(_TrimFacetPart(self, [p[0] for p in pieces],
                                              [p[1] for p in pieces], [p[2] for p in pieces]))
                if len(sub) == 1:
                    parts[name] = sub[0]
                elif sub:
                    parts[name] = UnionTopology(self.space, self.ndims - 1, {f'_{i}': s for i, s in enumerate(sub)})
        return UnionTopology(self.space, self.ndims - 1, parts)

    def _exposure_pieces(self):
        '''(elem, facet simplex [d, d] in element-local coordinates, local
        normal) covering the kept-element face area whose neighboring
        elements were entirely trimmed away.'''
        if _is_hier(self.plain):
            return self._exposure_pieces_hier()
        out = []
        for e, k, nrm in self._exposed_edges():
            ref = self._ref_of(e)
            lin, off, _n, eref = ref.edges[k]
            t = self.data[e]
            if t.status == 'full':
                for S in _ref_simplices(eref):
                    out.append((e, _apply(lin, off, S), nrm))
            else:
                for S in t.hull:
                    if self._edge_matches(ref, k, S):
                        out.append((e, S, nrm))
        return out

    def _exposure_pieces_hier(self):
        '''Hierarchical (multi-level) exposure: pass 1 walks kept faces and
        resolves the neighbor cell at the kept element's own level through
        the active-ancestor index (covers same-level and kept-finer /
        empty-coarser); pass 2 walks EMPTY faces whose neighbor resolves to a
        strictly coarser kept element and emits the empty face's footprint in
        the kept element's local frame (partial exposure of a coarse face).
        Reference counterpart: SubsetTopology boundary over a
        HierarchicalTopology base (topology.py:2665, 2785).'''
        plain = self.plain
        fam = plain.family
        if not fam.structured:
            raise NotImplementedError('exposure detection on trimmed hierarchical '
                                      'topologies requires a structured family')
        out = []
        status = numpy.array([t.status for t in self.data])
        if not (status == 'empty').any():
            return out
        levels, els = plain._row_level_elem(numpy.arange(len(plain)))
        base = fam.base
        ref = base.ref
        edgeinfo = []
        for k, (_l, _o, nrm, _r) in enumerate(ref.edges):
            idim = int(numpy.argmax(numpy.abs(nrm)))
            edgeinfo.append((idim, int(nrm[idim] > 0), nrm.astype(float), k))
        kbyn = {(idim, side): k for idim, side, _nrm, k in edgeinfo}

        def neighbor(l, e, idim, side):
            shape = fam.shape(l)
            multi = numpy.array(numpy.unravel_index(e, shape))
            multi[idim] += 1 if side else -1
            if idim in base.periodic:
                multi[idim] %= shape[idim]
            elif multi[idim] < 0 or multi[idim] >= shape[idim]:
                return None
            return int(numpy.ravel_multi_index(multi, shape))

        def hidx(l, e):
            return int(plain._hier_index([l], [e], strict=False)[0])

        for row in numpy.nonzero(status != 'empty')[0]:
            l, e = int(levels[row]), int(els[row])
            for idim, side, nrm, k in edgeinfo:
                nb = neighbor(l, e, idim, side)
                if nb is None:
                    continue
                nrow = hidx(l, nb)
                if nrow < 0 or status[nrow] != 'empty':
                    continue
                t = self.data[row]
                lin, off, _n, eref = ref.edges[k]
                if t.status == 'full':
                    for S in _ref_simplices(eref):
                        out.append((int(row), _apply(lin, off, S), nrm))
                else:
                    for S in t.hull:
                        if self._edge_matches(ref, k, S):
                            out.append((int(row), S, nrm))
        for row in numpy.nonzero(status == 'empty')[0]:
            l, e = int(levels[row]), int(els[row])
            for idim, side, nrm, k in edgeinfo:
                nb = neighbor(l, e, idim, side)
                if nb is None:
                    continue
                nrow = hidx(l, nb)
                if nrow < 0 or status[nrow] == 'empty' or int(levels[nrow]) >= l:
                    continue  # same level handled by pass 1 from the kept side
                nl, ne = int(levels[nrow]), int(els[nrow])
                flin_e, foff_e = fam._level_frame(l, numpy.array([e]))
                tl_n, to_n = fam._level_to_local(nl, numpy.array([ne]))
                lin, off, _n, eref = ref.edges[k]
                knrm = -nrm  # kept element's outward normal points into the empty
                t = self.data[nrow]
                if t.status == 'full':
                    for S in _ref_simplices(eref):
                        frame = _apply(flin_e[0], foff_e[0], _apply(lin, off, S))
                        out.append((int(nrow), _apply(tl_n[0], to_n[0], frame), knrm))
                else:
                    # hull pieces of the cut kept element on the shared plane,
                    # restricted to the empty face's footprint box
                    corners = _apply(tl_n[0], to_n[0], _apply(
                        flin_e[0], foff_e[0], _apply(lin, off, eref.vertices)))
                    lo = corners.min(axis=0) - _TOL
                    hi = corners.max(axis=0) + _TOL
                    k2 = kbyn[idim, 1 - side]
                    for S in t.hull:
                        c = numpy.asarray(S, dtype=float).mean(axis=0)
                        if self._edge_matches(ref, k2, S) and (c >= lo).all() and (c <= hi).all():
                            out.append((int(nrow), S, knrm))
        return out

    def _exposed_edges(self):
        '''(elem, iedge, normal) for kept-element faces whose neighbor element
        was entirely trimmed away.'''
        out = []
        dropped = numpy.asarray([e for e, t in enumerate(self.data) if t.status == 'empty'], dtype=int)
        if not len(dropped):
            return out
        if isinstance(self.plain, StructuredTopology):
            p = self.plain
            d = p.ndims
            status = numpy.array([t.status for t in self.data])
            edgeidx = {}
            for k, (_l, _o, nrm, _r) in enumerate(p.ref.edges):
                idim = int(numpy.argmax(numpy.abs(nrm)))
                edgeidx[idim, int(nrm[idim] > 0)] = k
            for e in self.kept_elems:
                multi = numpy.array(numpy.unravel_index(e, p.shape))
                for idim in range(d):
                    for side in (0, 1):
                        nb = multi.copy()
                        nb[idim] += 1 if side else -1
                        if idim in p.periodic:
                            nb[idim] %= p.shape[idim]
                        elif nb[idim] < 0 or nb[idim] >= p.shape[idim]:
                            continue
                        if status[numpy.ravel_multi_index(nb, p.shape)] == 'empty':
                            k = edgeidx[idim, side]
                            out.append((int(e), k, p.ref.edges[k][2].astype(float)))
        else:
            conn = self.plain.connectivity
            status = [t.status for t in self.data]
            for e in self.kept_elems:
                for k, nb in enumerate(conn[int(e)]):
                    if nb >= 0 and status[nb] == 'empty':
                        out.append((int(e), k, self.plain._refs[int(e)].edges[k][2].astype(float)))
        return out

    def _edge_matches(self, ref, k, S):
        lin, off, nrm, _eref = ref.edges[k]
        return bool((numpy.abs((numpy.asarray(S) - off) @ nrm) < _TOL).all())

    def _structured_group(self, bpart):
        '''Boundary side of the structured base: full-element faces (by face
        index) plus trimmed hull pieces of cut elements on that side.'''
        p = self.plain
        parent_index, lin, off, nrm = bpart._tables
        full_faces = numpy.nonzero(numpy.isin(parent_index, self.full_elems))[0]
        cut_rows = numpy.nonzero(numpy.isin(parent_index, self.cut_elems))[0]
        pieces = []
        for row in cut_rows:
            e = int(parent_index[row])
            t = self.data[e]
            for S in t.hull:
                if (numpy.abs((S - off) @ nrm) < _TOL).all():
                    pieces.append((e, S, nrm.astype(float)))
        return full_faces, pieces

    def _unstructured_group(self, bpart):
        full_rows = []
        pieces = []
        for row, (e, k) in enumerate(bpart._edges):
            if self.data[e].status == 'full':
                full_rows.append(row)
            elif self.data[e].status == 'cut':
                ref = self.plain._refs[e]
                lin, off, nrm, _eref = ref.edges[k]
                for S in self.data[e].hull:
                    if self._edge_matches(ref, k, S):
                        pieces.append((e, S, nrm.astype(float)))
        return numpy.asarray(full_rows, dtype=int), pieces

    # ------------------------------------------------------------ misc

    def __getitem__(self, item):
        raise KeyError(item)


class _TrimFacetPart(Topology):
    '''A batch of (d-1)-simplex boundary facets of a trimmed d-dim topology,
    in element-local coordinates with per-facet normals.'''

    def __init__(self, trimmed, elems, facets, normals):
        super().__init__(trimmed.space, trimmed.ndims - 1)
        self.trimmed = trimmed
        self.elems = numpy.asarray(elems, dtype=int)
        self.facets = numpy.asarray([numpy.asarray(f, dtype=float) for f in facets])  # [E, d, d]
        self.normals = numpy.asarray(normals)                                         # [E, d]

    def __len__(self):
        return len(self.elems)

    def sample(self, ischeme, degree=None):
        d = self.trimmed.ndims
        sref = element.simplex(d - 1)
        tri_local = hull_local = None
        if ischeme == 'gauss':
            pts, wts = sref.gauss(degree)
        elif ischeme == 'bezier':
            pts, tri_local, hull_local = sref.bezier(degree)
            wts = None
        elif ischeme == '_centroid':
            pts = sref.vertices.mean(0, keepdims=True)
            wts = None
        else:
            raise ValueError(f'unknown sample scheme {ischeme!r}')
        E, P = len(self.elems), len(pts)
        a = self.facets[:, 0]                                     # [E, d]
        span = self.facets[:, 1:] - self.facets[:, :1]            # [E, d-1, d]
        flin, foff = self.trimmed._frame(self.elems)
        a_f = numpy.einsum('eij,ej->ei', flin, a) + foff
        span_f = numpy.einsum('eij,esj->esi', flin, span)         # [E, d-1, d]
        coords = a_f[:, None, :] + numpy.einsum('ps,esi->epi', pts, span_f)
        tangents = numpy.swapaxes(span_f, 1, 2)                   # [E, d, d-1]
        # normals transform by the inverse transpose of the frame map
        ninv = numpy.linalg.inv(numpy.swapaxes(flin, 1, 2))
        nrm = numpy.einsum('eij,ej->ei', ninv, self.normals)
        nrm = nrm / numpy.linalg.norm(nrm, axis=1, keepdims=True)
        p_lin, p_off = self.trimmed._to_local(self.elems)
        weights = None if wts is None else numpy.broadcast_to(wts, (E, P)).copy()
        index, otopo, lineage = self.trimmed._chart_of(self.elems)
        return _sample.Sample(
            self.space, coords, weights, index, p_lin, p_off, tangents,
            nrm, tri_local, hull_local,
            part_ids=numpy.zeros(E, dtype=int), part_topos=[self],
            batch_key=('trimseg',), origin_topo=otopo, lineage=lineage)

    def basis(self, btype='std', degree=1, **kwargs):
        return self.trimmed.basis(btype, degree, **kwargs)
