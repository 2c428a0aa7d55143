'''Levelset trimming (finite cell method).

TPU-native counterpart of the reference's trim machinery (reference:
topology.py:1603 trim, element.py:195 Reference.trim/slice, element.py:912
MosaicReference): the levelset is evaluated in ONE batched pass on the
depth-``maxrefine`` vertex grid of every element; per element a host-side
quadtree recursion produces flat tables of integration cells — full sub-boxes
plus mosaic triangles star-shaped around a snapped midpoint — interface
facets, and retained boundary pieces.  Samples over the trimmed topology are
plain batched tables whose charts carry *base* element indices, so every
existing basis and geometry lowers unchanged; the trimmed basis is the base
basis with the dof axis pruned (function.PrunedBasis).

The cut geometry reproduces the reference's conventions exactly: cut
positions snapped to a ``2**ndivisions`` grid per leaf edge, midpoint = first
cut edge's intersection, star triangulation over retained hull segments, and
corner ribs promoted to interface facets (element.py:209-290).
'''

import functools
import itertools

import numpy

from . import element, function, sample as _sample
from .topology import Topology, UnionTopology, StructuredTopology, _StructuredBoundary, _WithGroupsTopology
from .unstructured import UnstructuredTopology, UnstructuredBoundary
from .utils import _log as log


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


def _slice_cell(ref, corner_levels, nbins):
    '''Slice a 2D cell along the linear interpolant of its corner levels
    (reference: element.py:209 Reference.slice).  Returns ('full',),
    ('empty',) or ('mosaic', tris, iface, hull) with tris [nt, 3, d], iface
    [(a, b)], hull {iedge: [(a, b)]} in cell-local coordinates.'''
    verts = ref.vertices
    lv = numpy.asarray(corner_levels, dtype=float)
    if (lv >= 0).all():
        return ('full',)
    if (lv <= 0).all():
        return ('empty',)

    def vid(p):
        d2 = ((verts - p) ** 2).sum(1)
        i = int(numpy.argmin(d2))
        assert d2[i] < 1e-20
        return i

    estat = []
    for k, (lin, off, nrm, eref) in enumerate(ref.edges):
        p0 = off
        p1 = off + lin[:, 0]
        st = _slice_edge(lv[vid(p0)], lv[vid(p1)], nbins)
        estat.append((st, p0, p1))

    midpoint = None
    for st, p0, p1 in estat:
        if st[0] == 'cut':
            midpoint = p0 + st[1] * (p1 - p0)
            break
    if midpoint is None:
        nchanged = sum(1 for st, _p0, _p1 in estat if st[0] == 'empty')
        if nchanged < ref.ndims:
            return ('full',)
        nkept = sum(1 for st, _p0, _p1 in estat if st[0] == 'full')
        if nkept < ref.ndims:
            return ('empty',)
        count = numpy.zeros(len(verts), dtype=int)
        for st, p0, p1 in estat:
            if st[0] == 'full':
                count[vid(p0)] += 1
                count[vid(p1)] += 1
        midpoint = verts[count == 1][0]

    same = lambda a, b: ((numpy.asarray(a) - b) ** 2).sum() < 1e-20
    tris = []
    iface = []
    hull = {k: [] for k in range(len(estat))}
    for k, (st, p0, p1) in enumerate(estat):
        if st[0] == 'empty':
            continue
        if st[0] == 'full':
            segs = [(p0, p1)]
        else:
            t, keep_low = st[1], st[2]
            c = p0 + t * (p1 - p0)
            segs = [(p0, c)] if keep_low else [(c, p1)]
            if not same(c, midpoint):
                iface.append((midpoint, c))
        for a, b in segs:
            hull[k].append((numpy.asarray(a, dtype=float), numpy.asarray(b, dtype=float)))
            if not (same(a, midpoint) or same(b, midpoint)):
                tris.append((midpoint, a, b))

    # ribs: corners kept by one incident edge but removed by the other become
    # interface facets pulled to the midpoint (reference: element.py:995-1003)
    for iv, v in enumerate(verts):
        kept = []
        for st, p0, p1 in estat:
            if same(p0, v) or same(p1, v):
                if st[0] == 'full':
                    kept.append(True)
                elif st[0] == 'empty':
                    kept.append(False)
                else:
                    keep_low = st[2]
                    kept.append(keep_low if same(p0, v) else not keep_low)
        assert len(kept) == ref.ndims
        if kept[0] != kept[1] and not same(v, midpoint):
            iface.append((midpoint, numpy.asarray(v, dtype=float)))

    tris = numpy.asarray([numpy.stack(t) for t in tris]) if tris else numpy.zeros((0, 3, ref.ndims))
    return ('mosaic', tris, iface, hull)


class _ElemTrim:
    '''Per-element trim result in element-local coordinates.'''

    __slots__ = 'status', 'boxes', 'tris', 'iface', 'iface_normal', 'hull'

    def __init__(self):
        self.status = None
        self.boxes = []   # (A [d,d], b [d]): ref-shaped sub-cells
        self.tris = []    # [3, d] triangle vertices
        self.iface = []   # (a, b) interface segments
        self.iface_normal = []  # [d] outward normals (away from kept side)
        self.hull = []    # (a, b) retained pieces of the element hull


def _trim_element(ref, grid, m, nbins):
    '''Quadtree trim of one element given its levelset values on the depth-m
    vertex grid (``grid[i, j]`` at local coords (i, j)/2**m).'''
    out = _ElemTrim()
    n = (1 << m)
    d = ref.ndims
    children = element.children(ref)
    is_simplex = isinstance(ref, element.TriangleReference)

    def subtree_vals(A, b, rem):
        s = 1 << rem
        ii, jj = numpy.meshgrid(numpy.arange(s + 1), numpy.arange(s + 1), indexing='ij')
        if is_simplex:
            keep = ii + jj <= s
            ii, jj = ii[keep], jj[keep]
        else:
            ii, jj = ii.ravel(), jj.ravel()
        q = numpy.stack([ii, jj], axis=1) / s  # node-local coords
        x = q @ A.T + b
        g = x * n
        gi = numpy.round(g).astype(int)
        assert numpy.abs(g - gi).max() < 1e-9
        return grid[gi[:, 0], gi[:, 1]]

    def add_hull(A, b):
        for lin, off, nrm, eref in ref.edges:
            p0 = off @ A.T + b
            p1 = (off + lin[:, 0]) @ A.T + b
            out.hull.append((p0, p1))

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
        lv = []
        for v in ref.vertices:
            x = v @ A.T + b
            g = x * n
            gi = numpy.round(g).astype(int)
            lv.append(grid[gi[0], gi[1]])
        res = _slice_cell(ref, lv, nbins)
        if res[0] == 'full':
            out.boxes.append((A, b))
            add_hull(A, b)
            return
        if res[0] == 'empty':
            return
        _tag, tris, iface, hull = res
        Ainv_T = numpy.linalg.inv(A).T
        # linear levelset gradient for interface orientation
        V = numpy.concatenate([ref.vertices, numpy.ones((len(ref.vertices), 1))], axis=1)
        gfit = numpy.linalg.lstsq(V, numpy.asarray(lv), rcond=None)[0][:d]
        for t in tris:
            out.tris.append(t @ A.T + b)
        for a, c in iface:
            a2, c2 = a @ A.T + b, c @ A.T + b
            tang = numpy.asarray(c) - a
            nrm_loc = numpy.array([tang[1], -tang[0]])
            if nrm_loc @ gfit > 0:
                nrm_loc = -nrm_loc
            nrm2 = Ainv_T @ nrm_loc
            nn = numpy.linalg.norm(nrm2)
            if nn < 1e-15:
                continue
            out.iface.append((a2, c2))
            out.iface_normal.append(nrm2 / nn)
        for k, segs in hull.items():
            for a, c in segs:
                out.hull.append((a @ A.T + b, c @ A.T + b))

    vals0 = subtree_vals(numpy.eye(d), numpy.zeros(d), m)
    if (vals0 >= 0).all():
        out.status = 'full'
    elif (vals0 <= 0).all():
        out.status = 'empty'
    else:
        rec(numpy.eye(d), numpy.zeros(d), m)
        if not out.boxes and not out.tris:
            out.status = 'empty'
        else:
            out.status = 'cut'
    return out


def trim(topo, levelset, maxrefine, ndivisions=8, name='trimmed', *, arguments=None):
    '''Trim a topology along a levelset, keeping the positive side
    (reference: topology.py:1603 TransformChainsTopology.trim).'''
    levelset = function.asarray(levelset)
    plain = topo
    while isinstance(plain, _WithGroupsTopology):
        plain = plain.parent
    n = 2 ** maxrefine + 1
    smp = plain.sample('bezier', n)
    vals = numpy.asarray(smp.eval(levelset, arguments or {}))
    if numpy.isnan(vals).any():
        raise Exception('levelset function evaluated to NaN values')
    nbins = 2 ** ndivisions

    data = [None] * len(plain)
    parts = smp.samples if isinstance(smp, _sample.ChainedSample) else [smp]
    pos = 0
    for s in parts:
        v = vals[pos:pos + s.npoints].reshape(s.nelems, s.npoints_per_elem)
        pos += s.npoints
        for row in range(s.nelems):
            e = int(s.index[row])
            ref = plain.ref if isinstance(plain, StructuredTopology) else plain._refs[e]
            grid = numpy.full((n, n), numpy.nan)
            if isinstance(ref, element.TriangleReference):
                k = 0
                for i in range(n):
                    for j in range(n - i):
                        grid[i, j] = v[row, k]
                        k += 1
            else:
                grid[:, :] = v[row].reshape(n, n)
            data[e] = _trim_element(ref, grid, maxrefine, nbins)
    return TrimmedTopology(topo, data, name)


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
        if isinstance(self.plain, StructuredTopology):
            h = self.plain.root_h
            lin = numpy.broadcast_to(numpy.eye(d) * h, (len(elems), d, d))
            return lin, self.plain._origins[elems]
        lin = numpy.broadcast_to(numpy.eye(d), (len(elems), d, d))
        return lin, numpy.zeros((len(elems), d))

    def _to_local(self, elems):
        d = self.ndims
        if isinstance(self.plain, StructuredTopology):
            h = self.plain.root_h
            lin = numpy.broadcast_to(numpy.eye(d) / h, (len(elems), d, d))
            return lin, -self.plain._origins[elems] / h
        lin = numpy.broadcast_to(numpy.eye(d), (len(elems), d, d))
        return lin, numpy.zeros((len(elems), d))

    def _ref_of(self, e):
        return self.plain.ref if isinstance(self.plain, StructuredTopology) else self.plain._refs[e]

    # ------------------------------------------------------------ sampling

    def sample(self, ischeme, degree=None):
        parts = []
        # full elements: the base topology's own sample, row-restricted
        if len(self.full_elems):
            base = self.plain.sample(ischeme, degree)
            for s in (base.samples if isinstance(base, _sample.ChainedSample) else [base]):
                rows = numpy.nonzero(numpy.isin(s.index, self.full_elems))[0]
                if len(rows):
                    parts.append(_sample.take_rows(s, rows))
        # cut elements: per-subcell batches, bucketed by subcell shape
        cells = {}  # (refname) -> list of (elem, A [d,d], b [d], ref)
        for e in self.cut_elems:
            t = self.data[e]
            ref = self._ref_of(e)
            for A, b in t.boxes:
                cells.setdefault(('box', type(ref).__name__), []).append((e, A, b, ref))
            for tri in t.tris:
                v0 = tri[0]
                F = numpy.stack([tri[1] - v0, tri[2] - v0], axis=1)
                cells.setdefault(('tri',), []).append((e, F, v0, element.simplex(2)))
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
            parts.append(_sample.Sample(
                self.space, coords, weights, elems, p_lin, p_off, lin,
                None, tri_local, hull_local,
                part_ids=numpy.zeros(E, dtype=int), part_topos=[self],
                batch_key=('trimcell',) + key, origin_topo=self.plain))
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
        segs, nrms, selems = [], [], []
        for e in self.cut_elems:
            t = self.data[e]
            for (a, b), nn in zip(t.iface, t.iface_normal):
                segs.append((a, b))
                nrms.append(nn)
                selems.append(e)
        # exposures: edges of kept elements whose neighbor element disappeared
        # entirely join the trimmed group (reference: topology.py:2688-2696)
        for e, k, nrm in self._exposed_edges():
            ref = self._ref_of(e)
            lin, off, _n, _eref = ref.edges[k]
            t = self.data[e]
            if t.status == 'full':
                segs.append((off, off + lin[:, 0]))
                nrms.append(nrm)
                selems.append(e)
            else:
                for a, b in t.hull:
                    if self._edge_matches(ref, k, a, b):
                        segs.append((a, b))
                        nrms.append(nrm)
                        selems.append(e)
        if segs:
            parts[self.name] = _TrimSegPart(self, selems, segs, nrms)
        # base boundary groups, restricted to kept elements and trimmed pieces
        if isinstance(self.plain, StructuredTopology):
            for name, bpart in self.plain.boundary.parts.items():
                fsub, pieces = self._structured_group(bpart)
                sub = []
                if len(fsub):
                    sub.append(_StructuredBoundary(self.plain, bpart.idim, bpart.side, fsub))
                if pieces:
                    elems = [p[0] for p in pieces]
                    seg = [(p[1], p[2]) for p in pieces]
                    nrm = [p[3] for p in pieces]
                    sub.append(_TrimSegPart(self, elems, seg, nrm))
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
                    sub.append(_TrimSegPart(self, [p[0] for p in pieces],
                                            [(p[1], p[2]) for p in pieces], [p[3] for p in pieces]))
                if len(sub) == 1:
                    parts[name] = sub[0]
                elif sub:
                    parts[name] = UnionTopology(self.space, self.ndims - 1, {f'_{i}': s for i, s in enumerate(sub)})
        return UnionTopology(self.space, self.ndims - 1, parts)

    def _exposed_edges(self):
        '''(elem, iedge, normal) for kept-element edges whose neighbor element
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

    def _edge_matches(self, ref, k, a, b):
        lin, off, nrm, _eref = ref.edges[k]
        return abs((a - off) @ nrm) < 1e-12 and abs((b - off) @ nrm) < 1e-12

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
            ref = self._ref_of(e)
            t = self.data[e]
            for a, b in t.hull:
                if abs((a - off) @ nrm) < 1e-12 and abs((b - off) @ nrm) < 1e-12:
                    pieces.append((e, a, b, nrm.astype(float)))
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
                for a, b in self.data[e].hull:
                    if self._edge_matches(ref, k, a, b):
                        pieces.append((e, a, b, nrm.astype(float)))
        return numpy.asarray(full_rows, dtype=int), pieces

    # ------------------------------------------------------------ misc

    def __getitem__(self, item):
        raise KeyError(item)


class _TrimSegPart(Topology):
    '''A batch of 1D boundary segments of a trimmed 2D topology, in
    element-local coordinates with per-segment normals.'''

    def __init__(self, trimmed, elems, segs, normals):
        super().__init__(trimmed.space, trimmed.ndims - 1)
        self.trimmed = trimmed
        self.elems = numpy.asarray(elems, dtype=int)
        self.segs = numpy.asarray([numpy.stack(s) for s in segs])  # [E, 2, d]
        self.normals = numpy.asarray(normals)                      # [E, d]

    def __len__(self):
        return len(self.elems)

    def sample(self, ischeme, degree=None):
        from .ops import quadrature
        d = self.trimmed.ndims
        tri_local = hull_local = None
        if ischeme == 'gauss':
            pts, wts = quadrature.line(degree)
        elif ischeme == 'bezier':
            pts = numpy.linspace(0, 1, degree)[:, None]
            tri_local = numpy.stack([numpy.arange(degree - 1), numpy.arange(1, degree)], axis=1)
            hull_local = numpy.array([[0], [degree - 1]])
            wts = None
        elif ischeme == '_centroid':
            pts = numpy.array([[0.5]])
            wts = None
        else:
            raise ValueError(f'unknown sample scheme {ischeme!r}')
        E, P = len(self.elems), len(pts)
        a = self.segs[:, 0]  # [E, d]
        dvec = self.segs[:, 1] - self.segs[:, 0]
        flin, foff = self.trimmed._frame(self.elems)
        a_f = numpy.einsum('eij,ej->ei', flin, a) + foff
        d_f = numpy.einsum('eij,ej->ei', flin, dvec)
        coords = a_f[:, None, :] + pts[:, 0][None, :, None] * d_f[:, None, :]
        tangents = d_f[:, :, None]  # [E, d, 1]
        # normals transform by the inverse transpose of the frame map
        ninv = numpy.linalg.inv(numpy.swapaxes(flin, 1, 2))
        nrm = numpy.einsum('eij,ej->ei', ninv, self.normals)
        nrm = nrm / numpy.linalg.norm(nrm, axis=1, keepdims=True)
        p_lin, p_off = self.trimmed._to_local(self.elems)
        weights = None if wts is None else numpy.broadcast_to(wts, (E, P)).copy()
        return _sample.Sample(
            self.space, coords, weights, self.elems, p_lin, p_off, tangents,
            nrm, tri_local, hull_local,
            part_ids=numpy.zeros(E, dtype=int), part_topos=[self],
            batch_key=('trimseg',), origin_topo=self.trimmed.plain)

    def basis(self, btype='std', degree=1, **kwargs):
        return self.trimmed.basis(btype, degree, **kwargs)
