'''Unstructured topologies: simplex and mixed-element meshes.

The TPU-native counterpart of the reference's SimplexTopology/ConnectedTopology
(reference: topology.py:2437,2422): per-element vertex tables plus generic
edge-matching connectivity replace transform chains; elements are grouped into
uniform *buckets* by reference type so every bucket lowers to statically
shaped batched arrays, and samples over mixed meshes are chains of per-bucket
samples.

>>> import numpy
>>> from nutils_tpu import mesh, function
>>> topo, geom = mesh.unitsquare(2, 'triangle')
>>> len(topo)
8
>>> float(topo.integrate(function.J(geom), degree=1))
1.0±1e-12
>>> float(topo.boundary.integrate(function.J(geom), degree=1))
4.0±1e-12
>>> topo.basis('std', degree=1).ndofs
9
'''

import functools

import numpy

from . import element, function, sample as _sample
from .topology import Topology, UnionTopology


def merge_index_map(nin, merge_sets):
    '''Union-find index merge with minimal representatives, condensed by first
    appearance (reference semantics: _util.py:759 merge_index_map).'''
    index_map = numpy.arange(nin)

    def find(i):
        root = i
        while index_map[root] != root:
            root = index_map[root]
        while index_map[i] != root:
            index_map[i], i = root, index_map[i]
        return root

    for merge_set in merge_sets:
        roots = sorted(set(find(i) for i in merge_set))
        keep = roots[0]
        for r in roots[1:]:
            index_map[r] = keep
    # resolve chains
    for i in range(nin):
        index_map[i] = find(i)
    # condense by first appearance
    renumber = {}
    out = numpy.empty(nin, dtype=int)
    for i, r in enumerate(index_map):
        if r not in renumber:
            renumber[r] = len(renumber)
        out[i] = renumber[r]
    return out, len(renumber)


def newton_locate(topo, geom, coords, *, tol=None, eps=0, arguments=None, maxiter=None,
                  maxdist=None, skip_missing=False, weights=None, _raw=False):
    '''Generic physical-point location: per-point Newton iteration over
    candidate elements sorted by centroid distance (reference:
    topology.py:777-897 ``Topology.locate``/``_locate``).  The topology
    provides four hooks — ``_locate_start`` (initial iteration coordinates
    per candidate element), ``_locate_eval`` (geometry value + gradient with
    respect to the iteration coordinates), ``_locate_clip`` (trust region)
    and ``_locate_accept`` (containment test, mapping iteration coordinates
    to the containing element + local coordinates) — plus ``_point_sample``
    to build the final sample.'''
    coords = numpy.asarray(coords, dtype=float)
    if coords.ndim == 1:
        coords = coords[:, None]
    d = topo.ndims
    geom = function.asarray(geom)
    if geom.ndim == 0:
        geom = function.stack([geom], axis=0)
    assert coords.shape[1] == geom.shape[0]
    tol = tol or 1e-12
    arguments = arguments or {}
    npts = len(coords)
    # element centroids in physical space
    csmp = topo.sample('_centroid')
    parts = csmp.samples if isinstance(csmp, _sample.ChainedSample) else [csmp]
    cent = numpy.empty((len(topo), geom.shape[0]))
    for s in parts:
        cent[s.index] = numpy.asarray(s.eval(geom, arguments)).reshape(s.nelems, -1)
    ncand = min(len(topo), 32)
    order = numpy.argsort(((cent[None, :, :] - coords[:, None, :]) ** 2).sum(-1), axis=1)[:, :ncand]
    rootgrad = function.grad(geom, function._RootCoords(topo.space, d))
    found_elem = numpy.full(npts, -1, dtype=int)
    found_xi = numpy.zeros((npts, d))
    active = numpy.arange(npts)
    for rank in range(ncand):
        if not len(active):
            break
        cand = order[active, rank]
        xi = topo._locate_start(cand)
        for it in range(maxiter or 30):
            vals, grads = topo._locate_eval(cand, xi, geom, rootgrad, arguments)
            r = coords[active] - vals
            resid = numpy.abs(r).max(axis=1)
            if (resid < max(tol, 1e-12)).all():
                break
            if grads.shape[1] == grads.shape[2]:
                try:
                    delta = numpy.linalg.solve(grads, r[..., None])[..., 0]
                except numpy.linalg.LinAlgError:
                    delta = numpy.stack([numpy.linalg.lstsq(g, rr, rcond=None)[0]
                                         for g, rr in zip(grads, r)])
            else:
                delta = numpy.stack([numpy.linalg.lstsq(g, rr, rcond=None)[0]
                                     for g, rr in zip(grads, r)])
            xi = topo._locate_clip(cand, xi + delta)
        inside_ok, elems, xi_local = topo._locate_accept(cand, xi, eps)
        ok = inside_ok & (resid < max(tol, 1e-12))
        hit = active[ok]
        found_elem[hit] = elems[ok]
        found_xi[hit] = xi_local[ok]
        active = active[~ok]
    if len(active) and not skip_missing:
        raise ValueError(f'failed to locate {len(active)}/{npts} points')
    if _raw:
        # (element id or -1, element-local coordinates) per input point —
        # the hook the hierarchical walk-down builds on
        return found_elem, found_xi
    sel = found_elem >= 0
    return topo._point_sample(found_elem[sel], found_xi[sel],
                              None if weights is None else numpy.asarray(weights)[sel])


def _frame_arrays(topo, ids, coords, tangents, normal_root=None):
    '''Transform element-local sample arrays into refinement-family *frame*
    arrays when ``topo`` is a refined member of a family (the analogue of the
    reference's transform-chain composition through child transforms,
    transformseq.py:708 DerivedTransforms): returns (coords [E,P,d],
    p_linear, p_offset, tangents, normal_root, lineage).  For base topologies
    the chart is the element itself and the maps are trivial.'''
    E = len(ids)
    d = coords.shape[-1]
    hier = getattr(topo, '_hier', None)
    if hier is None or hier[1] == 0:
        return (coords, numpy.broadcast_to(numpy.eye(d), (E, d, d)), numpy.zeros((E, d)),
                tangents, normal_root,
                None if hier is None else (hier[0], numpy.zeros(E, dtype=int), numpy.asarray(ids)))
    fam, l = hier
    ids = numpy.asarray(ids)
    flin, foff = fam._level_frame(l, ids)
    coords = numpy.einsum('eij,epj->epi', flin, coords) + foff[:, None, :]
    plin, poff = fam._level_to_local(l, ids)
    tangents = numpy.einsum('eij,ejk->eik', flin, numpy.broadcast_to(tangents, (E, d, tangents.shape[-1])))
    if normal_root is not None:
        normal_root = numpy.linalg.solve(
            flin.transpose(0, 2, 1), numpy.broadcast_to(normal_root, (E, d))[..., None])[..., 0]
    return coords, plin, poff, tangents, normal_root, (fam, numpy.full(E, l, dtype=int), ids)


class UnstructuredTopology(Topology):
    '''Mesh of elements given by (reference, vertex ids) per element.

    Parameters
    ----------
    space : str
    refs : list of Reference, one per element (shared instances define buckets)
    elem_verts : list of int arrays, vertex ids per element (sorted rows)
    nverts : total number of vertices
    '''

    def __init__(self, space, refs, elem_verts, nverts):
        ndims = refs[0].ndims
        assert all(r.ndims == ndims for r in refs)
        super().__init__(space, ndims)
        self._refs = list(refs)
        self._elem_verts = [numpy.asarray(v) for v in elem_verts]
        self.nverts = int(nverts)
        # bucket elements by reference type
        buckets = {}
        for ielem, ref in enumerate(self._refs):
            buckets.setdefault(type(ref).__name__, (ref, []))[1].append(ielem)
        self._buckets = [(ref, numpy.asarray(ids)) for ref, ids in buckets.values()]

    def __len__(self):
        return len(self._refs)

    # ------------------------------------------------------------ sampling

    def sample(self, ischeme, degree=None):
        return self._sample_elements(self._buckets, ischeme, degree, self)

    def _sample_elements(self, buckets, ischeme, degree, origin):
        '''Sample the given (ref, global element ids) buckets; ``origin`` is
        the topology recorded in part_topos (self or a subset view).'''
        samples = []
        for ref, ids in buckets:
            tri_local = hull_local = None
            if ischeme == 'gauss':
                pts, wts = ref.gauss(degree)
            elif ischeme == 'bezier':
                pts, tri_local, hull_local = ref.bezier(degree)
                wts = None
            elif ischeme == '_centroid':
                pts = ref.vertices.mean(0, keepdims=True)
                wts = None
            elif ischeme == 'vertex':
                pts = ref.vertices
                wts = None
            elif ischeme == 'uniform':
                pts, wts = ref.uniform(degree or 1)
            else:
                raise ValueError(f'unknown sample scheme {ischeme!r}')
            E, P, d = len(ids), len(pts), self.ndims
            coords = numpy.broadcast_to(pts, (E, P, d)).copy()
            weights = None if wts is None else numpy.broadcast_to(wts, (E, P)).copy()
            tangents = numpy.broadcast_to(numpy.eye(d), (E, d, d))
            coords, p_linear, p_offset, tangents, _, lineage = _frame_arrays(self, ids, coords, tangents)
            samples.append(_sample.Sample(self.space, coords, weights, ids, p_linear, p_offset,
                                          tangents, None, tri_local, hull_local,
                                          part_ids=numpy.zeros(E, dtype=int), part_topos=[origin],
                                          batch_key=type(ref).__name__, origin_topo=self,
                                          lineage=lineage))
        if len(samples) == 1:
            return samples[0]
        return _sample.ChainedSample(samples)

    def take(self, ielems):
        '''Subset view over a selection of elements.  Samples carry the
        parent's element numbering so any basis or geometry defined on the
        full topology evaluates on the subset's samples; the boundary includes
        the interface edges exposed by the selection (the analogue of the
        reference's whole-element SubsetTopology, topology.py:2615).'''
        return UnstructuredSubsetTopology(self, ielems)

    def withgroups(self, vgroups=None, bgroups=None, pgroups=None):
        '''Attach named element/boundary/point groups: ``topo[name]`` gives
        the subset topology of an element group, ``topo.boundary[name]`` a
        boundary group, and ``topo.points[name]`` a 0-d point-group topology
        (reference: topology.py:731-760 with* and gmsh's pgroups).'''
        out = self
        if vgroups:
            resolved = {name: self.take(ielems) if not isinstance(ielems, Topology) else ielems
                        for name, ielems in vgroups.items()}
            out = out.withsubdomain(**resolved)
        if bgroups:
            out = out.withboundary(**bgroups)
        if pgroups:
            object.__setattr__(out, 'points', dict(pgroups))
        return out

    def point_topology(self, vertex_id):
        '''0-d topology of a single mesh vertex (reference: gmsh physical
        points, accessible as topo.points[name], mesh.py:300 pgroups).'''
        return _VertexTopology(self, int(vertex_id))

    # ------------------------------------------------------------ structure

    @functools.cached_property
    def connectivity(self):
        '''Per-element neighbor list aligned with the reference-type edge
        numbering; -1 marks boundary edges.  Computed by sorted-vertex edge
        matching (the reference computes the same relation from its
        transform sequences, topology.py:2479).'''
        edge_owner = {}
        conn = [numpy.full(len(ref.edge_vertex_ids), -1, dtype=int) for ref in self._refs]
        interior = []
        for ielem, ref in enumerate(self._refs):
            verts = self._elem_verts[ielem]
            for iedge, ev in enumerate(ref.edge_vertex_ids):
                key = tuple(sorted(verts[list(ev)]))
                if key in edge_owner:
                    jelem, jedge = edge_owner.pop(key)
                    conn[ielem][iedge] = jelem
                    conn[jelem][jedge] = ielem
                    interior.append((jelem, jedge, ielem, iedge))
                else:
                    edge_owner[key] = (ielem, iedge)
        self._boundary_edges = sorted(edge_owner.values())
        self._interior_edges = sorted(interior)
        return conn

    @functools.cached_property
    def boundary(self):
        conn = self.connectivity  # also computes self._boundary_edges
        return UnstructuredBoundary(self, self._boundary_edges)

    @functools.cached_property
    def interfaces(self):
        '''Interior inter-element faces with two-sided samples
        (reference: topology.py:2422 ConnectedTopology.interfaces).'''
        self.connectivity  # computes self._interior_edges
        return UnstructuredInterfaces(self, self._interior_edges)

    @property
    def refined(self):
        '''Uniformly refined topology (reference: topology.py:2749
        RefinedTopology; for simplex meshes topology.py:2437).  The result is
        a full UnstructuredTopology over subdivided elements, linked to this
        one through the refinement family so functions (geometry, bases)
        defined here evaluate on the refined samples via the chart lineage.'''
        from .hierarchical import family_of
        fam = family_of(self)
        l = getattr(self, '_hier')[1]
        fam.ensure(l + 2)
        return fam.levels[l + 1]

    # ------------------------------------------------------------ locate

    def _point_sample(self, ielems, xi, weights=None):
        '''Sample of one point per row at local coordinates xi [N, d] of
        elements ielems [N], in input row order (mixed reference types are
        fine: every chart array is per-row, and the ragged per-element basis
        tables do not require type grouping for single-point rows).'''
        ielems = numpy.asarray(ielems, dtype=int)
        xi = numpy.asarray(xi, dtype=float)
        N, d = xi.shape
        coords = xi[:, None, :]
        tangents = numpy.broadcast_to(numpy.eye(d), (N, d, d))
        coords, p_linear, p_offset, tangents, _, lineage = _frame_arrays(self, ielems, coords, tangents)
        return _sample.Sample(
            self.space, coords,
            None if weights is None else numpy.asarray(weights)[:, None],
            ielems, p_linear, p_offset, tangents, None, None, None,
            part_ids=numpy.zeros(N, dtype=int), part_topos=[self],
            batch_key=('point', self.space), origin_topo=self, lineage=lineage)

    def locate(self, geom, coords, *, tol=None, eps=0, arguments=None, maxiter=None,
               maxdist=None, skip_missing=False, weights=None):
        '''Sample at the elements/local coordinates containing the given
        physical points, by per-point Newton iteration over candidate
        elements sorted by centroid distance (reference: topology.py:777-897
        ``Topology.locate``/``_locate``).'''
        return newton_locate(self, geom, coords, tol=tol, eps=eps, arguments=arguments,
                             maxiter=maxiter, maxdist=maxdist, skip_missing=skip_missing,
                             weights=weights)

    # newton_locate hooks: iteration coordinates are element-local coordinates
    # of the candidate element

    def _locate_start(self, cand):
        return numpy.stack([self._refs[e].vertices.mean(0) for e in cand])

    def _locate_eval(self, cand, xi, geom, rootgrad, arguments):
        smp = self._point_sample(cand, xi)
        vals, grads = smp.eval([geom, rootgrad], arguments)
        d = self.ndims
        vals = numpy.asarray(vals).reshape(len(cand), -1)
        grads = numpy.asarray(grads).reshape(len(cand), -1, d)
        hier = getattr(self, '_hier', None)
        if hier is not None and hier[1] > 0:
            # root gradients are frame gradients: chain through the frame map
            flin, _ = hier[0]._level_frame(hier[1], cand)
            grads = numpy.einsum('egj,eji->egi', grads, flin)
        return vals, grads

    def _locate_clip(self, cand, xi):
        return numpy.clip(xi, -1.0, 2.0)

    def _locate_accept(self, cand, xi, eps):
        ok = numpy.array([element.inside(self._refs[e], x, eps + 1e-10)
                          for e, x in zip(cand, xi)], dtype=bool)
        return ok, cand, xi

    def _point_rows(self, ielems):
        rows_by_type = {}
        for row, ie in enumerate(ielems):
            rows_by_type.setdefault(type(self._refs[ie]).__name__, []).append(row)
        return list(rows_by_type.values())

    # ------------------------------------------------------------ bases

    def basis_std(self, degree):
        if degree == 1 and all(isinstance(r, (element.LineReference, element.TriangleReference, element.TetReference)) for r in self._refs):
            # pure simplex: vertex dofs directly (reference: topology.py:2495)
            coeffs = [element.bernstein_coeffs(ref, 1) for ref in self._refs]
            basis = function.PlainBasis(self.space, list(self._elem_verts), coeffs, self.nverts, ragged=True)
            basis._origin = self
            return basis
        return self.basis_bernstein(degree)

    def basis_bernstein(self, degree):
        '''C0 Bernstein basis: per-element dofs merged across shared edges
        (reference: topology.py:1777 _basis_c0_structured).'''
        return self._basis_c0(degree, element.bernstein_coeffs)

    def basis_lagrange(self, degree):
        '''C0 nodal Lagrange basis on the equispaced lattice (reference:
        topology.py:1801 basis_lagrange): same dof enumeration and edge merge
        as Bernstein, interpolatory coefficients.'''
        return self._basis_c0(degree, element.lagrange_coeffs)

    def _basis_c0(self, degree, coeffs_of):
        coeffs = [coeffs_of(ref, degree) for ref in self._refs]
        counts = [len(c) for c in coeffs]
        offsets = numpy.cumsum([0] + counts)

        def merge_sets():
            for ielem, neighbors in enumerate(self.connectivity):
                for iedge, jelem in enumerate(neighbors):
                    if jelem >= ielem:
                        jedge = list(self.connectivity[jelem]).index(ielem)
                        di = offsets[ielem] + element.edge_dofs(self._refs[ielem], degree, iedge)
                        dj = offsets[jelem] + element.edge_dofs(self._refs[jelem], degree, jedge)
                        yield from zip(di.tolist(), dj.tolist())
        dofmap, ndofs = merge_index_map(int(offsets[-1]), merge_sets())
        dofs = [dofmap[offsets[i]:offsets[i + 1]] for i in range(len(self._refs))]
        basis = function.PlainBasis(self.space, dofs, coeffs, ndofs, ragged=True)
        basis._origin = self
        return basis


    def basis_discont(self, degree):
        coeffs = [element.bernstein_coeffs(ref, degree) for ref in self._refs]
        counts = [len(c) for c in coeffs]
        offsets = numpy.cumsum([0] + counts)
        dofs = [numpy.arange(offsets[i], offsets[i + 1]) for i in range(len(self._refs))]
        basis = function.PlainBasis(self.space, dofs, coeffs, int(offsets[-1]), ragged=True)
        basis._origin = self
        return basis

    def basis_bubble(self, degree=1):
        '''Linear simplex basis enriched with interior bubbles
        (reference: topology.py:2502 basis_bubble).'''
        assert degree == 1, 'bubble basis is linear-plus-bubble by definition'
        assert all(isinstance(r, element.TriangleReference) for r in self._refs), 'bubble basis: 2-D simplex only'
        d = self.ndims
        K = d + 2
        coeffs = []
        for ielem, ref in enumerate(self._refs):
            lin = element.bernstein_coeffs(ref, 1)  # [3, 2, 2]
            lin_p = numpy.zeros((3, K, K))
            lin_p[:, :2, :2] = lin
            bubble = numpy.zeros((K, K))
            # lam0*lam1*lam2 = (1-x-y) x y = xy - x^2 y - x y^2
            bubble[1, 1] += 1.0
            bubble[2, 1] -= 1.0
            bubble[1, 2] -= 1.0
            c = numpy.concatenate([lin_p - bubble[None] / (d + 1), bubble[None]], axis=0)
            coeffs.append(c)
        ndofs = self.nverts + len(self)
        dofs = [numpy.concatenate([self._elem_verts[i], [self.nverts + i]]) for i in range(len(self))]
        basis = function.PlainBasis(self.space, dofs, coeffs, ndofs, ragged=True)
        basis._origin = self
        return basis


class UnstructuredBoundary(Topology):
    '''Boundary edges of an unstructured topology, bucketed by edge type.'''

    def __init__(self, parent, edges, subset=None):
        super().__init__(parent.space, parent.ndims - 1)
        self.parent = parent
        self._edges = list(edges)  # [(ielem, iedge)]
        if subset is not None:
            self._edges = [self._edges[i] for i in subset]

    def __len__(self):
        return len(self._edges)

    def __getitem__(self, item):
        if isinstance(item, numpy.ndarray) and item.dtype == bool:
            return UnstructuredBoundary(self.parent, self._edges, numpy.nonzero(item)[0])
        if isinstance(item, (slice, list, numpy.ndarray)):
            idx = numpy.arange(len(self._edges))[item]
            return UnstructuredBoundary(self.parent, self._edges, idx)
        raise KeyError(item)

    def sample(self, ischeme, degree=None):
        # bucket boundary edges by (parent ref type, edge ref type)
        buckets = {}
        for k, (ielem, iedge) in enumerate(self._edges):
            ref = self.parent._refs[ielem]
            key = (type(ref).__name__, type(ref.edges[iedge][3]).__name__)
            buckets.setdefault(key, []).append((ielem, iedge))
        samples = []
        for key, items in buckets.items():
            pref = self.parent._refs[items[0][0]]
            eref = pref.edges[items[0][1]][3]
            tri_local = hull_local = None
            if ischeme == 'gauss':
                pts, wts = eref.gauss(degree)
            elif ischeme == 'bezier':
                pts, tri_local, hull_local = eref.bezier(degree)
                wts = None
            elif ischeme == '_centroid':
                pts = eref.vertices.mean(0, keepdims=True)
                wts = None
            elif ischeme == 'uniform':
                pts, wts = eref.uniform(degree or 1)
            else:
                raise ValueError(f'unknown sample scheme {ischeme!r}')
            E, P = len(items), len(pts)
            d = self.parent.ndims
            coords = numpy.empty((E, P, d))
            tangents = numpy.empty((E, d, d - 1))
            normals = numpy.empty((E, d))
            index = numpy.empty(E, dtype=int)
            for k, (ielem, iedge) in enumerate(items):
                lin, off, nrm, _ = self.parent._refs[ielem].edges[iedge]
                coords[k] = pts @ lin.T + off
                tangents[k] = lin
                normals[k] = nrm
                index[k] = ielem
            coords, p_linear, p_offset, tangents, normals, lineage = \
                _frame_arrays(self.parent, index, coords, tangents, normals)
            samples.append(_sample.Sample(self.parent.space, coords, None if wts is None else numpy.broadcast_to(wts, (E, P)).copy(),
                                          index, p_linear, p_offset, tangents, normals, tri_local, hull_local,
                                          part_ids=numpy.zeros(E, dtype=int), part_topos=[self],
                                          batch_key=key, origin_topo=self.parent, lineage=lineage))
        if len(samples) == 1:
            return samples[0]
        return _sample.ChainedSample(samples)

    def basis(self, btype='std', degree=1, **kwargs):
        return self.parent.basis(btype, degree, **kwargs)


class UnstructuredSubsetTopology(Topology):
    '''Whole-element subset view of an :class:`UnstructuredTopology`.

    Samples keep the parent's element numbering, so bases and geometries of
    the parent evaluate directly on subset samples; the subset's boundary is
    recomputed by edge matching *within the selection* and therefore includes
    interface edges against the rest of the mesh (the reference's
    SubsetTopology boundary semantics, topology.py:2615,2665).
    '''

    def __init__(self, parent, ielems):
        if isinstance(parent, UnstructuredSubsetTopology):
            ielems = parent._ielems[numpy.asarray(ielems, dtype=int)]
            parent = parent.parent
        super().__init__(parent.space, parent.ndims)
        self.parent = parent
        self._ielems = numpy.unique(numpy.asarray(ielems, dtype=int))

    def __len__(self):
        return len(self._ielems)

    @functools.cached_property
    def _buckets(self):
        buckets = {}
        for gi in self._ielems:
            ref = self.parent._refs[gi]
            buckets.setdefault(type(ref).__name__, (ref, []))[1].append(int(gi))
        return [(ref, numpy.asarray(ids)) for ref, ids in buckets.values()]

    def sample(self, ischeme, degree=None):
        return self.parent._sample_elements(self._buckets, ischeme, degree, self)

    def basis(self, btype='std', degree=1, **kwargs):
        '''Parent basis restricted to the dofs supported on this subset
        (reference: the PrunedBasis a subset topology's basis() returns,
        topology.py:2615 via function.py:3103).'''
        parent_basis = self.parent.basis(btype, degree, **kwargs)
        pruned = function.PrunedBasis(parent_basis, self._ielems)
        pruned._origin = parent_basis._origin
        return pruned

    def take(self, ielems):
        return UnstructuredSubsetTopology(self, ielems)

    @functools.cached_property
    def boundary(self):
        edge_owner = {}
        for gi in self._ielems:
            ref = self.parent._refs[gi]
            verts = self.parent._elem_verts[gi]
            for iedge, ev_ in enumerate(ref.edge_vertex_ids):
                key = tuple(sorted(verts[list(ev_)].tolist()))
                if key in edge_owner:
                    edge_owner.pop(key)
                else:
                    edge_owner[key] = (int(gi), iedge)
        return UnstructuredBoundary(self.parent, sorted(edge_owner.values()))


class _VertexTopology(Topology):
    '''0-d topology of one mesh vertex (reference: gmsh physical points
    exposed as topo.points[name], mesh.py:300).  Sampling yields a single
    point with unit weight in an element containing the vertex; tangents span
    the full parent dimension so functions of the parent space (including
    jacobians of volume geometries) evaluate cleanly.'''

    def __init__(self, parent, vertex_id):
        super().__init__(parent.space, 0)
        self.parent = parent
        self.vertex_id = int(vertex_id)
        for ielem, verts in enumerate(parent._elem_verts):
            hit = numpy.nonzero(numpy.asarray(verts) == self.vertex_id)[0]
            if len(hit):
                self._ielem = ielem
                self._local = parent._refs[ielem].vertices[int(hit[0])]
                break
        else:
            raise ValueError(f'vertex {vertex_id} not referenced by any element')

    def __len__(self):
        return 1

    def sample(self, ischeme, degree=None):
        d = self.parent.ndims
        coords = numpy.asarray(self._local, dtype=float).reshape(1, 1, d)
        weights = numpy.ones((1, 1))
        p_linear = numpy.eye(d)[None]
        p_offset = numpy.zeros((1, d))
        tangents = numpy.eye(d)[None]
        return _sample.Sample(self.space, coords, weights, numpy.array([self._ielem]),
                              p_linear, p_offset, tangents, origin_topo=self.parent,
                              part_ids=numpy.zeros(1, dtype=int), part_topos=[self],
                              batch_key=('vertex', type(self.parent._refs[self._ielem]).__name__))


class UnstructuredInterfaces(Topology):
    '''Interior inter-element faces of an unstructured topology with
    two-sided samples: each face evaluates functions on its owning element,
    and carries an ``opposite`` sample bound to the neighbor so
    ``function.opposite``/jump/mean switch sides (reference: topology.py:2422
    ConnectedTopology.interfaces with opposite transform chains).

    Point pairing across sides goes through vertex interpolation weights
    (element.corner_weights): a quadrature point on the shared face is
    expressed in the weights of the face's corner vertices, and each side
    rebuilds its element-local coordinates from its own local positions of
    the *same global vertices* — exact for affine/multilinear face
    correspondences, which is the conforming-mesh case.  The interface normal
    points out of the first (owning) side.'''

    def __init__(self, parent, pairs):
        super().__init__(parent.space, parent.ndims - 1)
        self.parent = parent
        self._pairs = list(pairs)  # [(ielem, iedge, jelem, jedge)]

    def __len__(self):
        return len(self._pairs)

    def sample(self, ischeme, degree=None):
        par = self.parent
        d = par.ndims
        buckets = {}
        for pair in self._pairs:
            ref = par._refs[pair[0]]
            eref = ref.edges[pair[1]][3]
            key = (type(par._refs[pair[0]]).__name__, type(par._refs[pair[2]]).__name__,
                   type(eref).__name__)
            buckets.setdefault(key, (eref, []))[1].append(pair)
        samples = []
        for key, (eref, items) in buckets.items():
            tri_local = hull_local = None
            if ischeme == 'gauss':
                assert degree is not None
                pts, wts = eref.gauss(degree)
            elif ischeme == 'bezier':
                pts, tri_local, hull_local = eref.bezier(degree)
                wts = None
            elif ischeme == '_centroid':
                pts = eref.vertices.mean(0, keepdims=True)
                wts = None
            elif ischeme == 'uniform':
                pts, wts = eref.uniform(degree or 1)
            else:
                raise ValueError(f'unknown interface scheme {ischeme!r}')
            P = len(pts)
            W = element.corner_weights(eref, pts)                 # [P, nv]
            center = eref.vertices.mean(0)
            dt = eref.ndims
            # affine tangent weights: centered differences at the face center
            Wt = numpy.stack([
                element.corner_weights(eref, (center + 0.5 * numpy.eye(dt)[t])[None])[0]
                - element.corner_weights(eref, (center - 0.5 * numpy.eye(dt)[t])[None])[0]
                for t in range(dt)])                              # [dt, nv]
            E = len(items)
            sides = []
            for side in range(2):
                coords = numpy.empty((E, P, d))
                tangents = numpy.empty((E, d, dt))
                normals = numpy.empty((E, d))
                index = numpy.empty(E, dtype=int)
                sides.append(dict(coords=coords, tangents=tangents, normals=normals, index=index))
            for k, (ielem, iedge, jelem, jedge) in enumerate(items):
                refi, refj = par._refs[ielem], par._refs[jelem]
                evi = list(refi.edge_vertex_ids[iedge])
                evj = list(refj.edge_vertex_ids[jedge])
                gv_i = par._elem_verts[ielem][evi]
                gv_j = par._elem_verts[jelem][evj]
                # position of each side-i corner among side-j's corners
                posmap = [int(numpy.nonzero(gv_j == g)[0][0]) for g in gv_i]
                pos_i = refi.vertices[evi]                        # [nv, d]
                pos_j = refj.vertices[[evj[m] for m in posmap]]   # [nv, d]
                for side, (elem, pos, edge) in enumerate((
                        (ielem, pos_i, refi.edges[iedge]),
                        (jelem, pos_j, refj.edges[jedge]))):
                    sides[side]['coords'][k] = W @ pos
                    sides[side]['tangents'][k] = (Wt @ pos).T
                    sides[side]['normals'][k] = edge[2]
                    sides[side]['index'][k] = elem
            built = []
            for side in (1, 0):
                q = sides[side]
                coords, p_linear, p_offset, tangents, normals, lineage = \
                    _frame_arrays(par, q['index'], q['coords'], q['tangents'], q['normals'])
                built.append(_sample.Sample(
                    par.space, coords,
                    None if (wts is None or side == 1) else numpy.broadcast_to(wts, (E, P)).copy(),
                    q['index'], p_linear, p_offset, tangents, normals, tri_local, hull_local,
                    opposite=built[0] if side == 0 else None,
                    part_ids=numpy.zeros(E, dtype=int), part_topos=[self],
                    batch_key=('iface',) + key, origin_topo=par, lineage=lineage))
            samples.append(built[1])
        if len(samples) == 1:
            return samples[0]
        return _sample.ChainedSample(samples)

    def basis(self, btype='std', degree=1, **kwargs):
        return self.parent.basis(btype, degree, **kwargs)
