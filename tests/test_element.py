'''Reference-element geometric invariants (scope model: reference
tests/test_element.py): edge maps, vertex identities, children partitions,
normals, Bernstein bases.'''

import math

import numpy
import pytest

from nutils_tpu import element


ALL_REFS = [element.LineReference(), element.QuadReference(), element.HexReference(),
            element.TriangleReference(), element.TetReference()]


def _volume(ref):
    return {element.LineReference: 1.0, element.QuadReference: 1.0,
            element.HexReference: 1.0, element.TriangleReference: 0.5,
            element.TetReference: 1 / 6}[type(ref)]


@pytest.mark.parametrize('ref', ALL_REFS, ids=lambda r: type(r).__name__)
def test_edge_vertex_ids_invariant(ref):
    '''edge_vertex_ids[k][j] must be the element vertex at edge-reference
    vertex j under the k-th edge map — the invariant interface matching and
    trimming rely on.'''
    for k, (lin, off, _nrm, eref) in enumerate(ref.edges):
        vids = ref.edge_vertex_ids[k]
        everts = eref.vertices if eref.ndims else numpy.zeros((1, 0))
        mapped = everts @ numpy.asarray(lin, dtype=float).T + off
        for j, mv in enumerate(mapped):
            numpy.testing.assert_allclose(mv, ref.vertices[vids[j]], atol=1e-14)


@pytest.mark.parametrize('ref', ALL_REFS, ids=lambda r: type(r).__name__)
def test_edge_normals_outward_unit(ref):
    '''Every edge normal is unit length, orthogonal to the edge span, and
    points away from the element centroid.'''
    centroid = ref.vertices.mean(0)
    for lin, off, nrm, eref in ref.edges:
        nrm = numpy.asarray(nrm, dtype=float)
        assert numpy.linalg.norm(nrm) == pytest.approx(1.0, rel=1e-12)
        lin = numpy.asarray(lin, dtype=float)
        if eref.ndims:
            numpy.testing.assert_allclose(nrm @ lin, 0, atol=1e-12)
        face_pt = numpy.asarray(off, dtype=float) if not eref.ndims \
            else eref.vertices.mean(0) @ lin.T + off
        assert (face_pt - centroid) @ nrm > 0


@pytest.mark.parametrize('ref', ALL_REFS, ids=lambda r: type(r).__name__)
def test_surface_divergence_identity(ref):
    '''∮ n dS = 0 and ∮ x·n dS = d·|V| over the element hull (exact for
    affine faces with degree-1 gauss).'''
    d = ref.ndims
    total_n = numpy.zeros(d)
    total_xn = 0.0
    for lin, off, nrm, eref in ref.edges:
        pts, wts = eref.gauss(2)
        lin = numpy.asarray(lin, dtype=float)
        x = (pts @ lin.T + off) if eref.ndims else numpy.asarray(off, dtype=float)[None]
        if eref.ndims:
            jac = numpy.sqrt(numpy.linalg.det(lin.T @ lin))
        else:
            jac = 1.0
            wts = numpy.ones(1)
        total_n += (wts * jac).sum() * numpy.asarray(nrm, dtype=float)
        total_xn += float((wts * jac * (x @ numpy.asarray(nrm, dtype=float))).sum())
    numpy.testing.assert_allclose(total_n, 0, atol=1e-12)
    assert total_xn == pytest.approx(d * _volume(ref), rel=1e-12)


@pytest.mark.parametrize('ref', [element.LineReference(), element.QuadReference(),
                                 element.HexReference(), element.TriangleReference(),
                                 element.TetReference()], ids=lambda r: type(r).__name__)
def test_children_partition(ref):
    '''Child maps tile the reference: volumes sum to |V| and child images of
    gauss points stay inside; child vertices lie in the closed reference.'''
    kids = element.children(ref)
    d = ref.ndims
    vol = 0.0
    for clin, coff in kids:
        clin = numpy.asarray(clin, dtype=float)
        vol += abs(numpy.linalg.det(clin)) * _volume(ref)
        mapped = ref.vertices @ clin.T + coff
        if isinstance(ref, (element.TriangleReference, element.TetReference)):
            assert (mapped.sum(1) <= 1 + 1e-12).all() and (mapped >= -1e-12).all()
        else:
            assert (mapped >= -1e-12).all() and (mapped <= 1 + 1e-12).all()
    assert vol == pytest.approx(_volume(ref), rel=1e-12)
    # children cover: centroids of a fine lattice each inside exactly one child
    pts = ref.gauss(3)[0]
    counts = numpy.zeros(len(pts), dtype=int)
    for clin, coff in kids:
        clin = numpy.asarray(clin, dtype=float)
        inv = numpy.linalg.inv(clin)
        loc = (pts - coff) @ inv.T
        if isinstance(ref, (element.TriangleReference, element.TetReference)):
            inside = (loc >= -1e-9).all(1) & (loc.sum(1) <= 1 + 1e-9)
        else:
            inside = (loc >= -1e-9).all(1) & (loc <= 1 + 1e-9).all(1)
        counts += inside
    assert (counts >= 1).all()


@pytest.mark.parametrize('ref,degree', [(r, dg) for r in ALL_REFS for dg in (1, 2, 3)],
                         ids=lambda v: type(v).__name__ if isinstance(v, element.Reference) else str(v))
def test_bernstein_partition_of_unity(ref, degree):
    coeffs = element.bernstein_coeffs(ref, degree)  # [ndofs, K1..Kd]
    pts = ref.gauss(3)[0]
    d = ref.ndims
    vals = numpy.zeros((len(pts), coeffs.shape[0]))
    K = coeffs.shape[1:]
    for i, p in enumerate(pts):
        mono = numpy.ones(())
        grids = numpy.ones(K)
        for ax in range(d):
            shape = [1] * d
            shape[ax] = K[ax]
            grids = grids * (p[ax] ** numpy.arange(K[ax])).reshape(shape)
        vals[i] = (coeffs * grids).reshape(coeffs.shape[0], -1).sum(1)
    numpy.testing.assert_allclose(vals.sum(1), 1, atol=1e-11)
    # degree-1 bernstein on simplex/box interpolates vertices
    if degree == 1:
        vvals = numpy.zeros((ref.nverts, coeffs.shape[0]))
        for i, p in enumerate(ref.vertices):
            grids = numpy.ones(K)
            for ax in range(d):
                shape = [1] * d
                shape[ax] = K[ax]
                grids = grids * (p[ax] ** numpy.arange(K[ax])).reshape(shape)
            vvals[i] = (coeffs * grids).reshape(coeffs.shape[0], -1).sum(1)
        # each vertex activates exactly one dof at value 1
        assert numpy.allclose(sorted(vvals.max(1)), 1.0, atol=1e-12)
        numpy.testing.assert_allclose(vvals.sum(1), 1, atol=1e-12)


def test_compose_affine_poly():
    '''Polynomial composition with an affine map matches pointwise
    evaluation (the nutils-poly composition_with_inner_matrix role,
    reference transform.py:181).'''
    rng = numpy.random.RandomState(0)
    coeffs = rng.standard_normal((5, 3, 3))  # 5 dofs, bi-quadratic
    # child/edge maps are axis-aligned (diagonal scaling + offset, possibly
    # permuted); a general dense lin would grow the per-axis coefficient box
    lin = numpy.diag(rng.uniform(0.2, 0.8, 2)) @ numpy.array([[0.0, 1.0], [1.0, 0.0]])
    off = rng.uniform(0, 0.3, 2)
    out = element.compose_affine_poly(coeffs, lin, off)

    def peval(c, x):
        return sum(c[i, j] * x[0] ** i * x[1] ** j
                   for i in range(c.shape[0]) for j in range(c.shape[1]))

    for x in rng.standard_normal((7, 2)):
        xin = lin @ x + off
        for dof in range(5):
            assert peval(out[dof], x) == pytest.approx(peval(coeffs[dof], xin), rel=1e-9, abs=1e-9)


def test_child_edge_map_consistency(ref=element.QuadReference()):
    '''child_edge_map: child edges on the parent hull map to the matching
    parent edge.'''
    kids = element.children(ref)
    cem = element.child_edge_map(ref)
    for ci, (clin, coff) in enumerate(kids):
        for k, (lin, off, nrm, eref) in enumerate(ref.edges):
            pk = cem[ci][k]
            if pk < 0:
                continue
            # child edge k midpoint mapped to parent must lie on parent edge pk
            mid = (eref.vertices.mean(0) @ numpy.asarray(lin, dtype=float).T + off) if eref.ndims else numpy.asarray(off, dtype=float)
            gmid = numpy.asarray(clin, dtype=float) @ mid + coff
            plin, poff, pnrm, _peref = ref.edges[pk]
            assert abs((gmid - poff) @ numpy.asarray(pnrm, dtype=float)) < 1e-12
