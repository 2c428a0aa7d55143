'''Finite-cell geometry matrix: trimmed volumes, trimmed-boundary measures
and fluxes against analytic values, multiplied over dimension × levelset
shape × maxrefine (reference model: tests/test_finitecell.py — the
volume/area convergence tables behind the FCM feature set; reference
element trimming: element.py:195-203 Reference.trim).'''

import numpy
import pytest

from nutils_tpu import function, mesh


def _vol(topo, geom, degree=2):
    return float(numpy.asarray(topo.sample('gauss', degree).integrate(function.J(geom), {})))


def _area(btopo, geom, degree=2):
    return float(numpy.asarray(btopo.sample('gauss', degree).integrate(function.J(geom), {})))


def _flux(btopo, geom, degree=2):
    smp = btopo.sample('gauss', degree)
    return float(numpy.asarray(smp.integrate(
        (geom * function.normal(geom)).sum(-1) * function.J(geom), {})))


# --------------------------------------------------- 2-D circle, convergence

#: interval-halving on each maxrefine step: volume error must shrink
CIRCLE_TOL = {0: 2e-1, 1: 5e-2, 2: 1e-2}


@pytest.mark.parametrize('maxrefine', [0, 1, 2])
@pytest.mark.parametrize('n', [4, 6])
def test_circle_volume_convergence(maxrefine, n):
    topo, geom = mesh.rectilinear([numpy.linspace(-1, 1, n + 1)] * 2)
    r = 0.8
    inside = topo.trim(r**2 - (geom**2).sum(-1), maxrefine=maxrefine)
    exact = numpy.pi * r**2
    assert _vol(inside, geom) == pytest.approx(exact, rel=CIRCLE_TOL[maxrefine])


@pytest.mark.parametrize('maxrefine', [1, 2])
def test_circle_perimeter_and_flux(maxrefine):
    topo, geom = mesh.rectilinear([numpy.linspace(-1, 1, 7)] * 2)
    r = 0.8
    inside = topo.trim(r**2 - (geom**2).sum(-1), maxrefine=maxrefine, name='rim')
    # divergence theorem closes exactly regardless of the geometric error
    vol = _vol(inside, geom)
    assert _flux(inside.boundary, geom) == pytest.approx(2 * vol, rel=1e-9)
    # trimmed-rim measure converges to the circumference
    rim = inside.boundary['rim']
    assert _area(rim, geom) == pytest.approx(2 * numpy.pi * r, rel=5e-2 / maxrefine)


def test_circle_complement_partition():
    '''inside + outside volumes partition the square for the SAME levelset
    (reference: tests/test_finitecell.py test_union).'''
    topo, geom = mesh.rectilinear([numpy.linspace(-1, 1, 7)] * 2)
    r = 0.8
    ls = r**2 - (geom**2).sum(-1)
    inside = topo.trim(ls, maxrefine=2)
    outside = topo.trim(-ls, maxrefine=2)
    assert _vol(inside, geom) + _vol(outside, geom) == pytest.approx(4.0, rel=1e-12)


# ----------------------------------------------------------- 3-D sphere

@pytest.mark.parametrize('maxrefine', [0, 1, 2])
def test_sphere_octant_volume(maxrefine):
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 4)] * 3)
    r = 0.9
    inside = topo.trim(r**2 - (geom**2).sum(-1), maxrefine=maxrefine)
    exact = 4 / 3 * numpy.pi * r**3 / 8
    tol = {0: 2e-1, 1: 5e-2, 2: 2e-2}[maxrefine]
    assert _vol(inside, geom) == pytest.approx(exact, rel=tol)


def test_sphere_divergence_closure():
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 4)] * 3)
    r = 0.9
    inside = topo.trim(r**2 - (geom**2).sum(-1), maxrefine=1)
    vol = _vol(inside, geom)
    assert _flux(inside.boundary, geom) == pytest.approx(3 * vol, rel=1e-9)


# -------------------------------------------------- plane cuts (exact cases)

@pytest.mark.parametrize('ndims', [1, 2, 3])
@pytest.mark.parametrize('c', [0.3, 0.5, 0.6875])
def test_halfspace_volume_quantized(ndims, c):
    '''a linear levelset cut is exact up to the ndivisions quantization: cut
    positions snap to a 2^-8 lattice of the element (the reference's
    ndivisions=8 binning, topology.py:1604), so the volume error is bounded
    by h/256 per cut layer and is exactly zero when the plane lands on the
    lattice (c=0.5, 0.6875 here).'''
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 5)] * ndims)
    inside = topo.trim(c - geom[0], maxrefine=0)
    h = 0.25
    assert _vol(inside, geom) == pytest.approx(c, abs=h / 256 + 1e-12)
    if c in (0.5, 0.6875):
        assert _vol(inside, geom) == pytest.approx(c, rel=1e-12)


@pytest.mark.parametrize('sign', [+1, -1])
def test_diagonal_cut_2d(sign):
    '''cut along the diagonal x+y=1: area = 1/2 exactly.'''
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 5)] * 2)
    inside = topo.trim(sign * (1.0 - geom[0] - geom[1]), maxrefine=0)
    assert _vol(inside, geom) == pytest.approx(0.5, rel=1e-12)


def test_vertex_grazing_cut():
    '''levelset that passes exactly through mesh vertices (reference:
    tests/test_finitecell.py specialcases — zero-measure intersections).'''
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 3)] * 2)
    inside = topo.trim(0.5 - geom[0], maxrefine=1)
    assert _vol(inside, geom) == pytest.approx(0.5, rel=1e-12)
    # boundary of the trimmed half: 3 unit sides + the cut line = 4? the cut
    # coincides with element edges, so the trimmed rim has measure 1
    assert _area(inside.boundary, geom) == pytest.approx(3.0, rel=1e-12)


# ----------------------------------------------- trim × hierarchy × basis

@pytest.mark.parametrize('btype,degree', [('std', 1), ('std', 2), ('spline', 2)])
def test_basis_on_trimmed(btype, degree):
    '''integrating a partition of unity over the trimmed domain gives the
    trimmed volume (bases restrict without renumbering; reference:
    topology.py:2615 SubsetTopology.basis).'''
    topo, geom = mesh.rectilinear([numpy.linspace(-1, 1, 7)] * 2)
    r = 0.8
    inside = topo.trim(r**2 - (geom**2).sum(-1), maxrefine=2)
    basis = inside.basis(btype, degree=degree)
    vol = _vol(inside, geom)
    total = float(numpy.asarray(inside.sample('gauss', degree + 1).integrate(
        function.sum_(basis, 0) * function.J(geom), {})))
    assert total == pytest.approx(vol, rel=1e-10)


def test_trimmed_refined_volume():
    '''refine a trimmed topology hierarchically near the cut: volume keeps
    converging (reference: tests/test_finitecell.py trimmedhierarchical).'''
    topo, geom = mesh.rectilinear([numpy.linspace(-1, 1, 5)] * 2)
    r = 0.8
    ls = r**2 - (geom**2).sum(-1)
    inside = topo.trim(ls, maxrefine=1)
    v0 = _vol(inside, geom)
    exact = numpy.pi * r**2
    # refine all elements and re-trim at the same maxrefine: error shrinks
    refined = topo.refined.trim(ls, maxrefine=1)
    v1 = _vol(refined, geom)
    assert abs(v1 - exact) < abs(v0 - exact)


def test_trim_with_arguments():
    '''levelset may depend on solver arguments, resolved at trim time
    (reference: topology.py:1604 trim(arguments=...)).'''
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 5)] * 2)
    c = function.Argument('c', ())
    inside = topo.trim(c - geom[0], maxrefine=0, arguments={'c': 0.625})
    assert _vol(inside, geom) == pytest.approx(0.625, rel=1e-12)


# ------------------------------------------------------------ ellipse (aniso)

def test_ellipse_area():
    topo, geom = mesh.rectilinear([numpy.linspace(-1, 1, 7)] * 2)
    a, b = 0.9, 0.5
    inside = topo.trim(1 - (geom[0] / a)**2 - (geom[1] / b)**2, maxrefine=2)
    assert _vol(inside, geom) == pytest.approx(numpy.pi * a * b, rel=1e-2)


def test_annulus_by_double_trim():
    '''trim twice: outer disc minus inner disc (set-operation composition).'''
    topo, geom = mesh.rectilinear([numpy.linspace(-1, 1, 9)] * 2)
    r1, r2 = 0.85, 0.4
    rr = (geom**2).sum(-1)
    ring = topo.trim(r1**2 - rr, maxrefine=2, name='outer').trim(
        rr - r2**2, maxrefine=2, name='inner')
    exact = numpy.pi * (r1**2 - r2**2)
    assert _vol(ring, geom) == pytest.approx(exact, rel=1e-2)
