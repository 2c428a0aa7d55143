'''Sample-layer suite (reference scope model: tests/test_sample.py):
integral/eval/bind equivalences, triangulations, subset, zip, nodal basis,
asfunction.'''

import numpy
import pytest

from nutils_tpu import function, mesh


@pytest.fixture(scope='module')
def setup():
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 4)] * 2)
    return topo, geom


def test_integral_vs_integrate(setup):
    topo, geom = setup
    smp = topo.sample('gauss', 2)
    f = (geom ** 2).sum(-1) * function.J(geom)
    a = float(numpy.asarray(function.eval(smp.integral(f), {})))
    b = float(numpy.asarray(smp.integrate(f, {})))
    assert a == b == pytest.approx(2 / 3, rel=1e-12)


def test_eval_matches_bind(setup):
    topo, geom = setup
    smp = topo.sample('bezier', 3)
    f = function.sin(geom[0]) * geom[1]
    via_eval = numpy.asarray(smp.eval(f, {}))
    via_bind = numpy.asarray(function.eval(smp.bind(f), {}))
    numpy.testing.assert_allclose(via_eval, via_bind, atol=1e-14)
    assert via_eval.shape == (smp.npoints,)


def test_tri_hull_measures(setup):
    '''The sample triangulation tiles the domain and the hull its boundary.'''
    topo, geom = setup
    smp = topo.sample('bezier', 4)
    x = numpy.asarray(smp.eval(geom, {}))
    tri = numpy.asarray(smp.tri)
    area = 0.0
    for t in tri:
        V = x[t]
        area += abs(numpy.linalg.det(V[1:] - V[0])) / 2
    assert area == pytest.approx(1.0, rel=1e-12)
    # hull = per-element boundaries (mesh lines): 9 elements x 4 edges x 1/3
    hull = numpy.asarray(smp.hull)
    length = sum(numpy.linalg.norm(x[b] - x[a]) for a, b in hull)
    assert length == pytest.approx(12.0, rel=1e-12)


def test_subset(setup):
    topo, geom = setup
    smp = topo.sample('gauss', 1)
    x = numpy.asarray(smp.eval(geom, {}))
    mask = x[:, 0] < 1 / 3  # the points of the left column of elements
    sub = smp.subset(mask)
    area = float(numpy.asarray(sub.integrate(function.J(geom), {})))
    assert area == pytest.approx(1 / 3, rel=1e-12)


def test_nodal_basis(setup):
    topo, geom = setup
    smp = topo.sample('bezier', 2)
    b = smp.basis()
    vals = numpy.asarray(smp.eval(function.dotarg('p', b), {'p': numpy.arange(float(smp.npoints))}))
    numpy.testing.assert_allclose(vals, numpy.arange(smp.npoints), atol=1e-12)


def test_asfunction(setup):
    topo, geom = setup
    smp = topo.sample('gauss', 2)
    x = numpy.asarray(smp.eval(geom, {}))
    target = numpy.sin(x[:, 0])
    f = smp.asfunction(target)
    got = numpy.asarray(smp.eval(f, {}))
    numpy.testing.assert_allclose(got, target, atol=1e-12)
    # integrating the sampled function equals integrating the original
    a = float(numpy.asarray(smp.integrate(f * function.J(geom), {})))
    b = float(numpy.asarray(smp.integrate(function.sin(geom[0]) * function.J(geom), {})))
    assert a == pytest.approx(b, rel=1e-12)


def test_zip(setup):
    '''zip pairs samples point-by-point across topologies (reference:
    sample.py:333): integrand mixing functions of both sides.'''
    topo, geom = setup
    topo2, geom2 = mesh.rectilinear([numpy.linspace(0, 1, 7)] * 2, space='Y')
    s1 = topo.boundary['right'].sample('gauss', 2)
    x1 = numpy.asarray(s1.eval(geom, {}))
    s2 = topo2.locate(geom2, x1, tol=1e-10)
    z = s1.zip(s2)
    # f(geom) on side 1 == f(geom2) on side 2 at the zipped points
    d = numpy.asarray(z.eval(geom2[1] - geom[1], {}))
    numpy.testing.assert_allclose(d, 0, atol=1e-9)


def test_bezier_point_counts(setup):
    topo, geom = setup
    for n in (2, 3, 5):
        smp = topo.sample('bezier', n)
        assert smp.npoints == 9 * n * n
