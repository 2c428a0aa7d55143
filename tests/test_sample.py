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


def test_zip_triplet(setup):
    '''Three-way zip across disjoint spaces (reference: test_sample.py Zip
    .test_triplet).'''
    topoY, geomY = mesh.line(numpy.linspace(0, 1, 6), space='Y')
    topoX, geomX = mesh.unitsquare(3, 'square')
    topoZ, geomZ = mesh.line(numpy.linspace(0, 3, 4), space='Z')
    sampleY = topoY.sample('uniform', 3)
    slope = numpy.array([1.0, 0.5])
    y = numpy.asarray(sampleY.eval(geomY, {}))
    sampleX = topoX.locate(geomX, y[:, None] * slope, tol=1e-10)
    sampleZ = topoZ.locate(geomZ, 3 * y, tol=1e-10)
    triplet = sampleY.zip(sampleX, sampleZ)
    gX, gY, gZ = (numpy.asarray(a) for a in triplet.eval([geomX, geomY, geomZ], {}))
    numpy.testing.assert_allclose(gX, gY[:, None] * slope, atol=1e-9)
    numpy.testing.assert_allclose(gY, gZ / 3, atol=1e-9)


def test_zip_nested_integral(setup):
    '''A zipped integral used as the integrand of an outer integral on a third
    space (reference: test_sample.py Zip.test_nested).'''
    from nutils_tpu import function
    topoY, geomY = mesh.line(numpy.linspace(0, 1, 6), space='Y')
    topoX, geomX = mesh.unitsquare(3, 'square')
    sampleY = topoY.sample('uniform', 3)
    slope = numpy.array([1.0, 0.5])
    y = numpy.asarray(sampleY.eval(geomY, {}))
    sampleX = topoX.locate(geomX, y[:, None] * slope, tol=1e-10)
    stitched = sampleY.zip(sampleX)
    topoZ, geomZ = mesh.line(numpy.linspace(0, 2, 3), space='Z')
    inner = stitched.integral((geomZ - geomX) * function.J(geomY))
    outer = topoZ.integral(inner * function.J(geomZ), degree=2)
    # ∫_0^2 dz ∫_0^1 (z - α x) dx = 2 - α  (midpoint quadrature on Y is exact
    # for the linear integrand)
    numpy.testing.assert_allclose(numpy.asarray(function.eval(outer, {})),
                                  2 - slope, atol=1e-9)


def test_zip_weights_from_first(setup):
    '''The first sample of a zip provides the quadrature weights: the zipped
    measure of Y equals |Y| regardless of the X-side element layout.'''
    from nutils_tpu import function
    topoY, geomY = mesh.line(numpy.linspace(0, 1, 6), space='Y')
    topoX, geomX = mesh.unitsquare(3, 'square')
    sampleY = topoY.sample('gauss', 4)
    y = numpy.asarray(sampleY.eval(geomY, {}))
    sampleX = topoX.locate(geomX, numpy.stack([y, 0.5 * y], axis=1), tol=1e-10)
    stitched = sampleY.zip(sampleX)
    total = float(numpy.asarray(stitched.integrate(function.J(geomY), {})))
    assert total == pytest.approx(1.0, rel=1e-10)


def test_zip_reordered_reference_indices():
    '''Points of the second sample landing out of element order (the
    reference's ZipCornerCases.test_reordered_reference_indices, issue #791):
    weights and per-point element membership must survive the reorder.'''
    from nutils_tpu import function
    X, x = mesh.line([1, 5], space='X')
    Y, y = mesh.line([0, 3, 4], space='Y')
    smpl = X.sample('gauss', 6)
    xv = numpy.asarray(smpl.eval(x, {}))
    located = Y.locate(y, xv % 4, tol=1e-10)
    zipped = smpl.zip(located)
    # element indicator on Y: dotting a discont-0 basis with arange gives the
    # per-point element index
    ielem = numpy.asarray(zipped.eval(
        function.dotarg('i', Y.basis('discont', degree=0)),
        {'i': numpy.arange(2.0)}))
    expect = (xv % 4 >= 3).astype(float)  # Y elements: [0,3) -> 0, [3,4] -> 1
    numpy.testing.assert_allclose(ielem, expect, atol=1e-12)
    total = float(numpy.asarray(zipped.integrate(x * function.J(x), {})))
    assert total == pytest.approx(12.0, rel=1e-10)


def test_zip_rejects_shared_space_and_unequal_counts(setup):
    topo, geom = setup
    s1 = topo.sample('gauss', 1)
    with pytest.raises(AssertionError):
        s1.zip(topo.sample('gauss', 1))  # same space
    topoY, geomY = mesh.line(numpy.linspace(0, 1, 3), space='Y')
    with pytest.raises(AssertionError):
        s1.zip(topoY.sample('gauss', 4))  # different point count


def test_concatenate_boundary_groups(setup):
    '''Sample.concatenate chains samples: measures add and evaluation
    concatenates point-wise.'''
    from nutils_tpu import function
    topo, geom = setup
    from nutils_tpu.sample import Sample
    sl = topo.boundary['left'].sample('gauss', 2)
    sr = topo.boundary['right'].sample('gauss', 2)
    both = Sample.concatenate([sl, sr])
    J = function.J(geom)
    total = float(numpy.asarray(both.integrate(J, {})))
    assert total == pytest.approx(2.0, rel=1e-12)
    xs = numpy.asarray(both.eval(geom, {}))
    x1 = numpy.asarray(sl.eval(geom, {}))
    x2 = numpy.asarray(sr.eval(geom, {}))
    numpy.testing.assert_allclose(xs, numpy.concatenate([x1, x2]), atol=1e-14)


def test_uniform_scheme_counts_and_measure(setup):
    topo, geom = setup
    from nutils_tpu import function
    for n in (1, 2, 3):
        smp = topo.sample('uniform', n)
        assert smp.npoints == 9 * n * n
        area = float(numpy.asarray(smp.integrate(function.J(geom), {})))
        assert area == pytest.approx(1.0, rel=1e-12)


def test_eval_multiple_functions_shapes(setup):
    topo, geom = setup
    smp = topo.sample('bezier', 2)
    f1, f2, f3 = smp.eval([geom, (geom ** 2).sum(-1), function.grad(geom[0] * geom[1], geom)], {})
    assert numpy.asarray(f1).shape == (smp.npoints, 2)
    assert numpy.asarray(f2).shape == (smp.npoints,)
    assert numpy.asarray(f3).shape == (smp.npoints, 2)
