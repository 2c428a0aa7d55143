'''Topology/sample/geometry tests (mirrors reference tests/test_topology.py
essentials: measures, divergence theorem, basis partition of unity).'''

import numpy
import pytest

from nutils_tpu import function, mesh


@pytest.fixture(scope='module')
def square():
    return mesh.unitsquare(4, 'square')


def test_area(square):
    topo, geom = square
    area = topo.integral(function.J(geom), degree=2).eval()
    assert float(area) == pytest.approx(1.0)


def test_perimeter(square):
    topo, geom = square
    length = topo.boundary.integral(function.J(geom), degree=2).eval()
    assert float(length) == pytest.approx(4.0)


def test_divergence_theorem(square):
    topo, geom = square
    n = function.normal(geom)
    J = function.J(geom)
    # int_bnd x.n dS = div(x) * area = 2
    out = topo.boundary.integral((geom @ n) * J, degree=2).eval()
    assert float(out) == pytest.approx(2.0)
    # int_bnd n dS = 0
    out2 = topo.boundary.integral(n * J, degree=2).eval()
    numpy.testing.assert_allclose(out2, 0, atol=1e-12)


def test_boundary_groups(square):
    topo, geom = square
    J = function.J(geom)
    for name, (coord, value) in {'left': (0, 0.0), 'right': (0, 1.0), 'bottom': (1, 0.0), 'top': (1, 1.0)}.items():
        side = topo.boundary[name]
        length = side.integral(J, degree=1).eval()
        assert float(length) == pytest.approx(1.0), name
        x = side.sample('bezier', 2).eval(geom)
        numpy.testing.assert_allclose(numpy.asarray(x)[:, coord], value, atol=1e-12)


@pytest.mark.parametrize('btype,degree', [('std', 1), ('std', 2), ('spline', 2), ('spline', 3)])
def test_basis_pou(square, btype, degree):
    topo, geom = square
    basis = topo.basis(btype, degree)
    vals = topo.sample('bezier', 4).eval(function.sum_(basis, 0))
    numpy.testing.assert_allclose(numpy.asarray(vals), 1.0, rtol=1e-11)


def test_basis_ndofs(square):
    topo, _ = square
    assert topo.basis('std', 1).shape == (25,)
    assert topo.basis('std', 2).shape == (81,)
    assert topo.basis('spline', 2).shape == (36,)
    assert topo.basis('discont', 1).shape == (64,)


def test_field_gradient(square):
    topo, geom = square
    u = topo.field('u', btype='std', degree=1)
    xs = numpy.arange(5) / 4
    coef = (2 * xs[:, None] + 3 * xs[None, :]).ravel()  # u = 2x + 3y
    g = topo.sample('bezier', 2).eval(function.grad(u, geom), {'u': coef})
    numpy.testing.assert_allclose(numpy.asarray(g), numpy.broadcast_to([2.0, 3.0], numpy.asarray(g).shape), rtol=1e-11)


def test_periodic_basis():
    topo, geom = mesh.rectilinear([4], periodic=(0,))
    basis = topo.basis('spline', 2)
    assert basis.shape == (4,)
    vals = topo.sample('bezier', 3).eval(function.sum_(basis, 0))
    numpy.testing.assert_allclose(numpy.asarray(vals), 1.0, rtol=1e-11)


def test_rectilinear_verts():
    topo, geom = mesh.rectilinear([[0.0, 1.0, 3.0, 6.0]])
    length = topo.integral(function.J(geom), degree=2).eval()
    assert float(length) == pytest.approx(6.0)
    x = topo.sample('bezier', 2).eval(geom)
    numpy.testing.assert_allclose(numpy.asarray(x).ravel(), [0, 1, 1, 3, 3, 6], atol=1e-12)


def test_bezier_tri_hull(square):
    topo, geom = square
    bez = topo.sample('bezier', 3)
    assert bez.tri.shape == (16 * 8, 3)
    assert bez.hull.shape == (16 * 8, 2)
    x = numpy.asarray(bez.eval(geom))
    assert x.shape == (16 * 9, 2)


def test_gmsh_import(tmp_path):
    from nutils_tpu import mesh, function
    import numpy
    msh = '''$MeshFormat
2.2 0 8
$EndMeshFormat
$PhysicalNames
3
1 1 "bottom"
1 2 "top"
2 3 "interior"
$EndPhysicalNames
$Nodes
4
1 0 0 0
2 1 0 0
3 0 1 0
4 1 1 0
$EndNodes
$Elements
4
1 1 2 1 10 1 2
2 1 2 2 11 3 4
3 2 2 3 12 1 2 3
4 2 2 3 12 2 3 4
$EndElements
'''
    p = tmp_path / 'square.msh'
    p.write_text(msh)
    topo, geom = mesh.gmsh(str(p))
    assert len(topo) == 2
    area = float(numpy.asarray(topo.integral(function.J(geom), degree=2).eval()))
    assert abs(area - 1) < 1e-12
    blen = float(numpy.asarray(topo.boundary['bottom'].sample('gauss', 2).integral(function.J(geom)).eval()))
    assert abs(blen - 1) < 1e-12


def test_sample_asfunction_basis():
    from nutils_tpu import mesh, function
    import numpy
    topo, geom = mesh.rectilinear([2, 2])
    s = topo.sample('gauss', 1)
    v = numpy.arange(s.npoints, dtype=float)
    assert numpy.abs(numpy.asarray(s.eval(s.asfunction(v))) - v).max() < 1e-14
    b = s.basis()
    assert numpy.abs(numpy.asarray(s.eval(function.matmul(b, function.asarray(v)))) - v).max() < 1e-14


def test_cache_function(tmp_path):
    from nutils_tpu import cache
    calls = []

    @cache.function
    def f(x):
        calls.append(x)
        return x * 2
    with cache.enable(str(tmp_path)):
        assert f(3) == 6 and f(3) == 6
    assert len(calls) == 1
    assert f(3) == 6 and len(calls) == 2  # disabled outside the context


def test_locate_newton_curved():
    from nutils_tpu import mesh
    import numpy
    topo, geom = mesh.unitcircle(4, 'rectilinear')
    pts = numpy.array([[0.0, 0.0], [0.3, 0.2], [-0.5, 0.5], [0.9, 0.0]])
    smp = topo.locate(geom, pts, tol=1e-12)
    got = numpy.asarray(smp.eval(geom))
    assert numpy.abs(got - pts).max() < 1e-10
    smp2 = topo.locate(geom, numpy.array([[0.0, 0.0], [2.0, 2.0]]), tol=1e-10,
                       skip_missing=True, maxdist=0.1)
    assert smp2.nelems == 1


def test_sample_zip():
    '''Sample.zip pairs aligned samples on disjoint spaces (reference:
    sample.py:333 doctest): evaluation works across spaces, integrals use the
    first sample's weights.'''
    from nutils_tpu import mesh, function
    topo1, geom1 = mesh.line([0, .5, 1], space='ZX')
    topo2, geom2 = mesh.line([0, .2, 1], space='ZY')
    sample1 = topo1.sample('uniform', 3)
    sample2 = topo2.locate(geom2, numpy.asarray(sample1.eval(geom1)), tol=1e-10)
    zipped = sample1.zip(sample2)
    assert float(numpy.linalg.norm(zipped.eval(function.subtract(geom1, geom2)))) < 1e-10
    numpy.testing.assert_allclose(float(zipped.integrate(function.J(geom1))), 1.0, rtol=1e-12)
    numpy.testing.assert_allclose(float(zipped.integrate(function.J(geom2))), 1.4, rtol=1e-12)


def test_structured_slicing():
    '''Sub-grid slicing shares the parent root chart (reference:
    topology.py:1982 StructuredTopology.__getitem__).'''
    from nutils_tpu import mesh, function
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 5)] * 2)
    sub = topo[1:-1, :2]
    assert len(sub) == 4
    # parent geometry/basis evaluate on the slice's samples
    area = float(sub.integral(function.J(geom), degree=2).eval())
    numpy.testing.assert_allclose(area, 2 / 4 * 2 / 4)
    u = topo.field('u', btype='std', degree=1)
    val = float(sub.integral(function.multiply(u, function.J(geom)), degree=2).eval(
        u=numpy.ones(25)))
    numpy.testing.assert_allclose(val, area, rtol=1e-12)


def test_masked_basis_on_slice():
    '''removedofs (MaskedBasis) evaluation on sliced-topology samples must
    resolve elements through the parent's root-coordinate lookup (regression:
    the coil example evaluated garbage on RZ[:-1,:-1] slices).'''
    from nutils_tpu import mesh, function
    n = 6
    topo, xy = mesh.rectilinear([n, n], space='S')
    b = topo.basis('spline', degree=2, removedofs=[[-1], [-1]])
    nk = n + 2 - 1
    coef = (numpy.arange(nk * nk, dtype=float) % 7 + 1)
    f = function.matmul(b, function.asarray(coef))
    full = topo.sample('uniform', 2)
    xv = numpy.asarray(full.eval(xy))
    fv_full = numpy.asarray(full.eval(f))
    smp = topo[1:5, 2:5].sample('uniform', 2)
    xs = numpy.asarray(smp.eval(xy))
    fv = numpy.asarray(smp.eval(f))
    # match each sliced point against the identical full-topology point
    lookup = {tuple(numpy.round(p, 9)): v for p, v in zip(xv, fv_full)}
    for p, v in zip(xs, fv):
        numpy.testing.assert_allclose(v, lookup[tuple(numpy.round(p, 9))], atol=1e-12)


def test_gmsh_v41_subdomains(tmp_path):
    '''msh 4.1 import with physical volume groups: topo[name] is a subset
    topology whose samples evaluate full-mesh fields (reference: mesh.py:461
    gmsh with pgroups/vgroups).'''
    from nutils_tpu import mesh, function
    msh = '''$MeshFormat
4.1 0 8
$EndMeshFormat
$PhysicalNames
3
1 1 "bottom"
2 2 "left"
2 3 "right"
$EndPhysicalNames
$Entities
0 1 2 0
1 0 0 0 1 0 0 1 1 0
1 0 0 0 1 1 0 1 2 0
2 0 0 0 1 1 0 1 3 0
$EndEntities
$Nodes
1 4 1 4
1 1 0 4
1
2
3
4
0 0 0
1 0 0
0 1 0
1 1 0
$EndNodes
$Elements
3 3 1 3
1 1 1 1
1 1 2
2 1 2 1
2 1 2 3
2 2 2 1
3 2 3 4
$EndElements
'''
    p = tmp_path / 'square41.msh'
    p.write_text(msh)
    topo, geom = mesh.gmsh(str(p))
    assert len(topo) == 2
    total = float(numpy.asarray(topo.integral(function.J(geom), degree=2).eval()))
    numpy.testing.assert_allclose(total, 1.0, rtol=1e-12)
    a_left = float(numpy.asarray(topo['left'].integral(function.J(geom), degree=2).eval()))
    a_right = float(numpy.asarray(topo['right'].integral(function.J(geom), degree=2).eval()))
    numpy.testing.assert_allclose([a_left, a_right], [.5, .5], rtol=1e-12)
    u = topo.field('u', btype='std', degree=1)
    val = float(topo['left'].integral(u * function.J(geom), degree=2).eval(u=numpy.ones(4)))
    numpy.testing.assert_allclose(val, a_left, rtol=1e-12)


def test_project_ptypes():
    '''project ptype lsqr/convolute/nodal semantics (reference topology.py:448):
    lsqr and nodal reproduce a linear function exactly on a std degree-1
    basis; convolute is the diagonal Riesz approximation, exact at interior
    (symmetric-support) nodes with h/3-per-dimension skew at the boundary.'''
    from nutils_tpu import mesh
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 4)] * 2)
    basis = topo.basis('std', degree=1)
    fun = geom[0] + 2 * geom[1]
    exact = numpy.array([i / 3 + 2 * j / 3 for i in range(4) for j in range(4)])
    for ptype, tol in (('lsqr', 1e-12), ('nodal', 1e-12)):
        v = topo.project(fun, basis, geom, degree=4, ptype=ptype)
        assert not numpy.isnan(v).any()
        numpy.testing.assert_allclose(v, exact, atol=tol)
    v = topo.project(fun, basis, geom, degree=4, ptype='convolute')
    h = 1 / 3
    interior = numpy.array([0 < i < 3 and 0 < j < 3 for i in range(4) for j in range(4)])
    numpy.testing.assert_allclose(v[interior], exact[interior], atol=1e-12)
    # corner skew: +h/3 per clamped dimension (f increases into the domain)
    assert v[0] == pytest.approx(h / 3 + 2 * h / 3, abs=1e-12)
    with pytest.raises(ValueError):
        topo.project(fun, basis, geom, degree=2, ptype='bogus')
    # verify= count assertion and exact_boundaries consistency
    topo.project(fun, basis, geom, degree=4, verify=16)
    v2 = topo.project(fun, basis, geom, degree=4, exact_boundaries=True)
    numpy.testing.assert_allclose(v2, exact, atol=1e-12)


def test_integrate_elementwise_asfunction():
    '''asfunction=True returns the piecewise-constant per-element integral
    (reference: topology.py:420).'''
    from nutils_tpu import mesh
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 3)] * 2)
    J = function.J(geom)
    areas = topo.integrate_elementwise(J, degree=2)
    numpy.testing.assert_allclose(areas, 0.25, atol=1e-12)
    f = topo.integrate_elementwise(J, degree=2, asfunction=True)
    smp = topo.sample('gauss', 1)
    vals = numpy.asarray(smp.eval(f, {}))
    numpy.testing.assert_allclose(vals, 0.25, atol=1e-12)
    # vector integrand
    fv = topo.integrate_elementwise(geom * J, degree=2, asfunction=True)
    got = numpy.asarray(smp.eval(fv, {}))
    want = numpy.asarray(smp.eval(geom, {})) * 0.25  # centroid * area
    numpy.testing.assert_allclose(got, want, atol=1e-12)
