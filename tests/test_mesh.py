'''Gmsh import against committed fixture files (reference scope model:
tests/test_mesh.py with tests/test_mesh/*.msh fixtures): msh2.2 and msh4.1,
2-D and 3-D, linear and quadratic (isoparametric) geometry.'''

import os

import numpy
import pytest

from nutils_tpu import function, mesh

FIXTURES = os.path.join(os.path.dirname(__file__), 'test_mesh')


def _load(name):
    return mesh.gmsh(os.path.join(FIXTURES, name))


def _area(topo, geom, degree=2):
    return float(numpy.asarray(topo.sample('gauss', degree).integrate(function.J(geom), {})))


def test_square_p1():
    topo, geom = _load('square_p1.msh')
    assert len(topo) == 4
    assert _area(topo, geom) == pytest.approx(1.0, rel=1e-12)
    for name in ('bottom', 'right', 'top', 'left'):
        assert _area(topo.boundary[name], geom) == pytest.approx(1.0, rel=1e-12)
    assert _area(topo['interior'], geom) == pytest.approx(1.0, rel=1e-12)


def test_square_v41():
    topo, geom = _load('square_v41.msh')
    assert len(topo) == 4
    assert _area(topo, geom) == pytest.approx(1.0, rel=1e-12)
    assert _area(topo.boundary['bottom'], geom) == pytest.approx(1.0, rel=1e-12)


def test_cube_p1():
    topo, geom = _load('cube_p1.msh')
    assert len(topo) == 6
    assert _area(topo, geom) == pytest.approx(1.0, rel=1e-12)
    assert _area(topo.boundary['bottom'], geom) == pytest.approx(1.0, rel=1e-12)
    assert _area(topo.boundary['top'], geom) == pytest.approx(1.0, rel=1e-12)
    # divergence theorem on the cube: ∮ x·n dS = 3 |V|
    smp = topo.boundary.sample('gauss', 2)
    flux = float(numpy.asarray(smp.integrate(
        (geom * function.normal(geom)).sum(-1) * function.J(geom), {})))
    assert flux == pytest.approx(3.0, rel=1e-12)


def test_curved_p2_isoparametric():
    '''Quadratic geometry: single triangle with the hypotenuse midside node
    bulged outward by s along the diagonal; the curved edge is the parabola
    through its three nodes, adding the parabolic-segment area (2/3)·L·h
    = 4s/3 to the straight-triangle area 1/2.'''
    topo, geom = _load('curved_p2.msh')
    s = 0.15
    assert len(topo) == 1
    area = _area(topo, geom, degree=4)
    assert area == pytest.approx(0.5 + 4 * s / 3, rel=1e-12)
    # corner vertices are reproduced exactly by the p2 geometry
    smp = topo.sample('bezier', 2)
    x = numpy.asarray(smp.eval(geom, {}))
    want = {(0.0, 0.0), (1.0, 0.0), (0.0, 1.0)}
    got = {tuple(numpy.round(p, 12)) for p in x}
    assert want <= got


def test_laplace_on_gmsh_mesh():
    '''End-to-end: Poisson with Dirichlet boundary on the fixture square.'''
    from nutils_tpu import solver
    topo, geom = _load('square_p1.msh')
    basis = topo.basis('std', degree=1)
    u = function.dotarg('u', basis)
    v = function.replace_arguments(u, 'u:v')
    J = function.J(geom)
    res = topo.integral((function.grad(v, geom) @ function.grad(u, geom) - v) * J, degree=2)
    sqr = topo.boundary.integral(u ** 2 * J, degree=2)
    cons = solver.optimize('u', sqr, droptol=1e-12)
    args = solver.System(res, trial='u', test='v').solve(constrain={'u': cons})
    uv = numpy.asarray(args['u'])
    # only the center node is free; - Δu = 1 symmetric problem: u(center) > 0
    free = numpy.isnan(cons)
    assert free.sum() == 1 and uv[free][0] > 0


def test_unsupported_element_type():
    import tempfile
    msh = '''$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
4
1 0 0 0
2 1 0 0
3 1 1 0
4 0 1 0
$EndNodes
$Elements
1
1 3 2 0 0 1 2 3 4
$EndElements
'''
    with pytest.raises(ValueError, match='unsupported gmsh element type'):
        mesh.parsegmsh(msh)
