'''Multi-space tensor-product topologies (reference model: the tensorial
TestCase families in tests/test_topology.py and the space-time / revolved
patterns of examples/coil.py): product measure, nested integrals, product
fields, product boundaries, and product samples with triangulation.'''

import numpy
import pytest

from nutils_tpu import function, mesh
from nutils_tpu.expression import Namespace


@pytest.fixture(scope='module')
def prod():
    X, x = mesh.line(numpy.linspace(0, 2, 5), space='X')
    Y, y = mesh.line(numpy.linspace(0, 3, 4), space='Y')
    return X, x, Y, y


def test_product_measure(prod):
    X, x, Y, y = prod
    topo = X * Y
    geom = function.stack([x, y])
    area = topo.integrate(function.J(geom), degree=2)
    numpy.testing.assert_allclose(float(area), 6.0, rtol=1e-12)


def test_nested_integrals_match_product(prod):
    X, x, Y, y = prod
    topo = X * Y
    geom = function.stack([x, y])
    f = x ** 2 * y
    direct = topo.integral(f * function.J(geom), degree=4)
    nested = X.integral(Y.integral(f * function.J(y), degree=4) * function.J(x), degree=4)
    va = float(function.eval([direct], {})[0])
    vb = float(function.eval([nested], {})[0])
    numpy.testing.assert_allclose(va, vb, rtol=1e-12)
    numpy.testing.assert_allclose(va, (8.0 / 3.0) * 4.5, rtol=1e-12)


def test_product_field_solves(prod):
    X, x, Y, y = prod
    topo = X * Y
    geom = function.stack([x, y])
    u = topo.field('u', btype='std', degree=1)
    # the product field spans the bilinear space: project a bilinear function
    # exactly
    target = (1 + x) * (2 - y)
    from nutils_tpu import solver
    v = function.replace_arguments(u, 'u:v')
    res = topo.integral((u - target) * v * function.J(geom), degree=4)
    args = solver.System(res, trial='u', test='v').solve()
    err = topo.integral((u - target) ** 2 * function.J(geom), degree=4)
    numpy.testing.assert_allclose(float(function.eval([err], args)[0]), 0, atol=1e-20)


def test_product_boundary_measure(prod):
    X, x, Y, y = prod
    topo = X * Y
    geom = function.stack([x, y])
    per = topo.boundary.integrate(function.J(geom), degree=2)
    numpy.testing.assert_allclose(float(per), 2 * (2.0 + 3.0), rtol=1e-12)


def test_product_sample_eval_and_tri(prod):
    X, x, Y, y = prod
    topo = X * Y
    geom = function.stack([x, y])
    smp = topo.sample('bezier', 3)
    pts = numpy.asarray(smp.eval(geom, {}))
    assert pts.shape[1] == 2
    assert pts[:, 0].min() == pytest.approx(0) and pts[:, 0].max() == pytest.approx(2)
    tri = smp.tri
    # triangulated area covers the rectangle
    a = pts[tri[:, 0]]
    b = pts[tri[:, 1]]
    c = pts[tri[:, 2]]
    area = 0.5 * numpy.abs(numpy.cross(b - a, c - a)).sum()
    numpy.testing.assert_allclose(area, 6.0, rtol=1e-12)


def test_sample_times_sample(prod):
    X, x, Y, y = prod
    s1 = X.sample('gauss', 2)
    s2 = Y.sample('gauss', 2)
    smp = s1 * s2
    total = smp.integrate(x * function.J(x) * function.J(y))
    numpy.testing.assert_allclose(float(total), 2.0 * 3.0, rtol=1e-12)


def test_three_way_product():
    T, t = mesh.line(numpy.linspace(0, 1, 3), space='T')
    X, x = mesh.line(numpy.linspace(0, 1, 3), space='X')
    Y, y = mesh.line(numpy.linspace(0, 1, 3), space='Y')
    topo = T * (X * Y)
    geom = function.stack([t, x, y])
    vol = topo.integrate(function.J(geom), degree=2)
    numpy.testing.assert_allclose(float(vol), 1.0, rtol=1e-12)


def test_product_requires_disjoint_spaces(prod):
    X, x, Y, y = prod
    with pytest.raises(AssertionError):
        X * X


def test_spacetime_heat_equation():
    '''space-time formulation on a product topology: solve u_t = u_xx with
    a one-shot space-time variational problem (the space-time pattern the
    multi-space machinery exists for).'''
    T, t = mesh.line(numpy.linspace(0, 0.1, 4), space='T')
    X, x = mesh.line(numpy.linspace(0, numpy.pi, 9), space='X')
    topo = T * X
    from nutils_tpu import solver
    u = topo.field('u', btype='std', degree=(1, 2))
    v = function.replace_arguments(u, 'u:v')
    J = function.J(t) * function.J(x)
    dudt = function.derivative(u, 'dummy') if False else None
    geom = function.stack([t, x])
    gu = function.grad(u, geom)   # [2]: (u_t, u_x)
    gv = function.grad(v, geom)
    res = topo.integral((v * gu[0] + gv[1] * gu[1]) * J, degree=4)
    # product boundary part names: first factor's parts keep their names,
    # clashing second-factor parts get a prime ("left'" = x boundary)
    assert set(topo.boundary.parts) == {'left', 'right', "left'", "right'"}
    # dirichlet: u=0 at x=0, x=pi; initial: u=sin(x) at t=0 ('left' in T)
    consx = solver.System(topo.boundary["left'"].integral(u ** 2 * function.J(t), degree=4)
                          + topo.boundary["right'"].integral(u ** 2 * function.J(t), degree=4),
                          trial='u').solve_constraints(droptol=1e-12)
    cons0 = solver.System(topo.boundary['left'].integral((u - function.sin(x)) ** 2 * function.J(x),
                                                         degree=6), trial='u').solve_constraints(droptol=1e-12)
    cu, c0 = consx['u'], cons0['u']
    # merge: initial condition wins at t=0 face; but both vanish at corners
    merged = numpy.where(numpy.isnan(cu), c0, cu)
    args = solver.System(res, trial='u', test='v').solve(constrain={'u': merged})
    # exact solution u = exp(-t) sin(x); bilinear-in-t so expect small error
    err = topo.integral((u - function.exp(-t) * function.sin(x)) ** 2 * J, degree=6)
    e = float(function.eval([err], args)[0]) ** 0.5
    assert e < 5e-4, e
