'''Function-layer vector calculus identities and API surface (scope model:
reference tests/test_function.py): gradient rules, divergence/curl
identities, surface calculus on a circle, jump/mean on interfaces,
replace_arguments/linearize/dotarg/kronecker behavior.'''

import numpy
import pytest

from nutils_tpu import function, mesh


@pytest.fixture(scope='module')
def disk():
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 5)] * 2)
    return topo, geom


def _ev(smp, func, args=None):
    return numpy.asarray(smp.eval(func, args or {}))


def test_grad_product_rule(disk):
    topo, geom = disk
    x, y = geom
    f = function.sin(x) * y
    g = function.cos(y) + x ** 2
    smp = topo.sample('gauss', 3)
    lhs = _ev(smp, function.grad(f * g, geom))
    rhs = _ev(smp, function.grad(f, geom) * g + f * function.grad(g, geom))
    numpy.testing.assert_allclose(lhs, rhs, rtol=1e-10, atol=1e-12)


def test_grad_chain_rule(disk):
    topo, geom = disk
    f = (geom ** 2).sum(-1) + 0.5
    smp = topo.sample('gauss', 3)
    lhs = _ev(smp, function.grad(function.ln(f), geom))
    rhs = _ev(smp, function.grad(f, geom) / f)
    numpy.testing.assert_allclose(lhs, rhs, rtol=1e-10, atol=1e-12)


def test_div_curl_laplace(disk):
    topo, geom = disk
    x, y = geom
    v = function.stack([x * y ** 2, function.sin(x)])
    smp = topo.sample('gauss', 4)
    div = _ev(smp, function.div(v, geom))
    pts = _ev(smp, geom)
    numpy.testing.assert_allclose(div, pts[:, 1] ** 2, rtol=1e-10, atol=1e-12)
    curl = _ev(smp, function.curl2(v, geom)) if hasattr(function, 'curl2') else None
    lap = _ev(smp, function.laplace((geom ** 2).sum(-1), geom))
    numpy.testing.assert_allclose(lap, 4, rtol=1e-10)
    # div(curl-free gradient field) == laplace
    lap2 = _ev(smp, function.div(function.grad((geom ** 2).sum(-1), geom), geom))
    numpy.testing.assert_allclose(lap2, 4, rtol=1e-10)


def test_normal_and_jacobian_boundary(disk):
    topo, geom = disk
    smp = topo.boundary['right'].sample('gauss', 2)
    n = _ev(smp, function.normal(geom))
    numpy.testing.assert_allclose(n, numpy.broadcast_to([1.0, 0.0], n.shape), atol=1e-12)
    length = float(numpy.asarray(smp.integrate(function.J(geom), {})))
    assert length == pytest.approx(1.0, rel=1e-12)


def test_surfgrad_curvature_circle():
    '''On a circle of radius R: surface gradient of a tangential-harmonic
    function and curvature = 1/R (reference: function.py:2253,2272).'''
    topo, geom0 = mesh.rectilinear([numpy.linspace(0, 1, 9)] * 2)
    R = 0.75
    # map the unit square to a disk-ish annulus; use the boundary of the
    # unit circle topology instead for a clean circle
    topo2, geom = mesh.unitcircle(4, 'rectilinear')
    circ = topo2.boundary
    smp = circ.sample('gauss', 4)
    k = _ev(smp, function.curvature(geom))
    numpy.testing.assert_allclose(k, 1.0, rtol=1e-3)
    perim = float(numpy.asarray(smp.integrate(function.J(geom), {})))
    assert perim == pytest.approx(2 * numpy.pi, rel=1e-4)


def test_jump_mean_interfaces(disk):
    topo, geom = disk
    iface = topo.interfaces
    smp = iface.sample('gauss', 2)
    f = (geom ** 2).sum(-1)
    # continuous function: zero jump, mean equals value
    jump = _ev(smp, function.jump(f))
    numpy.testing.assert_allclose(jump, 0, atol=1e-12)
    mean = _ev(smp, function.mean(f))
    vals = _ev(smp, f)
    numpy.testing.assert_allclose(mean, vals, atol=1e-12)
    # sign convention jump = opposite - self (reference: function.py:1619)
    # with opposite(n) = -n gives jump(n) = -2n
    njump = _ev(smp, function.jump(function.normal(geom)))
    n = _ev(smp, function.normal(geom))
    numpy.testing.assert_allclose(njump, -2 * n, atol=1e-12)


def test_dotarg_replace_arguments(disk):
    topo, geom = disk
    basis = topo.basis('std', degree=1)
    u = function.dotarg('u', basis)
    v = function.replace_arguments(u, 'u:v')
    args = {'u': numpy.arange(25.0), 'v': numpy.arange(25.0)[::-1].copy()}
    smp = topo.sample('bezier', 2)
    uu = _ev(smp, u, args)
    vv = _ev(smp, v, args)
    w = _ev(smp, function.dotarg('v', basis), args)
    numpy.testing.assert_allclose(vv, w, atol=1e-14)
    assert not numpy.allclose(uu, vv)


def test_linearize(disk):
    topo, geom = disk
    basis = topo.basis('std', degree=1)
    u = function.dotarg('u', basis)
    e = u ** 3
    lin = function.linearize(e, 'u:du')
    rng = numpy.random.RandomState(0)
    u0 = rng.rand(25)
    du = rng.rand(25)
    smp = topo.sample('gauss', 3)
    got = _ev(smp, lin, {'u': u0, 'du': du})
    u0v = _ev(smp, u, {'u': u0})
    duv = _ev(smp, u, {'u': du})
    numpy.testing.assert_allclose(got, 3 * u0v ** 2 * duv, rtol=1e-10)


def test_derivative_matches_fd(disk):
    topo, geom = disk
    basis = topo.basis('std', degree=1)
    u = function.dotarg('u', basis)
    J = function.J(geom)
    energy = topo.integral((function.grad(u, geom) @ function.grad(u, geom) / 2 + u ** 4) * J, degree=4)
    de = function.derivative(energy, 'u')
    rng = numpy.random.RandomState(1)
    u0 = rng.rand(25)
    got = numpy.asarray(function.eval(de, {'u': u0}))
    eps = 1e-7
    fd = numpy.empty(25)
    for i in range(25):
        up, um = u0.copy(), u0.copy()
        up[i] += eps
        um[i] -= eps
        fd[i] = (float(numpy.asarray(function.eval(energy, {'u': up})))
                 - float(numpy.asarray(function.eval(energy, {'u': um})))) / (2 * eps)
    numpy.testing.assert_allclose(got, fd, rtol=1e-5, atol=1e-8)


def test_kronecker_eye_stack(disk):
    topo, geom = disk
    smp = topo.sample('gauss', 1)
    e = function.eye(3)
    numpy.testing.assert_allclose(_ev(smp, e[0]), numpy.broadcast_to([1, 0, 0], (smp.npoints, 3)), atol=1e-14)
    s = function.stack([geom[0], geom[1], geom[0] + geom[1]])
    sv = _ev(smp, s)
    numpy.testing.assert_allclose(sv[:, 2], sv[:, 0] + sv[:, 1], atol=1e-14)


def test_numpy_protocol_ops(disk):
    topo, geom = disk
    smp = topo.sample('gauss', 2)
    x = geom[0] + 0.5
    pairs = [
        (numpy.sin(x), numpy.sin),
        (numpy.exp(x), numpy.exp),
        (numpy.sqrt(x), numpy.sqrt),
        (numpy.maximum(geom[0], geom[1]), None),
        (abs(geom[0] - geom[1]), None),
    ]
    xv = _ev(smp, x)
    for fn_arr, np_fn in pairs[:3]:
        numpy.testing.assert_allclose(_ev(smp, fn_arr), np_fn(xv), rtol=1e-12)
    g = _ev(smp, geom)
    numpy.testing.assert_allclose(_ev(smp, pairs[3][0]), numpy.maximum(g[:, 0], g[:, 1]), atol=1e-14)
    numpy.testing.assert_allclose(_ev(smp, pairs[4][0]), numpy.abs(g[:, 0] - g[:, 1]), atol=1e-14)
