'''Public function-layer helpers (reference: function.py symgrad/ngrad/
nsymgrad/dotnorm/tangent/piecewise/partition/chain/broadcast/typecast/
evaluate).'''

import numpy
import pytest

from nutils_tpu import function, mesh


@pytest.fixture(scope='module')
def square():
    return mesh.rectilinear([numpy.linspace(0, 1, 4)] * 2)


def _ev(smp, f):
    return numpy.asarray(smp.eval(f, {}))


def test_symgrad(square):
    topo, geom = square
    u = function.stack([geom[0] * geom[1], geom[0] ** 2], axis=0)
    smp = topo.sample('gauss', 2)
    g = _ev(smp, function.grad(u, geom))
    s = _ev(smp, function.symgrad(u, geom))
    numpy.testing.assert_allclose(s, 0.5 * (g + numpy.swapaxes(g, -1, -2)), atol=1e-13)


def test_ngrad_nsymgrad_dotnorm_tangent(square):
    topo, geom = square
    smp = topo.boundary['right'].sample('gauss', 2)
    f = geom[0] ** 2 * geom[1]
    n = _ev(smp, function.normal(geom))
    numpy.testing.assert_allclose(n, numpy.broadcast_to([1.0, 0.0], n.shape), atol=1e-13)
    g = _ev(smp, function.grad(f, geom))
    numpy.testing.assert_allclose(_ev(smp, function.ngrad(f, geom)),
                                  (g * n).sum(-1), atol=1e-13)
    u = function.stack([f, geom[1]], axis=0)
    sg = _ev(smp, function.symgrad(u, geom))
    numpy.testing.assert_allclose(_ev(smp, function.nsymgrad(u, geom)),
                                  (sg * n[:, None, :]).sum(-1), atol=1e-13)
    numpy.testing.assert_allclose(_ev(smp, function.dotnorm(u, geom)),
                                  (_ev(smp, u) * n).sum(-1), atol=1e-13)
    t = _ev(smp, function.tangent(geom, u))
    numpy.testing.assert_allclose((t * n).sum(-1), 0.0, atol=1e-13)
    numpy.testing.assert_allclose(t + ((_ev(smp, u) * n).sum(-1))[:, None] * n,
                                  _ev(smp, u), atol=1e-13)


def test_piecewise(square):
    topo, geom = square
    smp = topo.sample('uniform', 3)
    x = _ev(smp, geom)
    f = function.piecewise(geom[0], [1 / 3, 2 / 3], 10.0, geom[1], geom[0] ** 2)
    vals = _ev(smp, f)
    expect = numpy.where(x[:, 0] <= 1 / 3, 10.0,
                         numpy.where(x[:, 0] <= 2 / 3, x[:, 1], x[:, 0] ** 2))
    numpy.testing.assert_allclose(vals, expect, atol=1e-13)


def test_partition(square):
    topo, geom = square
    smp = topo.sample('uniform', 3)
    x = _ev(smp, geom)[:, 0]
    parts = function.partition(geom[0], 1 / 3, 2 / 3)
    assert len(parts) == 3
    vals = numpy.stack([_ev(smp, p) for p in parts])
    numpy.testing.assert_allclose(vals.sum(0), 1.0, atol=1e-13)  # partition of unity
    numpy.testing.assert_allclose(vals[0], (x < 1 / 3).astype(float), atol=1e-13)
    numpy.testing.assert_allclose(vals[2], (x > 2 / 3).astype(float), atol=1e-13)


def test_chain(square):
    topo, geom = square
    b1 = topo.basis('std', degree=1)
    b2 = topo.basis('discont', degree=0)
    c1, c2 = function.chain([b1, b2])
    n1, n2 = int(b1.shape[0]), int(b2.shape[0])
    assert int(c1.shape[0]) == int(c2.shape[0]) == n1 + n2
    smp = topo.sample('gauss', 1)
    v1 = _ev(smp, c1)
    v2 = _ev(smp, c2)
    if v1.shape[0] != smp.npoints:
        v1, v2 = v1.T, v2.T
    numpy.testing.assert_allclose(v1[:, n1:], 0.0, atol=1e-14)
    numpy.testing.assert_allclose(v2[:, :n1], 0.0, atol=1e-14)
    numpy.testing.assert_allclose(v1[:, :n1], _ev(smp, b1).T if _ev(smp, b1).shape[0] == n1 else _ev(smp, b1), atol=1e-14)


def test_broadcast_and_typecast(square):
    topo, geom = square
    a = geom  # [2]
    b = function.asarray(numpy.arange(6).reshape(3, 1, 2))
    aa, bb = function.broadcast_arrays(a, b)
    assert tuple(int(n) for n in aa.shape) == (3, 1, 2)
    assert tuple(int(n) for n in bb.shape) == (3, 1, 2)
    smp = topo.sample('gauss', 1)
    va = _ev(smp, aa)          # [P, 3, 1, 2]
    vg = _ev(smp, geom)        # [P, 2]
    numpy.testing.assert_allclose(va, numpy.broadcast_to(vg[:, None, None, :], va.shape), atol=0)
    assert function.broadcast_shapes((3, 1, 2), (2,)) == (3, 1, 2)
    ia, fa = function.typecast_arrays(function.asarray(numpy.arange(3)),
                                      function.asarray(numpy.linspace(0, 1, 3)))
    assert ia.dtype == float and fa.dtype == float
    (ib,) = function.typecast_arrays(function.asarray(numpy.arange(3)))
    assert ib.dtype == int
    (fc,) = function.typecast_arrays(function.asarray(numpy.arange(3)), min_dtype=float)
    assert fc.dtype == float


def test_evaluate():
    a = function.asarray(numpy.arange(3.0))
    u = function.Argument('u', (2,), float)
    va, vu = function.evaluate(a, u * 2, arguments={'u': numpy.array([1.0, 4.0])})
    numpy.testing.assert_allclose(va, [0, 1, 2])
    numpy.testing.assert_allclose(vu, [2, 8])


def test_sign():
    vals, = function.evaluate(function.sign(function.asarray(numpy.array([-2.0, 0.0, 3.5]))))
    numpy.testing.assert_array_equal(vals, [-1.0, 0.0, 1.0])


def test_comparisons_and_where(square):
    topo, geom = square
    smp = topo.sample('uniform', 2)
    x = _ev(smp, geom)
    for expr, ref in [(geom[0] > 0.5, x[:, 0] > 0.5),
                      (geom[0] < geom[1], x[:, 0] < x[:, 1]),
                      (geom[0] >= 2 / 3, x[:, 0] >= 2 / 3),
                      (geom[0] <= 1 / 3, x[:, 0] <= 1 / 3),
                      (function.equal(geom[0], geom[1]), x[:, 0] == x[:, 1]),
                      (function.not_equal(geom[0], geom[1]), x[:, 0] != x[:, 1]),
                      (numpy.logical_and(geom[0] > .2, geom[1] > .2), (x[:, 0] > .2) & (x[:, 1] > .2)),
                      (numpy.logical_or(geom[0] > .8, geom[1] > .8), (x[:, 0] > .8) | (x[:, 1] > .8)),
                      (numpy.logical_not(geom[0] > .5), ~(x[:, 0] > .5))]:
        got = _ev(smp, expr)
        assert got.dtype == bool
        numpy.testing.assert_array_equal(got, ref)
    w = _ev(smp, numpy.where(geom[0] > 0.5, geom[1], -1.0))
    numpy.testing.assert_allclose(w, numpy.where(x[:, 0] > 0.5, x[:, 1], -1.0), atol=1e-15)
    # identity-based __eq__ keeps Arrays hashable and container-friendly
    assert geom == geom and hash(geom) == hash(geom)
    assert geom in [geom]


def test_einsum(square):
    topo, geom = square
    smp = topo.sample('gauss', 2)
    x = _ev(smp, geom)
    rng = numpy.random.default_rng(0)
    A = rng.standard_normal((2, 3))
    B = rng.standard_normal((3, 4))
    got = numpy.asarray(function.eval(numpy.einsum('ij,jk->ik', function.asarray(A), function.asarray(B)), {}))
    numpy.testing.assert_allclose(got, A @ B, atol=1e-13)
    # implicit output, transpose output, contraction with a spatial field
    got = numpy.asarray(function.eval(numpy.einsum('ij,kj->ki', function.asarray(A), function.asarray(numpy.ones((5, 3)))), {}))
    numpy.testing.assert_allclose(got, numpy.einsum('ij,kj->ki', A, numpy.ones((5, 3))), atol=1e-13)
    e = numpy.einsum('i,i->', geom, geom)
    numpy.testing.assert_allclose(_ev(smp, e), (x * x).sum(-1), atol=1e-13)
    g = function.grad(function.stack([geom[0] * geom[1], geom[1] ** 2], axis=0), geom)
    got = _ev(smp, numpy.einsum('ij,j->i', g, geom))
    ref = numpy.einsum('pij,pj->pi', _ev(smp, g), x)
    numpy.testing.assert_allclose(got, ref, atol=1e-13)
    with pytest.raises(NotImplementedError):
        function.einsum('ii->', function.asarray(numpy.eye(3)))
    with pytest.raises(ValueError):
        function.einsum('ij,jk->ik', function.asarray(A))


def test_choose(square):
    topo, geom = square
    smp = topo.sample('uniform', 2)
    x = _ev(smp, geom)
    idx = function.piecewise(geom[0], [1 / 3, 2 / 3], 0, 1, 2)
    ch = function.choose(function._cast(idx, int), [geom[1], 10.0, -geom[0]])
    got = _ev(smp, ch)
    bins = numpy.digitize(x[:, 0], [1 / 3, 2 / 3])
    ref = numpy.select([bins == 0, bins == 1, bins == 2], [x[:, 1], numpy.full(len(x), 10.0), -x[:, 0]])
    numpy.testing.assert_allclose(got, ref, atol=1e-13)


def test_prod(square):
    topo, geom = square
    smp = topo.sample('gauss', 2)
    x = _ev(smp, geom)
    numpy.testing.assert_allclose(_ev(smp, numpy.prod(geom, axis=-1)),
                                  x.prod(-1), atol=1e-14)
    A = function.asarray(numpy.arange(1.0, 7.0).reshape(2, 3))
    got = numpy.asarray(function.eval(A.prod(0), {}))
    numpy.testing.assert_allclose(got, [4.0, 10.0, 18.0])
