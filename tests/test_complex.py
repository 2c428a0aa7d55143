'''Complex-number support: split real/imag representation at the function
layer, complex arguments backed by real (..., 2) arrays, and the solver's
Re(res)-stationarity reduction of complex-linear systems (the reference
supports a complex dtype throughout, exercised by examples/coil.py).'''

import numpy
import pytest

from nutils_tpu import function, mesh
from nutils_tpu.expression import Namespace
from nutils_tpu.solver import System


def test_complex_arithmetic():
    z = function.asarray(1 + 2j)
    w = function.asarray(3 - 1j)
    got = function.eval([z * w, z + w, z / w, z ** 2, -z, z.conjugate(),
                         abs(z), function.real(z), function.imag(z), function.exp(z)])
    zz, ww = 1 + 2j, 3 - 1j
    expect = [zz * ww, zz + ww, zz / ww, zz ** 2, -zz, zz.conjugate(),
              abs(zz), zz.real, zz.imag, numpy.exp(zz)]
    for g, e in zip(got, expect):
        numpy.testing.assert_allclose(g, e, rtol=1e-12, err_msg=str(e))


def test_complex_real_mixing():
    x = function.asarray(numpy.array([1., 2., 3.]))
    z = function.asarray(2j)
    out = function.eval(x * z + 1.)
    numpy.testing.assert_allclose(out, numpy.array([1., 2., 3.]) * 2j + 1.)


def test_complex_structural():
    a = numpy.arange(6).reshape(2, 3) * (1 + 1j)
    z = function.asarray(a)
    got = function.eval([z.T, z.sum(1), z[0], function.stack([z[0], z[1]], axis=0)])
    numpy.testing.assert_allclose(got[0], a.T)
    numpy.testing.assert_allclose(got[1], a.sum(1))
    numpy.testing.assert_allclose(got[2], a[0])
    numpy.testing.assert_allclose(got[3], a)


def test_complex_argument_eval():
    A = function.Argument('A', (3,), dtype=complex)
    assert A.dtype == complex and A.shape == (3,)
    val = numpy.array([1 + 1j, 2 - 3j, -1j])
    out = function.eval(A * (2 + 1j), A=val)
    numpy.testing.assert_allclose(out, val * (2 + 1j))
    # string renaming keeps the complex backing
    B = function.replace_arguments(A, 'A:B')
    out = function.eval(B, B=val)
    numpy.testing.assert_allclose(out, val)
    # replacement by a complex value
    out = function.eval(function.replace_arguments(A * 2, {'A': function.asarray(val)}))
    numpy.testing.assert_allclose(out, val * 2)


def test_complex_linear_solve():
    '''Complex mass-matrix projection: find A with ∫ Atest (A - f) = 0.'''
    topo, geom = mesh.unitsquare(3, 'square')
    ns = Namespace()
    ns.x = geom
    ns.define_for('x', gradient='D', jacobians=('dV', 'dS'))
    ns.A = topo.field('A', btype='std', degree=1, dtype=complex)
    ns.Atest = function.replace_arguments(ns.A, 'A:Atest')
    ns.f = function.asarray(2. + 3.j) * ns.x[0] + ns.x[1]
    res = topo.integral('Atest (A - f) dV' @ ns, degree=3)
    sys_ = System(res, trial='A', test='Atest')
    assert sys_.is_linear
    args = sys_.solve()
    A = args['A']
    assert A.dtype.kind == 'c'
    # the projection of a bilinear function on a bilinear basis is exact:
    xy = topo.sample('bezier', 2).eval(ns.x)
    smp = topo.sample('bezier', 2).eval(ns.A, args)
    numpy.testing.assert_allclose(smp, (2 + 3j) * xy[:, 0] + xy[:, 1], atol=1e-10)


def test_complex_helmholtz_like():
    '''Complex stiffness: (∇Atest·∇A + j ω A Atest - Atest) = 0; checks that a
    genuinely coupled re/im system solves and satisfies its residual.'''
    topo, geom = mesh.unitsquare(3, 'square')
    ns = Namespace()
    ns.x = geom
    ns.define_for('x', gradient='D', jacobians=('dV', 'dS'))
    ns.j = 1j
    ns.ω = 5.
    ns.A = topo.field('A', btype='std', degree=1, dtype=complex)
    ns.Atest = function.replace_arguments(ns.A, 'A:Atest')
    res = topo.integral('(D_i(Atest) D_i(A) + j ω Atest A - Atest) dV' @ ns, degree=2)
    sys_ = System(res, trial='A', test='Atest')
    args = sys_.solve()
    A = args['A']
    assert A.dtype.kind == 'c' and numpy.abs(A.imag).max() > 1e-6
    # verify the complex residual at the solution by direct evaluation
    n = 16
    ei = numpy.zeros(n, dtype=complex)
    for k in [0, 5, 12]:
        ei[:] = 0
        ei[k] = 1
        rk = function.eval(function.replace_arguments(res, {'Atest': function.asarray(ei), 'A': function.asarray(A)}))
        assert abs(rk) < 1e-10


def test_scatter_trignormal():
    th = function.asarray(numpy.pi / 3)
    v = function.eval(function.scatter(function.trignormal(th), 3, [0, 2]))
    numpy.testing.assert_allclose(v, [numpy.cos(numpy.pi / 3), 0, numpy.sin(numpy.pi / 3)], atol=1e-15)
