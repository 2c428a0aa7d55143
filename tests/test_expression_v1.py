'''v1 expression language (reference scope model: tests/test_expression_v1.py
and the expression_v1 docstring examples).'''

import numpy
import pytest

from nutils_tpu import expression_v1, function, mesh
from nutils_tpu.expression_v1 import ExpressionSyntaxError, Namespace


@pytest.fixture(scope='module')
def ns():
    ns = Namespace()
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 4)] * 2)
    ns.x = geom
    ns.A = numpy.array([[1.0, 2.0], [3.0, 4.0]])
    ns.a = numpy.array([1.0, 2.0])
    ns.b = numpy.array([3.0, 4.0])
    ns.c = 2
    return ns, topo, geom


def _val(arr, args=None):
    return numpy.asarray(function.eval(arr, args or {}))


def test_docstring_examples():
    ns = Namespace()
    ns.A = numpy.array([[1.0, 2.0, 0.0], [0.0, 3.0, 1.0], [1.0, 0.0, 2.0]])
    ns.x = numpy.array([1.0, 2.0, 3.0])
    ns.c = 2
    ns.cAx_i = 'c A_ij x_j'
    ns.xAx = 'x_i A_ij x_j'
    A, x = numpy.asarray(_val(ns.A)), numpy.asarray(_val(ns.x))
    numpy.testing.assert_allclose(_val(ns.cAx), 2 * A @ x)
    assert float(_val(ns.xAx)) == pytest.approx(x @ A @ x)
    assert _val(ns.eval_('2 c')) == pytest.approx(4)
    numpy.testing.assert_allclose(_val(ns.eval_i('c A_ij x_j')), 2 * A @ x)
    numpy.testing.assert_allclose(_val(ns.eval_ij('A_ij + A_ji')), A + A.T)
    numpy.testing.assert_allclose(_val('2 c' @ ns), 4)
    numpy.testing.assert_allclose(_val('A_ij x_j' @ ns), A @ x)


def test_trace_and_item(ns):
    ns, topo, geom = ns
    A = numpy.array([[1.0, 2.0], [3.0, 4.0]])
    assert float(_val(ns.eval_('A_ii'))) == pytest.approx(5.0)
    assert float(_val(ns.eval_('A_i0 a_i'))) == pytest.approx(1 * 1 + 3 * 2)
    assert float(_val(ns.eval_('a_i b_i'))) == pytest.approx(11.0)
    numpy.testing.assert_allclose(_val(ns.eval_ij('a_i b_j')), numpy.outer([1, 2], [3, 4]))


def test_fraction_power_negation(ns):
    ns, topo, geom = ns
    assert float(_val('2 c / 4 c' @ ns)) == pytest.approx((2 * 2) / (4 * 2))
    assert float(_val('c^2' @ ns)) == pytest.approx(4)
    assert float(_val('c^-2' @ ns)) == pytest.approx(0.25)
    assert float(_val('c^(1 / 2)' @ ns)) == pytest.approx(numpy.sqrt(2))
    assert float(_val('-c + c c' @ ns)) == pytest.approx(2.0)
    with pytest.raises(ExpressionSyntaxError):
        'c + -c' @ ns


def test_dirac_lengths():
    ns = Namespace(length_ij=2)
    numpy.testing.assert_allclose(_val(ns.eval_ij('δ_ij')), numpy.eye(2))
    ns2 = Namespace(fallback_length=3)
    numpy.testing.assert_allclose(_val(ns2.eval_ij('δ_ij')), numpy.eye(3))
    ns3 = Namespace()
    with pytest.raises(ExpressionSyntaxError, match='cannot be determined'):
        ns3.eval_ij('δ_ij')
    # fixed length conflicts with an actual array length
    ns4 = Namespace(length_i=2)
    ns4.a = numpy.array([1.0, 2.0, 3.0])
    with pytest.raises(ExpressionSyntaxError):
        'a_i' @ ns4


def test_arguments_and_substitution(ns):
    ns, topo, geom = ns
    basis = topo.basis('std', degree=1)
    ns.basis = basis
    u = 'basis_i ?coeffs_i' @ ns
    assert ns.arg_shapes['coeffs'] == (16,)
    vals = _val(topo.sample('bezier', 2).bind(u), {'coeffs': numpy.ones(16)})
    numpy.testing.assert_allclose(vals, 1.0, atol=1e-12)
    # substitution
    two = '2 ?y(y = c)' @ ns
    assert float(_val(two)) == pytest.approx(4.0)


def test_gradient_normal_surface(ns):
    ns, topo, geom = ns
    f = 'x_0^2 x_1' @ ns
    g = ns.eval_i('(x_0^2 x_1)_,i')
    smp = topo.sample('gauss', 3)
    got = numpy.asarray(smp.eval(g, {}))
    x = numpy.asarray(smp.eval(geom, {}))
    want = numpy.stack([2 * x[:, 0] * x[:, 1], x[:, 0] ** 2], axis=-1)
    numpy.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
    # vector gradient without underscore: x_i,j = identity
    gx = ns.eval_ij('x_i,j')
    numpy.testing.assert_allclose(numpy.asarray(smp.eval(gx, {})),
                                  numpy.broadcast_to(numpy.eye(2), (smp.npoints, 2, 2)), atol=1e-12)
    # normal on the right boundary
    bsmp = topo.boundary['right'].sample('gauss', 1)
    nv = numpy.asarray(bsmp.eval(ns.eval_i('n_i'), {}))
    numpy.testing.assert_allclose(nv, numpy.broadcast_to([1.0, 0.0], nv.shape), atol=1e-12)


def test_jump_mean(ns):
    ns, topo, geom = ns
    f = 'x_0^2' @ ns
    ismp = topo.interfaces.sample('gauss', 2)
    jm = numpy.asarray(ismp.eval('[ x_0^2 ]' @ ns, {}))
    numpy.testing.assert_allclose(jm, 0, atol=1e-12)
    mn = numpy.asarray(ismp.eval('{ x_0^2 }' @ ns, {}))
    fv = numpy.asarray(ismp.eval(f, {}))
    numpy.testing.assert_allclose(mn, fv, atol=1e-12)


def test_functions(ns):
    ns, topo, geom = ns
    assert float(_val('sin(c)' @ ns)) == pytest.approx(numpy.sin(2))
    assert float(_val('sqrt(c)' @ ns)) == pytest.approx(numpy.sqrt(2))
    numpy.testing.assert_allclose(_val(ns.eval_i('exp(a_i)')), numpy.exp([1, 2]))

    def sqr(v):
        return v ** 2

    def mul(p, q):
        out = p
        for n in q.shape:
            out = function.insertaxis(out, out.ndim, n)
        qq = q
        for n in reversed(p.shape):
            qq = function.insertaxis(qq, 0, n)
        return function.multiply(out, qq)

    nsf = Namespace(functions=dict(sqr=sqr, mul=mul))
    nsf.a = numpy.array([1.0, 2.0, 3.0])
    nsf.b = numpy.array([4.0, 5.0])
    numpy.testing.assert_allclose(_val(nsf.eval_i('sqr(a_i)')), [1, 4, 9])
    numpy.testing.assert_allclose(_val(nsf.eval_ij('mul(a_i, b_j)')),
                                  numpy.outer([1, 2, 3], [4, 5]))
    # consumed indices: mul(a_i, a_i) == a_i a_i
    assert float(_val('mul(a_i, a_i)' @ nsf)) == pytest.approx(14.0)


def test_stack(ns):
    ns, topo, geom = ns
    v = _val(ns.eval_i('<1, 2>_i'))
    numpy.testing.assert_allclose(v, [1, 2])
    v2 = _val(ns.eval_i('<c, c^2>_i'))
    numpy.testing.assert_allclose(v2, [2, 4])


def test_syntax_errors(ns):
    ns, topo, geom = ns
    for bad in ['2 a 2', 'a_i +', 'a_iii', 'A_ij + a_i', '01']:
        with pytest.raises(ExpressionSyntaxError):
            bad @ ns


def test_default_geometry_name():
    ns = Namespace(default_geometry_name='y')
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 3)] * 2)
    ns.y = geom
    g = ns.eval_i('(y_0 y_1)_,i')
    smp = topo.sample('gauss', 2)
    got = numpy.asarray(smp.eval(g, {}))
    x = numpy.asarray(smp.eval(geom, {}))
    numpy.testing.assert_allclose(got, numpy.stack([x[:, 1], x[:, 0]], -1), atol=1e-12)
