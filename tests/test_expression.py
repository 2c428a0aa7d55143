'''Expression DSL tests (mirrors reference tests/test_expression_v2.py
essentials).'''

import numpy
import pytest

from nutils_tpu import function, mesh
from nutils_tpu.expression import ExpressionSyntaxError, Namespace


@pytest.fixture()
def ns():
    ns = Namespace()
    ns.A = function.asarray(numpy.arange(6.).reshape(2, 3))
    ns.x = function.asarray(numpy.arange(3.))
    ns.y = function.asarray(numpy.arange(2.))
    ns.c = 2
    return ns


def ev(expr, ns):
    return numpy.asarray(function.eval(expr @ ns))


def test_scalar(ns):
    assert ev('2', ns) == 2
    assert ev('2 c', ns) == 4
    assert ev('c^2', ns) == 4
    assert ev('c^-2', ns) == 0.25
    assert ev('2 / c', ns) == 1
    assert ev('c + c', ns) == 4
    assert ev('-c + c', ns) == 0


def test_indices(ns):
    numpy.testing.assert_allclose(ev('x_i x_i', ns), 5.0)
    numpy.testing.assert_allclose(ev('A_ij x_j', ns), numpy.arange(6.).reshape(2, 3) @ numpy.arange(3.))
    numpy.testing.assert_allclose(ev('A_ij', ns), numpy.arange(6.).reshape(2, 3))
    # output indices ordered alphabetically
    numpy.testing.assert_allclose(ev('A_ji', ns), numpy.arange(6.).reshape(2, 3).T)


def test_item_selection(ns):
    assert ev('x_0', ns) == 0
    assert ev('x_2', ns) == 2
    numpy.testing.assert_allclose(ev('A_i0', ns), [0, 3])


def test_functions(ns):
    numpy.testing.assert_allclose(ev('sin(x_1)', ns), numpy.sin(1.0))
    numpy.testing.assert_allclose(ev('cos(1) cosh(x_1)', ns), numpy.cos(1) * numpy.cosh(1))
    numpy.testing.assert_allclose(ev('sqrt(x_i x_i)', ns), numpy.sqrt(5))


def test_add_align(ns):
    # 'A_ij + B_ji' style alignment
    ns.B = function.asarray(numpy.arange(6.).reshape(3, 2))
    A = numpy.arange(6.).reshape(2, 3)
    B = numpy.arange(6.).reshape(3, 2)
    numpy.testing.assert_allclose(ev('A_ij + B_ji', ns), A + B.T)


def test_assignment(ns):
    ns.z_i = 'A_ij x_j'
    numpy.testing.assert_allclose(numpy.asarray(function.eval(ns.z)), numpy.arange(6.).reshape(2, 3) @ numpy.arange(3.))
    ns.w_ji = 'A_ij'
    assert ns.w.shape == (3, 2)


def test_trace_syntax():
    ns = Namespace()
    ns.B = function.asarray(numpy.arange(8.).reshape(2, 2, 2))
    out = numpy.asarray(function.eval('B_iji' @ ns))
    expect = numpy.einsum('iji->j', numpy.arange(8.).reshape(2, 2, 2))
    numpy.testing.assert_allclose(out, expect)


def test_errors(ns):
    with pytest.raises(ExpressionSyntaxError):
        'x_i + y_j' @ ns
    with pytest.raises(ExpressionSyntaxError):
        'q' @ ns
    with pytest.raises(ExpressionSyntaxError):
        'x_i x_i x_i' @ ns


def test_define_for():
    topo, geom = mesh.unitsquare(2, 'square')
    ns = Namespace()
    ns.x = geom
    ns.define_for('x', gradient='D', normal='n', jacobians=('dV', 'dS'))
    area = topo.integral('dV' @ ns, degree=1).eval()
    assert float(area) == pytest.approx(1.0)
    out = topo.boundary.integral('x_i n_i dS' @ ns, degree=2).eval()
    assert float(out) == pytest.approx(2.0)
    ns.f = 'x_0^2'
    df = topo.sample('bezier', 2).eval('D_i(f)' @ ns)
    x = topo.sample('bezier', 2).eval('x_i' @ ns)
    numpy.testing.assert_allclose(numpy.asarray(df)[:, 0], 2 * numpy.asarray(x)[:, 0], atol=1e-12)


def test_field_expression():
    topo, geom = mesh.unitsquare(2, 'square')
    ns = Namespace()
    ns.x = geom
    ns.define_for('x', gradient='D', jacobians=('dV',))
    ns.u = topo.field('u', btype='std', degree=1)
    ns.v = topo.field('v', btype='std', degree=1)
    res = topo.integral('D_i(v) D_i(u) dV' @ ns, degree=2)
    assert res.shape == ()
    assert set(res.arguments) == {'u', 'v'}
