'''Expression-DSL matrix (reference model: tests/test_expression_v2.py — the
grammar surface exercised case by case): Einstein summation, index alignment
of sums, traces, numeral item selection, fractions and powers, jump/mean
brackets, function calls with generated axes, define_for helpers, and the
syntax-error surface.'''

import numpy
import pytest

from nutils_tpu import function, mesh
from nutils_tpu.expression import ExpressionSyntaxError, Namespace


@pytest.fixture(scope='module')
def ctx():
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 4)] * 2)
    ns = Namespace()
    ns.x = geom
    ns.define_for('x', gradient='∇', normal='n', jacobians=('dV', 'dS'))
    raw = dict(a=2.0, b=numpy.array([1.0, 2.0]), c=numpy.array([[1.0, 2.0], [3.0, 4.0]]),
               d=numpy.array([[2.0, 1.0], [0.5, 3.0]]), t3=numpy.arange(8.0).reshape(2, 2, 2))
    for k, v in raw.items():
        setattr(ns, k, v)
    smp = topo.sample('gauss', 2)
    return topo, geom, ns, smp, raw


def _ev(smp, expr):
    return numpy.asarray(smp.eval(expr, {}))


def _const(smp, expr):
    vals = _ev(smp, expr)
    first = vals.reshape(vals.shape[0], -1)[0].reshape(vals.shape[1:]) if vals.ndim else vals
    return first


# --------------------------------------------------------------- valid cases

def test_scalar_arithmetic(ctx):
    topo, geom, ns, smp, raw = ctx
    assert _const(smp, 'a + a' @ ns) == pytest.approx(4.0)
    assert _const(smp, 'a / 4' @ ns) == pytest.approx(0.5)
    assert _const(smp, '2^3' @ ns) == pytest.approx(8.0)
    assert _const(smp, 'a^-1' @ ns) == pytest.approx(0.5)
    assert _const(smp, '-a + 3' @ ns) == pytest.approx(1.0)


def test_einstein_contraction(ctx):
    topo, geom, ns, smp, raw = ctx
    b, c, d = raw['b'], raw['c'], raw['d']
    numpy.testing.assert_allclose(_const(smp, 'b_i b_i' @ ns), b @ b)
    numpy.testing.assert_allclose(_const(smp, 'c_ij b_j' @ ns), c @ b)
    numpy.testing.assert_allclose(_const(smp, 'c_ij d_jk' @ ns), c @ d)
    numpy.testing.assert_allclose(_const(smp, 'c_ij d_ij' @ ns), (c * d).sum())
    numpy.testing.assert_allclose(_const(smp, 'b_i c_ij b_j' @ ns), b @ c @ b)


def test_trace_and_item_selection(ctx):
    topo, geom, ns, smp, raw = ctx
    c, t3 = raw['c'], raw['t3']
    numpy.testing.assert_allclose(_const(smp, 'c_ii' @ ns), numpy.trace(c))
    numpy.testing.assert_allclose(_const(smp, 'c_i0' @ ns), c[:, 0])
    numpy.testing.assert_allclose(_const(smp, 't3_iji' @ ns), numpy.einsum('iji->j', t3))
    numpy.testing.assert_allclose(_const(smp, 't3_0jk c_jk' @ ns), (t3[0] * c).sum())


def test_sum_index_alignment(ctx):
    topo, geom, ns, smp, raw = ctx
    c, d = raw['c'], raw['d']
    # both orderings of the free indices must align before adding
    numpy.testing.assert_allclose(_const(smp, '(c_ij + d_ji) b_j' @ ns),
                                  (c + d.T) @ raw['b'])


def test_fraction_splits_whole_term(ctx):
    topo, geom, ns, smp, raw = ctx
    # in the v2 grammar '/' splits the whole term: 'a / 2 a' is a / (2 a)
    # (reference: expression_v2.py:31-34)
    numpy.testing.assert_allclose(_const(smp, 'a / 2 a' @ ns), 0.5)
    numpy.testing.assert_allclose(_const(smp, '2 a / 4 a' @ ns), 0.5)


def test_gradient_divergence_normal(ctx):
    topo, geom, ns, smp, raw = ctx
    f = '∇_i(x_i)' @ ns
    numpy.testing.assert_allclose(_ev(smp, f), 2.0)
    g = '∇_j(x_0 x_1)' @ ns
    x = _ev(smp, 'x_i' @ ns)
    numpy.testing.assert_allclose(_ev(smp, g), x[:, ::-1], rtol=1e-12)
    bsmp = topo.boundary['right'].sample('gauss', 2)
    numpy.testing.assert_allclose(numpy.asarray(bsmp.eval('n_i' @ ns, {})),
                                  numpy.broadcast_to([1.0, 0.0], (bsmp.npoints, 2)))


def test_jacobian_weights(ctx):
    topo, geom, ns, smp, raw = ctx
    area = topo.integrate('dV' @ ns, degree=2)
    numpy.testing.assert_allclose(float(area), 1.0, rtol=1e-12)
    per = topo.boundary.integrate('dS' @ ns, degree=2)
    numpy.testing.assert_allclose(float(per), 4.0, rtol=1e-12)


def test_jump_mean_brackets(ctx):
    topo, geom, ns, smp, raw = ctx
    ns2 = ns.copy_()
    ns2.u = topo.field('u', btype='discont', degree=1)
    ifc = topo.interfaces.sample('gauss', 2)
    rng = numpy.random.default_rng(0)
    args = {'u': rng.standard_normal(ns2.u.arguments['u'][0])}
    jump_vals = numpy.asarray(ifc.eval('[u]' @ ns2, args))
    mean_vals = numpy.asarray(ifc.eval('{u}' @ ns2, args))
    u_self = numpy.asarray(ifc.eval(ns2.u, args))
    u_opp = numpy.asarray(ifc.eval(function.opposite(ns2.u), args))
    # the jump sign is orientation-dependent (reference: function.py:1586);
    # here it is opposite-minus-self, and mean is orientation-free
    numpy.testing.assert_allclose(jump_vals, u_opp - u_self, rtol=1e-12, atol=1e-12)
    numpy.testing.assert_allclose(mean_vals, (u_self + u_opp) / 2, rtol=1e-12, atol=1e-12)


def test_function_call_consumes_indices(ctx):
    topo, geom, ns, smp, raw = ctx
    got = _const(smp, 'sin(a)' @ ns)
    numpy.testing.assert_allclose(got, numpy.sin(2.0), rtol=1e-12)
    got = _const(smp, 'exp(b_i b_i)' @ ns)
    numpy.testing.assert_allclose(got, numpy.exp(5.0), rtol=1e-12)


def test_namespace_copy_substitutes_arguments(ctx):
    topo, geom, ns, smp, raw = ctx
    ns2 = ns.copy_()
    ns2.u = topo.field('u', btype='std', degree=1)
    ns3 = ns2.copy_(u='v')
    assert 'v' in ns3.u.arguments and 'u' not in ns3.u.arguments


def test_define_for_curl():
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 3)] * 3)
    ns = Namespace()
    ns.x = geom
    ns.define_for('x', gradient='∇', curl='curl', jacobians=('dV',))
    # curl of a linear rotational field (-x1, x0, 0) is (0, 0, 2)
    ns.δ = function.eye(3)
    ns.w_i = '-x_1 δ_i0 + x_0 δ_i1'
    smp = topo.sample('gauss', 2)
    vals = numpy.asarray(smp.eval('curl_ki(w_i)' @ ns, {}))
    numpy.testing.assert_allclose(vals, numpy.broadcast_to([0.0, 0.0, 2.0], vals.shape),
                                  atol=1e-12)


# --------------------------------------------------------------- error cases

BAD = [
    'a +',              # dangling operator
    '(a',               # unbalanced parenthesis
    'a)',               # stray closing parenthesis
    'b_i + a',          # inconsistent free indices across sum terms
    'b_i c_jk',         # product with three distinct free indices is fine -- see GOODFREE
    'nosuchvar',        # unknown name
    'b_i b_i b_i',      # index repeated three times
    'c_ij b_i b_j + b_k',  # scalar + vector
    'a^',               # dangling power
    '1.2.3',            # malformed number
    'b_',               # dangling subscript
]


@pytest.mark.parametrize('expr', [b for b in BAD if b != 'b_i c_jk'])
def test_syntax_errors(ctx, expr):
    topo, geom, ns, smp, raw = ctx
    with pytest.raises(ExpressionSyntaxError):
        expr @ ns


def test_error_marks_position(ctx):
    topo, geom, ns, smp, raw = ctx
    try:
        'b_i + a' @ ns
    except ExpressionSyntaxError as e:
        assert 'b_i + a' in str(e) or 'index' in str(e).lower()
    else:
        pytest.fail('expected ExpressionSyntaxError')


def test_multi_free_index_product(ctx):
    topo, geom, ns, smp, raw = ctx
    b, c = raw['b'], raw['c']
    got = _const(smp, 'b_i c_jk' @ ns)
    numpy.testing.assert_allclose(got, numpy.einsum('i,jk->ijk', b, c))
