'''Unit tests for the expression IR (mirrors reference tests/test_evaluable.py
strategy: evalf vs numpy, sparsity localization, gradients vs finite
differences).'''

import numpy
import pytest

from nutils_tpu import evaluable as ev


rng = numpy.random.RandomState(0)


def test_arithmetic():
    a = ev.constant(rng.rand(3, 4))
    b = ev.constant(rng.rand(3, 4))
    out = ev.eval_once(ev.add(ev.multiply(a, b), ev.negative(a)))
    numpy.testing.assert_allclose(out, a.value * b.value - a.value)


def test_sum_einsum():
    a = rng.rand(5, 3)
    b = rng.rand(3, 4)
    A, B = ev.constant(a), ev.constant(b)
    Ax = ev.insertaxis(A, 2, 4)
    Bx = ev.insertaxis(B, 0, 5)
    out = ev.eval_once(ev.sum_(ev.multiply(Ax, Bx), 1))
    numpy.testing.assert_allclose(out, a @ b, rtol=1e-12)


def test_argument():
    a = ev.Argument('a', (4,))
    out = ev.eval_once(ev.sum_(ev.multiply(a, a), 0), {'a': numpy.arange(4.)})
    assert float(out) == pytest.approx(1 + 4 + 9)


def test_inflate_dense():
    v = ev.constant(numpy.array([[1.0, 2.0], [3.0, 4.0]]))
    d = ev.constant(numpy.array([[0, 2], [2, 1]]))
    out = ev.eval_once(ev.inflate(v, d, 4, 1))
    numpy.testing.assert_allclose(out, [[1, 0, 2, 0], [0, 4, 3, 0]])


def test_inflate_multiply_localizes():
    E, P, L, N = 4, 2, 3, 9
    B = ev.constant(rng.rand(E, P, L))
    D = ev.constant(rng.randint(0, N, (E, 1, L)))
    basis = ev.inflate(B, D, N, 2)
    arg = ev.Argument('u', (N,))
    argb = ev.insertaxis(ev.insertaxis(arg, 0, E), 1, P)
    u = ev.sum_(ev.multiply(basis, argb), 2)
    # contraction must localize: no Inflate may remain in the graph
    assert not ev.find(u, lambda n: isinstance(n, ev.Inflate))
    uval = ev.eval_once(u, {'u': rng.rand(N)})
    assert uval.shape == (E, P)


def test_residual_fuses_to_single_scatter():
    E, P, L, N = 4, 2, 3, 9
    Bv = rng.rand(E, P, L)
    Dv = rng.randint(0, N, (E, 1, L))
    wv = rng.rand(E, P)
    basis = ev.inflate(ev.constant(Bv), ev.constant(Dv), N, 2)
    w = ev.insertaxis(ev.constant(wv), 2, N)
    res = ev.sum_(ev.multiply(basis, w), (0, 1))
    # the fold rule must turn sum-of-scatters into one flat segment scatter
    assert isinstance(res, (ev.Inflate, ev.Transpose)) and isinstance(res if isinstance(res, ev.Inflate) else res.func, ev.Inflate)
    val = ev.eval_once(res)
    dense = numpy.zeros(N)
    for e in range(E):
        for p in range(P):
            for l in range(L):
                dense[Dv[e, 0, l]] += Bv[e, p, l] * wv[e, p]
    numpy.testing.assert_allclose(val, dense, rtol=1e-12)


def test_grad():
    leaf = ev.Leaf('x', (5, 2))
    f = ev.sum_(ev.multiply(ev.multiply(leaf, leaf), leaf), ())  # x^3 pointwise
    g = ev.grad(ev.multiply(ev.multiply(leaf, leaf), leaf), leaf)
    x0 = rng.rand(5, 2)
    gv = numpy.asarray(ev.Compiled(g)({}, {'x': x0}))
    expect = 3 * x0[..., None] ** 2 * numpy.eye(2)
    numpy.testing.assert_allclose(gv, expect, rtol=1e-12)


def test_monomials_grad_at_zero():
    leaf = ev.Leaf('x', (3, 1))
    x = ev.take(leaf, ev.constant(numpy.array(0)), 1)
    m = ev.Monomials(x, 4)
    g = ev.grad(m, leaf)
    x0 = numpy.array([[0.0], [0.5], [1.0]])
    gv = numpy.asarray(ev.Compiled(g)({}, {'x': x0}))
    # d/dx [1, x, x^2, x^3] = [0, 1, 2x, 3x^2]
    for i, xv in enumerate(x0[:, 0]):
        numpy.testing.assert_allclose(gv[i, :, 0], [0, 1, 2 * xv, 3 * xv ** 2], atol=1e-12)
    assert numpy.isfinite(gv).all()


def test_power_static_no_nan_tangent():
    import jax
    leaf = ev.Leaf('x', (3,))
    p = ev.power(leaf, ev.constant(2.0))
    comp = ev.Compiled(ev.sum_(p, 0))
    g = jax.grad(lambda x: comp.trace({}, {'x': x}))(numpy.zeros(3))
    gg = jax.jvp(lambda x: jax.grad(lambda y: comp.trace({}, {'y' if False else 'x': y}))(x),
                 (numpy.zeros(3),), (numpy.ones(3),))[1]
    assert numpy.isfinite(numpy.asarray(g)).all()
    assert numpy.isfinite(numpy.asarray(gg)).all()


def test_poly_degree():
    a = ev.Argument('a', (4,))
    names = frozenset({'a'})
    assert ev.poly_degree(a, names) == 1
    assert ev.poly_degree(ev.multiply(a, a), names) == 2
    assert ev.poly_degree(ev.power(a, ev.constant(3.0)), names) == 3
    assert ev.poly_degree(ev.pointwise('sin', a), names) == numpy.inf
    assert ev.poly_degree(ev.constant(numpy.ones(4)), names) == 0
    assert ev.poly_degree(ev.negative(a), names) == 1


def test_inverse_determinant():
    for d in (1, 2, 3):
        A = rng.rand(7, d, d) + 2 * numpy.eye(d)
        out_inv = ev.eval_once(ev.Inverse(ev.constant(A)))
        out_det = ev.eval_once(ev.Determinant(ev.constant(A)))
        numpy.testing.assert_allclose(out_inv, numpy.linalg.inv(A), rtol=1e-10)
        numpy.testing.assert_allclose(out_det, numpy.linalg.det(A), rtol=1e-10)


def test_replace():
    a = ev.Argument('a', (3,))
    b = ev.Argument('b', (3,))
    expr = ev.sum_(ev.multiply(a, a), 0)
    expr2 = ev.replace(expr, {a: b})
    out = ev.eval_once(expr2, {'b': numpy.ones(3)})
    assert float(out) == pytest.approx(3)


def test_trace_with_stats():
    '''Instrumented eager evaluation (reference: stats='log' timing,
    evaluable.py:7052) and heat-colored graphviz export.'''
    import numpy
    from nutils_tpu import evaluable as ev
    a = ev.constant(numpy.arange(12.0).reshape(3, 4))
    expr = ev.sum_(ev.multiply(a, a), (0, 1))
    comp = ev.compile(expr)
    out, stats = comp.trace_with_stats({})
    numpy.testing.assert_allclose(float(out), float((numpy.arange(12.0) ** 2).sum()))
    assert stats and all(t >= 0 for t in stats.values())
    dot = ev.export_graphviz(expr, stats)
    assert 'digraph' in dot and 'fillcolor' in dot
    ev.log_stats(stats)
