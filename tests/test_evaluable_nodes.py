'''Per-node evalf-vs-numpy oracle and gradient-vs-finite-difference checks
for the expression IR (scope model: reference tests/test_evaluable.py, which
checks every node class for evalf correctness, derivative correctness and
shape/dtype invariants).'''

import numpy
import pytest

from nutils_tpu import evaluable as ev


rng = numpy.random.RandomState(7)


def run(expr, args=None, leaves=None):
    out = ev.Compiled(expr).trace(args or {}, leaves or {})
    a = numpy.asarray(out)
    assert a.shape == expr.shape, f'declared {expr.shape}, evaluated {a.shape}'
    if expr.dtype is float:
        assert a.dtype.kind == 'f'
    elif expr.dtype is int:
        assert a.dtype.kind in 'iu'
    else:
        assert a.dtype.kind == 'b'
    return a


# ------------------------------------------------------------------ structure

def test_constant_zeros_range():
    v = rng.rand(3, 4)
    numpy.testing.assert_array_equal(run(ev.constant(v)), v)
    numpy.testing.assert_array_equal(run(ev.Zeros((2, 3), float)), numpy.zeros((2, 3)))
    numpy.testing.assert_array_equal(run(ev.Range(5)), numpy.arange(5))


def test_insertaxis():
    v = rng.rand(3, 4)
    for axis in range(3):
        got = run(ev.InsertAxis(ev.constant(v), axis, 5))
        want = numpy.broadcast_to(numpy.expand_dims(v, axis), got.shape)
        numpy.testing.assert_array_equal(got, want)


def test_transpose():
    v = rng.rand(2, 3, 4)
    for axes in [(1, 0, 2), (2, 1, 0), (0, 2, 1), (2, 0, 1)]:
        numpy.testing.assert_array_equal(run(ev.Transpose(ev.constant(v), axes)),
                                         v.transpose(axes))


def test_ravel_unravel():
    v = rng.rand(2, 3, 4)
    numpy.testing.assert_array_equal(run(ev.Ravel(ev.constant(v), 0)), v.reshape(6, 4))
    numpy.testing.assert_array_equal(run(ev.Ravel(ev.constant(v), 1)), v.reshape(2, 12))
    w = rng.rand(6, 5)
    numpy.testing.assert_array_equal(run(ev.Unravel(ev.constant(w), 0, 2, 3)), w.reshape(2, 3, 5))
    numpy.testing.assert_array_equal(run(ev.Unravel(ev.constant(w), 1, 5, 1)), w.reshape(6, 5, 1))


def test_take():
    v = rng.rand(4, 5)
    idx = numpy.array([[0, 2], [4, 1]])
    got = run(ev.Take(ev.constant(v), ev.constant(idx), 1))
    numpy.testing.assert_array_equal(got, numpy.take(v, idx, axis=1))
    got0 = run(ev.Take(ev.constant(v), ev.constant(numpy.array(2)), 0))
    numpy.testing.assert_array_equal(got0, v[2])


def test_concatenate():
    a, b = rng.rand(2, 3), rng.rand(2, 4)
    got = run(ev.Concatenate((ev.constant(a), ev.constant(b)), 1))
    numpy.testing.assert_array_equal(got, numpy.concatenate([a, b], axis=1))


def test_inflate_duplicates_accumulate():
    v = rng.rand(3, 4)
    d = numpy.array([[1, 1, 0, 3]] * 3)
    got = run(ev.Inflate(ev.constant(v), ev.constant(d), 5, 1))
    want = numpy.zeros((3, 5))
    for e in range(3):
        for l in range(4):
            want[e, d[e, l]] += v[e, l]
    numpy.testing.assert_allclose(got, want, rtol=1e-12)


def test_gather_along():
    v = rng.rand(3, 6)
    d = numpy.array([[0, 5], [2, 2], [4, 1]])
    got = run(ev.GatherAlong(ev.constant(v), ev.constant(d), 1))
    want = numpy.take_along_axis(v, d, axis=1)
    numpy.testing.assert_array_equal(got, want)


# ------------------------------------------------------------------ math

def test_add_multiply_negative():
    a, b = rng.rand(3, 4), rng.rand(3, 4)
    numpy.testing.assert_allclose(run(ev.Add(ev.constant(a), ev.constant(b))), a + b)
    numpy.testing.assert_allclose(run(ev.Multiply(ev.constant(a), ev.constant(b))), a * b)
    numpy.testing.assert_allclose(run(ev.negative(ev.constant(a))), -a)


def test_sum_axes():
    v = rng.rand(2, 3, 4)
    for axes in [(0,), (1,), (2,), (0, 2), (0, 1, 2)]:
        numpy.testing.assert_allclose(run(ev.Sum(ev.constant(v), axes)),
                                      v.sum(axis=axes), rtol=1e-12)


def test_power():
    base = rng.rand(3, 4) + 0.5
    exp = rng.rand(3, 4) * 2
    numpy.testing.assert_allclose(run(ev.Power(ev.constant(base), ev.constant(exp))),
                                  base ** exp, rtol=1e-12)


@pytest.mark.parametrize('op', sorted(ev.Pointwise.UNARY))
def test_pointwise_unary(op):
    v = rng.rand(3, 4) * 0.8 + 0.1  # (0.1, 0.9): in-domain for all ops
    if op == 'arccosh':
        v = v + 1.0
    got = run(ev.Pointwise(op, ev.constant(v)))
    want = getattr(numpy, op if op != 'abs' else 'absolute')(v)
    numpy.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize('op', sorted(ev.Pointwise.BINARY))
def test_pointwise_binary(op):
    a = rng.rand(3, 4) + 0.1
    b = rng.rand(3, 4) + 0.1
    got = run(ev.Pointwise(op, ev.constant(a), ev.constant(b)))
    numpy.testing.assert_allclose(got, getattr(numpy, op)(a, b), rtol=1e-12)


def test_cast_compare_logic_choose():
    a = rng.rand(3, 4)
    b = rng.rand(3, 4)
    A, B = ev.constant(a), ev.constant(b)
    numpy.testing.assert_array_equal(run(ev.Cast(A, int)), a.astype(numpy.int64))
    numpy.testing.assert_array_equal(run(ev.Less(A, B)), a < b)
    numpy.testing.assert_array_equal(run(ev.Equal(A, A)), numpy.ones((3, 4), bool))
    lt = ev.Less(A, B)
    numpy.testing.assert_array_equal(run(ev.LogicalNot(lt)), ~(a < b))
    numpy.testing.assert_array_equal(run(ev.LogicalAnd(lt, ev.Less(B, A))), numpy.zeros((3, 4), bool))
    numpy.testing.assert_array_equal(run(ev.Choose(lt, A, B)), numpy.where(a < b, a, b))


def test_inverse_determinant_batched():
    A = rng.rand(2, 5, 3, 3) + 2 * numpy.eye(3)
    numpy.testing.assert_allclose(run(ev.Inverse(ev.constant(A))), numpy.linalg.inv(A), rtol=1e-10)
    numpy.testing.assert_allclose(run(ev.Determinant(ev.constant(A))), numpy.linalg.det(A), rtol=1e-10)


def test_eigh():
    M = rng.rand(4, 3, 3)
    A = M + numpy.swapaxes(M, -1, -2)
    w_want, v_want = numpy.linalg.eigh(A)
    w = run(ev.Eigh(ev.constant(A), 'values'))
    v = run(ev.Eigh(ev.constant(A), 'vectors'))
    numpy.testing.assert_allclose(w, w_want, rtol=1e-10, atol=1e-12)
    # eigenvectors up to sign: check A v = w v
    numpy.testing.assert_allclose(numpy.einsum('nij,njk->nik', A, v),
                                  w[:, None, :] * v, rtol=1e-9, atol=1e-9)


def test_eig_general():
    '''Non-symmetric eigendecomposition via the host-callback node
    (reference: evaluable.Eig symmetric=False, evaluable.py:3149).'''
    A = rng.rand(4, 3, 3)
    w_want, v_want = numpy.linalg.eig(A)
    wr = run(ev.EigGeneral(ev.constant(A), 'values', 'real'))
    wi = run(ev.EigGeneral(ev.constant(A), 'values', 'imag'))
    vr = run(ev.EigGeneral(ev.constant(A), 'vectors', 'real'))
    vi = run(ev.EigGeneral(ev.constant(A), 'vectors', 'imag'))
    w = wr + 1j * wi
    v = vr + 1j * vi
    # eigenvalues up to ordering: compare sorted by (real, imag)
    key = lambda z: numpy.lexsort((z.imag.round(9), z.real.round(9)))
    for b in range(4):
        numpy.testing.assert_allclose(w[b][key(w[b])], w_want[b][key(w_want[b])],
                                      rtol=1e-9, atol=1e-10)
    # vectors satisfy A v = w v
    numpy.testing.assert_allclose(numpy.einsum('nij,njk->nik', A.astype(complex), v),
                                  w[:, None, :] * v, rtol=1e-8, atol=1e-9)


def test_function_eig():
    '''function.eig / function.eigh and their numpy protocol dispatch
    (reference: function.py:3666-3673).'''
    from nutils_tpu import function, mesh
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 3)])
    smp = topo.sample('gauss', 1)
    t = geom[0]
    rot = function.stack([function.stack([function.cos(t), -function.sin(t)], 0),
                          function.stack([function.sin(t), function.cos(t)], 0)], 0)
    w, v = numpy.linalg.eig(rot)  # dispatches to function.eig, complex result
    wr = numpy.asarray(smp.eval(w.real, {}))
    wi = numpy.asarray(smp.eval(w.imag, {}))
    tv = numpy.asarray(smp.eval(t, {}))
    # rotation matrix eigenvalues are cos(t) +- i sin(t)
    numpy.testing.assert_allclose(numpy.sort(wr, -1), numpy.sort(numpy.stack([numpy.cos(tv)] * 2, -1), -1), atol=1e-12)
    numpy.testing.assert_allclose(numpy.sort(wi, -1), numpy.sort(numpy.stack([-numpy.sin(tv), numpy.sin(tv)], -1), -1), atol=1e-12)
    # symmetric pair API
    sym = rot + function.transpose(rot, (1, 0))
    ws, vs = numpy.linalg.eigh(sym)
    wsv = numpy.asarray(smp.eval(ws, {}))
    assert wsv.shape[-1] == 2


def test_monomials_legendre():
    x = rng.rand(5)
    m = run(ev.Monomials(ev.constant(x), 4))
    numpy.testing.assert_allclose(m, x[:, None] ** numpy.arange(4), rtol=1e-12)
    p = run(ev.Legendre(ev.constant(x), 3))
    numpy.testing.assert_allclose(p[:, 0], 1)
    numpy.testing.assert_allclose(p[:, 1], x)
    numpy.testing.assert_allclose(p[:, 2], (3 * x**2 - 1) / 2, rtol=1e-12)
    numpy.testing.assert_allclose(p[:, 3], (5 * x**3 - 3 * x) / 2, rtol=1e-12)


# ------------------------------------------------------------------ calculus

def _fd_grad(f, x0, eps=1e-6):
    '''Central finite differences of f: R^shape -> R^outshape w.r.t. the last
    axis of x0; returns outshape + (d,).'''
    d = x0.shape[-1]
    outs = []
    for i in range(d):
        dx = numpy.zeros_like(x0)
        dx[..., i] = eps
        outs.append((f(x0 + dx) - f(x0 - dx)) / (2 * eps))
    return numpy.stack(outs, axis=-1)


def test_grad_composite_vs_fd():
    leaf = ev.Leaf('x', (6, 2))
    x = ev.constant  # noqa: E731 shortcut below
    # f = sin(x0) * exp(x1) + x0^2 * x1, built through take/pointwise/power
    x0 = ev.take(leaf, ev.constant(numpy.array(0)), 1)
    x1 = ev.take(leaf, ev.constant(numpy.array(1)), 1)
    f = ev.add(ev.multiply(ev.pointwise('sin', x0), ev.pointwise('exp', x1)),
               ev.multiply(ev.power(x0, ev.constant(2.0)), x1))
    g = ev.grad(f, leaf)
    xv = rng.rand(6, 2)
    got = numpy.asarray(ev.Compiled(g).trace({}, {'x': xv}))

    def fnp(xa):
        return numpy.sin(xa[..., 0]) * numpy.exp(xa[..., 1]) + xa[..., 0] ** 2 * xa[..., 1]
    numpy.testing.assert_allclose(got, _fd_grad(fnp, xv), rtol=1e-6, atol=1e-8)


def test_grad_through_inverse_determinant():
    leaf = ev.Leaf('x', (4, 2))
    # A = [[1+x0, x1], [x1, 2+x0]]; f = log(det A) ; df/dA = inv(A)^T chain
    x0 = ev.take(leaf, ev.constant(numpy.array(0)), 1)
    x1 = ev.take(leaf, ev.constant(numpy.array(1)), 1)
    one, two = ev.constant(numpy.ones(4)), ev.constant(2 * numpy.ones(4))
    row0 = ev.Concatenate((ev.InsertAxis(ev.add(one, x0), 1, 1), ev.InsertAxis(x1, 1, 1)), 1)
    row1 = ev.Concatenate((ev.InsertAxis(x1, 1, 1), ev.InsertAxis(ev.add(two, x0), 1, 1)), 1)
    A = ev.Concatenate((ev.InsertAxis(row0, 1, 1), ev.InsertAxis(row1, 1, 1)), 1)
    f = ev.pointwise('log', ev.Determinant(A))
    g = ev.grad(f, leaf)
    xv = rng.rand(4, 2) * 0.3
    got = numpy.asarray(ev.Compiled(g).trace({}, {'x': xv}))

    def fnp(xa):
        Am = numpy.empty((4, 2, 2))
        Am[:, 0, 0] = 1 + xa[..., 0]
        Am[:, 0, 1] = Am[:, 1, 0] = xa[..., 1]
        Am[:, 1, 1] = 2 + xa[..., 0]
        return numpy.log(numpy.linalg.det(Am))
    numpy.testing.assert_allclose(got, _fd_grad(fnp, xv), rtol=1e-6, atol=1e-8)


def test_leafgrad_directional():
    leaf = ev.Leaf(('loc', 991), (5, 3), float)
    f = ev.sum_(ev.multiply(ev.multiply(leaf, leaf), leaf), (0, 1))  # sum x^3
    seed = ev.constant(rng.rand(5, 3))
    lg = ev.LeafGrad(f, leaf.key, seed)
    x0 = rng.rand(5, 3)
    got = float(numpy.asarray(ev.Compiled(lg).trace({}, {leaf.key: x0})))
    want = float((3 * x0 ** 2 * numpy.asarray(seed.value)).sum())
    assert got == pytest.approx(want, rel=1e-10)


def test_arggrad_directional():
    a = ev.Argument('a', (4,))
    f = ev.sum_(ev.multiply(a, ev.pointwise('sin', a)), 0)
    dirn = ev.constant(rng.rand(4))
    agr = ev.ArgGrad(f, 'a', dirn)
    av = rng.rand(4)
    got = float(numpy.asarray(ev.Compiled(agr).trace({'a': av}, {})))
    want = float(((numpy.sin(av) + av * numpy.cos(av)) * numpy.asarray(dirn.value)).sum())
    assert got == pytest.approx(want, rel=1e-10)


def test_argjac_full():
    a = ev.Argument('a', (3,))
    f = ev.multiply(a, a)  # f_i = a_i^2 -> df_i/da_j = 2 a_i delta_ij
    jac = ev.ArgJac(f, 'a', (3,))
    av = rng.rand(3)
    got = numpy.asarray(ev.Compiled(jac).trace({'a': av}, {}))
    numpy.testing.assert_allclose(got, numpy.diag(2 * av), rtol=1e-12, atol=1e-14)


def test_custom_node_with_partials():
    import jax.numpy as jnp

    def fn(x):
        return jnp.sin(x[:, 0]) * x[:, 1]

    def partials(i, x):
        assert i == 0
        return jnp.stack([jnp.cos(x[:, 0]) * x[:, 1], jnp.sin(x[:, 0])], axis=-1).reshape(x.shape[0], 1, 2)[:, 0, :]

    leaf = ev.Leaf('x', (6, 2))
    node = ev.CustomNode(fn, (leaf,), (), float, 1, partials=partials)
    xv = rng.rand(6, 2)
    got = numpy.asarray(ev.Compiled(node).trace({}, {'x': xv}))
    numpy.testing.assert_allclose(got, numpy.sin(xv[:, 0]) * xv[:, 1], rtol=1e-12)
    # custom partials drive the gradient
    g = numpy.asarray(ev.Compiled(ev.grad(node, leaf)).trace({}, {'x': xv}))
    want = numpy.stack([numpy.cos(xv[:, 0]) * xv[:, 1], numpy.sin(xv[:, 0])], axis=-1)
    numpy.testing.assert_allclose(g, want, rtol=1e-10)


# --------------------------------------------------------- builder invariants

def test_simplify_preserves_shape_dtype():
    '''Builders must preserve declared shape/dtype (the analogue of the
    reference's `simplified` assertion, reference evaluable.py:163).'''
    a = ev.Argument('a', (3, 4))
    c = ev.constant(rng.rand(3, 4))
    exprs = [
        ev.add(a, c), ev.multiply(a, c), ev.sum_(a, 1), ev.sum_(a, (0, 1)),
        ev.insertaxis(a, 1, 7), ev.transpose(a, (1, 0)), ev.ravel(a, 0),
        ev.take(a, ev.constant(numpy.array([2, 0])), 1),
        ev.inflate(a, ev.constant(numpy.tile(numpy.arange(4), (3, 1))), 9, 1),
        ev.power(ev.pointwise('abs', a), ev.constant(2.0)),
    ]
    for e in exprs:
        assert all(isinstance(n, int) for n in e.shape)
        v = numpy.asarray(ev.Compiled(e).trace({'a': rng.rand(3, 4)}, {}))
        assert v.shape == e.shape


def test_grad_inflate_pushdown_equivalence():
    '''grad(Inflate(f)) == Inflate(grad(f)) numerically (the pushdown rule
    enabling vector-residual localization).'''
    leaf = ev.Leaf('x', (4, 2))
    vals = ev.multiply(ev.take(leaf, ev.constant(numpy.array(0)), 1),
                       ev.take(leaf, ev.constant(numpy.array(1)), 1))  # [4]
    vals2 = ev.insertaxis(vals, 1, 3)  # [4, 3]
    dofs = ev.constant(rng.randint(0, 7, (4, 3)))
    infl = ev.Inflate(vals2, dofs, 7, 1)
    g_built = ev.grad(ev.inflate(vals2, dofs, 7, 1), leaf)
    g_naive = ev.Grad(infl, leaf)
    xv = rng.rand(4, 2)
    a = numpy.asarray(ev.Compiled(g_built).trace({}, {'x': xv}))
    b = numpy.asarray(ev.Compiled(g_naive).trace({}, {'x': xv}))
    numpy.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-14)
    assert not isinstance(g_built, ev.Grad), 'pushdown failed to fire'
