'''Numpy-protocol operation matrix for function.Array (reference model:
tests/test_function.py — every arithmetic/structural/linear-algebra op
checked against the equivalent numpy computation on sampled values, across
shapes and broadcasting patterns).'''

import numpy
import pytest

from nutils_tpu import function, mesh

RNG = numpy.random.default_rng(7)


@pytest.fixture(scope='module')
def ctx():
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 3)] * 2)
    smp = topo.sample('gauss', 2)
    x = numpy.asarray(smp.eval(geom, {}))  # [npts, 2]
    return topo, geom, smp, x


def _check(smp, expr, want, **tol):
    got = numpy.asarray(smp.eval(expr, {}))
    numpy.testing.assert_allclose(got, want, **{'rtol': 1e-12, 'atol': 1e-12, **tol})


# ------------------------------------------------------------- binary ops

BINOPS = [
    ('add', lambda a, b: a + b, lambda a, b: a + b),
    ('sub', lambda a, b: a - b, lambda a, b: a - b),
    ('mul', lambda a, b: a * b, lambda a, b: a * b),
    ('div', lambda a, b: a / (b + 2), lambda a, b: a / (b + 2)),
    ('pow', lambda a, b: (a + 1.5) ** 2, lambda a, b: (a + 1.5) ** 2),
    ('min', function.min_, numpy.minimum),
    ('max', function.max_, numpy.maximum),
    ('arctan2', function.arctan2, numpy.arctan2),
]


@pytest.mark.parametrize('name,fop,nop', BINOPS, ids=[b[0] for b in BINOPS])
def test_binary_scalar_fields(ctx, name, fop, nop):
    topo, geom, smp, x = ctx
    a, b = geom[0], geom[1]
    _check(smp, fop(a, b), nop(x[:, 0], x[:, 1]))


@pytest.mark.parametrize('shape_a,shape_b', [((3,), (3,)), ((2, 3), (3,)),
                                             ((2, 1), (2, 3)), ((), (4,))])
def test_binary_broadcasting(ctx, shape_a, shape_b):
    topo, geom, smp, x = ctx
    A = RNG.standard_normal(shape_a)
    B = RNG.standard_normal(shape_b)
    fa = function.asarray(A) * (geom[0] + 1)  # make it field-dependent
    fb = function.asarray(B) * (geom[1] + 2)
    out_shape = numpy.broadcast_shapes(shape_a, shape_b)
    n = len(x)

    def lift(V, shp):
        v = V.reshape((n,) + (1,) * (len(out_shape) - len(shp)) + shp)
        return numpy.broadcast_to(v, (n,) + out_shape)
    want = lift(A * (x[:, 0] + 1).reshape((-1,) + (1,) * len(shape_a)), shape_a) \
        + lift(B * (x[:, 1] + 2).reshape((-1,) + (1,) * len(shape_b)), shape_b)
    _check(smp, fa + fb, want)


# -------------------------------------------------------------- unary ops

UNARY = [
    ('neg', lambda a: -a, lambda a: -a),
    ('abs', function.abs_, numpy.abs),
    ('sin', function.sin, numpy.sin),
    ('cos', function.cos, numpy.cos),
    ('tan', function.tan, numpy.tan) if hasattr(function, 'tan') else None,
    ('sinh', function.sinh, numpy.sinh),
    ('cosh', function.cosh, numpy.cosh),
    ('exp', function.exp, numpy.exp),
    ('sqrt', function.sqrt, lambda a: numpy.sqrt(numpy.abs(a) + 1)),
    ('heaviside', function.heaviside, lambda a: numpy.heaviside(a, .5)),
]
UNARY = [u for u in UNARY if u is not None]


@pytest.mark.parametrize('name,fop,nop', UNARY, ids=[u[0] for u in UNARY])
def test_unary(ctx, name, fop, nop):
    topo, geom, smp, x = ctx
    a = geom[0] - 0.4
    arg = function.abs_(a) + 1 if name == 'sqrt' else a
    _check(smp, fop(arg), nop(x[:, 0] - 0.4))


def test_ln_log_family(ctx):
    topo, geom, smp, x = ctx
    f = geom[0] + 1.5
    _check(smp, function.ln(f), numpy.log(x[:, 0] + 1.5))


# -------------------------------------------------------- structural ops

def test_stack_concatenate_transpose(ctx):
    topo, geom, smp, x = ctx
    a, b = geom[0], geom[1]
    st = function.stack([a, b, a * b], axis=0)
    want = numpy.stack([x[:, 0], x[:, 1], x[:, 0] * x[:, 1]], axis=1)
    _check(smp, st, want)
    cc = function.concatenate([st, st[:2]], axis=0)
    _check(smp, cc, numpy.concatenate([want, want[:, :2]], axis=1))
    M = function.stack([st, 2 * st], axis=0)  # [2, 3]
    _check(smp, function.transpose(M), numpy.stack([want, 2 * want], 1).transpose(0, 2, 1))


def test_getitem_slicing(ctx):
    topo, geom, smp, x = ctx
    A = RNG.standard_normal((4, 3))
    f = function.asarray(A) * geom[0]
    want = A * x[:, 0, None, None]
    _check(smp, f[1], want[:, 1])
    _check(smp, f[:, 2], want[:, :, 2])
    _check(smp, f[1:3], want[:, 1:3])
    _check(smp, f[:, ::2], want[:, :, ::2])
    _check(smp, f[-1], want[:, -1])


def test_sum_axes(ctx):
    topo, geom, smp, x = ctx
    A = RNG.standard_normal((4, 3))
    f = function.asarray(A) * geom[0]
    want = A * x[:, 0, None, None]
    _check(smp, function.sum_(f, 0), want.sum(1))
    _check(smp, function.sum_(f, 1), want.sum(2))
    _check(smp, f.sum(-1), want.sum(-1))


def test_matmul_variants(ctx):
    topo, geom, smp, x = ctx
    A = RNG.standard_normal((3, 4))
    v = RNG.standard_normal(4)
    fA = function.asarray(A) * geom[0]
    fv = function.asarray(v) * geom[1]
    wA = A * x[:, 0, None, None]
    wv = v * x[:, 1, None]
    _check(smp, function.matmul(fA, fv), numpy.einsum('pij,pj->pi', wA, wv))
    _check(smp, fA @ fv, numpy.einsum('pij,pj->pi', wA, wv))
    _check(smp, fv @ fv, numpy.einsum('pj,pj->p', wv, wv))


def test_inverse_determinant(ctx):
    topo, geom, smp, x = ctx
    base = numpy.eye(3) * 2 + RNG.standard_normal((3, 3)) * 0.1
    f = function.asarray(base) * (1 + geom[0])
    w = base * (1 + x[:, 0, None, None])
    _check(smp, function.determinant(f), numpy.linalg.det(w), rtol=1e-9)
    _check(smp, function.inverse(f), numpy.linalg.inv(w), rtol=1e-9)


def test_kronecker_scatter_eye(ctx):
    topo, geom, smp, x = ctx
    f = geom[0] * 3
    k = function.kronecker(f, 0, 4, 2)
    want = numpy.zeros((len(x), 4))
    want[:, 2] = x[:, 0] * 3
    _check(smp, k, want)
    _check(smp, function.eye(3), numpy.broadcast_to(numpy.eye(3), (len(x), 3, 3)))


def test_trace_levicivita(ctx):
    topo, geom, smp, x = ctx
    A = RNG.standard_normal((3, 3))
    f = function.asarray(A) * geom[1]
    w = A * x[:, 1, None, None]
    _check(smp, function.trace(f), numpy.trace(w, axis1=1, axis2=2))
    eps = numpy.asarray(smp.eval(function.levicivita(3), {}))
    want = numpy.zeros((3, 3, 3))
    for i, j, k in [(0, 1, 2), (1, 2, 0), (2, 0, 1)]:
        want[i, j, k] = 1
        want[i, k, j] = -1
    numpy.testing.assert_allclose(eps.reshape(-1, 3, 3, 3) - want, 0, atol=1e-14)


def test_normalized_trignormal(ctx):
    topo, geom, smp, x = ctx
    v = function.stack([1 + geom[0], geom[1] - 2])
    got = numpy.asarray(smp.eval(function.normalized(v), {}))
    numpy.testing.assert_allclose((got ** 2).sum(-1), 1.0, atol=1e-12)
    ang = geom[0] * 2
    tn = numpy.asarray(smp.eval(function.trignormal(ang), {}))
    numpy.testing.assert_allclose(tn, numpy.stack([numpy.cos(2 * x[:, 0]), numpy.sin(2 * x[:, 0])], 1), atol=1e-12)


# ------------------------------------------------------------- reductions
# over the dtype/int behavior

def test_int_float_promotion(ctx):
    topo, geom, smp, x = ctx
    ia = function.asarray(numpy.arange(3))
    f = ia * geom[0]
    assert f.dtype is float
    _check(smp, f, numpy.arange(3) * x[:, 0, None])


def test_python_operator_dunder_surface(ctx):
    topo, geom, smp, x = ctx
    g = geom[0]
    _check(smp, 2 + g, 2 + x[:, 0])
    _check(smp, 2 - g, 2 - x[:, 0])
    _check(smp, 2 * g, 2 * x[:, 0])
    _check(smp, 2 / (g + 1), 2 / (x[:, 0] + 1))
    _check(smp, (g + 1) ** 3, (x[:, 0] + 1) ** 3)
    _check(smp, -g, -x[:, 0])
    _check(smp, abs(g - .3), numpy.abs(x[:, 0] - .3))
