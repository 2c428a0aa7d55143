'''Packing/quadrature/spline unit tests.'''

import numpy
import pytest

from nutils_tpu.ops import quadrature, spline
from nutils_tpu.utils import numeric


def test_pack_roundtrip():
    a = numpy.array([0.0, 0.5, 1.0, 2.0, -3.0, numpy.nan])
    n = numeric.pack(a, 2e-15, 2e-3, 'int16')
    b = numeric.unpack(n, 2e-15, 2e-3)
    sp = numpy.sqrt((2e-15) ** 2 + (a * 2e-3) ** 2)
    ok = numpy.abs(a - b) <= sp
    assert ok[~numpy.isnan(a)].all()
    assert numpy.isnan(b[-1])


def test_pack_reference_values():
    # spot values documented in the reference (numeric.py:383-391)
    def truncate(a, dtype, **tol):
        return numeric.unpack(numeric.pack(a, dtype=dtype, **tol), **tol)
    assert truncate(0.5, 'int16', atol=2e-15, rtol=2e-3) == pytest.approx(0.5004, abs=1e-4)
    assert truncate(1, 'int16', atol=2e-15, rtol=2e-3) == pytest.approx(0.9998, abs=1e-4)
    assert truncate(2, 'int16', atol=2e-15, rtol=2e-3) == pytest.approx(2.0013, abs=1e-4)
    assert truncate(2, 'int16', atol=2e-15, rtol=2e-4) == numpy.inf


def test_base64_roundtrip():
    a = numpy.linspace(-2, 2, 37)
    s = numeric.base64_pack(a)
    b = numeric.base64_unpack(s)
    sp = numpy.sqrt((2e-15) ** 2 + (a * 2e-3) ** 2)
    assert (numpy.abs(a - b) <= sp).all()


@pytest.mark.parametrize('degree', range(1, 8))
def test_gauss_line_exact(degree):
    x, w = quadrature.line(degree)
    for p in range(degree + 1):
        exact = 1 / (p + 1)
        assert (w * x[:, 0] ** p).sum() == pytest.approx(exact, rel=1e-13)


@pytest.mark.parametrize('degree', range(1, 7))
def test_gauss_triangle_exact(degree):
    x, w = quadrature.triangle(degree)
    import math
    for p in range(degree + 1):
        for q in range(degree + 1 - p):
            exact = math.factorial(p) * math.factorial(q) / math.factorial(p + q + 2)
            assert (w * x[:, 0] ** p * x[:, 1] ** q).sum() == pytest.approx(exact, rel=1e-12)


@pytest.mark.parametrize('degree', range(1, 5))
def test_gauss_tet_exact(degree):
    x, w = quadrature.tetrahedron(degree)
    import math
    for p in range(degree + 1):
        for q in range(degree + 1 - p):
            for r in range(degree + 1 - p - q):
                exact = (math.factorial(p) * math.factorial(q) * math.factorial(r)
                         / math.factorial(p + q + r + 3))
                assert (w * x[:, 0] ** p * x[:, 1] ** q * x[:, 2] ** r).sum() == pytest.approx(exact, rel=1e-12)


@pytest.mark.parametrize('degree,continuity,ndofs', [(1, 0, 5), (2, 1, 6), (2, 0, 9), (3, 2, 7), (3, 0, 13)])
def test_spline_counts(degree, continuity, ndofs):
    off, co, nd = spline.splinebasis_1d(4, degree, continuity=continuity)
    assert nd == ndofs
    # partition of unity on every element
    for e in range(4):
        for t in (0.0, 0.33, 1.0):
            assert co[e] @ t ** numpy.arange(degree + 1) == pytest.approx(1.0) or \
                (co[e] @ t ** numpy.arange(degree + 1)).sum() == pytest.approx(1.0)


def test_spline_continuity():
    for p, c in [(2, 1), (3, 2)]:
        off, co, nd = spline.splinebasis_1d(5, p, continuity=c)
        # evaluate basis and derivatives at the junctions: continuity c means
        # derivatives up to order c match
        for e in range(4):
            for der in range(c + 1):
                dl = numpy.polynomial.polynomial.polyder(co[e].T, der).T if der else co[e]
                dr = numpy.polynomial.polynomial.polyder(co[e + 1].T, der).T if der else co[e + 1]
                left = dl @ numpy.ones(dl.shape[1]) if False else sum(dl[:, k] * 1.0 ** k for k in range(dl.shape[1]))
                right = dr[:, 0]
                full_l = numpy.zeros(nd)
                full_r = numpy.zeros(nd)
                full_l[(off[e] + numpy.arange(p + 1)) % nd] += left
                full_r[(off[e + 1] + numpy.arange(p + 1)) % nd] += right
                numpy.testing.assert_allclose(full_l, full_r, atol=1e-10)


def test_simplex_grid():
    from nutils_tpu.utils import numeric
    import numpy
    pts = numeric.simplex_grid([1, 1], 0.2)
    assert pts.ndim == 2 and pts.shape[1] == 2
    assert (pts >= 0).all() and (pts <= 1).all()
    # nearest-neighbour spacing close to requested
    d = numpy.sqrt(((pts[:, None] - pts[None, :]) ** 2).sum(-1))
    numpy.fill_diagonal(d, numpy.inf)
    assert abs(d.min() - 0.2) < 0.05


def test_native_poly_kernels():
    import numpy
    from nutils_tpu import native
    if native._get_poly() is None:
        return  # toolchain absent: python fallback covers functionality
    rng = numpy.random.default_rng(0)
    for d, K in [(1, 3), (2, 3), (2, 4)]:
        a = rng.normal(size=(K,) * d)
        b = rng.normal(size=(K,) * d)
        out = native.poly_mul(a, b)
        # brute-force reference
        ref = numpy.zeros((2 * K - 1,) * d)
        for ia in numpy.ndindex(*a.shape):
            for ib in numpy.ndindex(*b.shape):
                ref[tuple(x + y for x, y in zip(ia, ib))] += a[ia] * b[ib]
        assert numpy.abs(out - ref).max() < 1e-12
        cd = native.poly_change_degree(a, K + 2)
        assert cd.shape == (K + 2,) * d and numpy.abs(cd[(slice(0, K),) * d] - a).max() == 0
