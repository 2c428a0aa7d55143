'''Quadrature exactness: every gauss rule must integrate all monomials up to
its advertised degree exactly (reference scope model: tests/test_quadrature.py:35).'''

import itertools
import math

import numpy
import pytest

from nutils_tpu import element


def _monomial_integral_box(powers):
    '''∫_[0,1]^d prod x_i^p_i dx = prod 1/(p_i+1).'''
    return numpy.prod([1.0 / (p + 1) for p in powers])


def _monomial_integral_simplex(powers):
    '''∫_simplex prod x_i^p_i dx = prod(p_i!) / (d + sum p_i)! over the unit
    simplex x_i >= 0, sum x_i <= 1.'''
    d = len(powers)
    num = numpy.prod([math.factorial(p) for p in powers])
    return num / math.factorial(d + sum(powers))


def _check(ref, degree, exact_fn):
    pts, wts = ref.gauss(degree)
    d = ref.ndims
    assert pts.shape[1] == d
    for powers in itertools.product(range(degree + 1), repeat=d):
        if sum(powers) > degree:
            continue
        got = float((wts * numpy.prod(pts ** numpy.asarray(powers), axis=1)).sum())
        want = exact_fn(powers)
        assert got == pytest.approx(want, rel=1e-12, abs=1e-14), \
            f'{type(ref).__name__} degree {degree} monomial {powers}: {got} != {want}'


@pytest.mark.parametrize('degree', range(1, 9))
def test_line(degree):
    _check(element.LineReference(), degree, _monomial_integral_box)


@pytest.mark.parametrize('degree', range(1, 7))
def test_quad(degree):
    _check(element.QuadReference(), degree, _monomial_integral_box)


@pytest.mark.parametrize('degree', range(1, 6))
def test_hex(degree):
    _check(element.HexReference(), degree, _monomial_integral_box)


@pytest.mark.parametrize('degree', range(1, 8))
def test_triangle(degree):
    # same degree cap as the reference: triangle rules to degree 7
    # (reference points.py:358)
    _check(element.TriangleReference(), degree, _monomial_integral_simplex)


@pytest.mark.parametrize('degree', range(1, 9))
def test_tetrahedron(degree):
    # tet rules to degree 8 (reference points.py:402)
    _check(element.TetReference(), degree, _monomial_integral_simplex)


def test_weights_positive_and_sum():
    for ref, vol in [(element.LineReference(), 1.0),
                     (element.QuadReference(), 1.0),
                     (element.HexReference(), 1.0),
                     (element.TriangleReference(), 0.5),
                     (element.TetReference(), 1 / 6)]:
        for degree in range(1, 6):
            pts, wts = ref.gauss(degree)
            assert wts.sum() == pytest.approx(vol, rel=1e-12)
            # points inside the closed reference element
            assert (pts >= -1e-12).all()
            if isinstance(ref, (element.TriangleReference, element.TetReference)):
                assert (pts.sum(1) <= 1 + 1e-12).all()
            else:
                assert (pts <= 1 + 1e-12).all()


def test_bezier_lattice():
    '''bezier(n) covers the vertex lattice with a valid triangulation.'''
    for ref in [element.LineReference(), element.QuadReference(),
                element.HexReference(), element.TriangleReference(),
                element.TetReference()]:
        pts, tri, hull = ref.bezier(3)
        d = ref.ndims
        assert pts.shape[1] == d
        # vertices of the reference are in the lattice
        for v in ref.vertices:
            assert ((numpy.abs(pts - v) < 1e-12).all(1)).any()
        if tri is not None and d:
            # triangulated volume = reference volume
            vol = 0.0
            for simplex in tri:
                V = pts[simplex]
                vol += abs(numpy.linalg.det(V[1:] - V[0])) / math.factorial(d)
            want = 0.5 if isinstance(ref, element.TriangleReference) \
                else 1 / 6 if isinstance(ref, element.TetReference) else 1.0
            assert vol == pytest.approx(want, rel=1e-12)
