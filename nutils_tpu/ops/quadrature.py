'''Quadrature rules on reference elements (host-side, numpy, float64).

The reference hardcodes simplex Gauss tables (reference: points.py:343-460);
here line rules come from Golub-Welsch (numpy leggauss) and simplex rules from
collapsed-coordinate Gauss-Jacobi products (Duffy transform), which integrate
polynomials of the requested total degree exactly with a tensor point count.
Exactness — not point-for-point parity — is what the regression suite
observes, since solutions depend only on exactly-integrated forms.
'''

import functools

import numpy


@functools.cache
def gauss_line(npoints):
    '''Gauss-Legendre points/weights on [0, 1].'''
    x, w = numpy.polynomial.legendre.leggauss(npoints)
    return (x + 1) / 2, w / 2


@functools.cache
def gauss_jacobi_line(npoints, alpha):
    '''Gauss-Jacobi points/weights on [0, 1] with weight (1-x)^alpha.'''
    from scipy.special import roots_jacobi
    x, w = roots_jacobi(npoints, alpha, 0.0)
    # map [-1,1] -> [0,1]; weight (1-x)^alpha picks up a factor 2^-(alpha+1)
    return (x + 1) / 2, w / 2 ** (alpha + 1)


def line(degree):
    '''Rule on the unit interval exact for polynomials of given degree.'''
    n = max(1, (degree + 2) // 2)
    x, w = gauss_line(n)
    return x[:, None], w


def tensor(degree, ndims):
    '''Tensor-product Gauss rule on the unit hypercube.'''
    x1, w1 = line(degree)
    coords, weights = x1, w1
    for _ in range(ndims - 1):
        coords = numpy.concatenate([
            numpy.repeat(coords, len(x1), axis=0),
            numpy.tile(x1, (len(coords), 1)),
        ], axis=1)
        weights = (weights[:, None] * w1[None, :]).ravel()
    return coords, weights


def triangle(degree):
    '''Rule on the unit triangle {x,y >= 0, x+y <= 1}, exact for total degree.

    Duffy map from the square: x = u*(1-v), y = v with jacobian (1-v);
    the v-direction uses Gauss-Jacobi(alpha=1) so the jacobian is absorbed
    exactly into the weight.
    '''
    n = max(1, (degree + 2) // 2)
    u, wu = gauss_line(n)
    v, wv = gauss_jacobi_line(n, 1.0)
    U, V = numpy.meshgrid(u, v, indexing='ij')
    W = numpy.outer(wu, wv)
    coords = numpy.stack([(U * (1 - V)).ravel(), V.ravel()], axis=1)
    return coords, W.ravel()


def tetrahedron(degree):
    '''Collapsed-coordinate rule on the unit tetrahedron.'''
    n = max(1, (degree + 2) // 2)
    u, wu = gauss_line(n)
    v, wv = gauss_jacobi_line(n, 1.0)
    t, wt = gauss_jacobi_line(n, 2.0)
    U, V, T = numpy.meshgrid(u, v, t, indexing='ij')
    W = wu[:, None, None] * wv[None, :, None] * wt[None, None, :]
    x = U * (1 - V) * (1 - T)
    y = V * (1 - T)
    z = T
    coords = numpy.stack([x.ravel(), y.ravel(), z.ravel()], axis=1)
    return coords, W.ravel()
