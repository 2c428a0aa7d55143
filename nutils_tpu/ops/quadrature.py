'''Quadrature rules on reference elements (host-side, numpy, float64).

The reference hardcodes simplex Gauss tables (reference: points.py:343-460);
here line rules come from Golub-Welsch (numpy leggauss) and simplex rules from
collapsed-coordinate Gauss-Jacobi products (Duffy transform), which integrate
polynomials of the requested total degree exactly with a tensor point count.
Exactness — not point-for-point parity — is what the regression suite
observes, since solutions depend only on exactly-integrated forms.

>>> import numpy
>>> from nutils_tpu.ops import quadrature
>>> x, w = quadrature.gauss_line(3)       # exact through degree 5 on [0, 1]
>>> float(w @ x**5)
0.16666666666666666±1e-14
>>> x, w = quadrature.triangle(2)         # exact for quadratics on the simplex
>>> float(w @ (x[:, 0] * x[:, 1]))
0.041666666666666664±1e-14
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


def _orbit_rule(orbits, volume):
    '''Assemble a symmetric simplex rule from (index_patterns, coords, weight)
    orbits; weights are normalized by the reference volume.'''
    pts = []
    wts = []
    for patterns, c, w in orbits:
        for pat in patterns:
            pts.append([c[k] for k in pat])
            wts.append(w * volume)
    return numpy.asarray(pts, dtype=float), numpy.asarray(wts, dtype=float)


# classic symmetric simplex rules (Dunavant / Jinyun constants, e.g. Flaherty,
# "Finite Element Analysis" lecture notes, ch. 6) -- the same rules the
# reference uses (points.py:360,404), so non-polynomial integrands evaluate
# identically.
_TRI_I = ([0, 0],)
_TRI_J = ([1, 1], [0, 1], [1, 0])
_TRI_K = ([1, 2], [2, 0], [0, 1], [2, 1], [1, 0], [0, 2])


@functools.cache
def triangle(degree):
    '''Symmetric rule on the unit triangle {x,y >= 0, x+y <= 1}.

    Mirrors the reference's degree cap: rules are tabulated up to total
    degree 7 and higher degrees fall back to the degree-7 rule.
    '''
    if degree <= 1:
        orbits = [(_TRI_I, [1/3], 1.0)]
    elif degree == 2:
        orbits = [(_TRI_J, [2/3, 1/6], 1/3)]
    elif degree == 3:
        orbits = [(_TRI_I, [1/3], -9/16), (_TRI_J, [3/5, 1/5], 25/48)]
    elif degree == 4:
        orbits = [(_TRI_J, [0.816847572980458, 0.091576213509771], 0.109951743655322),
                  (_TRI_J, [0.108103018168070, 0.445948490915965], 0.223381589678011)]
    elif degree == 5:
        orbits = [(_TRI_I, [1/3], 0.225),
                  (_TRI_J, [0.797426985353088, 0.101286507323456], 0.125939180544827),
                  (_TRI_J, [0.059715871789770, 0.470142064105115], 0.132394152788506)]
    elif degree == 6:
        orbits = [(_TRI_J, [0.873821971016996, 0.063089014491502], 0.050844906370207),
                  (_TRI_J, [0.501426509658180, 0.249286745170910], 0.116786275726379),
                  (_TRI_K, [0.636502499121399, 0.310352451033785, 0.053145049844816], 0.082851075618374)]
    else:
        orbits = [(_TRI_I, [1/3], -0.149570044467671),
                  (_TRI_J, [0.479308067841924, 0.260345966079038], 0.175615257433204),
                  (_TRI_J, [0.869739794195568, 0.065130102902216], 0.053347235608839),
                  (_TRI_K, [0.638444188569809, 0.312865496004875, 0.048690315425316], 0.077113760890257)]
    return _orbit_rule(orbits, 0.5)


_TET_I = ([0, 0, 0],)
_TET_J = ([1, 1, 1], [0, 1, 1], [1, 1, 0], [1, 0, 1])
_TET_K = ([0, 1, 1], [1, 0, 1], [1, 1, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1])
_TET_L = ([0, 1, 1], [1, 0, 1], [1, 1, 0], [2, 1, 1], [1, 2, 1], [1, 1, 2],
          [1, 0, 2], [0, 2, 1], [2, 1, 0], [1, 2, 0], [0, 1, 2], [2, 0, 1])


@functools.cache
def tetrahedron(degree):
    '''Symmetric rule on the unit tetrahedron (same family as ``triangle``,
    tabulated up to degree 8).'''
    if degree <= 1:
        orbits = [(_TET_I, [1/4], 1.0)]
    elif degree == 2:
        orbits = [(_TET_J, [0.5854101966249685, 0.1381966011250105], 1/4)]
    elif degree == 3:
        orbits = [(_TET_I, [.25], -.8), (_TET_J, [.5, 1/6], .45)]
    elif degree == 4:
        orbits = [(_TET_I, [.25], -.2368/3),
                  (_TET_J, [0.7857142857142857, 0.0714285714285714], .1372/3),
                  (_TET_K, [0.1005964238332008, 0.3994035761667992], .448/3)]
    elif degree == 5:
        orbits = [(_TET_I, [.25], 0.1817020685825351),
                  (_TET_J, [0., 1/3], 0.0361607142857143),
                  (_TET_J, [8/11, 1/11], 0.0698714945161738),
                  (_TET_K, [0.4334498464263357, 0.0665501535736643], 0.0656948493683187)]
    elif degree == 6:
        orbits = [(_TET_J, [0.3561913862225449, 0.2146028712591517], 0.0399227502581679),
                  (_TET_J, [0.8779781243961660, 0.0406739585346113], 0.0100772110553207),
                  (_TET_J, [0.0329863295731731, 0.3223378901422757], 0.0553571815436544),
                  (_TET_L, [0.2696723314583159, 0.0636610018750175, 0.6030056647916491], 0.0482142857142857)]
    elif degree == 7:
        orbits = [(_TET_I, [.25], 0.1095853407966528),
                  (_TET_J, [0.7653604230090441, 0.0782131923303186], 0.0635996491464850),
                  (_TET_J, [0.6344703500082868, 0.1218432166639044], -0.3751064406859797),
                  (_TET_J, [0.0023825066607383, 0.3325391644464206], 0.0293485515784412),
                  (_TET_K, [0., .5], 0.0058201058201058),
                  (_TET_L, [.2, .1, .6], 0.1653439153439105)]
    else:
        orbits = [(_TET_I, [.25], -0.2359620398477557),
                  (_TET_J, [0.6175871903000830, 0.1274709365666390], 0.0244878963560562),
                  (_TET_J, [0.9037635088221031, 0.0320788303926323], 0.0039485206398261),
                  (_TET_K, [0.4502229043567190, 0.0497770956432810], 0.0263055529507371),
                  (_TET_K, [0.3162695526014501, 0.1837304473985499], 0.0829803830550589),
                  (_TET_L, [0.0229177878448171, 0.2319010893971509, 0.5132800333608811], 0.0254426245481023),
                  (_TET_L, [0.7303134278075384, 0.0379700484718286, 0.1937464752488044], 0.0134324384376852)]
    return _orbit_rule(orbits, 1/6)
