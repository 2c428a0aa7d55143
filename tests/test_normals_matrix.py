'''Normal-vector identity matrix (reference: tests/test_normals.py): for
straight and curved geometries in 1-D/2-D/3-D, the outward boundary normal
must satisfy the divergence-theorem closures

  * ∮ n dS = 0                      (closed-surface normal closure)
  * ∮ x ⊗ n dS = V I                (volume from boundary flux)
  * ∫ ∇·(f g) dV = ∮ f g · n dS − Σ_interfaces ∮ [[f g]] · n dS

plus curvature of a known curved arc and axis alignment of named structured
boundaries.  These identities exercise normal(), J(), jump() and the
boundary/interfaces topologies together, which is where orientation bugs
hide.'''

import numpy
import pytest

from nutils_tpu import function, mesh


def _straight(ndims):
    lines = [[1, 1.5, 2], [-1, 0], [0, 2, 4]][:ndims]
    topo, geom = mesh.rectilinear(lines)
    volume = 1.0
    for line in lines:
        volume *= line[-1] - line[0]
    return topo, geom, volume


def _curved():
    # (√2 sin ξ cos η, √2 cos ξ sin η) on [−π/4, π/4]²: a genuinely curved
    # diffeomorphism whose boundary has curvature 1 (it maps the square onto
    # a region bounded by unit-circle arcs)
    nodes = numpy.linspace(-.25 * numpy.pi, .25 * numpy.pi, 3)
    topo, x = mesh.rectilinear([nodes, nodes])
    geom = numpy.sqrt(2) * function.stack(
        [function.sin(x[0]) * function.cos(x[1]),
         function.cos(x[0]) * function.sin(x[1])])
    return topo, geom


def _cases():
    for ndims in (1, 2, 3):
        yield pytest.param(ndims, False, id=f'{ndims}d')
    yield pytest.param(2, True, id='2d-curved')


@pytest.mark.parametrize('ndims,curved', _cases())
def test_normal_closure(ndims, curved):
    topo, geom = _curved() if curved else _straight(ndims)[:2]
    zero = topo.boundary.integrate(function.normal(geom) * function.J(geom), degree=9)
    numpy.testing.assert_allclose(numpy.asarray(zero), 0, atol=1e-10)


@pytest.mark.parametrize('ndims,curved', _cases())
def test_volume_from_boundary_flux(ndims, curved):
    topo, geom = _curved() if curved else _straight(ndims)[:2]
    ndims = len(geom)
    volume = topo.integrate(function.J(geom), degree=9)
    flux = topo.boundary.integrate(
        geom[:, None] * function.normal(geom)[None, :] * function.J(geom), degree=9)
    numpy.testing.assert_allclose(numpy.asarray(flux),
                                  float(volume) * numpy.eye(ndims), atol=1e-10)


@pytest.mark.parametrize('ndims,curved', _cases())
def test_gauss_identity_discontinuous(ndims, curved):
    '''∫ ∇·(f g) dV computed elementwise must equal the boundary flux minus
    the interface jump flux for a discontinuous integrand (the orientation
    consistency of boundary and interface normals).'''
    topo, geom = _curved() if curved else _straight(ndims)[:2]
    ndims = len(geom)
    basis = topo.basis('discont', degree=2)
    nb = basis.shape[0]
    f = (basis[:, None] * numpy.arange(nb * ndims).reshape(nb, ndims)).sum(0)
    g = basis @ numpy.arange(nb)
    fg = f * g
    lhs = topo.integrate(
        (function.div(f, geom) * g + (f * function.grad(g, geom)).sum(-1)) * function.J(geom),
        degree=9)
    rhs = topo.boundary.integrate(
        (fg * function.normal(geom)).sum(-1) * function.J(geom), degree=9)
    if len(topo.interfaces):
        rhs = rhs - topo.interfaces.integrate(
            (function.jump(fg) * function.normal(geom)).sum(-1) * function.J(geom), degree=9)
    numpy.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-10, atol=1e-10)


def test_curved_boundary_curvature():
    topo, geom = _curved()
    c = topo.boundary.sample('uniform', 1).eval(function.curvature(geom))
    numpy.testing.assert_allclose(numpy.asarray(c), 1.0, rtol=1e-12)


@pytest.mark.parametrize('ndims', [1, 2, 3])
def test_named_boundary_normals(ndims):
    topo, geom, _ = _straight(ndims)
    for name, n in zip(['right', 'top', 'back'][:ndims], numpy.eye(ndims)):
        np_plus = topo.boundary[name].sample('uniform', 2).eval(function.normal(geom))
        numpy.testing.assert_allclose(np_plus, numpy.broadcast_to(n, np_plus.shape), atol=1e-13)
    for name, n in zip(['left', 'bottom', 'front'][:ndims], -numpy.eye(ndims)):
        np_minus = topo.boundary[name].sample('uniform', 2).eval(function.normal(geom))
        numpy.testing.assert_allclose(np_minus, numpy.broadcast_to(n, np_minus.shape), atol=1e-13)


@pytest.mark.parametrize('ndims', [2, 3])
def test_manifold_normal_exterior(ndims):
    '''the normal of a codim-1 boundary geometry agrees with the exterior
    normal computed from the embedding (reference: test_normals.check.zero
    on boundary topologies).'''
    topo, geom, _ = _straight(ndims)
    btopo = topo.boundary
    closure = btopo.integrate(function.normal(geom) * function.J(geom), degree=9)
    numpy.testing.assert_allclose(numpy.asarray(closure), 0, atol=1e-10)
