'''function.derivative and function.Custom (VERDICT round-1 item 8;
reference: function.py:2021 derivative, function.py:665 Custom).'''

import numpy
import pytest

from nutils_tpu import function, mesh
from nutils_tpu.solver import System


def test_derivative_standalone_matches_fd():
    u = function.Argument('u', (4,))
    f = function.sum_(function.multiply(function.sin(u), u), 0)  # scalar
    d = function.derivative(f, 'u')
    assert d.shape == (4,)
    u0 = numpy.linspace(0.3, 1.2, 4)
    got = numpy.asarray(d.eval(u=u0))
    eps = 1e-6
    fd = numpy.array([(float(f.eval(u=u0 + eps * numpy.eye(4)[i])) -
                       float(f.eval(u=u0 - eps * numpy.eye(4)[i]))) / (2 * eps)
                      for i in range(4)])
    numpy.testing.assert_allclose(got, fd, rtol=1e-6)


def test_derivative_nonscalar_shape():
    u = function.Argument('u', (3,))
    f = function.multiply(u, u)  # shape (3,)
    d = function.derivative(f, 'u')
    assert d.shape == (3, 3)
    u0 = numpy.array([1.0, 2.0, 3.0])
    got = numpy.asarray(d.eval(u=u0))
    numpy.testing.assert_allclose(got, numpy.diag(2 * u0), rtol=1e-12)


def test_derivative_unknown_argument_raises():
    u = function.Argument('u', (3,))
    with pytest.raises(ValueError, match='does not appear'):
        function.derivative(u, 'nope')


def test_energy_derivative_residual_solves_laplace():
    '''The VERDICT done-criterion: a reference-style
    ``energy.derivative('u')``-built residual solves laplace identically to
    the System(energy) path.'''
    topo, geom = mesh.unitsquare(8, 'square')
    u = topo.field('u', btype='std', degree=1)
    g = function.grad(u, geom)
    J = function.J(geom)
    f = function.sin(geom[0]) * function.cosh(geom[1])
    energy = topo.integral(((g @ g) / 2 - f * u) * J, degree=2)

    sqr = topo.boundary.integral(u * u * function.J(geom), degree=2)
    cons = System(sqr, trial='u').solve_constraints(droptol=1e-15)

    args_energy = System(energy, trial='u').solve(constrain=cons)
    residual = energy.derivative('u')
    assert residual.shape == args_energy['u'].shape
    args_res = System([residual], trial='u').solve(constrain=cons)
    numpy.testing.assert_allclose(args_res['u'], args_energy['u'], rtol=1e-10, atol=1e-12)


def test_custom_evalf_and_autodiff():
    import jax.numpy as jnp

    class Sigmoid(function.Custom):
        @staticmethod
        def evalf(x):
            return 1 / (1 + jnp.exp(-x))

    x = function.Argument('x', (5,))
    s = Sigmoid(args=[x], shape=(5,))
    x0 = numpy.linspace(-2, 2, 5)
    numpy.testing.assert_allclose(s.eval(x=x0), 1 / (1 + numpy.exp(-x0)), rtol=1e-12)

    # derivatives flow through jax AD of evalf
    d = function.derivative(function.sum_(s, 0), 'x')
    sig = 1 / (1 + numpy.exp(-x0))
    numpy.testing.assert_allclose(numpy.asarray(d.eval(x=x0)), sig * (1 - sig), rtol=1e-10)


def test_custom_partial_derivative_override():
    import jax.numpy as jnp

    class Doubler(function.Custom):
        @staticmethod
        def evalf(x):
            return 2.0 * x

        @staticmethod
        def partial_derivative(iarg, x):
            # deliberately wrong (3 instead of 2) to prove the override is used
            n, k = x.shape
            return jnp.broadcast_to(3.0 * jnp.eye(k), (n, k, k))

    x = function.Argument('x', (3,))
    s = Doubler(args=[x], shape=(3,))
    x0 = numpy.array([1.0, 2.0, 3.0])
    numpy.testing.assert_allclose(s.eval(x=x0), 2 * x0)
    d = function.derivative(function.sum_(s, 0), 'x')
    numpy.testing.assert_allclose(numpy.asarray(d.eval(x=x0)), 3.0 * numpy.ones(3), rtol=1e-12)


def test_custom_on_topology_geometry():
    '''Custom of a spatial field, integrated over a topology: the evalf
    receives the flattened quadrature points.'''
    import jax.numpy as jnp

    class Squared(function.Custom):
        @staticmethod
        def evalf(x):
            return (x * x).sum(axis=-1)

    topo, geom = mesh.unitsquare(4, 'square')
    s = Squared(args=[geom], shape=())
    val = topo.integral(s * function.J(geom), degree=3).eval()
    numpy.testing.assert_allclose(float(val), 2 / 3, rtol=1e-10)  # int x^2+y^2 over unit square
