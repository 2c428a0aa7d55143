'''Derivative correctness matrix (reference model: tests/test_evaluable.py
checking every node's _derivative against finite differences, and
tests/test_function.py's derivative surface): function.derivative of
composite expressions against central finite differences on random
arguments, across pointwise ops, linear algebra, contraction, gradients,
boundary integrals, and integral functionals.'''

import numpy
import pytest

from nutils_tpu import function, mesh
from nutils_tpu.solver import System

RNG = numpy.random.default_rng(11)


@pytest.fixture(scope='module')
def ctx():
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 4)] * 2)
    return topo, geom


def _fd_check(functional, name, x0, rel=1e-6, atol=1e-8, rtol=1e-5):
    '''compare d(integral)/d(arg) with central differences.'''
    dfunc = function.derivative(functional, name)
    g = numpy.asarray(function.eval([dfunc], {name: x0})[0])
    h = rel * max(1.0, float(numpy.abs(x0).max()))
    fd = numpy.empty_like(g)
    for i in range(x0.size):
        xp = x0.copy().reshape(-1)
        xm = x0.copy().reshape(-1)
        xp[i] += h
        xm[i] -= h
        fp = float(function.eval([functional], {name: xp.reshape(x0.shape)})[0])
        fm = float(function.eval([functional], {name: xm.reshape(x0.shape)})[0])
        fd.reshape(-1)[i] = (fp - fm) / (2 * h)
    numpy.testing.assert_allclose(g, fd, rtol=rtol, atol=atol)


POINTWISE = [
    ('square', lambda u: u ** 2),
    ('cube', lambda u: u ** 3),
    ('exp', lambda u: function.exp(u)),
    ('sin', lambda u: function.sin(u)),
    ('cosh', lambda u: function.cosh(u)),
    ('tanh', lambda u: function.tanh(u)),
    ('log-shift', lambda u: function.ln(u ** 2 + 1.5)),
    ('sqrt-shift', lambda u: function.sqrt(u ** 2 + 0.5)),
    ('abs-smoothish', lambda u: u * function.tanh(10 * u)),
    ('arctan', lambda u: function.arctan(u)),
    ('recip', lambda u: 1 / (u ** 2 + 2)),
]


@pytest.mark.parametrize('name,op', POINTWISE, ids=[p[0] for p in POINTWISE])
def test_pointwise_derivative(ctx, name, op):
    topo, geom = ctx
    u = topo.field('u', btype='std', degree=1)
    x0 = 0.4 * RNG.standard_normal(u.arguments['u'][0])
    functional = topo.integral(op(u) * function.J(geom), degree=4)
    _fd_check(functional, 'u', x0)


def test_gradient_energy_derivative(ctx):
    topo, geom = ctx
    u = topo.field('u', btype='spline', degree=2)
    x0 = 0.3 * RNG.standard_normal(u.arguments['u'][0])
    g = function.grad(u, geom)
    functional = topo.integral((g @ g + u ** 2 * g[0]) * function.J(geom), degree=5)
    _fd_check(functional, 'u', x0)


def test_vector_field_derivative(ctx):
    topo, geom = ctx
    u = topo.field('u', btype='std', degree=1, shape=[2])
    x0 = 0.3 * RNG.standard_normal(u.arguments['u'][0])
    g = function.grad(u, geom)                    # [2, 2]
    div = function.trace(g)
    functional = topo.integral((div ** 2 + (u @ u) * g[0, 1]) * function.J(geom), degree=4)
    _fd_check(functional, 'u', x0)


def test_determinant_inverse_derivative(ctx):
    topo, geom = ctx
    u = topo.field('u', btype='std', degree=1, shape=[2])
    x0 = 0.1 * RNG.standard_normal(u.arguments['u'][0])
    F = function.eye(2) + function.grad(u, geom)  # deformation gradient
    C = function.matmul(function.transpose(F), F)
    J2 = function.determinant(C)
    Cinv = function.inverse(C)
    functional = topo.integral((J2 + function.trace(Cinv)) * function.J(geom), degree=5)
    _fd_check(functional, 'u', x0, rtol=1e-4)


def test_boundary_integral_derivative(ctx):
    topo, geom = ctx
    u = topo.field('u', btype='std', degree=2)
    x0 = 0.3 * RNG.standard_normal(u.arguments['u'][0])
    n = function.normal(geom)
    g = function.grad(u, geom)
    functional = topo.boundary.integral((u ** 2 + (g @ n) * u) * function.J(geom), degree=4)
    _fd_check(functional, 'u', x0)


def test_interface_jump_derivative(ctx):
    topo, geom = ctx
    u = topo.field('u', btype='discont', degree=1)
    x0 = 0.3 * RNG.standard_normal(u.arguments['u'][0])
    jump = function.jump(u)
    functional = topo.interfaces.integral(jump ** 2 * function.J(geom), degree=4)
    _fd_check(functional, 'u', x0)


def test_second_derivative_symmetry(ctx):
    '''the jacobian of the residual of a symmetric energy must be symmetric
    (d2E/du2): exercised through System, the reference's solver-level use of
    nested derivatives (solver.py:238,252).'''
    topo, geom = ctx
    u = topo.field('u', btype='std', degree=1)
    energy = topo.integral((function.grad(u, geom) @ function.grad(u, geom) / 2
                            + u ** 4 / 12) * function.J(geom), degree=4)
    sys_ = System(energy, trial='u')
    x0 = 0.3 * RNG.standard_normal(sys_.trial_shapes[0])
    jac = sys_.assemble_jacobian({'u': x0})
    dense = jac.export('dense')
    numpy.testing.assert_allclose(dense, dense.T, rtol=1e-10, atol=1e-12)


def test_derivative_of_derivative_vs_fd(ctx):
    '''second derivative (hessian-vector through two nested derivatives)
    against finite differences of the first.'''
    topo, geom = ctx
    u = topo.field('u', btype='std', degree=1)
    nd = u.arguments['u'][0][0]
    x0 = 0.2 * RNG.standard_normal(nd)
    functional = topo.integral(function.exp(u) * function.J(geom), degree=4)
    dfunc = function.derivative(functional, 'u')
    d2func = function.derivative(dfunc, 'u')
    H = numpy.asarray(function.eval([d2func], {'u': x0})[0])
    h = 1e-6
    for i in range(0, nd, 5):
        xp = x0.copy()
        xm = x0.copy()
        xp[i] += h
        xm[i] -= h
        gp = numpy.asarray(function.eval([dfunc], {'u': xp})[0])
        gm = numpy.asarray(function.eval([dfunc], {'u': xm})[0])
        numpy.testing.assert_allclose(H[:, i], (gp - gm) / (2 * h), rtol=1e-4, atol=1e-7)


def test_replace_then_derive(ctx):
    '''derivative sees through argument replacement: replacements carry the
    ARGUMENT's (dof-vector) shape, as in the reference (function.py:1906).'''
    topo, geom = ctx
    u = topo.field('u', btype='std', degree=1)
    nd = u.arguments['u'][0][0]
    x0 = 0.3 * RNG.standard_normal(nd)
    # u substituted by the dof-vector expression 2*u of the same argument
    f2 = function.replace_arguments(function.sin(u), {'u': 2 * function.Argument('u', (nd,))})
    functional = topo.integral(f2 * function.J(geom), degree=4)
    _fd_check(functional, 'u', x0)


def test_custom_node_derivative(ctx):
    '''function.Custom with jax-AD partials differentiates correctly inside
    an integral functional (reference: function.py:665 Custom).'''
    import jax.numpy as jnp

    class Softplus(function.Custom):

        @staticmethod
        def evalf(x):
            return jnp.logaddexp(x, 0.0)

    topo, geom = ctx
    u = topo.field('u', btype='std', degree=1)
    x0 = 0.5 * RNG.standard_normal(u.arguments['u'][0])
    sp = Softplus(args=(u,), shape=u.shape, dtype=float)
    functional = topo.integral(sp * function.J(geom), degree=4)
    _fd_check(functional, 'u', x0)
