'''Solver-layer tests: assembly correctness, constraints, linear/nonlinear.'''

import numpy
import pytest

from nutils_tpu import function, mesh
from nutils_tpu.solver import Newton, System


@pytest.fixture(scope='module')
def setup():
    topo, geom = mesh.unitsquare(3, 'square')
    u = topo.field('u', btype='std', degree=1)
    return topo, geom, u


def test_mass_matrix(setup):
    topo, geom, u = setup
    J = function.J(geom)
    sys_ = System(topo.integral(u ** 2 * J, degree=2), trial='u')
    assert sys_.is_linear and sys_.is_symmetric and sys_.is_constant_matrix
    jac, res = sys_.assemble_jacobian_residual({'u': numpy.zeros(16)})
    M = jac.export('dense') / 2  # E = u^T M u -> jacobian 2M
    # row sums of the mass matrix = integral of each basis fn; total = area
    assert M.sum() == pytest.approx(1.0)
    numpy.testing.assert_allclose(M, M.T, rtol=1e-12)
    # exact 1D mass = h/6 [4 1; 1 2] pattern, 2D is the tensor square
    h = 1 / 3
    m1 = numpy.zeros((4, 4))
    for i in range(3):
        m1[i:i+2, i:i+2] += h / 6 * numpy.array([[2, 1], [1, 2]])
    numpy.testing.assert_allclose(M, numpy.kron(m1, m1), rtol=1e-10, atol=1e-14)


def test_stiffness_vs_reference_values(setup):
    topo, geom, u = setup
    J = function.J(geom)
    g = function.grad(u, geom)
    sys_ = System(topo.integral((g @ g) / 2 * J, degree=2), trial='u')
    jac, _ = sys_.assemble_jacobian_residual({'u': numpy.zeros(16)})
    K = jac.export('dense')
    # 2D bilinear stiffness: diagonal interior entry 8/3, checkerboard structure
    numpy.testing.assert_allclose(K, K.T, rtol=1e-12)
    assert K[5, 5] == pytest.approx(8 / 3)
    numpy.testing.assert_allclose(K.sum(axis=1), 0, atol=1e-12)


def test_residual_vector_mode(setup):
    topo, geom, u = setup
    J = function.J(geom)
    v = topo.field('v', btype='std', degree=1)
    gv = function.grad(v, geom)
    gu = function.grad(u, geom)
    res = topo.integral((gv @ gu) * J, degree=2)
    sys_e = System(res, trial='u', test='v')
    # same system via solve: compare with energy formulation
    sys_s = System(topo.integral((gu @ gu) / 2 * J, degree=2), trial='u')
    x = numpy.random.RandomState(0).rand(16)
    r1 = sys_e.assemble_residual({'u': x})
    r2 = sys_s.assemble_residual({'u': x})
    numpy.testing.assert_allclose(r1, r2, rtol=1e-11)
    j1 = sys_e.assemble_jacobian({'u': x}).export('dense')
    j2 = sys_s.assemble_jacobian({'u': x}).export('dense')
    numpy.testing.assert_allclose(j1, j2, rtol=1e-11)


def test_dirichlet_bool_constraints(setup):
    topo, geom, u = setup
    J = function.J(geom)
    g = function.grad(u, geom)
    # solve laplace with u=0 at left (x=0), u=1 at right (x=1): u = x
    sqr = topo.boundary['left'].integral(u ** 2 * J, degree=2)
    sqr += topo.boundary['right'].integral((u - 1) ** 2 * J, degree=2)
    cons = System(sqr, trial='u').solve_constraints(droptol=1e-13)
    res = System(topo.integral((g @ g) / 2 * J, degree=2), trial='u')
    args = res.solve(constrain=cons)
    xs = numpy.arange(4) / 3
    expect = numpy.broadcast_to(xs[:, None], (4, 4)).ravel()
    numpy.testing.assert_allclose(args['u'], expect, atol=1e-10)


def test_nonlinear_newton(setup):
    topo, geom, u = setup
    J = function.J(geom)
    g = function.grad(u, geom)
    # nonlinear diffusion: E = (1 + u^2)/2 |grad u|^2 ... just check convergence
    E = topo.integral(((1 + u ** 2) * (g @ g) / 2 + u ** 2 / 2 - u) * J, degree=3)
    sys_ = System(E, trial='u')
    assert not sys_.is_linear
    args = sys_.solve(constrain={'u': numpy.concatenate([numpy.zeros(4), numpy.full(12, numpy.nan)])}, tol=1e-10)
    r = sys_.assemble_residual(args)
    assert numpy.linalg.norm(r[4:]) < 1e-10  # free-dof residual (first 4 are constrained)


def test_vector_field(setup):
    topo, geom, _ = setup
    J = function.J(geom)
    w = topo.field('w', btype='std', degree=1, shape=(2,))
    assert w.shape == (2,)
    gw = function.grad(w, geom)  # [2, 2]
    E = topo.integral(function.trace(function.matmul(gw, function.transpose(gw))) / 2 * J, degree=2)
    sys_ = System(E, trial='w')
    jac, res = sys_.assemble_jacobian_residual({'w': numpy.zeros((16, 2))})
    K = jac.export('dense')
    assert K.shape == (32, 32)
    numpy.testing.assert_allclose(K, K.T, rtol=1e-11)
    # block-diagonal over components: coupling between x- and y- components vanishes
    Kx = K.reshape(16, 2, 16, 2)
    numpy.testing.assert_allclose(Kx[:, 0, :, 1], 0, atol=1e-12)


def test_step_theta(setup):
    topo, geom, u = setup
    J = function.J(geom)
    v = topo.field('v', btype='std', degree=1)
    u0 = function.replace_arguments(u, {'u': function.Argument('u0', (16,))})
    dt = function.Argument('dt?', ()) if False else 0.1
    # implicit euler for du/dt = -u: (u - u0)/dt * v + u v = 0
    res = topo.integral(((u - u0) / dt + u) * v * J, degree=2)
    sys_ = System(res, trial='u', test='v')
    args = {'u': numpy.ones(16)}
    args = sys_.step(arguments=args, suffix='0', tol=1e-10)
    # discrete solution: u1 = u0/(1+dt)
    numpy.testing.assert_allclose(args['u'], 1 / 1.1, rtol=1e-10)
