'''Multi-device determinism (the analogue of the reference CI's
NUTILS_NPROCS=2 rows, .github/workflows/test.yaml:58, and of
tests/test_parallel.py's shared-memory checks): the same assembly, with its
element tables sharded over an 8-virtual-device mesh, must produce the same
residual/jacobian values as the single-device run.'''

import numpy
import pytest


@pytest.fixture(scope='module')
def system():
    from nutils_tpu import function, mesh
    from nutils_tpu.solver import System
    topo, geom = mesh.unitsquare(8, 'square')
    u = topo.field('u', btype='std', degree=2)
    g = function.grad(u, geom)
    J = function.J(geom)
    f = function.sin(geom[0]) * function.cos(geom[1])
    energy = topo.integral(((g @ g) / 2 + u * u / 2 - f * u) * J, degree=4)
    return System(energy, trial='u')


def test_sharded_assembly_matches(system):
    import jax
    from nutils_tpu import parallel
    ndofs = system.trial_shapes[0][0]
    rng = numpy.random.RandomState(0)
    args = {'u': rng.standard_normal(ndofs)}
    r_ref = numpy.asarray(system.assemble_residual(args))
    jac_ref = system.assemble_jacobian(args).export('dense')

    assert jax.device_count() >= 8, 'conftest must provide 8 virtual devices'
    mesh_ = parallel.device_mesh(8)
    parallel.shard_samples(mesh_, system)
    system._cache.pop('residual', None)
    system._cache.pop('jacobian', None)
    r_sh = numpy.asarray(system.assemble_residual(args))
    jac_sh = system.assemble_jacobian(args).export('dense')
    numpy.testing.assert_allclose(r_sh, r_ref, rtol=1e-12, atol=1e-14)
    numpy.testing.assert_allclose(jac_sh, jac_ref, rtol=1e-12, atol=1e-14)


def test_solve_on_mesh(system):
    '''A full solve with sharded tables converges to the single-device
    solution.'''
    from nutils_tpu import parallel
    sol_ref = dict(system.solve())
    mesh_ = parallel.device_mesh(8)
    parallel.shard_samples(mesh_, system)
    system._cache.clear()
    sol_sh = dict(system.solve())
    numpy.testing.assert_allclose(sol_sh['u'], sol_ref['u'], rtol=1e-10, atol=1e-12)
