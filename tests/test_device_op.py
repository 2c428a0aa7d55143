'''Device operator forms (stencil / ELL / CSR) and masked-constraint Krylov
solves.  These replace the deleted pallas kernels: measured on a v5e, the
XLA shifted-slice stencil matvec runs at the HBM roofline (64 us at 1M dofs
f32) while both pallas variants lost — ELL could not lower through Mosaic's
restricted gather at all, and the pallas stencil ran at 113 us vs XLA's 64.
See nutils_tpu/ops/stencil.py for the measurement record.'''

import numpy
import pytest
import scipy.sparse

from nutils_tpu import matrix
from nutils_tpu.ops import sparse as dsp
from nutils_tpu.ops import stencil as st


rng = numpy.random.RandomState(3)


def _grid_matrix(ny, nx, k=1, seed=0):
    '''Random SPD-ish (2k+1)^2 stencil matrix on an ny x nx grid, as CSR.'''
    r = numpy.random.RandomState(seed)
    n = ny * nx
    rows, cols, vals = [], [], []
    I, J = numpy.meshgrid(numpy.arange(ny), numpy.arange(nx), indexing='ij')
    for dy in range(-k, k + 1):
        for dx in range(-k, k + 1):
            ii, jj = I + dy, J + dx
            m = (ii >= 0) & (ii < ny) & (jj >= 0) & (jj < nx)
            w = r.uniform(-1, 0, (ny, nx)) if (dy, dx) != (0, 0) else numpy.full((ny, nx), 4.0 * (2 * k + 1) ** 2)
            rows.append((I * nx + J)[m])
            cols.append((ii * nx + jj)[m])
            vals.append(w[m])
    A = scipy.sparse.csr_matrix((numpy.concatenate(vals),
                                 (numpy.concatenate(rows), numpy.concatenate(cols))), shape=(n, n))
    return A


@pytest.mark.parametrize('k', [1, 2])
def test_stencil_detection_and_matvec(k):
    import jax.numpy as jnp
    ny, nx = 13, 17
    A = _grid_matrix(ny, nx, k=k, seed=k)
    form = st.from_csr(A.data, A.indices, A.indptr, ny * nx)
    assert form is not None
    assert form.k == k and (form.ny, form.nx) in [(ny, nx), (nx, ny)] or form.ny * form.nx == ny * nx
    x = rng.standard_normal(ny * nx)
    y = numpy.asarray(st.matvec(form, jnp.asarray(form.w), jnp.asarray(x)))
    numpy.testing.assert_allclose(y, A @ x, rtol=1e-10, atol=1e-12)


def test_stencil_rejects_unstructured():
    n = 200
    A = scipy.sparse.random(n, n, density=6 / n, format='csr', random_state=1)
    A = A + scipy.sparse.eye(n, format='csr')
    assert st.from_csr(A.data, A.indices, A.indptr, n) is None


def test_stencil_rejects_wraparound():
    # 1-D periodic band: offsets fit a window but wrap at row ends
    n = 36
    diags = [numpy.full(n, 4.0), numpy.full(n - 1, -1.0), numpy.full(n - 1, -1.0),
             numpy.full(1, -1.0), numpy.full(1, -1.0)]
    A = scipy.sparse.diags(diags, [0, 1, -1, n - 1, -(n - 1)], format='csr')
    form = st.from_csr(A.data, A.indices, A.indptr, n)
    if form is not None:
        # if a form was found it must still be EXACT
        import jax.numpy as jnp
        x = rng.standard_normal(n)
        y = numpy.asarray(st.matvec(form, jnp.asarray(form.w), jnp.asarray(x)))
        numpy.testing.assert_allclose(y, A @ x, rtol=1e-10)


def test_ell_matvec():
    import jax.numpy as jnp
    n = 150
    A = scipy.sparse.random(n, n, density=5 / n, format='csr', random_state=2)
    vals, cols = dsp.csr_to_ell(A.data, A.indices, A.indptr)
    mv = dsp._make_matvec(('ell',))
    x = rng.standard_normal(n)
    y = numpy.asarray(mv((jnp.asarray(vals), jnp.asarray(cols)), jnp.asarray(x)))
    numpy.testing.assert_allclose(y, A @ x, rtol=1e-10, atol=1e-12)


def test_device_op_selection():
    # stencil pattern -> stencil kind
    A = _grid_matrix(12, 15)
    M = matrix.Matrix(A.indptr, A.indices, A.data, A.shape)
    kind, op = M._device_op()
    assert kind[0] == 'stencil'
    # unstructured bounded rows -> ell
    B = scipy.sparse.random(300, 300, density=5 / 300, format='csr', random_state=4)
    B = B + scipy.sparse.eye(300, format='csr')
    M2 = matrix.Matrix(B.indptr, B.indices, B.data, B.shape)
    kind2, _ = M2._device_op()
    assert kind2[0] in ('bell', 'ell', 'csr')


def test_masked_stencil_cg_matches_submatrix_direct():
    '''Constrained solve through the masked stencil CG equals the
    submatrix + direct solve.'''
    ny = nx = 16
    A = _grid_matrix(ny, nx, seed=5)
    A = (A + A.T) / 2  # symmetrize for CG
    n = ny * nx
    M = matrix.Matrix(A.indptr, A.indices, A.data, A.shape)
    rhs = rng.standard_normal(n)
    cons = numpy.full(n, numpy.nan)
    cons[:nx] = 1.5       # fix the bottom row of the grid
    cons[-nx:] = -0.5     # and the top row
    x_direct = M.solve(rhs, constrain=cons, solver='direct')
    x_masked = M.solve(rhs, constrain=cons, solver='cg', rtol=1e-12, symmetric=True)
    numpy.testing.assert_allclose(x_masked, x_direct, rtol=1e-8, atol=1e-9)


def test_masked_gmres_matches_direct():
    ny = nx = 12
    A = _grid_matrix(ny, nx, seed=6)  # nonsymmetric
    n = ny * nx
    M = matrix.Matrix(A.indptr, A.indices, A.data, A.shape)
    rhs = rng.standard_normal(n)
    cons = numpy.full(n, numpy.nan)
    cons[::7] = 0.3
    x_direct = M.solve(rhs, constrain=cons, solver='direct')
    x_masked = M.solve(rhs, constrain=cons, solver='gmres', rtol=1e-12)
    numpy.testing.assert_allclose(x_masked, x_direct, rtol=1e-7, atol=1e-8)


def test_stencil_cg_unconstrained_matches_direct():
    ny, nx = 14, 11
    A = _grid_matrix(ny, nx, seed=7)
    A = (A + A.T) / 2
    M = matrix.Matrix(A.indptr, A.indices, A.data, A.shape)
    rhs = rng.standard_normal(ny * nx)
    x_cg = M.solve(rhs, solver='cg', rtol=1e-12)
    x_direct = M.solve(rhs, solver='direct')
    numpy.testing.assert_allclose(x_cg, x_direct, rtol=1e-8, atol=1e-9)


def test_mg_preconditioned_cg_scaling():
    '''Geometric multigrid: V-cycle contraction ~0.1/iter and
    mesh-independent MG-CG convergence to 1e-10 through the refinement
    wrapper (f32 inner, f64 outer).'''
    import jax.numpy as jnp
    from nutils_tpu.ops import mg as mgmod
    for m in (33, 65):
        ny = nx = m
        A = _grid_matrix(ny, nx, seed=m)
        A = (A + A.T) / 2
        n = ny * nx
        M = matrix.Matrix(A.indptr, A.indices, A.data.astype(numpy.float32), A.shape)
        mg = M._mg()
        assert mg is not None and len(mg.shapes) >= 2
        # Richardson with the V-cycle contracts fast
        b = rng.standard_normal(n)
        x = numpy.zeros(n)
        A64 = A.astype(numpy.float64)
        for _ in range(6):
            r = b - A64 @ x
            x = x + numpy.asarray(mgmod.apply_vcycle(mg, jnp.asarray(r.astype(numpy.float32))),
                                  dtype=numpy.float64)
        assert numpy.linalg.norm(b - A64 @ x) / numpy.linalg.norm(b) < 1e-4
        # full pipeline: f32 data solved to 1e-10 true residual
        xs = M.solve(b, solver='cg', rtol=1e-10)
        rel = numpy.linalg.norm(b - A64 @ xs) / numpy.linalg.norm(b)
        assert rel < 5e-9  # floor-aware acceptance: eps64 |A| |x| slack


def _nd_grid_matrix(shape, ks, seed=0, sym=False):
    '''Random diagonally-dominant stencil matrix on an arbitrary-rank grid.'''
    import itertools
    r = numpy.random.RandomState(seed)
    n = int(numpy.prod(shape))
    coords = numpy.stack(numpy.meshgrid(*[numpy.arange(s) for s in shape],
                                        indexing='ij'), -1).reshape(-1, len(shape))
    pitches = numpy.array([int(numpy.prod(shape[i + 1:])) for i in range(len(shape))])
    rows, cols, vals = [], [], []
    for shifts in itertools.product(*[range(-k, k + 1) for k in ks]):
        tgt = coords + numpy.array(shifts)
        m = ((tgt >= 0) & (tgt < numpy.array(shape))).all(1)
        w = r.uniform(-1, 0, n) if any(shifts) \
            else numpy.full(n, 4.0 * numpy.prod([2 * k + 1 for k in ks]))
        rows.append((coords @ pitches)[m])
        cols.append((tgt @ pitches)[m])
        vals.append(w[m])
    A = scipy.sparse.csr_matrix((numpy.concatenate(vals),
                                 (numpy.concatenate(rows), numpy.concatenate(cols))), shape=(n, n))
    return (A + A.T) / 2 if sym else A


@pytest.mark.parametrize('shape,ks', [((7, 9, 11), (1, 1, 1)), ((5, 7, 9), (2, 1, 1)),
                                      ((9, 11), (1, 2)), ((37,), (2,))])
def test_stencil_detection_nd(shape, ks):
    '''Dimension-generic detection: 1-D bands, 3-D hex grids, anisotropic
    windows (mixed per-axis degree) all round-trip exactly.'''
    import jax.numpy as jnp
    A = _nd_grid_matrix(shape, ks, seed=sum(shape))
    form = st.from_csr(A.data, A.indices, A.indptr, A.shape[0])
    assert form is not None
    assert form.shape == shape and form.ks == ks
    x = rng.standard_normal(A.shape[0])
    y = numpy.asarray(st.matvec(form, jnp.asarray(form.w), jnp.asarray(x)))
    numpy.testing.assert_allclose(y, A @ x, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize('shape,ks', [((65, 65), (2, 2)), ((17, 17, 17), (1, 1, 1))])
def test_mg_wide_and_3d(shape, ks):
    '''Multigrid beyond the 9-point/2-D case: 25-point (degree-2) stencils
    and 3-D grids build a hierarchy and solve f32 data to 1e-10 true
    residual through the refinement wrapper.'''
    A = _nd_grid_matrix(shape, ks, seed=sum(shape), sym=True)
    M = matrix.Matrix(A.indptr, A.indices, A.data.astype(numpy.float32), A.shape)
    mg = M._mg()
    assert mg is not None and len(mg.levels) >= 2
    b = rng.standard_normal(A.shape[0])
    x = M.solve(b, solver='cg', rtol=1e-10)
    rel = numpy.linalg.norm(b - A @ x) / numpy.linalg.norm(b)
    assert rel < 5e-9


def test_mg_preconditioned_gmres_nonsymmetric():
    '''The V-cycle preconditions GMRES on nonsymmetric stencil systems
    (convection-diffusion class) — the structured-roofline path no longer
    requires symmetry.'''
    A = _nd_grid_matrix((65, 65), (1, 1), seed=99)  # nonsymmetric
    M = matrix.Matrix(A.indptr, A.indices, A.data.astype(numpy.float32), A.shape)
    assert M._mg() is not None
    b = rng.standard_normal(A.shape[0])
    x = M.solve(b, solver='gmres', rtol=1e-10)
    rel = numpy.linalg.norm(b - A @ x) / numpy.linalg.norm(b)
    assert rel < 5e-9


def test_bell_matvec_and_selection():
    '''Shared-column block-ELL: exact matvec and the default unstructured
    selection (one gather per unique block column instead of one per
    entry).'''
    import jax.numpy as jnp
    for n, nnz_row, R in [(150, 5, 16), (333, 9, 32), (64, 3, 32)]:
        A = scipy.sparse.random(n, n, density=nnz_row / n, format='csr', random_state=2)
        A = (A + scipy.sparse.eye(n)).tocsr()
        vals, cols = dsp.csr_to_bell(A.data, A.indices, A.indptr, R)
        assert vals.shape[0] == -(-n // R) and vals.shape[1] == R
        mv = dsp._make_matvec(('bell', R))
        x = rng.standard_normal(n)
        y = numpy.asarray(mv((jnp.asarray(vals), jnp.asarray(cols)), jnp.asarray(x)))
        numpy.testing.assert_allclose(y, A @ x, rtol=1e-10, atol=1e-12)


def test_bell_gmres_unstructured():
    '''Unstructured nonsymmetric system solves through the BELL device path.'''
    n = 400
    A = scipy.sparse.random(n, n, density=7 / n, format='csr', random_state=8)
    A = (A + scipy.sparse.diags(numpy.full(n, 8.0))).tocsr()
    M = matrix.Matrix(A.indptr, A.indices, A.data, A.shape)
    assert M._device_op()[0][0] == 'bell'
    b = rng.standard_normal(n)
    x = M.solve(b, solver='gmres', rtol=1e-11)
    rel = numpy.linalg.norm(b - A @ x) / numpy.linalg.norm(b)
    assert rel < 1e-9


def _taylor_hood_system(nelems=12, dtype=numpy.float64, mass=0.01, nu=1.0):
    '''Stokes-class mixed system (P2 velocity / P1 pressure) with a small
    mass regularization; returns (jac, field offsets).'''
    from nutils_tpu import function, mesh
    from nutils_tpu.expression import Namespace
    from nutils_tpu.solver import System
    from nutils_tpu.utils import config
    with config.floatx(dtype):
        topo, geom = mesh.unitsquare(nelems, 'square')
        ns = Namespace()
        ns.x = geom
        ns.define_for('x', gradient='∇', jacobians=('dV',))
        ns.u = topo.field('u', btype='std', degree=2, shape=[2])
        ns.p = topo.field('p', btype='std', degree=1)
        ns.v = function.replace_arguments(ns.u, 'u:v')
        ns.q = function.replace_arguments(ns.p, 'p:q')
        ns.m = mass
        ns.nu = nu
        ns.eps = 0.001
        res = topo.integral('(m u_i v_i + nu ∇_j(v_i) ∇_j(u_i) - p ∇_i(v_i)'
                            ' + q ∇_i(u_i) + eps p q) dV' @ ns, degree=5)
        system = System(res, trial='u,p', test='v,q')
        args = {t: numpy.zeros(shape) for t, shape in zip(system.trials, system.trial_shapes)}
        jac, _ = system.assemble_jacobian_residual(args)
    return jac


def test_blockgrid_detection_and_matvec():
    '''A Taylor-Hood (P2/P1) saddle-point matrix decomposes into a grid of
    inter-grid stencils — including the 2:1 phased velocity-pressure
    couplings — with an exact slice-only matvec (ops/blockgrid.py).'''
    import jax.numpy as jnp
    from nutils_tpu.ops import blockgrid as bg
    jac = _taylor_hood_system(8)
    assert jac._device_op()[0][0] == 'blockgrid'
    offsets = jac._field_offsets
    form = bg.detect(numpy.asarray(jac.data), jac.indices, jac.indptr, offsets)
    assert form is not None
    kinds = {(b[0], b[1]): (b[4], b[5]) for b in form.meta[2]}
    assert kinds[(0, 1)] != kinds[(0, 0)]  # u-p coupling is a 2:1 phased stencil
    x = rng.standard_normal(jac.shape[0])
    ws = [jnp.asarray(w) for w in form.ws]
    y = numpy.asarray(bg.matvec(form, ws, jnp.asarray(x)))
    numpy.testing.assert_allclose(y, jac._scipy() @ x, rtol=1e-10, atol=1e-12)
    # value refill (constant pattern, fresh values) reproduces the weights
    ws2 = bg.refill(form, numpy.asarray(jac.data))
    for a, b2 in zip(form.ws, ws2):
        assert numpy.array_equal(a, b2)


def test_blockgrid_gmres_matches_direct():
    jac = _taylor_hood_system(8)
    b = rng.standard_normal(jac.shape[0])
    x = jac.solve(b, solver='gmres', rtol=1e-11)
    xd = jac.solve(b, solver='direct')
    numpy.testing.assert_allclose(x, xd, rtol=1e-6, atol=1e-8)


def test_fieldsplit_preconditioner_stiff_stokes():
    '''Diffusion-dominant Stokes defeats the diagonal scaling but converges
    under the segregated velocity-MG preconditioner; the automatic
    second-tier retry engages it without user action.'''
    jac = _taylor_hood_system(12, dtype=numpy.float32, mass=0.01, nu=1.0)
    fs = jac._fieldsplit()
    assert fs is not None
    kinds = [k if isinstance(k, str) else k[0] for k in fs[0][2]]
    assert kinds == ['mg', 'diag']  # velocity MG, pressure Schur scaling
    b = rng.standard_normal(jac.shape[0])
    x = jac.solve(b, solver='gmres', rtol=1e-8)  # engages the retry tier
    A64 = jac._scipy().astype(numpy.float64)
    rel = numpy.linalg.norm(b - A64 @ x) / numpy.linalg.norm(b)
    assert rel < 1e-6


def test_periodic_stencil_detection():
    '''Periodic grids: wrapped couplings canonicalize modulo the axis size
    and the matvec wrap-pads — 1-D bands and tori detect exactly.'''
    import jax.numpy as jnp
    n = 36
    diags = [numpy.full(n, 4.0), numpy.full(n - 1, -1.0), numpy.full(n - 1, -1.0),
             numpy.full(1, -1.0), numpy.full(1, -1.0)]
    P = scipy.sparse.diags(diags, [0, 1, -1, n - 1, -(n - 1)], format='csr')
    f = st.from_csr(P.data, P.indices, P.indptr, n)
    assert f is not None and f.shape == (n,) and f.periodic == (True,)
    x = rng.standard_normal(n)
    y = numpy.asarray(st.matvec(f, jnp.asarray(f.w), jnp.asarray(x)))
    numpy.testing.assert_allclose(y, P @ x, rtol=1e-12)


def test_field_grid_hints_periodic_mixed():
    '''topology.field registers the exact dof-grid layout (incl. periodic
    axes); a periodic-channel Taylor-Hood system then becomes a block-grid
    operator with wrapped couplings, no grid inference.'''
    import jax.numpy as jnp
    from nutils_tpu import function, mesh
    from nutils_tpu.expression import Namespace
    from nutils_tpu.solver import System
    from nutils_tpu.utils import config
    from nutils_tpu.ops import sparse as dsp2
    with config.floatx(numpy.float64):
        topo, geom = mesh.rectilinear([numpy.linspace(0, 2 * numpy.pi, 17),
                                       numpy.linspace(0, 1, 9)], periodic=[0])
        ns = Namespace()
        ns.x = geom
        ns.define_for('x', gradient='∇', jacobians=('dV',))
        ns.u = topo.field('u', btype='spline', degree=2, shape=[2])
        ns.p = topo.field('p', btype='spline', degree=1)
        ns.v = function.replace_arguments(ns.u, 'u:v')
        ns.q = function.replace_arguments(ns.p, 'p:q')
        ns.nu = 0.1
        ns.eps = 0.001
        res = topo.integral('(u_i v_i + nu ∇_j(v_i) ∇_j(u_i) - p ∇_i(v_i)'
                            ' + q ∇_i(u_i) + eps p q) dV' @ ns, degree=5)
        system = System(res, trial='u,p', test='v,q')
        args = {t: numpy.zeros(s) for t, s in zip(system.trials, system.trial_shapes)}
        jac, _r = system.assemble_jacobian_residual(args)
    assert jac._field_grids[0] == ((16, 10, 2), (True, False, False))
    assert jac._field_grids[1] == ((16, 9), (True, False))
    kind, op = jac._device_op()
    assert kind[0] == 'blockgrid'
    assert any(b[8][0] for b in kind[1][2])  # wrapped x axis in some block
    x = rng.standard_normal(jac.shape[0])
    mv = dsp2._make_matvec(kind)
    y = numpy.asarray(mv(op, jnp.asarray(x)))
    numpy.testing.assert_allclose(y, jac._scipy() @ x, rtol=1e-10, atol=1e-12)
    b = rng.standard_normal(jac.shape[0])
    xs = jac.solve(b, solver='gmres', rtol=1e-10)
    rel = numpy.linalg.norm(b - jac._scipy() @ xs) / numpy.linalg.norm(b)
    assert rel < 5e-9


def test_mg_semicoarsening_vector_grid():
    '''Grids with an uncoarsenable component axis (vector fields) coarsen
    the spatial axes only.'''
    A = _nd_grid_matrix((33, 33, 2), (1, 1, 1), seed=4, sym=True)
    M = matrix.Matrix(A.indptr, A.indices, A.data.astype(numpy.float32), A.shape)
    mg = M._mg()
    assert mg is not None and len(mg.levels) >= 2
    assert all(lev[1][-1] == 2 for lev in mg.levels)
    b = rng.standard_normal(A.shape[0])
    x = M.solve(b, solver='cg', rtol=1e-10)
    rel = numpy.linalg.norm(b - A @ x) / numpy.linalg.norm(b)
    assert rel < 5e-9


def test_stencil_detection_fuzz():
    '''Property test: random grids (rank 1-3, mixed windows, optional
    periodic axes, random sparsification) must either detect with an EXACT
    matvec or return None — never a wrong operator.'''
    import itertools
    import jax.numpy as jnp
    r = numpy.random.RandomState(7)
    for trial in range(20):
        d = r.randint(1, 4)
        shape = tuple(int(s) for s in r.randint(3, 9, d))
        ks = tuple(int(k) for k in r.randint(0, 3, d))
        if not any(ks):
            ks = (1,) + ks[1:]
        periodic = tuple(bool(r.rand() < 0.3) and shape[ax] > 2 * ks[ax] + 1
                         for ax in range(d))
        n = int(numpy.prod(shape))
        coords = numpy.stack(numpy.meshgrid(*[numpy.arange(s) for s in shape],
                                            indexing='ij'), -1).reshape(-1, d)
        pitches = numpy.array([int(numpy.prod(shape[i + 1:])) for i in range(d)])
        rows, cols, vals = [], [], []
        for sh in itertools.product(*[range(-k, k + 1) for k in ks]):
            tgt = coords + numpy.array(sh)
            m = numpy.ones(n, dtype=bool)
            for ax in range(d):
                if periodic[ax]:
                    tgt[:, ax] %= shape[ax]
                else:
                    m &= (tgt[:, ax] >= 0) & (tgt[:, ax] < shape[ax])
            m &= r.rand(n) < 0.9  # random sparsification
            w = r.uniform(-1, 1, n) if any(sh) else numpy.full(n, 10.0)
            rows.append((coords @ pitches)[m])
            cols.append((tgt @ pitches)[m])
            vals.append(w[m])
        A = scipy.sparse.csr_matrix((numpy.concatenate(vals),
                                     (numpy.concatenate(rows), numpy.concatenate(cols))),
                                    shape=(n, n))
        A.sum_duplicates()
        form = st.from_csr(A.data, A.indices, A.indptr, n)
        if form is None:
            continue
        x = r.standard_normal(n)
        y = numpy.asarray(st.matvec(form, jnp.asarray(form.w), jnp.asarray(x)))
        numpy.testing.assert_allclose(y, A @ x, rtol=1e-10, atol=1e-12,
                                      err_msg=f'trial {trial}: {shape} {ks} {periodic} '
                                              f'-> {form.shape} {form.ks} {form.periodic}')


def test_mg_rejects_uncoarsenable():
    # even grid pitch cannot vertex-coarsen: setup returns None, solve still
    # works through the diag-preconditioned path
    A = _grid_matrix(12, 16, seed=2)
    A = (A + A.T) / 2
    M = matrix.Matrix(A.indptr, A.indices, A.data, A.shape)
    assert M._mg() is None
    b = rng.standard_normal(12 * 16)
    x = M.solve(b, solver='cg', rtol=1e-10)
    rel = numpy.linalg.norm(b - A @ x) / numpy.linalg.norm(b)
    assert rel < 1e-9
