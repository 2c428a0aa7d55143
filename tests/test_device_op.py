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
    assert kind2[0] in ('ell', 'csr')


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
