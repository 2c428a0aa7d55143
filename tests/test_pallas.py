'''Pallas kernel correctness (interpret mode, CPU-runnable).

The kernels target the TPU; ``interpret=True`` runs the same kernel logic
through the pallas interpreter so correctness is checked in CI without a
chip.  On-chip status in this environment (see ENVIRONMENT_NOTES.md): the
remote Mosaic compile service crashes when tracing under jax_enable_x64, so
on-TPU use requires an f32 (x64-disabled) pipeline.
'''

import numpy
import pytest


@pytest.fixture(scope='module')
def rng():
    return numpy.random.RandomState(0)


def test_stencil_matvec(rng):
    from nutils_tpu.ops import pallas_stencil as ps
    import jax.numpy as jnp
    ny, nx = 64, 128
    w = ps.poisson_stencil(ny, nx) * (1 + 0.1 * rng.random_sample((9, ny, nx)).astype(numpy.float32))
    x = rng.standard_normal((ny, nx)).astype(numpy.float32)
    y = numpy.asarray(ps.stencil_matvec(jnp.asarray(w), jnp.asarray(x), interpret=True))
    xp = numpy.pad(x, 1)
    ref = sum(w[k] * xp[dy:dy + ny, dx:dx + nx] for k, (dy, dx) in enumerate(ps._OFFSETS))
    numpy.testing.assert_allclose(y, ref, atol=1e-5)


def test_stencil_cg(rng):
    from nutils_tpu.ops import pallas_stencil as ps
    import jax.numpy as jnp
    ny = nx = 32
    w = ps.poisson_stencil(ny, nx)
    b = rng.standard_normal((ny, nx)).astype(numpy.float32)
    x, resnorm, k = ps.stencil_cg(jnp.asarray(w), jnp.asarray(b), atol=1e-4, maxiter=500, interpret=True)
    assert float(resnorm) < 1e-4
    # verify against the dense operator
    y = numpy.asarray(ps.stencil_matvec(jnp.asarray(w), x, interpret=True))
    numpy.testing.assert_allclose(y, b, atol=1e-3)


def test_ell_matvec(rng):
    import scipy.sparse as sp
    from nutils_tpu.ops import pallas_spmv
    import jax.numpy as jnp
    N = 512
    A = sp.random(N, N, density=9.0 / N, random_state=rng, format='csr', dtype=numpy.float32)
    A = (A + sp.eye(N, dtype=numpy.float32, format='csr')).tocsr()
    x = rng.standard_normal(N).astype(numpy.float32)
    vals, cols = pallas_spmv.csr_to_ell(A.data, A.indices, A.indptr)
    y = numpy.asarray(pallas_spmv.ell_matvec(jnp.asarray(vals), jnp.asarray(cols), jnp.asarray(x), interpret=True))
    numpy.testing.assert_allclose(y, A @ x, atol=1e-4)
