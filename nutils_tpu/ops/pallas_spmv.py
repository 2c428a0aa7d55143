'''Pallas TPU kernel: ELL sparse matrix-vector product.

FEM stiffness matrices have a bounded number of nonzeros per row (the dof's
neighborhood), so CSR converts losslessly to an ELL layout — ``vals [N, W]``,
``cols [N, W]`` padded with zero values — in which the matvec is a regular,
statically-shaped contraction:

    y[i] = sum_k vals[i, k] * x[cols[i, k]]

The kernel processes row blocks; the full ``x`` vector resides in VMEM (a
1M-dof f32 vector is 4 MB against ~16 MB VMEM) so the per-row gathers stay
on-chip, while ``vals``/``cols`` stream through in blocks.  This is the
TPU-resident replacement for the innermost loop of the reference's MKL
FGMRES/Pardiso bindings (reference: matrix/_mkl.py:205) and an alternative
to the XLA scatter-add path of ops.sparse.csr_matvec.
'''

import functools

import numpy


def csr_to_ell(data, indices, indptr):
    '''Convert CSR arrays to the padded (vals [N, W], cols [N, W]) layout.'''
    data = numpy.asarray(data)
    indices = numpy.asarray(indices)
    indptr = numpy.asarray(indptr)
    counts = numpy.diff(indptr)
    N = len(counts)
    W = int(counts.max()) if N else 0
    vals = numpy.zeros((N, W), dtype=data.dtype)
    cols = numpy.zeros((N, W), dtype=numpy.int32)
    # vectorized fill: position of each entry within its row
    pos = numpy.arange(len(data)) - numpy.repeat(indptr[:-1], counts)
    rows = numpy.repeat(numpy.arange(N), counts)
    vals[rows, pos] = data
    cols[rows, pos] = indices
    return vals, cols


def _spmv_kernel(vals_ref, cols_ref, x_ref, y_ref):
    import jax
    import jax.numpy as jnp
    vals = vals_ref[:]          # [B, W]
    cols = cols_ref[:]          # [B, W]
    x = x_ref[:]                # [Npad, 1] — 2-D operand/index gather is the
    # form the TPU pallas lowering supports; explicit lax.gather keeps the
    # index dtype int32 under jax_enable_x64
    B, W = vals.shape
    idx = cols.reshape(B * W, 1).astype(jnp.int32)
    idx2 = jnp.concatenate([idx, jnp.zeros_like(idx)], axis=1)  # [B*W, 2]
    dnums = jax.lax.GatherDimensionNumbers(offset_dims=(), collapsed_slice_dims=(0, 1),
                                           start_index_map=(0, 1))
    gathered = jax.lax.gather(x, idx2, dnums, slice_sizes=(1, 1), mode='clip').reshape(B, W)
    y_ref[:] = jnp.sum(vals * gathered, axis=1)


@functools.lru_cache(maxsize=None)
def _build(N, W, Npad, B, dtype_str, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    nblocks = N // B

    def run(vals, cols, x):
        x = x.reshape(-1, 1)
        return pl.pallas_call(
            _spmv_kernel,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((B, W), lambda i: (i, 0)),
                pl.BlockSpec((B, W), lambda i: (i, 0)),
                pl.BlockSpec((Npad, 1), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((B,), lambda i: (i,)),
            out_shape=jax.ShapeDtypeStruct((N,), jnp.dtype(dtype_str)),
            interpret=bool(interpret),
        )(vals, cols, x)
    return jax.jit(run)


def ell_matvec(vals, cols, x, *, block=256, interpret=False):
    '''y = A @ x with A in padded ELL form; pads rows to a block multiple.'''
    import jax.numpy as jnp
    N, W = vals.shape
    B = min(block, N)
    Npad_rows = -(-N // B) * B
    if Npad_rows != N:
        vals = jnp.concatenate([vals, jnp.zeros((Npad_rows - N, W), vals.dtype)])
        cols = jnp.concatenate([cols, jnp.zeros((Npad_rows - N, W), cols.dtype)])
    fn = _build(int(Npad_rows), int(W), int(x.shape[0]), int(B), str(vals.dtype), interpret)
    y = fn(vals, cols, x)
    return y[:N]
