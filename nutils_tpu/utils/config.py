'''Global configuration with environment-variable defaults and scoped overrides.

Mirrors the reference's three config mechanisms (reference: _util.py:366-404
``defaults_from_env``, ``set_current`` context-managed globals) with a single
small registry.  Environment variables use the ``NUTILS_TPU_`` prefix.

Key settings:

``floatx``
    Concrete dtype that abstract ``float`` expressions compile to.  Defaults to
    ``float64`` (required for reference-parity regression tests); the TPU
    benchmark path sets ``float32``.
``intx``
    Concrete dtype for abstract ``int``; ``int32`` is TPU-native.
``matrix``
    Linear algebra backend: ``auto``/``direct``/``cg``/``scipy``/``dense``.
'''

import contextlib
import os

import numpy


class _Setting:

    def __init__(self, name, default, parse=str):
        self.name = name
        env = os.environ.get('NUTILS_TPU_' + name.upper())
        self.value = parse(env) if env is not None else default

    @contextlib.contextmanager
    def __call__(self, value):
        old, self.value = self.value, value
        try:
            yield value
        finally:
            self.value = old


floatx = _Setting('floatx', numpy.float64, numpy.dtype)
intx = _Setting('intx', numpy.int32, numpy.dtype)
matrix = _Setting('matrix', 'auto')
# Under matrix='auto', systems with at least this many free dofs solve with
# the on-device Krylov backends (cg if symmetric else gmres, with host-direct
# demotion on tolerance failure); smaller systems use the host direct solver,
# where factorization beats device round-trips.
device_solve_min = _Setting('device_solve_min', 25000, int)
# Upper bound on elements per device batch during assembly; larger samples are
# processed in chunks to bound HBM footprint of quadrature intermediates.
assembly_chunk = _Setting('assembly_chunk', 2**21, int)
# Jacobian seed passes per device step: seeds are processed in blocks of this
# size (sequentially via lax.map) so the per-seed quadrature intermediates of
# huge element batches do not live simultaneously; 0 vmaps all seeds at once.
seed_block = _Setting('seed_block', 0, int)
# TPU only: estimated bytes of the largest linearization intermediate
# (seeds x elements x points x test-channels, f32) above which full-batch
# assembly is pre-emptively element-chunked.  TPU tiling pads the two minor
# dims of any materialized buffer to (8, 128), so element-major quadrature
# intermediates with small trailing dims can exceed HBM by a large factor
# even when their true size fits; the remote compile service surfaces that
# only as an opaque HTTP 500.  0 disables the estimate.
assembly_max_bytes = _Setting('assembly_max_bytes', 2**30, int)
# Fuse all assembly chunks into one XLA program (the default).  Setting this
# to 0 on the CPU backend compiles each chunk separately with host-side
# accumulation — a diagnostic mode for environments whose remote XLA compile
# service returns executables compiled against a mismatched target.
fuse_assembly = _Setting('fuse_assembly', 1, int)
# Colon-separated internal sanitizer flags (the analogue of NUTILS_DEBUG,
# reference: debug_flags.py): 'lower' checks every function.Array.lower result
# against the declared shape/dtype; 'sparse' verifies every rewriting
# evaluable builder against the naive node on random bindings at the call
# site (reference: verify_sparse_chunks, evaluable.py:440); 'compile' logs
# each compiled program; 'all' enables everything.
debug = _Setting('debug', frozenset(), lambda s: frozenset(s.split(':')) - {''})


# Multi-device execution mode (NUTILS_TPU_MESH=N): assemble and solve over a
# 1-D device mesh of N devices — System element tables shard over the mesh
# automatically, as do the stencil/blockgrid/sparse solve operands; GSPMD
# inserts the collectives (halo exchanges for shifted-slice matvecs,
# all-reduces for dof scatters).  0 disables (single device), -1 uses every
# visible device.  The TPU analogue of the reference's default-on
# fork+shared-memory element loop (reference: parallel.py:21, NUTILS_NPROCS).
mesh = _Setting('mesh', 0, int)

# Unstructured device SpMV layout: 'auto' (shared-column block-ELL when rows
# are boundedly short, else scatter CSR), or force 'bell'/'ell'/'csr'.
# Element-granular gathers serialize at ~7 ns each on this toolchain, so the
# block form — one gather per UNIQUE column of a row block — is the default.
spmv = _Setting('spmv', 'auto')
# Rows per shared-column block in the 'bell' layout.
spmv_blockrows = _Setting('spmv_blockrows', 32, int)


def debug_enabled(flag):
    d = debug.value
    return flag in d or 'all' in d


def float_dtype():
    return numpy.dtype(floatx.value)


def int_dtype():
    return numpy.dtype(intx.value)
# Collapse element-uniform constant tables (identical rows along the element
# axis, e.g. structured-basis coefficients) to a single broadcast row during
# constant promotion, cutting assembly HBM traffic.
uniform_tables = _Setting('uniform_tables', 1, int)
