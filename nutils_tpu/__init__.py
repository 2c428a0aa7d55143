'''nutils_tpu — a TPU-native finite element framework.

A ground-up re-design of the Nutils FEM library (reference: evalf/nutils) for
TPU hardware: the lazy expression graph lowers to batched, statically-shaped
JAX computations compiled by XLA; per-element quadrature loops become einsum
contractions over element batches; sparse matrix assembly produces a
host-precomputed CSR pattern with device-resident value scatter; linear solves
run as on-device preconditioned Krylov iterations.

Layer map (mirrors the reference's, see SURVEY.md):

  L0 utils/      config, numeric helpers (pack/unpack), logging, testing
  L1 evaluable   batched expression IR -> jax.jit compilation
  L2 element     reference elements, quadrature, bezier sampling
  L3 topology    structured/simplex topologies, bases, mesh, sample, function
  L4 matrix      CSR matrix, direct (host) and CG/GMRES (device) backends
  L5 solver      System: residual/jacobian assembly via JAX AD, Newton et al.
  L6 expression  tensor-index DSL (Namespace), export, cli
'''

__version__ = '0.1.0'
version = __version__

import os as _os_early

import jax as _jax

# The environment's TPU plugin overrides jax_platforms at import time; honor
# an explicit JAX_PLATFORMS request from the user (e.g. "cpu" for the test
# suite, which needs real float64).
if _os_early.environ.get('JAX_PLATFORMS'):
    _jax.config.update('jax_platforms', _os_early.environ['JAX_PLATFORMS'])

# FEM regression tolerances (reference: testing.py assertAlmostEqual64 with
# atol=2e-15) require double precision; enable x64 globally. The TPU benchmark
# path overrides the working dtype via utils.config.
_jax.config.update('jax_enable_x64', True)

# TPU MXU matmuls default to bfloat16 inputs; FEM assembly contractions
# (basis monomial einsums, quadrature sums) at bf16 corrupt the operator —
# measured: stencil weights off by ~1e-3 relative with structured zeros on
# the diagonal, which breaks every Krylov solve downstream.  Full-float32
# passes are required for correctness and cost little here because the
# assembly is bandwidth-bound, not MXU-bound.
_jax.config.update('jax_default_matmul_precision', 'float32')

# Persistent XLA compilation cache: FEM workflows compile many small kernels
# (one per integral/sample); caching amortizes them across runs (the analogue
# of the reference's compiled-evaluable caching, evaluable.py:6790).
#
# The cache directory is keyed by a fingerprint of the host CPU features:
# XLA:CPU cache entries are ahead-of-time compiled MACHINE CODE, and sessions
# can migrate between hosts with different vector ISAs — reloading a foreign
# artifact then computes garbage silently (the cpu_aot_loader "machine type
# mismatch" warning).  A per-ISA directory makes that impossible.
import os as _os
import hashlib as _hashlib


def _host_fingerprint():
    try:
        with open('/proc/cpuinfo') as f:
            keep = []
            for line in f:
                # flags + exact model/stepping/microcode: two hosts can share
                # an identical cpuinfo flag set yet get different XLA:CPU
                # code (LLVM tuning features like prefer-no-gather differ per
                # detected microarchitecture), so key on the full CPU identity
                if line.split(':')[0].strip() in ('flags', 'model', 'model name', 'stepping', 'microcode', 'cpu family'):
                    keep.append(line.strip())
                if line.strip() == '' and keep:
                    break  # first core only
            if keep:
                return _hashlib.sha1('\n'.join(sorted(keep)).encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform as _platform
    return _hashlib.sha1(_platform.processor().encode()).hexdigest()[:12]


_cache_dir = _os.environ.get('NUTILS_TPU_JAX_CACHE', _os.path.expanduser('~/.cache/nutils_tpu/jax-' + _host_fingerprint()))
if _cache_dir and _cache_dir != '0':
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update('jax_compilation_cache_dir', _cache_dir)
    _jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    _jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)

from .utils import config, numeric  # noqa: E402
from .utils import _log as log  # noqa: E402
