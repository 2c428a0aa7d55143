'''Test configuration: force CPU (real float64) with 8 virtual devices for
multi-chip sharding tests (the analogue of the reference CI's NUTILS_NPROCS=2
row, .github/workflows/test.yaml:58).'''

import os
import sys

# force CPU unconditionally: the session environment may pre-set
# JAX_PLATFORMS=axon (TPU tunnel), but regression tests require real float64,
# which the TPU only emulates (see ENVIRONMENT_NOTES.md)
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = flags + ' --xla_force_host_platform_device_count=8'

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'examples'))

import jax  # noqa: E402
jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
