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
    flags += ' --xla_force_host_platform_device_count=8'
# 8 virtual devices share ONE physical core here, so a heavy per-device
# program legitimately takes minutes to reach a collective; XLA:CPU's default
# 40 s rendezvous termination timeout then hard-aborts the process (observed
# on the coil example under NUTILS_TPU_TEST_MESH=8)
if '--xla_cpu_collective_call_terminate_timeout_seconds' not in flags:
    flags += (' --xla_cpu_collective_call_warn_stuck_timeout_seconds=600'
              ' --xla_cpu_collective_call_terminate_timeout_seconds=3600')
os.environ['XLA_FLAGS'] = flags

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'examples'))

import jax  # noqa: E402
jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
