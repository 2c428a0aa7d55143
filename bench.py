'''Benchmark: laplace-style residual+jacobian assembly at 1.05M dof.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.

value      = assembly throughput on the default (TPU) backend in GDOF/s
             (dofs of the assembled system per second of wall-clock for a full
             fused residual+jacobian evaluation, float32).
vs_baseline = speedup of the TPU assembly over the same computation jitted on
             the host CPU in float64 (the reference, evalf/nutils, is a
             CPU/numpy framework with no published numbers — BASELINE.md — so
             the CPU run of this same pipeline stands in as the baseline).
'''

import json
import os
import sys
import time

import numpy


def build(nelems, dtype):
    from nutils_tpu import function, mesh
    from nutils_tpu.solver import System
    from nutils_tpu.utils import config
    config.floatx.value = dtype
    topo, geom = mesh.unitsquare(nelems, 'square')
    u = topo.field('u', btype='std', degree=1)
    g = function.grad(u, geom)
    J = function.J(geom)
    f = function.sin(geom[0]) * function.cosh(geom[1])
    energy = topo.integral(((g @ g) / 2 - f * u) * J, degree=2)
    return System(energy, trial='u')


def time_assembly(system, device, repeats=5):
    import jax
    ndofs = system.trial_shapes[0][0]
    u = numpy.zeros(ndofs)
    with jax.default_device(device):
        fn = system._compiled('jacres')
        clean = system._clean({'u': u})
        data, res = fn(clean)  # compile + warmup
        jax.block_until_ready((data, res))
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            data, res = fn(clean)
            jax.block_until_ready((data, res))
            times.append(time.perf_counter() - t0)
    return min(times), ndofs


def _run(nelems, dtype):
    import jax
    system = build(nelems, dtype)
    t, ndofs = time_assembly(system, jax.devices()[0], repeats=3 if dtype == numpy.float64 else 5)
    return t, ndofs


def main():
    nelems = int(os.environ.get('BENCH_NELEMS', '1024'))

    if '--cpu-baseline' in sys.argv:
        t, ndofs = _run(nelems, numpy.float64)
        print(json.dumps({'t': t, 'ndofs': ndofs}))
        return

    # device (TPU) run, float32
    t_dev, ndofs = _run(nelems, numpy.float32)
    gdofs = ndofs / t_dev / 1e9

    # CPU float64 baseline in a subprocess (the reference is a CPU/numpy
    # framework; this same pipeline on host CPU stands in for it since the
    # reference publishes no numbers, BASELINE.md)
    try:
        import subprocess
        env = dict(os.environ, JAX_PLATFORMS='cpu')
        out = subprocess.run([sys.executable, os.path.abspath(__file__), '--cpu-baseline'],
                             env=env, capture_output=True, text=True, timeout=3000)
        t_cpu = json.loads(out.stdout.strip().splitlines()[-1])['t']
        speedup = t_cpu / t_dev
    except Exception as e:
        print(f'cpu baseline failed: {e}', file=sys.stderr)
        speedup = float('nan')

    print(json.dumps({
        'metric': f'laplace assembly throughput ({ndofs} dofs, fused jacobian+residual, f32 TPU vs f64 CPU)',
        'value': round(gdofs, 4),
        'unit': 'GDOF/s',
        'vs_baseline': round(speedup, 2),
    }))


if __name__ == '__main__':
    main()
