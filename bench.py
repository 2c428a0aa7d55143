'''Benchmarks: assembly and assemble+solve throughput at ~1M dof.

Prints one JSON line per metric as soon as it is measured, then a final
summary line (the driver's headline) carrying all metrics in a "sub" dict:

a. laplace_assembly   — fused residual+jacobian assembly, GDOF/s, f32 device.
b. laplace_solve      — assembly + device-CG solve (Jacobi precon) of an SPD
                        reaction-diffusion system, wall-clock seconds, rtol
                        1e-10: the inner Krylov loop runs in f32 on device
                        (stencil-form matvec at the HBM roofline) and an
                        outer f64 iterative-refinement loop contracts the
                        true residual past the f32 drift floor
                        (matrix._device_krylov).
c. ns_newton_step     — one Newton step of a cylinderflow-class nonsymmetric
                        system (Taylor-Hood Navier-Stokes time step with
                        convection at a nonzero state): fused jacobian +
                        residual assembly plus device-GMRES sub-solve at the
                        reference's Newton rtol 1e-3 (reference:
                        solver.py:657), wall-clock seconds.

Wall-clock discipline (the TPU tunnel of this environment intermittently
degrades to minute-scale stalls inside C-level device calls, which killed the
round-2 bench at the driver's budget): a <=90 s subprocess *health probe*
decides device-vs-CPU once up front; every section runs in a killable
subprocess under a share of BENCH_TOTAL_BUDGET (default 20 min); each
section's JSON line is flushed the moment it completes so a kill still leaves
partial numbers on record.

vs_baseline = speedup over the same pipeline jitted on the host CPU (the
reference, evalf/nutils, is a CPU/numpy framework with no published numbers —
BASELINE.md — so the CPU run of this same code stands in as the baseline).
The CPU baseline is persisted in the committed file bench_baseline.json (it
does not change between runs); regenerate with `python bench.py
--make-baseline`.  The headline keeps round-1's f32-device vs f64-CPU
assembly ratio for continuity; each sub-metric also carries a dtype-matched
f32-CPU ratio.
'''

import json
import os
import sys
import time

import numpy

_BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'bench_baseline.json')


def build_laplace(nelems, dtype, reaction=False):
    from nutils_tpu import function, mesh
    from nutils_tpu.solver import System
    from nutils_tpu.utils import config
    config.floatx.value = dtype
    topo, geom = mesh.unitsquare(nelems, 'square')
    u = topo.field('u', btype='std', degree=1)
    g = function.grad(u, geom)
    J = function.J(geom)
    f = function.sin(geom[0]) * function.cosh(geom[1])
    energy = topo.integral(((g @ g) / 2 + (u * u) / 2 * reaction - f * u) * J, degree=2)
    return System(energy, trial='u')


def build_ns(nelems, dtype):
    '''Navier-Stokes implicit-Euler time step, Taylor-Hood (P2/P1), with
    convection linearized at a nonzero state — the cylinderflow Newton-system
    class (reference: examples/cylinderflow.py:155, solver.py:503).'''
    from nutils_tpu import function, mesh
    from nutils_tpu.expression import Namespace
    from nutils_tpu.solver import System
    from nutils_tpu.utils import config
    config.floatx.value = dtype
    topo, geom = mesh.unitsquare(nelems, 'square')
    ns = Namespace()
    ns.x = geom
    ns.define_for('x', gradient='∇', jacobians=('dV',))
    ns.u = topo.field('u', btype='std', degree=2, shape=[2])
    ns.p = topo.field('p', btype='std', degree=1)
    ns.v = function.replace_arguments(ns.u, 'u:v')
    ns.q = function.replace_arguments(ns.p, 'p:q')
    ns.δ = function.eye(2)
    ns.u0_i = 'sin(x_0) cos(x_1) δ_i0 - cos(x_0) sin(x_1) δ_i1'  # prior state (divergence-free)
    ns.dt = 0.01
    ns.nu = 0.001
    ns.eps = 0.001  # pressure stabilization: removes the nullspace without BCs
    res = topo.integral(
        '(v_i (u_i - u0_i) / dt + v_i u_j ∇_j(u_i) + nu ∇_j(v_i) ∇_j(u_i)'
        ' - p ∇_i(v_i) + q ∇_i(u_i) + eps p q) dV' @ ns, degree=6)
    system = System(res, trial='u,p', test='v,q')
    rng = numpy.random.default_rng(0)
    args = {t: 0.1 * rng.standard_normal(shape)
            for t, shape in zip(system.trials, system.trial_shapes)}
    return system, args


def _mintime(fn, repeats):
    import jax
    out = fn()
    jax.block_until_ready(out)  # compile + warmup
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times), out


def _commit(clean):
    '''Device-commit the argument dict once (assembly dtype): measured
    assembly throughput is then the on-chip kernel, not the per-call
    host->device transfer of the state vector (which a fused production
    solve loop pays once, not per iteration).'''
    import jax
    import jax.numpy as jnp
    from nutils_tpu.utils import config
    out = {k: jax.device_put(jnp.asarray(v, dtype=config.float_dtype()))
           for k, v in clean.items()}
    jax.block_until_ready(out)
    return out


def bench_laplace_assembly(nelems, dtype, repeats=10):
    system = build_laplace(nelems, dtype)
    ndofs = system.trial_shapes[0][0]
    clean = _commit(system._clean({'u': numpy.zeros(ndofs)}))
    fn = system._compiled('jacres')
    t, _ = _mintime(lambda: fn(clean), repeats)
    return {'ndofs': ndofs, 't_assemble': t, 'gdofs': ndofs / t / 1e9}


def bench_laplace_solve(nelems, dtype, rtol=1e-10, repeats=3):
    system = build_laplace(nelems, dtype, reaction=True)
    ndofs = system.trial_shapes[0][0]
    args = {'u': numpy.zeros(ndofs)}
    clean = _commit(system._clean(args))
    fn = system._compiled('jacres')
    t_asm, _ = _mintime(lambda: fn(clean), repeats)
    jac, res = system.assemble_jacobian_residual(args)
    t_solve, x = _mintime(lambda: jac.solve(res, solver='cg', rtol=rtol), repeats)
    resnorm = float(numpy.linalg.norm(res - jac @ x) / numpy.linalg.norm(res))
    return {'ndofs': ndofs, 't_assemble': t_asm, 't_solve': t_solve,
            't_total': t_asm + t_solve, 'rel_residual': resnorm}


def bench_ns_newton(nelems, dtype, rtol=1e-3, repeats=3):
    system, args = build_ns(nelems, dtype)
    ndofs = sum(int(numpy.prod(s)) for s in system.trial_shapes)
    clean = _commit(system._clean(args))
    fn = system._compiled('jacres')
    t_asm, _ = _mintime(lambda: fn(clean), repeats)
    jac, res = system.assemble_jacobian_residual(args)
    t_solve, dx = _mintime(lambda: jac.solve_leniently(res, solver='gmres', rtol=rtol), repeats)
    resnorm = float(numpy.linalg.norm(res - jac @ dx) / numpy.linalg.norm(res))
    return {'ndofs': ndofs, 't_assemble': t_asm, 't_solve': t_solve,
            't_total': t_asm + t_solve, 'rel_residual': resnorm}


_SECTIONS = {
    'laplace_assembly': lambda nelems, ns_nelems, dtype: bench_laplace_assembly(nelems, dtype),
    'laplace_solve': lambda nelems, ns_nelems, dtype: bench_laplace_solve(nelems, dtype),
    'ns_newton_step': lambda nelems, ns_nelems, dtype: bench_ns_newton(ns_nelems, dtype),
}


def _probe_device(budget=90):
    '''Health-check the TPU tunnel: a tiny matmul in a killable subprocess.
    jax.devices() itself hangs for minutes when the tunnel is down, and
    in-process SIGALRM never fires inside C-level device calls, so only a
    subprocess under a hard timeout gives a reliable verdict.'''
    import subprocess
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--probe'],
            env=dict(os.environ), capture_output=True, text=True, timeout=budget)
        res = json.loads(out.stdout.strip().splitlines()[-1])
        return bool(res.get('ok')) and res.get('platform') not in ('cpu',)
    except Exception as e:
        print(f'device probe failed: {type(e).__name__}', file=sys.stderr)
        return False


def _run_section_subprocess(name, nelems, ns_nelems, dtype, budget, platform=None):
    '''Run one bench section in a subprocess under a hard timeout (see
    _probe_device for why a subprocess).  A timed-out or crashed section
    reports None.'''
    import subprocess
    env = dict(os.environ, BENCH_NELEMS=str(nelems), BENCH_NS_NELEMS=str(ns_nelems),
               BENCH_DTYPE=numpy.dtype(dtype).name)
    if platform is not None:
        env['JAX_PLATFORMS'] = platform
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--section', name],
            env=env, capture_output=True, text=True, timeout=budget)
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception as e:
        print(f'bench section {name} failed: {type(e).__name__}', file=sys.stderr)
        return None


def _run_sections_streaming(names, nelems, ns_nelems, dtype, budget):
    '''Run ALL sections in ONE device subprocess, streaming one JSON line per
    section and killing at the deadline: completed sections survive a kill,
    and the process-wide first-device-fetch penalty (measured 20-350 s,
    environment-dependent) is paid once instead of once per section.'''
    import selectors
    import subprocess
    env = dict(os.environ, BENCH_NELEMS=str(nelems), BENCH_NS_NELEMS=str(ns_nelems),
               BENCH_DTYPE=numpy.dtype(dtype).name)
    p = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), '--run-sections', ','.join(names)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    results = {}
    deadline = time.monotonic() + budget
    sel = selectors.DefaultSelector()
    sel.register(p.stdout, selectors.EVENT_READ)
    buf = ''
    try:
        while True:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                print('bench device budget exhausted; killing section runner', file=sys.stderr)
                p.kill()
                break
            if not sel.select(timeout=min(remaining, 10)):
                continue
            chunk = p.stdout.readline()
            if not chunk:
                break
            buf = chunk.strip()
            if not buf.startswith('{'):
                continue
            try:
                rec = json.loads(buf)
            except Exception:
                continue
            name = rec.pop('_section', None)
            if name:
                results[name] = rec
    finally:
        try:
            p.kill()
        except Exception:
            pass
        p.wait()
    return results


def _load_baseline(nelems, ns_nelems):
    try:
        with open(_BASELINE_FILE) as f:
            base = json.load(f)
        if base.get('nelems') == nelems and base.get('ns_nelems') == ns_nelems:
            return base['sections']
        print('bench_baseline.json is for different sizes; ignoring', file=sys.stderr)
    except FileNotFoundError:
        print('bench_baseline.json missing; vs_baseline will be NaN '
              '(regenerate: python bench.py --make-baseline)', file=sys.stderr)
    except Exception as e:
        print(f'bench_baseline.json unreadable: {e}', file=sys.stderr)
    return None


def _make_baseline(nelems, ns_nelems, budget_per_section):
    '''Measure the CPU baseline (all three sections f32 + the round-1 f64
    assembly anchor) and persist it to bench_baseline.json.  Run offline, not
    by the driver: the file is committed and reused.'''
    sections = {}
    for name in _SECTIONS:
        sections[name] = _run_section_subprocess(
            name, nelems, ns_nelems, numpy.float32, budget_per_section, platform='cpu')
        print(f'baseline {name}: {json.dumps(sections[name])}', flush=True)
    sections['laplace_assembly_f64'] = _run_section_subprocess(
        'laplace_assembly', nelems, ns_nelems, numpy.float64, budget_per_section, platform='cpu')
    print(f'baseline laplace_assembly_f64: {json.dumps(sections["laplace_assembly_f64"])}', flush=True)
    with open(_BASELINE_FILE, 'w') as f:
        json.dump({'nelems': nelems, 'ns_nelems': ns_nelems, 'platform': 'cpu',
                   'recorded': time.strftime('%Y-%m-%d'), 'sections': sections}, f, indent=1)
    print(f'wrote {_BASELINE_FILE}')


def main():
    nelems = int(os.environ.get('BENCH_NELEMS', '1024'))
    ns_nelems = int(os.environ.get('BENCH_NS_NELEMS', '330'))

    if '--probe' in sys.argv:
        import nutils_tpu  # noqa: F401 -- re-asserts JAX_PLATFORMS over the axon plugin's import-time override
        import jax
        import jax.numpy as jnp
        x = jnp.ones((256, 256), jnp.float32)
        (x @ x).block_until_ready()
        print(json.dumps({'ok': True, 'platform': jax.devices()[0].platform}))
        return

    if '--section' in sys.argv:
        name = sys.argv[sys.argv.index('--section') + 1]
        dtype = numpy.dtype(os.environ.get('BENCH_DTYPE', 'float32')).type
        print(json.dumps(_SECTIONS[name](nelems, ns_nelems, dtype)))
        return

    if '--run-sections' in sys.argv:
        names = sys.argv[sys.argv.index('--run-sections') + 1].split(',')
        dtype = numpy.dtype(os.environ.get('BENCH_DTYPE', 'float32')).type
        # pay the process-wide first-fetch penalty up front, outside timings
        import jax
        import jax.numpy as jnp
        numpy.asarray(jax.jit(lambda: jnp.arange(8, dtype=jnp.float32))())
        for name in names:
            try:
                rec = _SECTIONS[name](nelems, ns_nelems, dtype)
            except Exception as e:
                print(json.dumps({'_section': name, 'error': f'{type(e).__name__}: {e}'[:200]}),
                      flush=True)
                continue
            print(json.dumps({'_section': name, **rec}), flush=True)
        return

    if '--make-baseline' in sys.argv:
        _make_baseline(nelems, ns_nelems,
                       budget_per_section=int(os.environ.get('BENCH_SECTION_TIMEOUT', '5400')))
        return

    total_budget = int(os.environ.get('BENCH_TOTAL_BUDGET', '1200'))
    deadline = time.monotonic() + total_budget

    cpu = _load_baseline(nelems, ns_nelems)

    device_ok = _probe_device(budget=min(90, total_budget // 4))
    platform = None if device_ok else 'cpu'  # None inherits the env (TPU via tunnel)
    if not device_ok:
        print('TPU tunnel down (probe timed out); running all sections on host CPU',
              file=sys.stderr)

    def ratio(metric, field, sec):
        try:
            return round(cpu[metric][field] / sec[field], 2)
        except Exception:
            return float('nan')

    def tag(sec):
        return ' [cpu-fallback: TPU tunnel down]' if sec.get('platform') else ''

    _LINE = {
        'laplace_assembly': lambda a: {
            'metric': f'laplace assembly throughput ({a["ndofs"]} dofs, fused jacobian+residual, f32){tag(a)}',
            'value': round(a['gdofs'], 4), 'unit': 'GDOF/s',
            'vs_baseline': ratio('laplace_assembly', 't_assemble', a)},
        'laplace_solve': lambda b: {
            'metric': (f'laplace assemble + device-CG solve ({b["ndofs"]} dofs, rtol 1e-10, '
                       f'f32 device inner + f64 iterative refinement){tag(b)}'),
            'value': round(b['t_total'], 4), 'unit': 's',
            'vs_baseline': ratio('laplace_solve', 't_total', b)},
        'ns_newton_step': lambda c: {
            'metric': f'navier-stokes newton step, assemble + device-GMRES rtol 1e-3 ({c["ndofs"]} dofs, f32){tag(c)}',
            'value': round(c['t_total'], 4), 'unit': 's',
            'vs_baseline': ratio('ns_newton_step', 't_total', c)},
    }

    results = {}
    names = list(_SECTIONS)
    if platform is None:
        # healthy tunnel: all sections in one streamed device subprocess
        # (one first-fetch penalty, one build; completed sections survive a
        # deadline kill)
        streamed = _run_sections_streaming(names, nelems, ns_nelems, numpy.float32,
                                           max(60, deadline - time.monotonic() - 60))
        for name in names:
            res = streamed.get(name)
            if res is not None and 'error' in res:
                print(f'bench section {name} failed: {res["error"]}', file=sys.stderr)
                res = None
            results[name] = res
            if res is not None:
                print(json.dumps(_LINE[name](res)), flush=True)
    for name in names:
        if results.get(name) is not None:
            continue
        # degraded tunnel or failed section: host CPU fallback, per section
        remaining = deadline - time.monotonic()
        if remaining < 30:
            print(f'bench budget exhausted before {name}', file=sys.stderr)
            results[name] = None
            continue
        pending = sum(1 for n in names if results.get(n) is None)
        res = _run_section_subprocess(name, nelems, ns_nelems, numpy.float32,
                                      max(60, remaining / max(pending, 1)), platform='cpu')
        if res is not None:
            res['platform'] = 'cpu-fallback'
            print(json.dumps(_LINE[name](res)), flush=True)
        results[name] = res

    a = results.get('laplace_assembly')
    try:
        vs_f64 = round(cpu['laplace_assembly_f64']['t_assemble'] / a['t_assemble'], 2)
    except Exception:
        vs_f64 = float('nan')
    print(json.dumps({
        'metric': (f'laplace assembly throughput ({a["ndofs"]} dofs, fused jacobian+residual, '
                   f'f32 TPU vs f64 CPU){tag(a)}') if a else 'bench timed out (degraded TPU tunnel)',
        'value': round(a['gdofs'], 4) if a else float('nan'),
        'unit': 'GDOF/s',
        'vs_baseline': vs_f64,
        'sub': {
            name: ({**res, 'vs_cpu_f32': ratio(name, 't_total' if 't_total' in res else 't_assemble', res)}
                   if res else None)
            for name, res in results.items()
        },
    }), flush=True)


if __name__ == '__main__':
    main()
