'''Benchmarks: assembly and assemble+solve throughput at ~1M dof.

Prints one JSON line per metric as soon as it is measured, then a final
summary line (the driver's headline) carrying all metrics in a "sub" dict:

a. laplace_assembly   — fused residual+jacobian assembly, GDOF/s, f32 device;
                        also records the per-call device time amortized over
                        10 pipelined dispatches (tunnel latency overlapped).
b. laplace_solve      — assembly + device-CG solve of an SPD reaction-
                        diffusion system, wall-clock seconds, rtol 1e-10: the
                        auto-selected preconditioner is the geometric-
                        multigrid V-cycle on the stencil form
                        (matrix._device_krylov/_mg); the inner Krylov loop
                        runs in f32 on device and an outer f64 iterative-
                        refinement loop contracts the true residual past the
                        f32 drift floor.  The actually-used operator form,
                        preconditioner and iteration counts are recorded in
                        'solve_stats'; 'matvec' carries the amortized on-chip
                        matvec time and achieved HBM GB/s.
c. ns_newton_step     — one Newton step of a cylinderflow-class nonsymmetric
                        system (Taylor-Hood Navier-Stokes time step with
                        convection at a nonzero state): fused jacobian +
                        residual assembly plus device-GMRES sub-solve (block-
                        grid operator form, Schur-aware diagonal scaling,
                        device-resident end to end) at the reference's Newton
                        rtol 1e-3 (reference: solver.py:657), wall-clock
                        seconds.  This is the HEADLINE metric.

Wall-clock discipline (the TPU tunnel of this environment intermittently
degrades to minute-scale stalls inside C-level device calls, which killed the
round-2 bench at the driver's budget): a <=90 s subprocess *health probe*
decides device-vs-CPU once up front; every section runs in a killable
subprocess under a share of BENCH_TOTAL_BUDGET (default 20 min); each
section's JSON line is flushed the moment it completes so a kill still leaves
partial numbers on record.

vs_baseline = speedup over GENUINE reference nutils (evalf/nutils @ 10a8, run
on this host's CPU through the pure-python dependency shims in refshims/ —
bench_reference.py measures the identical three problems through the
reference's own System/assemble/solve stack and persists them under the
'reference' key of the committed bench_baseline.json; BASELINE.md items 1-2).
Each sub-metric also carries 'vs_cpu_f32': the same-code-on-CPU ratio that
earlier rounds reported as vs_baseline.  Regenerate the same-code baseline
with `python bench.py --make-baseline` and the reference baseline with
`python bench_reference.py` (offline; ~15 min).
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


def _platform():
    import jax
    return jax.default_backend()


def _matvec_microbench(jac, n_async=20):
    '''On-chip matvec time amortized over ``n_async`` back-to-back async
    dispatches (the tunnel's per-call dispatch latency overlaps, so the
    amortized per-call time approaches pure device execution), plus the
    achieved HBM bandwidth from a conservative traffic model of the
    stencil/blockgrid slice matvec (weights + operand read + result write).'''
    import jax
    import jax.numpy as jnp
    from nutils_tpu.ops.sparse import _make_matvec
    mv_kind, op = jac._device_op()
    mv = jax.jit(_make_matvec(mv_kind))
    n = jac.shape[0]
    dt = numpy.dtype(str(op[0].dtype))
    x = jnp.ones(n, dt)
    y = mv(op, x)
    jax.block_until_ready(y)  # compile + warmup
    scale = jnp.asarray(0.001, dt)  # keep the chained iterates off inf/NaN
    t0 = time.perf_counter()
    for _ in range(n_async):
        x = mv(op, x) * scale  # chained: forces sequential device execution
    jax.block_until_ready(x)
    t = (time.perf_counter() - t0) / n_async
    # traffic model from the device operands themselves (forcing the CSR
    # pattern for an nnz count would cost a 10M-entry host sort): weight
    # arrays read once, operand vector read once per weight slice, result
    # written once
    nweights = sum(int(numpy.prod(o.shape)) for o in op
                   if hasattr(o, 'dtype') and numpy.issubdtype(numpy.dtype(str(o.dtype)), numpy.floating))
    traffic = (2 * nweights + n) * dt.itemsize
    return {'op_form': mv_kind[0], 't_device_matvec': t,
            'gbps': traffic / t / 1e9 if t > 0 else None}


def bench_laplace_assembly(nelems, dtype, repeats=10):
    import jax
    system = build_laplace(nelems, dtype)
    ndofs = system.trial_shapes[0][0]
    clean = _commit(system._clean({'u': numpy.zeros(ndofs)}))
    fn = system._compiled('jacres')
    t, _ = _mintime(lambda: fn(clean), repeats)
    # amortized per-call device time: n back-to-back async dispatches
    # overlap the tunnel latency, so the mean approaches on-chip execution
    n_async = 10
    t0 = time.perf_counter()
    outs = [fn(clean) for _ in range(n_async)]
    jax.block_until_ready(outs)
    t_dev = (time.perf_counter() - t0) / n_async
    return {'ndofs': ndofs, 't_assemble': t, 'gdofs': ndofs / t / 1e9,
            't_device': t_dev, 'gdofs_device': ndofs / t_dev / 1e9,
            'platform': _platform()}


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
            't_total': t_asm + t_solve, 'rel_residual': resnorm,
            'solve_stats': getattr(jac, '_solve_stats', None),
            'matvec': _matvec_microbench(jac), 'platform': _platform()}


def bench_ns_newton(nelems, dtype, rtol=1e-3, repeats=3):
    import jax
    system, args = build_ns(nelems, dtype)
    ndofs = sum(int(numpy.prod(s)) for s in system.trial_shapes)
    clean = _commit(system._clean(args))
    fn = system._compiled('jacres')
    t_asm, _ = _mintime(lambda: fn(clean), repeats)
    n_async = 10
    t0 = time.perf_counter()
    outs = [fn(clean) for _ in range(n_async)]
    jax.block_until_ready(outs)
    t_asm_dev = (time.perf_counter() - t0) / n_async
    jac, res = system.assemble_jacobian_residual(args)
    t_solve, dx = _mintime(lambda: jac.solve_leniently(res, solver='gmres', rtol=rtol), repeats)
    resnorm = float(numpy.linalg.norm(res - jac @ dx) / numpy.linalg.norm(res))
    # the production time-loop shape: assembly + precon + refined GMRES as
    # ONE jitted program (System.fused_step_op) — a single dispatch instead
    # of the assemble/precon/solve round trips of the split path
    t_fused = rel_fused = None
    try:
        fused = system.fused_step_op(solver='gmres', rtol=rtol)
        t_fused, out = _mintime(lambda: fused(clean), repeats)
        dxf = numpy.asarray(out[0], dtype=numpy.float64)
        rel_fused = float(numpy.linalg.norm(res - jac @ dxf) / numpy.linalg.norm(res))
    except Exception as e:  # optional metric: a fused-program compile failure
        print(f'fused step unavailable: {type(e).__name__}', file=sys.stderr)
    return {'ndofs': ndofs, 't_assemble': t_asm, 't_assemble_device': t_asm_dev,
            't_solve': t_solve,
            't_total': t_asm + t_solve,
            't_step_fused': t_fused, 'rel_residual_fused': rel_fused,
            'rel_residual': resnorm,
            'solve_stats': getattr(jac, '_solve_stats', None),
            'matvec': _matvec_microbench(jac), 'platform': _platform()}


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
    '''(same-code CPU sections, reference-nutils CPU sections) from the
    committed bench_baseline.json.  The ``reference`` key holds genuine
    evalf/nutils wall-clocks measured on this host through refshims/
    (bench_reference.py; BASELINE.md items 1-2).'''
    try:
        with open(_BASELINE_FILE) as f:
            base = json.load(f)
        if base.get('nelems') == nelems and base.get('ns_nelems') == ns_nelems:
            return base['sections'], base.get('reference')
        print('bench_baseline.json is for different sizes; ignoring', file=sys.stderr)
    except FileNotFoundError:
        print('bench_baseline.json missing; vs_baseline will be NaN '
              '(regenerate: python bench.py --make-baseline)', file=sys.stderr)
    except Exception as e:
        print(f'bench_baseline.json unreadable: {e}', file=sys.stderr)
    return None, None


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

    cpu, ref = _load_baseline(nelems, ns_nelems)

    device_ok = _probe_device(budget=min(90, total_budget // 4))
    platform = None if device_ok else 'cpu'  # None inherits the env (TPU via tunnel)
    if not device_ok:
        print('TPU tunnel down (probe timed out); running all sections on host CPU',
              file=sys.stderr)

    def ratio(metric, field, sec, base=None):
        try:
            return round((cpu if base is None else base)[metric][field] / sec[field], 2)
        except Exception:
            return float('nan')

    def tag(sec):
        return ' [cpu-fallback: TPU tunnel down]' if sec.get('platform') in ('cpu-fallback',) else ''

    _LINE = {
        'laplace_assembly': lambda a: {
            'metric': f'laplace assembly throughput ({a["ndofs"]} dofs, fused jacobian+residual, f32){tag(a)}',
            'value': round(a['gdofs'], 4), 'unit': 'GDOF/s',
            'vs_baseline': ratio('laplace_assembly', 't_assemble', a, ref),
            'vs_cpu_f32': ratio('laplace_assembly', 't_assemble', a)},
        'laplace_solve': lambda b: {
            'metric': (f'laplace assemble + device-MG-CG solve ({b["ndofs"]} dofs, rtol 1e-10, '
                       f'f32 device inner + f64 iterative refinement){tag(b)}'),
            'value': round(b['t_total'], 4), 'unit': 's',
            'vs_baseline': ratio('laplace_solve', 't_total', b, ref),
            'vs_cpu_f32': ratio('laplace_solve', 't_total', b)},
        'ns_newton_step': lambda c: {
            'metric': (f'navier-stokes newton step, assemble + device-GMRES rtol 1e-3 '
                       f'({c["ndofs"]} dofs, f32{_ns_kind(c)}){tag(c)}'),
            'value': round(_ns_time(c), 4), 'unit': 's',
            'vs_baseline': _ns_ratio(c, ref),
            'vs_cpu_f32': _ns_ratio(c, cpu)},
    }

    def _ns_fused_ok(c):
        tf = c.get('t_step_fused')
        rf = c.get('rel_residual_fused')
        return (tf is not None and rf is not None and rf <= 1.5e-3
                and tf < c['t_total'])  # fused wins only when dispatch
        # latency dominates; on a healthy link the split path's cached f64
        # operands can beat the fused program's per-call re-widening

    def _ns_time(c):
        return c['t_step_fused'] if _ns_fused_ok(c) else c['t_total']

    def _ns_kind(c):
        return ', single fused program' if _ns_fused_ok(c) else ''

    def _ns_ratio(c, base):
        try:
            return round(base['ns_newton_step']['t_total'] / _ns_time(c), 2)
        except Exception:
            return float('nan')

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

    # headline: the north-star metric (BASELINE.json) — the Navier-Stokes
    # Newton step against GENUINE reference nutils measured on this host's
    # CPU (bench_baseline.json 'reference' key, BASELINE.md items 1-2)
    c = results.get('ns_newton_step')
    print(json.dumps({
        'metric': (f'navier-stokes newton step, assemble + device-GMRES rtol 1e-3 '
                   f'({c["ndofs"]} dofs, f32 TPU{_ns_kind(c)}) vs reference nutils '
                   f'(CPU, scipy backend){tag(c)}') if c else 'bench timed out (degraded TPU tunnel)',
        'value': round(_ns_time(c), 4) if c else float('nan'),
        'unit': 's',
        'vs_baseline': _ns_ratio(c, ref) if c else float('nan'),
        'sub': {
            name: ({**res,
                    'vs_cpu_f32': ratio(name, 't_total' if 't_total' in res else 't_assemble', res),
                    'vs_reference': ratio(name, 't_total' if 't_total' in res else 't_assemble', res, ref)}
                   if res else None)
            for name, res in results.items()
        },
        'reference_baseline': ref,
    }), flush=True)


if __name__ == '__main__':
    main()
