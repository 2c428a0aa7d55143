'''Measure the REFERENCE nutils (/root/reference, via refshims/) on this
host's CPU, on the exact problems bench.py measures, and persist the numbers
into bench_baseline.json under a "reference" key (BASELINE.md items 1-2).

Sections (mirroring bench.py):
  laplace_assembly — fused jacobian+residual assembly of the unitsquare
                     Poisson energy, nelems=1024 (1,050,625 dofs, std deg 1),
                     reference path solver.py:358-386 (assemble_jacobian_residual).
  laplace_solve    — assembly + solve(rtol=1e-10) of the SPD reaction-
                     diffusion system with the reference's default solver
                     stack (arnoldi + sparse-direct precon, matrix/_base.py:100).
  ns_newton_step   — one Newton step of the Taylor-Hood Navier-Stokes
                     implicit-Euler system at ns_nelems=330 (983,403 dofs):
                     assembly + solve_leniently(rtol=1e-3), the exact
                     per-iteration work of reference Newton (solver.py:657-661).

Each section runs in its own subprocess under a hard timeout; results stream
into bench_baseline.json as they land so a kill preserves partials.  Run
offline (not by the driver): python bench_reference.py
'''

import json
import os
import subprocess
import sys
import time

import numpy

_HERE = os.path.dirname(os.path.abspath(__file__))
_BASELINE_FILE = os.path.join(_HERE, 'bench_baseline.json')
_REFPATH = os.pathsep.join([os.path.join(_HERE, 'refshims'), '/root/reference/src'])


def _build_laplace(nelems, reaction=False):
    from nutils import function, mesh
    from nutils.solver import System
    topo, geom = mesh.unitsquare(nelems, 'square')
    u = topo.field('u', btype='std', degree=1)
    g = function.grad(u, geom)
    J = function.J(geom)
    f = numpy.sin(geom[0]) * numpy.cosh(geom[1])
    energy = topo.integral(((g @ g) / 2 + (u * u) / 2 * reaction - f * u) * J, degree=2)
    return System(energy, trial='u')


def _build_ns(nelems):
    from nutils import function, mesh
    from nutils.expression_v2 import Namespace
    from nutils.solver import System
    topo, geom = mesh.unitsquare(nelems, 'square')
    ns = Namespace()
    ns.x = geom
    ns.define_for('x', gradient='∇', jacobians=('dV',))
    ns.u = topo.field('u', btype='std', degree=2, shape=[2])
    ns.p = topo.field('p', btype='std', degree=1)
    ns.v = function.replace_arguments(ns.u, 'u:v')
    ns.q = function.replace_arguments(ns.p, 'p:q')
    ns.δ = function.eye(2)
    ns.u0_i = 'sin(x_0) cos(x_1) δ_i0 - cos(x_0) sin(x_1) δ_i1'
    ns.dt = 0.01
    ns.nu = 0.001
    ns.eps = 0.001
    res = topo.integral(
        '(v_i (u_i - u0_i) / dt + v_i u_j ∇_j(u_i) + nu ∇_j(v_i) ∇_j(u_i)'
        ' - p ∇_i(v_i) + q ∇_i(u_i) + eps p q) dV' @ ns, degree=6)
    return System(res, trial='u,p', test='v,q')


def _assemble(system, args):
    arguments, x = system.deconstruct(args, {})
    return system.assemble_jacobian_residual(arguments, x)


def _raw_assemble_fn(system):
    '''The reference constant-folds the entire assembly of a *linear* system
    after the first call (evaluable.compile cache_const_intermediates,
    evaluable.py:6791-6822), so warm repeats of assemble_jacobian_residual
    measure a cache hit, not assembly.  Compile the same block jacobian +
    residual WITHOUT constant caching to time genuine re-assembly — the exact
    work our bench.py times by calling the jitted jacres function directly.'''
    from nutils import evaluable, matrix
    f = evaluable.compile(
        (system._System__block_jacobian, system._System__block_residual),
        cache_const_intermediates=False)

    def assemble(arguments):
        jac_blocks, res_blocks = f(arguments)
        return matrix.assemble_block_csr(jac_blocks), numpy.concatenate(res_blocks)
    return assemble


def section_laplace_assembly(nelems, repeats=2):
    system = _build_laplace(nelems)
    ndofs = int(system.trial_shapes[0][0])
    arguments, _ = system.deconstruct({'u': numpy.zeros(ndofs)}, {})
    assemble = _raw_assemble_fn(system)
    assemble(arguments)  # compile + warmup
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        assemble(arguments)
        times.append(time.perf_counter() - t0)
    t = min(times)
    return {'ndofs': ndofs, 't_assemble': t, 'gdofs': ndofs / t / 1e9}


def section_laplace_solve(nelems, rtol=1e-10):
    system = _build_laplace(nelems, reaction=True)
    ndofs = int(system.trial_shapes[0][0])
    args = {'u': numpy.zeros(ndofs)}
    arguments, _ = system.deconstruct(args, {})
    assemble = _raw_assemble_fn(system)
    assemble(arguments)  # compile + warmup
    t0 = time.perf_counter()
    jac, res = assemble(arguments)
    t_asm = time.perf_counter() - t0
    jac, res = _assemble(system, args)  # constrained submatrix path for the solve
    t0 = time.perf_counter()
    # solve_leniently: the reference's arnoldi + splu-direct precon floors at
    # ~1e-9 relative residual at 1M dofs (eps * cond growth), so a strict
    # rtol=1e-10 solve raises ToleranceNotReached there; lenient mode is the
    # reference's own escape hatch (matrix/_base.py:178) and returns the best
    # iterate, whose achieved rel_residual is recorded alongside.
    x = jac.solve_leniently(res, rtol=rtol)
    t_solve = time.perf_counter() - t0
    resnorm = float(numpy.linalg.norm(res - jac @ x) / numpy.linalg.norm(res))
    return {'ndofs': ndofs, 't_assemble': t_asm, 't_solve': t_solve,
            't_total': t_asm + t_solve, 'rel_residual': resnorm}


def section_ns_newton_step(nelems, rtol=1e-3):
    system = _build_ns(nelems)
    ndofs = sum(int(numpy.prod(s)) for s in system.trial_shapes)
    rng = numpy.random.default_rng(0)
    args = {t: 0.1 * rng.standard_normal(tuple(map(int, shape)))
            for t, shape in zip(system.trials, system.trial_shapes)}
    jac, res = _assemble(system, args)  # compile + warmup
    t0 = time.perf_counter()
    jac, res = _assemble(system, args)
    t_asm = time.perf_counter() - t0
    t0 = time.perf_counter()
    dx = jac.solve_leniently(res, rtol=rtol)
    t_solve = time.perf_counter() - t0
    resnorm = float(numpy.linalg.norm(res - jac @ dx) / numpy.linalg.norm(res))
    return {'ndofs': ndofs, 't_assemble': t_asm, 't_solve': t_solve,
            't_total': t_asm + t_solve, 'rel_residual': resnorm}


_SECTIONS = {
    'laplace_assembly': lambda nelems, ns_nelems: section_laplace_assembly(nelems),
    'laplace_solve': lambda nelems, ns_nelems: section_laplace_solve(nelems),
    'ns_newton_step': lambda nelems, ns_nelems: section_ns_newton_step(ns_nelems),
}


def _store(name, rec):
    try:
        with open(_BASELINE_FILE) as f:
            base = json.load(f)
    except Exception:
        base = {}
    ref = base.setdefault('reference', {})
    ref[name] = rec
    ref['recorded'] = time.strftime('%Y-%m-%d')
    ref['nprocs'] = int(os.environ.get('NUTILS_NPROCS', '1'))
    ref['matrix_backend'] = os.environ.get('NUTILS_MATRIX', 'auto (scipy on this host)')
    with open(_BASELINE_FILE, 'w') as f:
        json.dump(base, f, indent=1)


def main():
    nelems = int(os.environ.get('BENCH_NELEMS', '1024'))
    ns_nelems = int(os.environ.get('BENCH_NS_NELEMS', '330'))

    if '--section' in sys.argv:
        name = sys.argv[sys.argv.index('--section') + 1]
        print(json.dumps(_SECTIONS[name](nelems, ns_nelems)), flush=True)
        return

    budget = int(os.environ.get('BENCH_REF_SECTION_TIMEOUT', '7200'))
    env = dict(os.environ)
    env['PYTHONPATH'] = _REFPATH + os.pathsep + env.get('PYTHONPATH', '')
    for name in _SECTIONS:
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), '--section', name],
                env=env, capture_output=True, text=True, timeout=budget)
            rec = json.loads(out.stdout.strip().splitlines()[-1])
        except subprocess.TimeoutExpired:
            rec = {'error': f'timeout after {budget}s'}
        except Exception as e:
            rec = {'error': f'{type(e).__name__}: {e}'[:300]}
            if out.stderr:
                rec['stderr_tail'] = out.stderr[-500:]
        rec['wall'] = round(time.time() - t0, 1)
        _store(name, rec)
        print(f'reference {name}: {json.dumps(rec)}', flush=True)


if __name__ == '__main__':
    main()
