'''Finite-cell (trim) geometry matrix against analytic values (reference
model: tests/test_finitecell.py — cutdomain volumes + divergence,
set-operation complements, element-aligned special cases, trimmed
hierarchical refinement).'''

import numpy
import pytest

from nutils_tpu import function, mesh


def _measure(topo, geom, degree=2):
    return float(numpy.asarray(topo.sample('gauss', degree).integrate(function.J(geom), {})))


def _flux(btopo, geom, degree=2):
    '''∮ x·n dS over a boundary topology.'''
    smp = btopo.sample('gauss', degree)
    return float(numpy.asarray(smp.integrate(
        (geom * function.normal(geom)).sum(-1) * function.J(geom), {})))


# ---------------------------------------------------------------- cutdomain

def test_cutdomain_3d_volume_and_divergence():
    '''Unit cube minus the r=0.6 corner sphere octant (reference:
    tests/test_finitecell.py cutdomain: volume, test_div).'''
    n = 4
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, n + 1)] * 3)
    r = 0.6
    trimmed = topo.trim((geom ** 2).sum(-1) - r**2, maxrefine=2)
    exact = 1.0 - (4 / 3 * numpy.pi * r**3) / 8
    vol = _measure(trimmed, geom)
    assert vol == pytest.approx(exact, rel=2e-3)
    # divergence theorem over the full trimmed boundary
    assert _flux(trimmed.boundary, geom) == pytest.approx(3 * vol, rel=1e-10)


def test_cutdomain_2d_divergence():
    topo, geom = mesh.rectilinear([numpy.linspace(-1, 1, 7)] * 2)
    r = 0.8
    trimmed = topo.trim(r**2 - (geom ** 2).sum(-1), maxrefine=3)
    vol = _measure(trimmed, geom)
    assert _flux(trimmed.boundary, geom) == pytest.approx(2 * vol, rel=1e-9)


# ------------------------------------------------------------ set operations

@pytest.mark.parametrize('maxrefine', [0, 1, 2])
def test_complement_partition(maxrefine):
    '''trim(L) and trim(-L) partition the domain: areas sum exactly, and the
    shared trimmed boundaries have equal measure (reference:
    tests/test_finitecell.py setoperations).'''
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 5)] * 2)
    x, y = geom
    levelset = x + 0.3 * function.sin_(numpy.pi * 3 * y) - 0.5 \
        if hasattr(function, 'sin_') else x + 0.3 * function.sin(numpy.pi * 3 * y) - 0.5
    pos = topo.trim(levelset, maxrefine=maxrefine, name='cut')
    neg = topo.trim(-levelset, maxrefine=maxrefine, name='cut')
    assert _measure(pos, geom) + _measure(neg, geom) == pytest.approx(1.0, abs=1e-12)
    lp = _measure(pos.boundary['cut'], geom)
    ln = _measure(neg.boundary['cut'], geom)
    assert lp == pytest.approx(ln, abs=1e-12)


# ------------------------------------------------------------- special cases

def test_levelset_aligned_with_edges():
    '''Levelset plane coincides with element interfaces: the cut is exact at
    maxrefine=0 and no sliver elements appear (reference:
    tests/test_finitecell.py specialcases inter_elem).'''
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 5)] * 2)
    trimmed = topo.trim(geom[1] - 0.5, maxrefine=0)
    assert _measure(trimmed, geom) == pytest.approx(0.5, abs=1e-13)
    assert _measure(trimmed.boundary['trimmed'], geom) == pytest.approx(1.0, abs=1e-13)


def test_levelset_through_vertices():
    '''Diagonal levelset passing exactly through grid vertices.'''
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 3)] * 2)
    trimmed = topo.trim(geom[0] - geom[1], maxrefine=1)
    assert _measure(trimmed, geom) == pytest.approx(0.5, rel=1e-12)
    assert _measure(trimmed.boundary['trimmed'], geom) == pytest.approx(numpy.sqrt(2), rel=1e-12)


def test_almost_all_positive():
    '''Levelset positive on all but a corner sliver.'''
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 3)] * 2)
    trimmed = topo.trim(geom.sum(-1) - 0.25, maxrefine=3)
    assert _measure(trimmed, geom) == pytest.approx(1.0 - 0.25**2 / 2, rel=1e-3)


def test_full_and_empty():
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 3)] * 2)
    full = topo.trim(geom[0] + 10.0, maxrefine=1)
    assert _measure(full, geom) == pytest.approx(1.0, abs=1e-13)
    empty = topo.trim(geom[0] - 10.0, maxrefine=1)
    assert len(empty) == 0 or _measure(empty, geom) == pytest.approx(0.0, abs=1e-13)


# ---------------------------------------------------- hierarchical + trimmed

def test_trimmed_hierarchical():
    '''Trim after hierarchical refinement (reference: trim over a
    HierarchicalTopology base, tests/test_topology.py:1047): the trim
    accuracy matches the plain (unrefined) trim of the same levelset at the
    same maxrefine, since the cut recursion runs per active element.'''
    topo, geom = mesh.rectilinear([numpy.linspace(-1, 1, 3)] * 2)
    r = 0.7
    ls = r**2 - (geom ** 2).sum(-1)
    refined = topo.refined_by([0])
    trimmed = refined.trim(ls, maxrefine=3)
    area = _measure(trimmed, geom)
    assert area == pytest.approx(numpy.pi * r**2, rel=2e-2)
    # the cut runs per ACTIVE element: with the finer active elements of the
    # refined corner the area error must not exceed the plain trim's
    plain_area = _measure(topo.trim(ls, maxrefine=3), geom)
    assert abs(area - numpy.pi * r**2) <= abs(plain_area - numpy.pi * r**2) * 1.001


def test_adaptive_fcm():
    '''The adaptive finite-cell workflow (reference: SURVEY §7.2 stage 8):
    refine the band of elements crossed by the trim curve, trim, and solve a
    Poisson problem with an L2-projected Dirichlet condition on the trimmed
    rim — end to end through select/refined_by/trim/basis/boundary/solve.'''
    from nutils_tpu import solver
    topo, geom = mesh.rectilinear([numpy.linspace(-1, 1, 7)] * 2)
    r = 0.7
    ls = r**2 - (geom ** 2).sum(-1)
    band = topo.select(0.05 - function.abs_(ls), ischeme='bezier3')
    refined = topo.refined_by(band)
    trimmed = refined.trim(ls, maxrefine=2)
    area = _measure(trimmed, geom)
    assert area == pytest.approx(numpy.pi * r**2, rel=5e-3)
    per = _measure(trimmed.boundary['trimmed'], geom)
    assert per == pytest.approx(2 * numpy.pi * r, rel=5e-3)
    # partition of unity of the pruned TRUNCATED hierarchical basis on the
    # cut cells (the classical h- family is famously not a PoU)
    tbasis = trimmed.basis('th-std', degree=1)
    vals = numpy.asarray(trimmed.sample('gauss', 2).eval(function.sum_(tbasis, 0), {}))
    numpy.testing.assert_allclose(vals, 1.0, atol=1e-12)
    basis = trimmed.basis('h-std', degree=1)
    u = function.dotarg('u', basis)
    v = function.replace_arguments(u, 'u:v')
    J = function.J(geom)
    res = trimmed.integral((function.grad(v, geom) @ function.grad(u, geom) - v) * J, degree=2)
    sqr = trimmed.boundary['trimmed'].integral(u ** 2 * J, degree=2)
    cons = solver.optimize('u', sqr, droptol=1e-10)
    args = solver.System(res, trial='u', test='v').solve(constrain={'u': cons})
    uc = numpy.asarray(args['u'])
    free = numpy.isnan(cons)
    # -Δu = 1, u|∂Ω = 0 on the disc: u = (r² - |x|²)/4, max r²/4 = 0.1225;
    # the projected-Dirichlet FCM discretization converges to it from below
    # (measured control series: 0.072 at h=1/6, 0.098 at h=1/12 uniform)
    assert free.any()
    umax = float(numpy.nanmax(uc[free]))
    assert 0.0 < umax < r * r / 4 + 1e-6
