'''Trimming (finite cell method) against analytic values, 2-D and 3-D
(reference scope model: tests/test_finitecell.py).'''

import numpy
import pytest

from nutils_tpu import function, mesh


def _integrate(topo, geom, degree=2):
    smp = topo.sample('gauss', degree)
    return float(numpy.asarray(smp.integrate(function.J(geom), {})))


# ------------------------------------------------------------------- 2-D

def test_circle_area_and_perimeter():
    topo, geom = mesh.rectilinear([numpy.linspace(-1, 1, 9)] * 2)
    r = 0.7
    levelset = r**2 - (geom ** 2).sum(-1)
    trimmed = topo.trim(levelset, maxrefine=3)
    area = _integrate(trimmed, geom)
    assert area == pytest.approx(numpy.pi * r**2, rel=2e-3)
    perim = _integrate(trimmed.boundary['trimmed'], geom)
    assert perim == pytest.approx(2 * numpy.pi * r, rel=2e-3)


def test_keep_outside_disc():
    # disc centered in the unit square; its r=0.4 boundary stays interior
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 5)] * 2)
    r = 0.4
    levelset = ((geom - 0.5) ** 2).sum(-1) - r**2
    trimmed = topo.trim(levelset, maxrefine=4)
    area = _integrate(trimmed, geom)
    assert area == pytest.approx(1.0 - numpy.pi * r**2, rel=2e-3)
    perim = _integrate(trimmed.boundary['trimmed'], geom)
    assert perim == pytest.approx(2 * numpy.pi * r, rel=2e-3)


def test_outer_boundary_restriction():
    # trim away x+y<0.5 corner; 'left' boundary keeps only its y>0.5-x part
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 5)] * 2)
    levelset = geom.sum(-1) - 0.5
    trimmed = topo.trim(levelset, maxrefine=2)
    area = _integrate(trimmed, geom)
    assert area == pytest.approx(1.0 - 0.5**2 / 2, rel=1e-10)
    left = _integrate(trimmed.boundary['left'], geom)
    assert left == pytest.approx(0.5, rel=1e-10)
    cut = _integrate(trimmed.boundary['trimmed'], geom)
    assert cut == pytest.approx(0.5 * numpy.sqrt(2), rel=1e-10)


def test_interface_normal_direction():
    # trimmed-boundary normal must point out of the kept (positive) region
    topo, geom = mesh.rectilinear([numpy.linspace(-1, 1, 5)] * 2)
    r = 0.6
    trimmed = topo.trim(r**2 - (geom**2).sum(-1), maxrefine=3)
    smp = trimmed.boundary['trimmed'].sample('gauss', 1)
    x, n = (numpy.asarray(a) for a in smp.eval([geom, function.normal(geom)], {}))
    # outward of the disc: n ≈ x/|x|
    xdir = x / numpy.linalg.norm(x, axis=-1, keepdims=True)
    assert numpy.abs(numpy.einsum('pi,pi->p', xdir, n) - 1).max() < 0.2


def test_divergence_theorem_2d():
    topo, geom = mesh.rectilinear([numpy.linspace(-1, 1, 7)] * 2)
    r = 0.75
    trimmed = topo.trim(r**2 - (geom**2).sum(-1), maxrefine=3)
    # ∫_Ω div(x) dV = ∫_∂Ω x·n dS ; div(x) = 2 in 2-D
    vol2 = 2 * _integrate(trimmed, geom)
    f = geom
    smp = trimmed.boundary.sample('gauss', 2)
    flux = float(numpy.asarray(smp.integrate(
        (f * function.normal(geom)).sum(-1) * function.J(geom), {})))
    assert flux == pytest.approx(vol2, rel=1e-3)


def test_trimmed_poisson_2d():
    # Poisson on a trimmed quarter-disc with exact solution u = x^2 + y^2
    # (laplace(u) = 4): exact Dirichlet on the straight edges, natural flux
    # du/dn = 2 r on the trimmed arc; weak form
    # ∫∇b·∇u dV + ∫ 4 b dV - ∮ 2r b dS = 0
    from nutils_tpu import solver
    from nutils_tpu.expression import Namespace
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 5)] * 2)
    r = 0.8
    trimmed = topo.trim(r**2 - (geom**2).sum(-1), maxrefine=3)
    ns = Namespace()
    ns.x = geom
    ns.define_for('x', gradient='∇', normal='n', jacobians=('dV', 'dS'))
    ns.basis = trimmed.basis('std', degree=2)
    ns.u = function.dotarg('u', ns.basis)
    res = trimmed.integral('∇_i(basis_k) ∇_i(u) dV' @ ns, degree=4)
    res += trimmed.integral('4 basis_k dV' @ ns, degree=4)
    res -= trimmed.boundary['trimmed'].integral(
        '2 basis_k sqrt(x_j x_j) dS' @ ns, degree=4)  # du/dn = 2r on arc
    sqr = trimmed.boundary['left'].integral('(u - x_1^2)^2 dS' @ ns, degree=6)
    sqr += trimmed.boundary['bottom'].integral('(u - x_0^2)^2 dS' @ ns, degree=6)
    cons = solver.optimize('u', sqr, droptol=1e-12)
    args = solver.System([res], trial='u').solve(constrain={'u': cons})
    err = trimmed.integral('(u - x_i x_i)^2 dV' @ ns, degree=8)
    e = float(numpy.asarray(function.eval(err, args)))
    assert numpy.sqrt(e) < 2e-3


# ------------------------------------------------------------------- 3-D

def test_sphere_volume_and_area():
    topo, geom = mesh.rectilinear([numpy.linspace(-1, 1, 5)] * 3)
    r = 0.7
    levelset = r**2 - (geom ** 2).sum(-1)
    # mosaic facets are flat, so volume/area converge as O(h^2): measured
    # rel errs 9.7%/2.4%/0.6% at maxrefine 1/2/3
    trimmed = topo.trim(levelset, maxrefine=3)
    vol = _integrate(trimmed, geom)
    assert vol == pytest.approx(4 / 3 * numpy.pi * r**3, rel=1e-2)
    area = _integrate(trimmed.boundary['trimmed'], geom)
    assert area == pytest.approx(4 * numpy.pi * r**2, rel=1e-2)


def test_keep_outside_ball_3d():
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 4)] * 3)
    r = 0.35
    levelset = ((geom - 0.5) ** 2).sum(-1) - r**2
    trimmed = topo.trim(levelset, maxrefine=3)
    vol = _integrate(trimmed, geom)
    assert vol == pytest.approx(1.0 - 4 / 3 * numpy.pi * r**3, rel=2e-2)
    area = _integrate(trimmed.boundary['trimmed'], geom)
    assert area == pytest.approx(4 * numpy.pi * r**2, rel=2e-2)


def test_plane_cut_3d():
    # exact plane cut at x=9/16 (on the ndivisions snap grid, so no snapping
    # error): volumes and all boundary groups must be near-exact
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 3)] * 3)
    c = 9 / 16
    levelset = c - geom[0]
    trimmed = topo.trim(levelset, maxrefine=1)
    vol = _integrate(trimmed, geom)
    assert vol == pytest.approx(c, rel=1e-9)
    cut = _integrate(trimmed.boundary['trimmed'], geom)
    assert cut == pytest.approx(1.0, rel=1e-9)
    top = _integrate(trimmed.boundary['top'], geom)
    assert top == pytest.approx(c, rel=1e-9)
    left = _integrate(trimmed.boundary['left'], geom)
    assert left == pytest.approx(1.0, rel=1e-9)


def test_divergence_theorem_3d():
    topo, geom = mesh.rectilinear([numpy.linspace(-1, 1, 4)] * 3)
    r = 0.8
    trimmed = topo.trim(r**2 - (geom**2).sum(-1), maxrefine=2)
    vol3 = 3 * _integrate(trimmed, geom)
    smp = trimmed.boundary.sample('gauss', 2)
    flux = float(numpy.asarray(smp.integrate(
        (geom * function.normal(geom)).sum(-1) * function.J(geom), {})))
    assert flux == pytest.approx(vol3, rel=5e-3)


# ------------------------------------------------------------- basis/unstructured

def test_trimmed_basis_prunes_dofs():
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 5)] * 2)
    trimmed = topo.trim(geom[0] - 0.45, maxrefine=2)
    basis = trimmed.basis('std', degree=1)
    full = topo.basis('std', degree=1)
    assert basis.shape[0] < full.shape[0]
    # partition of unity on the kept region
    smp = trimmed.sample('gauss', 2)
    vals = numpy.asarray(smp.eval(basis.sum(-1), {}))
    assert numpy.abs(vals - 1).max() < 1e-12


def test_trim_unstructured():
    topo, geom = mesh.unitsquare(6, etype='triangle')
    r = 0.6
    trimmed = topo.trim(r**2 - ((geom - 0.5)**2).sum(-1) * 4, maxrefine=3)
    # levelset = r^2 - 4|x-c|^2 -> disc of radius r/2 centered at (.5,.5)
    area = _integrate(trimmed, geom)
    assert area == pytest.approx(numpy.pi * (r / 2)**2, rel=2e-3)
    perim = _integrate(trimmed.boundary['trimmed'], geom)
    assert perim == pytest.approx(numpy.pi * r, rel=2e-3)


# ------------------------------------------------------------- sequential trim

@pytest.mark.parametrize('maxrefine,rtol', [(1, 0.05), (2, 0.02)])
def test_sequential_trim_rim_groups(maxrefine, rtol):
    # disc of radius .8 cut by the half-plane x < .3: the rim splits into a
    # circular arc (group 'circle') and a chord (group 'plane'); the group
    # measures must match the analytic arc/chord lengths even at coarse
    # maxrefine (exact-levelset facet classification; the former lattice
    # argmin misassigned ~20% of the chord at maxrefine=1)
    topo, geom = mesh.rectilinear([numpy.linspace(-1, 1, 9)] * 2)
    r, c = 0.8, 0.3
    disc = topo.trim(r**2 - (geom**2).sum(-1), maxrefine=maxrefine, name='circle')
    kept = disc.trim(c - geom[0], maxrefine=maxrefine, name='plane')
    arc = _integrate(kept.boundary['circle'], geom)
    chord = _integrate(kept.boundary['plane'], geom)
    theta = numpy.arccos(c / r)
    assert arc == pytest.approx(r * (2 * numpy.pi - 2 * theta), rel=rtol)
    assert chord == pytest.approx(2 * numpy.sqrt(r**2 - c**2), rel=rtol)


def test_sequential_trim_conflicting_arguments():
    topo, geom = mesh.rectilinear([numpy.linspace(-1, 1, 5)] * 2)
    basis = topo.basis('std', degree=1)
    lvl = function.field('lvl', basis)
    a1 = numpy.full(basis.shape[0], 0.5)
    first = topo.trim(lvl - geom[0], maxrefine=1, name='one', arguments={'lvl': a1})
    with pytest.raises(ValueError, match='conflicting'):
        first.trim(lvl + 1, maxrefine=1, name='two', arguments={'lvl': a1 + 1})
