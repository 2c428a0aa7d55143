'''Unstructured/multipatch interfaces, locate and uniform refinement
(reference scope: tests/test_topology.py interfaces cases, topology.py:2422
ConnectedTopology.interfaces, :777 locate, :2749 RefinedTopology, :3077
MultipatchTopology).'''

import numpy
import pytest

from nutils_tpu import mesh, function
from nutils_tpu.expression import Namespace
from nutils_tpu.multipatch import multipatch
from nutils_tpu.solver import System


# ------------------------------------------------------------ unstructured


@pytest.mark.parametrize('etype', ['triangle', 'mixed'])
def test_unstructured_interfaces_jump(etype):
    topo, geom = mesh.unitsquare(4, etype=etype)
    smp = topo.interfaces.sample('gauss', 3)
    f = function.sin(geom[0]) * geom[1] ** 2
    jump = smp.integrate(function.jump(f) * function.J(geom))
    assert abs(jump) < 1e-14
    mean = smp.integrate(function.mean(f) * function.J(geom))
    assert numpy.isfinite(mean) and mean != 0


def test_unstructured_interfaces_length():
    # 4x4 triangle unitsquare: 24 axis-aligned interior edges of length 1/4
    # plus 16 diagonals of length sqrt(2)/4
    topo, geom = mesh.unitsquare(4, etype='triangle')
    assert len(topo.interfaces) == 40
    length = topo.interfaces.sample('gauss', 1).integrate(function.J(geom))
    assert abs(length - (24 / 4 + 16 * numpy.sqrt(2) / 4)) < 1e-12


def test_unstructured_interface_normal_consistency():
    # divergence theorem per element: sum of boundary + both-sided interface
    # fluxes of a smooth field must vanish
    topo, geom = mesh.unitsquare(3, etype='triangle')
    F = function.stack([geom[0] ** 2, geom[0] * geom[1]])
    divF = 3 * geom[0]
    vol = topo.sample('gauss', 3).integrate(divF * function.J(geom))
    n = function.normal(geom)
    bnd = topo.boundary.sample('gauss', 3).integrate(F @ n * function.J(geom))
    assert abs(vol - bnd) < 1e-12
    # interface normal points out of side 1: jump(F)·n integrates to zero
    ifc = topo.interfaces.sample('gauss', 3).integrate(function.jump(F) @ n * function.J(geom))
    assert abs(ifc) < 1e-12


def test_dg_poisson_interior_penalty():
    '''Interior-penalty DG Poisson on an unstructured triangle mesh converges
    to the manufactured solution (VERDICT round-1 item 6 acceptance).'''
    errs = []
    for nelems in (4, 8):
        topo, geom = mesh.unitsquare(nelems, etype='triangle')
        ns = Namespace()
        ns.x = geom
        ns.define_for('x', gradient='∇', normal='n', jacobians=('dV', 'dS'))
        ns.pi = numpy.pi
        ns.u = topo.field('u', btype='discont', degree=2)
        ns.v = topo.field('v', btype='discont', degree=2)
        ns.uexact = 'sin(pi x_0) sin(pi x_1)'
        ns.f = '2 pi^2 uexact'
        ns.eta = 50.0 * nelems
        # SIPG; note the nutils jump convention [w] = opposite(w) - w with the
        # interface normal outward from the *owning* side, so the consistency
        # terms enter with + (reference: function.py:1619 jump)
        res = topo.integral('(∇_i(v) ∇_i(u) - v f) dV' @ ns, degree=6)
        res += topo.interfaces.integral(
            '(eta [v] [u] + [v] n_i {∇_i(u)} + [u] n_i {∇_i(v)}) dS' @ ns, degree=6)
        res += topo.boundary.integral(
            '(eta v u - v n_i ∇_i(u) - u n_i ∇_i(v)) dS' @ ns, degree=6)
        args = System(res, trial='u', test='v').solve()
        err = topo.integral('(u - uexact)^2 dV' @ ns, degree=8).eval(args) ** 0.5
        errs.append(float(err))
    assert errs[1] < 2e-3
    assert errs[1] < errs[0] / 4  # ≥ quadratic convergence


@pytest.mark.parametrize('etype', ['triangle', 'mixed'])
def test_unstructured_locate_roundtrip(etype):
    topo, geom = mesh.unitsquare(4, etype=etype)
    pts = numpy.random.default_rng(3).uniform(0.05, 0.95, (15, 2))
    loc = topo.locate(geom, pts, tol=1e-12)
    xs = numpy.asarray(loc.eval(geom)).reshape(-1, 2)
    assert numpy.abs(xs - pts).max() < 1e-10
    # basis evaluation at located points spans mixed element types
    pou = numpy.asarray(loc.eval(topo.basis('std', degree=1).sum()))
    assert numpy.abs(pou - 1).max() < 1e-12


def test_unstructured_locate_weights_missing():
    topo, geom = mesh.unitsquare(3, etype='triangle')
    pts = numpy.array([[0.25, 0.25], [0.75, 0.5], [1.5, 0.5]])  # last outside
    with pytest.raises(ValueError):
        topo.locate(geom, pts, tol=1e-12)
    w = numpy.array([2.0, 3.0, 1.0])
    loc = topo.locate(geom, pts, tol=1e-12, skip_missing=True, weights=w)
    val = loc.integrate(geom[0])
    assert abs(val - (2.0 * 0.25 + 3.0 * 0.75)) < 1e-12


def test_unstructured_refined():
    topo, geom = mesh.unitsquare(2, etype='triangle')
    fine = topo.refined
    assert len(fine) == 4 * len(topo)
    area = fine.sample('gauss', 2).integrate(function.J(geom))
    assert abs(area - 1) < 1e-12
    # geometry (a function on the coarse topology) evaluates on fine samples
    # and the refined basis is a partition of unity
    pou = fine.sample('gauss', 2).integrate(
        fine.basis('std', degree=1).sum() * function.J(geom))
    assert abs(pou - 1) < 1e-12
    finer = fine.refined
    assert len(finer) == 16 * len(topo)


def test_tet_mesh_3d():
    # unit cube as 6 Kuhn tetrahedra; vertex v = 4*i + 2*j + k
    from nutils_tpu.element import TetReference
    from nutils_tpu.unstructured import UnstructuredTopology
    verts = numpy.stack(numpy.meshgrid(*[[0.0, 1.0]] * 3, indexing='ij'), -1).reshape(-1, 3)
    import itertools
    tets = []
    for perm in itertools.permutations(range(3)):
        path = [0]
        v = numpy.zeros(3, dtype=int)
        for ax in perm:
            v = v.copy()
            v[ax] = 1
            path.append(int(v @ [4, 2, 1]))
        tets.append(path)
    ref = TetReference()
    topo = UnstructuredTopology('X', [ref] * 6, [numpy.array(t) for t in tets], 8)
    geom = function.matmul(topo.basis('std', degree=1), function.asarray(verts))
    vol = topo.sample('gauss', 2).integrate(function.J(geom))
    assert abs(vol - 1) < 1e-12
    area = topo.boundary.sample('gauss', 2).integrate(function.J(geom))
    assert abs(area - 6) < 1e-12
    # interior faces: jump of a smooth function vanishes
    smp = topo.interfaces.sample('gauss', 2)
    f = geom[0] * geom[1] + geom[2] ** 2
    assert abs(smp.integrate(function.jump(f) * function.J(geom))) < 1e-13
    # divergence theorem in 3D through two-sided interface normals
    F = function.stack([geom[0] * geom[2], geom[1], geom[0] ** 2])
    n = function.normal(geom)
    vol_div = topo.sample('gauss', 3).integrate((geom[2] + 1) * function.J(geom))
    bnd_flux = topo.boundary.sample('gauss', 3).integrate(F @ n * function.J(geom))
    assert abs(vol_div - bnd_flux) < 1e-12
    # locate round-trip
    pts = numpy.random.default_rng(5).uniform(0.1, 0.9, (10, 3))
    loc = topo.locate(geom, pts, tol=1e-12)
    xs = numpy.asarray(loc.eval(geom)).reshape(-1, 3)
    assert numpy.abs(xs - pts).max() < 1e-10


# ------------------------------------------------------------ multipatch


@pytest.fixture
def lshape():
    return multipatch(
        patches=[[0, 1, 3, 4], [1, 2, 4, 5], [3, 4, 6, 7]],
        patchverts=[[0, 0], [1, 0], [2, 0], [0, 1], [1, 1], [2, 1], [0, 2], [1, 2]],
        nelems=3)


def test_multipatch_interfaces(lshape):
    topo, geom = lshape
    smp = topo.interfaces.sample('gauss', 3)
    f = function.sin(geom[0] + 0.3) * geom[1] ** 2
    assert abs(smp.integrate(function.jump(f) * function.J(geom))) < 1e-14
    # 3 patches x 4 interior unit lines + 2 glued unit faces
    length = smp.integrate(function.J(geom))
    assert abs(length - 14) < 1e-12
    ipatch = topo.interfaces['interpatch'].sample('gauss', 3)
    assert abs(ipatch.integrate(function.J(geom)) - 2) < 1e-12
    assert abs(ipatch.integrate(function.jump(f) * function.J(geom))) < 1e-14


def test_multipatch_basis_continuity(lshape):
    '''C0 patch-continuous spline basis has zero jump across glued faces
    (VERDICT round-1 item 7 acceptance).'''
    topo, geom = lshape
    basis = topo.basis('spline', degree=2, patchcontinuous=True)
    smp = topo.interfaces.sample('gauss', 4)
    jb = smp.integrate(function.jump(basis) * function.J(geom))
    assert numpy.abs(numpy.asarray(jb)).max() < 1e-14


def test_multipatch_locate_batch(lshape):
    '''Batched locate across patches preserves input point order (regression:
    patch-grouped chained sample must be order-restored).'''
    topo, geom = lshape
    pts = numpy.array([[0.5, 0.5], [1.5, 0.3], [0.2, 1.7], [0.99, 0.99], [1.0, 0.5]])
    loc = topo.locate(geom, pts, tol=1e-12)
    xs = numpy.asarray(loc.eval(geom)).reshape(-1, 2)
    assert numpy.abs(xs - pts).max() < 1e-10
    w = numpy.array([1.0, 2.0, 0.5, 1.5, 3.0])
    lw = topo.locate(geom, pts, tol=1e-12, weights=w)
    assert abs(lw.integrate(geom[0]) - (w * pts[:, 0]).sum()) < 1e-12


def test_hierarchical_locate():
    '''Locate on hierarchically refined structured topologies: root
    coordinates from the base affine probe, per-level membership by integer
    arithmetic, input point order preserved across levels (VERDICT round-1
    unstructured/hierarchical locate parity).'''
    from nutils_tpu import mesh, function
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 5), numpy.linspace(0, 1, 5)])
    h2 = topo.refined_by([0, 1, 4]).refined_by([0, 1])
    pts = numpy.array([[0.03, 0.02], [0.9, 0.9], [0.51, 0.49], [0.12, 0.07], [0.26, 0.01]])
    smp = h2.locate(geom, pts, tol=1e-12)
    xs = numpy.asarray(smp.eval(geom)).reshape(-1, 2)
    assert numpy.abs(xs - pts).max() < 1e-12
    # hierarchical basis interpolation round-trips at the located points
    basis = h2.basis('th-spline', degree=2)
    w = function.field('w', basis)
    rng = numpy.random.RandomState(0)
    sol = rng.standard_normal(int(w.arguments['w'][0][0]))
    vloc = numpy.asarray(smp.eval(w, {'w': sol})).ravel()
    vref = numpy.asarray(h2.locate(geom, pts + 1e-13, tol=1e-10).eval(w, {'w': sol})).ravel()
    assert numpy.abs(vloc - vref).max() < 1e-8
    # skip_missing drops exterior points, weights follow the kept rows
    smp2 = h2.locate(geom, numpy.array([[2.0, 2.0], [0.5, 0.5]]), skip_missing=True)
    assert smp2.npoints == 1


def test_locate_hierarchical_unstructured():
    '''Locate on a hierarchical refinement of an unstructured (triangle)
    topology: base Newton locate + refinement-tree walk (reference:
    transformseq.py:15 index_with_tail through topology.py:777 locate).'''
    topo, geom = mesh.unitsquare(3, 'triangle')
    ref = topo.refined_by([0, 1, 5])
    rng = numpy.random.default_rng(11)
    pts = rng.uniform(0.05, 0.95, (12, 2))
    smp = ref.locate(geom, pts, tol=1e-12)
    x = numpy.asarray(smp.eval(geom, {})).reshape(12, 2)
    numpy.testing.assert_allclose(x, pts, atol=1e-10)
    # a basis of the refined topology evaluates on the located sample
    # (truncated family: partition of unity holds pointwise)
    basis = ref.basis('th-std', degree=1)
    vals = numpy.asarray(smp.eval(function.sum_(basis, 0), {}))
    numpy.testing.assert_allclose(vals, 1.0, atol=1e-11)


def test_locate_refined_gmsh_mesh():
    '''Locate on a refined gmsh import (reference: VERDICT r2 item 9).'''
    import os
    topo, geom = mesh.gmsh(os.path.join(os.path.dirname(__file__), 'test_mesh', 'square_p1.msh'))
    ref = topo.refined_by([0])
    pts = numpy.array([[0.2, 0.3], [0.7, 0.6], [0.5, 0.05], [0.9, 0.9]])
    smp = ref.locate(geom, pts, tol=1e-12)
    x = numpy.asarray(smp.eval(geom, {})).reshape(len(pts), 2)
    numpy.testing.assert_allclose(x, pts, atol=1e-10)
