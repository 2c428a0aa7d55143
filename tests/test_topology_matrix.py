'''Parametrized topology identity matrix (reference model:
tests/test_topology.py TopologyAssertions — assertBoundaries /
assertInterfaces — multiplied over structured / refined / hierarchical /
multipatch / unstructured topologies, dimensions, boundary types, degrees and
periodicity; reference: tests/test_topology.py:682-735, 712-733, 1008-1113).

Two exact identities anchor everything:

* divergence (assertBoundaries): for smooth f, ∫_Ω ∇f dV = ∮_∂Ω f n dS.
* per-element divergence (assertInterfaces): with a P0 element indicator χ_E,
  ∫_Ω χ_E ∇f = -∮_ifaces [[χ_E]] f n + ∮_∂Ω χ_E f n, summed over all E,
  which exercises interface orientation, two-sided evaluation and normals.
'''

import numpy
import pytest

from nutils_tpu import function, mesh


def _f(geom):
    '''Smooth scalar test function: sum_i (0.5 - x_i)^2 (the reference's
    choice, C^inf inside the domain, tests/test_topology.py:684).'''
    s = 0
    for i in range(int(geom.shape[0])):
        s = s + (0.5 - geom[i]) ** 2
    return s


def _integrate(smp, integrand):
    return numpy.asarray(smp.integrate(integrand, {}))


def check_divergence(topo, geom, degree=2):
    f = _f(geom)
    J = function.J(geom)
    lhs = _integrate(topo.sample('gauss', degree), function.grad(f, geom) * J)
    rhs = _integrate(topo.boundary.sample('gauss', degree),
                     f * function.normal(geom) * J)
    numpy.testing.assert_allclose(lhs, rhs, atol=1e-10)


def check_interfaces(topo, geom, periodic=False, degree=2):
    smp = topo.interfaces.sample('gauss', degree)
    x1, x2, n1, n2 = smp.eval([geom, function.opposite(geom),
                               function.normal(geom),
                               function.opposite(function.normal(geom))], {})
    if not periodic:
        numpy.testing.assert_allclose(numpy.asarray(x1), numpy.asarray(x2), atol=1e-12)
    numpy.testing.assert_allclose(numpy.asarray(n1), -numpy.asarray(n2), atol=1e-10)

    # per-element divergence: Σ_E | ∫_E ∇f + ∮_ifaces [[χ_E]] f n - ∮_∂E∩∂Ω f n | = 0
    f = _f(geom)
    J = function.J(geom)
    chi = topo.basis('discont', degree=0)
    d = int(geom.shape[0])
    lhs = _integrate(topo.sample('gauss', degree),
                     chi[:, None] * function.grad(f, geom)[None, :] * J)
    rhs = -_integrate(smp, function.jump(chi)[:, None]
                      * (f * function.normal(geom))[None, :] * J)
    if len(topo.boundary):
        rhs = rhs + _integrate(topo.boundary.sample('gauss', degree),
                               chi[:, None] * (f * function.normal(geom))[None, :] * J)
    numpy.testing.assert_allclose(lhs, rhs, atol=1e-10)


def check_partition_of_unity(topo, basis, npts=None):
    smp = topo.sample('gauss', 2)
    vals = numpy.asarray(smp.eval(function.sum_(basis, 0), {}))
    numpy.testing.assert_allclose(vals, 1.0, atol=1e-12)


def check_basis_continuity(topo, geom, basis, periodic=False):
    '''C0 continuity across interfaces: jump of every basis function is 0.'''
    smp = topo.interfaces.sample('gauss', 2)
    jumps = numpy.asarray(smp.eval(function.jump(basis), {}))
    numpy.testing.assert_allclose(jumps, 0.0, atol=1e-11)


# ------------------------------------------------------------- structured

@pytest.mark.parametrize('ndims', [1, 2, 3])
@pytest.mark.parametrize('refine', [0, 1])
def test_structured_divergence(ndims, refine):
    topo, geom = mesh.rectilinear([[-1, 0, 1]] * ndims)
    for _ in range(refine):
        topo = topo.refined
    check_divergence(topo, geom)


@pytest.mark.parametrize('ndims', [1, 2, 3])
@pytest.mark.parametrize('periodic', [(), (0,)])
def test_structured_interfaces(ndims, periodic):
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 4)] * ndims, periodic=periodic)
    check_interfaces(topo, geom, periodic=bool(periodic))


@pytest.mark.parametrize('btype,degree', [('std', 1), ('std', 2), ('std', 3),
                                          ('spline', 1), ('spline', 2), ('spline', 3)])
@pytest.mark.parametrize('periodic', [(), (0,)])
def test_structured_basis_properties(btype, degree, periodic):
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 5)] * 2, periodic=periodic)
    basis = topo.basis(btype, degree=degree)
    # dof count (reference formulas: spline n+p clamped / n periodic;
    # std: n*p+1 clamped / n*p periodic per dim)
    n = 4
    per_dim = []
    for ax in range(2):
        if btype == 'spline':
            per_dim.append(n if ax in periodic else n + degree)
        else:
            per_dim.append(n * degree if ax in periodic else n * degree + 1)
    assert basis.shape[0] == per_dim[0] * per_dim[1]
    check_partition_of_unity(topo, basis)
    check_basis_continuity(topo, geom, basis, periodic=bool(periodic))


@pytest.mark.parametrize('degree', [1, 2])
def test_structured_discont_basis(degree):
    topo, geom = mesh.rectilinear([[0, .5, 1]] * 2)
    basis = topo.basis('discont', degree=degree)
    assert basis.shape[0] == len(topo) * (degree + 1) ** 2
    check_partition_of_unity(topo, basis)


# ------------------------------------------------------------- unstructured

@pytest.mark.parametrize('etype', ['triangle', 'mixed', 'multipatch'])
def test_unitsquare_divergence(etype):
    topo, geom = mesh.unitsquare(4, etype)
    check_divergence(topo, geom)


@pytest.mark.parametrize('etype', ['triangle', 'mixed', 'multipatch'])
def test_unitsquare_interfaces(etype):
    topo, geom = mesh.unitsquare(4, etype)
    check_interfaces(topo, geom)


@pytest.mark.parametrize('etype,degree', [('triangle', 1), ('triangle', 2),
                                          ('mixed', 1), ('mixed', 2),
                                          ('multipatch', 1), ('multipatch', 2)])
def test_unitsquare_basis(etype, degree):
    topo, geom = mesh.unitsquare(4, etype)
    basis = topo.basis('std', degree=degree)
    check_partition_of_unity(topo, basis)
    check_basis_continuity(topo, geom, basis)


def test_unitcircle_area():
    topo, geom = mesh.unitcircle(8, 'rectilinear')
    area = float(_integrate(topo.sample('gauss', 4), function.J(geom)))
    assert area == pytest.approx(numpy.pi, rel=2e-3)


# ------------------------------------------------------------- hierarchical

@pytest.mark.parametrize('btype,degree', [('h-std', 1), ('h-std', 2),
                                          ('th-std', 1), ('th-std', 2),
                                          ('th-spline', 2)])
def test_hierarchical_basis(btype, degree):
    '''Refined-corner hierarchical topology: C0 continuity for both basis
    families, partition of unity for the TRUNCATED ones only (classical
    hierarchical bases are famously not a PoU — truncation restores it;
    reference: topology.py:3061 THB truncation).'''
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 3)] * 2)
    topo = topo.refined_by([0])
    basis = topo.basis(btype, degree=degree)
    if btype.startswith('th-'):
        check_partition_of_unity(topo, basis)
    check_basis_continuity(topo, geom, basis)


def test_hierarchical_interfaces_measure():
    '''Facet count and total measure of hierarchical interfaces, including
    the cross-level (fine face vs coarse neighbor) facets (reference:
    HierarchicalTopology interface gluing, topology.py:2785-2925).'''
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 3)] * 2)
    ref = topo.refined_by([0])
    ifc = ref.interfaces
    # 4 fine-fine (h=1/4) + 4 fine-coarse (h=1/4) + 2 coarse-coarse (h=1/2)
    assert len(ifc) == 10
    length = float(_integrate(ifc.sample('gauss', 2), function.J(geom)))
    assert length == pytest.approx(3.0, abs=1e-12)
    # two-sided geometry: opposite() of the coordinates is the identity
    smp = ifc.sample('gauss', 2)
    x0, x1 = (numpy.asarray(v) for v in smp.eval([geom, function.opposite(geom)], {}))
    numpy.testing.assert_allclose(x0, x1, atol=1e-13)


def test_hierarchical_unstructured_th_pou():
    '''Truncated hierarchical basis on a refined TRIANGLE mesh is a
    partition of unity; the classical one is not (sanity anchor).'''
    topo, geom = mesh.unitsquare(3, 'triangle')
    ref = topo.refined_by([0, 1, 5])
    check_partition_of_unity(ref, ref.basis('th-std', degree=1))
    smp = ref.sample('_centroid', None)
    vh = numpy.asarray(smp.eval(function.sum_(ref.basis('h-std', degree=1), 0), {}))
    assert vh.max() > 1.0 + 1e-6  # classical HB exceeds 1 near the refinement


@pytest.mark.parametrize('nrefine', [1, 2])
def test_hierarchical_divergence(nrefine):
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 3)] * 2)
    for _ in range(nrefine):
        topo = topo.refined_by([0])
    check_divergence(topo, geom)
    vol = float(_integrate(topo.sample('gauss', 1), function.J(geom)))
    assert vol == pytest.approx(1.0, abs=1e-12)


# ------------------------------------------------------------- multipatch

@pytest.mark.parametrize('degree', [1, 2, 3])
def test_multipatch_spline_continuity(degree):
    '''Patch-continuous splines on the 3-patch L-shape (reference:
    tests/test_topology.py:1115 multipatch_L).'''
    topo, geom = mesh.multipatch(
        patches=[[0, 1, 3, 4], [1, 2, 4, 5], [3, 4, 6, 7]],
        patchverts=[[0, 0], [1, 0], [2, 0], [0, 1], [1, 1], [2, 1], [0, 2], [1, 2]],
        nelems=2)
    basis = topo.basis('spline', degree=degree, patchcontinuous=True)
    check_partition_of_unity(topo, basis)
    check_basis_continuity(topo, geom, basis)


def test_multipatch_L_divergence():
    topo, geom = mesh.multipatch(
        patches=[[0, 1, 3, 4], [1, 2, 4, 5], [3, 4, 6, 7]],
        patchverts=[[0, 0], [1, 0], [2, 0], [0, 1], [1, 1], [2, 1], [0, 2], [1, 2]],
        nelems=2)
    check_divergence(topo, geom)
    vol = float(_integrate(topo.sample('gauss', 1), function.J(geom)))
    assert vol == pytest.approx(3.0, abs=1e-12)
