'''Hierarchical topology and basis tests (reference behaviors:
topology.py:2785 HierarchicalTopology, :2927 _tensorial_bases).'''

import numpy
import pytest

from nutils_tpu import mesh, function


def lshape(etype='square'):
    domain, geom = mesh.unitsquare(2, etype)
    x, y = (geom - .5)
    exact = (x**2 + y**2)**(1/3) * numpy.cos(numpy.arctan2(y+x, y-x) * (2/3))
    sel = domain.select(exact, ischeme='gauss1')
    return domain.subset(sel, newboundary='corner'), geom


def test_select_subset_area():
    dom, geom = lshape()
    assert len(dom) == 3
    area = float(numpy.asarray(dom.integral(function.J(geom), degree=2).eval()))
    assert abs(area - 0.75) < 1e-12
    blen = {name: float(numpy.asarray(part.integral(function.J(geom), degree=2).eval()))
            for name, part in dom.boundary.parts.items()}
    assert abs(blen['corner'] - 1.0) < 1e-12
    assert abs(sum(blen.values()) - 4.0) < 1e-12


@pytest.mark.parametrize('etype', ['square', 'triangle', 'mixed'])
def test_refined_area(etype):
    dom, geom = lshape(etype)
    dom = dom.refined_by([0]).refined_by([len(dom) + 1])
    area = float(numpy.asarray(dom.integral(function.J(geom), degree=2).eval()))
    assert abs(area - 0.75) < 1e-12
    blen = sum(float(numpy.asarray(part.integral(function.J(geom), degree=2).eval()))
               for part in dom.boundary.parts.values())
    assert abs(blen - 4.0) < 1e-12


@pytest.mark.parametrize('btype,pou', [('h-std', False), ('th-std', True),
                                       ('h-spline', False), ('th-spline', True)])
def test_basis_pou(btype, pou):
    dom, geom = lshape()
    dom = dom.refined_by([0]).refined_by([3])
    b = dom.basis(btype, degree=2)
    smp = dom.sample('gauss', 3)
    vals = numpy.asarray(smp.eval(b.sum(0)))
    assert vals.min() > 1 - 1e-12
    if pou:  # truncation restores the partition of unity
        assert vals.max() < 1 + 1e-12
    # classical and truncated span the same space: both contain polynomials
    # up to the basis degree, checked via exact projection of x*y
    from nutils_tpu.solver import System
    u = function.dotarg('u', b)
    x, y = geom
    sqr = dom.integral((u - x * y)**2 * function.J(geom), degree=6)
    args = System(sqr, trial='u').solve()
    err = float(numpy.asarray(dom.integral((u - x * y)**2 * function.J(geom), degree=6).eval(args)))
    assert err < 1e-20


def test_get_support_roundtrip():
    dom, _ = lshape()
    dom = dom.refined_by([1])
    b = dom.basis('h-std', degree=2)
    for dof in range(0, b.ndofs, 7):
        sup = b.get_support(dof)
        for e in sup:
            assert dof in b._dofs[e]


def test_transforms_refined_by():
    dom, _ = lshape()
    ref = dom.refined
    assert len(ref) == 4 * len(dom)
    marked = ref.transforms[[0, 1]]
    dom2 = dom.refined_by(marked)
    assert len(dom2) == len(dom) + 3  # one parent replaced by 4 children


def test_hierarchical_discont_basis():
    '''Per-active-element discontinuous basis on hierarchical topologies:
    L2 projection reproduces polynomials of the basis degree exactly
    (reference: generic 'discont' dispatch, topology.py:365).'''
    import numpy
    from nutils_tpu import mesh, function
    from nutils_tpu.solver import System
    topo, geom = mesh.rectilinear([4, 4])
    h = topo.refined_by([0, 1]).refined_by([0])
    for deg in (1, 2):
        b = h.basis('discont', degree=deg)
        assert b.ndofs == len(h) * (deg + 1) ** 2
        u = function.field('u', b)
        v = function.replace_arguments(u, 'u:v')
        f = geom[0] ** deg
        res = h.integral((u - f) * v * function.J(geom), degree=2 * deg + 2)
        sol = System(res, trial='u', test='v').solve()
        err = h.integral((function.replace_arguments(u, {'u': sol['u']}) - f) ** 2
                         * function.J(geom), degree=2 * deg + 2).eval()
        assert float(err) < 1e-20


def test_subset_plain_basis():
    '''A whole-element subset supports plain (non-hierarchical) bases via
    pruning (reference: SubsetTopology.basis -> PrunedBasis).'''
    dom, geom = lshape()
    b = dom.basis('std', degree=1)
    assert int(b.shape[0]) == 8  # 9 grid dofs minus the removed corner's far vertex
    smp = dom.sample('gauss', 2)
    pou = numpy.asarray(smp.eval(function.sum_(b, 0), {}))
    numpy.testing.assert_allclose(pou, 1.0, atol=1e-12)
    # projecting a linear field is exact
    x0 = numpy.asarray(smp.eval(geom[0], {}))
    B = numpy.asarray(smp.eval(b, {}))
    if B.shape[0] == 8:
        B = B.T
    coef, *_ = numpy.linalg.lstsq(B, x0, rcond=None)
    numpy.testing.assert_allclose(B @ coef, x0, atol=1e-12)
