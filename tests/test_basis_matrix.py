'''Basis property matrix (reference model: tests/test_topology.py:984
`basis` TestCase multiplied over btype × degree × periodic × boundary, and
tests/test_function.py basis classes).  For every basis family the suite
verifies, where applicable:

* dof count against the closed-form formula,
* partition of unity (Σ_i b_i = 1 pointwise),
* continuity order: a degree-p continuity-c spline has c continuous
  derivatives across interfaces (jump of ∂^k b = 0 for k ≤ c),
* polynomial reproduction: the span contains every monomial of total
  degree ≤ p (lstsq residual at machine precision),
* locality: each dof is supported on at most (p+1)^d structured elements.

Reference anchors: topology.py:2209 (basis_spline), topology.py:2326
(_localsplinebasis Cox-de Boor), function.py:3029 (StructuredBasis).
'''

import itertools

import numpy
import pytest

from nutils_tpu import function, mesh


def _eval(smp, expr):
    return numpy.asarray(smp.eval(expr, {}))


def check_pou(topo, basis, atol=1e-12):
    smp = topo.sample('gauss', 2)
    numpy.testing.assert_allclose(_eval(smp, function.sum_(basis, 0)), 1.0, atol=atol)


def check_continuity(topo, geom, basis, order):
    '''jump of the k-th derivative vanishes on interfaces for k <= order.'''
    smp = topo.interfaces.sample('gauss', 2)
    f = basis
    for k in range(order + 1):
        jumps = _eval(smp, function.jump(f))
        numpy.testing.assert_allclose(jumps, 0.0, atol=1e-9,
                                      err_msg=f'derivative {k} jumps across interfaces')
        f = function.grad(f, geom)


def check_poly_reproduction(topo, geom, basis, degree, total=False):
    '''every monomial of (per-axis, or total if total=True) degree <= p lies
    in the span: lstsq of basis values against monomial values has residual
    at machine precision.'''
    smp = topo.sample('gauss', degree + 1)
    B = _eval(smp, basis)            # [ndofs, npts] or [npts, ndofs]?
    if B.shape[0] == basis.shape[0]:
        B = B.T                      # -> [npts, ndofs]
    x = _eval(smp, geom)             # [npts, d]
    d = x.shape[1]
    exps = [e for e in itertools.product(range(degree + 1), repeat=d)
            if (sum(e) if total else max(e)) <= degree]
    for e in exps:
        t = numpy.prod([x[:, i] ** e[i] for i in range(d)], axis=0)
        coef, *_ = numpy.linalg.lstsq(B, t, rcond=None)
        resid = numpy.linalg.norm(B @ coef - t)
        assert resid < 1e-8 * max(1.0, numpy.linalg.norm(t)), \
            f'monomial {e} not reproduced: residual {resid:.2e}'


def check_support(topo, basis, max_elems):
    '''per-dof element support count: integrate |b_i| element-wise and count
    nonzero entries.'''
    sup = numpy.asarray(topo.integrate_elementwise(basis * basis, degree=4))
    # sup: [nelems, ndofs]
    counts = (sup > 1e-14).sum(axis=0)
    assert counts.max() <= max_elems, f'max support {counts.max()} > {max_elems}'
    assert counts.min() >= 1, 'dof with empty support'


# ------------------------------------------------------------- structured spline

@pytest.mark.parametrize('ndims', [1, 2])
@pytest.mark.parametrize('degree', [1, 2, 3])
@pytest.mark.parametrize('periodic', [False, True])
def test_spline_full(ndims, degree, periodic):
    n = 4
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, n + 1)] * ndims,
                                  periodic=(0,) if periodic else ())
    basis = topo.basis('spline', degree=degree)
    per_dim = [n if periodic and ax == 0 else n + degree for ax in range(ndims)]
    assert basis.shape[0] == numpy.prod(per_dim)
    check_pou(topo, basis)
    check_continuity(topo, geom, basis, degree - 1)
    if not periodic:
        check_poly_reproduction(topo, geom, basis, degree)
    check_support(topo, basis, (degree + 1) ** ndims)


@pytest.mark.parametrize('degree,continuity', [(2, 0), (2, 1), (3, 0), (3, 1), (3, 2)])
def test_spline_continuity_option(degree, continuity):
    '''explicit inter-element continuity c < p-1 (reference:
    topology.py:2245 knot multiplicity normalization).'''
    n = 3
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, n + 1)])
    basis = topo.basis('spline', degree=degree, continuity=continuity)
    # each interior knot has multiplicity p - c: ndofs = n*(p-c) + c + 1
    assert basis.shape[0] == n * (degree - continuity) + continuity + 1
    check_pou(topo, basis)
    check_continuity(topo, geom, basis, continuity)
    check_poly_reproduction(topo, geom, basis, degree)


@pytest.mark.parametrize('degree', [2, 3])
def test_spline_knotmultiplicities(degree):
    '''a full-multiplicity interior knot splits the basis into independent
    halves (C^{-1} there): function values may jump at that interface only.'''
    n = 4
    km = [1] + [1] * (n - 1) + [1]
    km[2] = degree + 1  # full multiplicity at the middle knot
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, n + 1)])
    basis = topo.basis('spline', degree=degree, knotmultiplicities=[km])
    # the extra (degree+1-1)=degree knots at the split each add one dof
    assert basis.shape[0] == n + 2 * degree
    check_pou(topo, basis)
    smp = topo.interfaces.sample('gauss', 2)
    jumps = _eval(smp, function.jump(basis))       # [ndofs, niface*pts] order free
    total_jump = numpy.abs(jumps).sum()
    assert total_jump > 1e-10  # the C^{-1} knot does produce a jump in some dof
    check_poly_reproduction(topo, geom, basis, degree)


def test_spline_knotvalues_nonuniform():
    '''non-uniform knot vector via explicit knotvalues matches geometry given
    by the same breakpoints.'''
    kv = [0.0, 0.1, 0.4, 0.45, 1.0]
    topo, geom = mesh.rectilinear([kv])
    basis = topo.basis('spline', degree=2, knotvalues=[kv])
    assert basis.shape[0] == len(kv) - 1 + 2
    check_pou(topo, basis)
    check_poly_reproduction(topo, geom, basis, 2)


@pytest.mark.parametrize('degree', [1, 2])
def test_spline_removedofs(degree):
    n = 3
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, n + 1)])
    full = topo.basis('spline', degree=degree)
    pruned = topo.basis('spline', degree=degree, removedofs=[[0, -1]])
    assert pruned.shape[0] == full.shape[0] - 2


# ------------------------------------------------------------- structured std

@pytest.mark.parametrize('ndims', [1, 2, 3])
@pytest.mark.parametrize('degree', [1, 2])
def test_std_full(ndims, degree):
    n = 3 if ndims < 3 else 2
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, n + 1)] * ndims)
    basis = topo.basis('std', degree=degree)
    assert basis.shape[0] == (n * degree + 1) ** ndims
    check_pou(topo, basis)
    check_continuity(topo, geom, basis, 0)
    check_poly_reproduction(topo, geom, basis, degree)
    check_support(topo, basis, 2 ** ndims)


@pytest.mark.parametrize('degree', [0, 1, 2])
def test_discont_full(degree):
    n = 3
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, n + 1)] * 2)
    basis = topo.basis('discont', degree=degree)
    assert basis.shape[0] == len(topo) * (degree + 1) ** 2
    check_pou(topo, basis)
    check_poly_reproduction(topo, geom, basis, degree)
    if degree > 0:
        # discontinuous: some dof jumps across interfaces
        smp = topo.interfaces.sample('gauss', 2)
        assert numpy.abs(_eval(smp, function.jump(basis))).max() > 0.1


def test_legendre_orthogonality():
    '''legendre basis is L2-orthogonal on each element (reference:
    function.py:2947 LegendreBasis).'''
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 3)])
    basis = topo.basis('legendre', degree=3)
    assert basis.shape[0] == 2 * 4
    M = numpy.asarray(topo.sample('gauss', 7).integrate(
        basis[:, None] * basis[None, :] * function.J(geom), {}))
    off = M - numpy.diag(numpy.diag(M))
    numpy.testing.assert_allclose(off, 0.0, atol=1e-12)
    assert numpy.diag(M).min() > 0
    check_poly_reproduction(topo, geom, basis, 3)


# ------------------------------------------------------------- boundary bases

@pytest.mark.parametrize('btype,degree', [('std', 1), ('std', 2), ('spline', 2)])
def test_boundary_basis(btype, degree):
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 4)] * 2)
    btopo = topo.boundary
    basis = btopo.basis(btype, degree=degree)
    smp = btopo.sample('gauss', 2)
    numpy.testing.assert_allclose(_eval(smp, function.sum_(basis, 0)), 1.0, atol=1e-12)


@pytest.mark.parametrize('degree', [1, 2])
def test_boundary_group_basis(degree):
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 4)] * 2)
    btopo = topo.boundary['left']
    basis = btopo.basis('std', degree=degree)
    smp = btopo.sample('gauss', 2)
    numpy.testing.assert_allclose(_eval(smp, function.sum_(basis, 0)), 1.0, atol=1e-12)


# ------------------------------------------------------------- unstructured

@pytest.mark.parametrize('etype', ['triangle', 'mixed'])
@pytest.mark.parametrize('degree', [1, 2])
def test_unstructured_std(etype, degree):
    topo, geom = mesh.unitsquare(3, etype)
    basis = topo.basis('std', degree=degree)
    check_pou(topo, basis)
    check_continuity(topo, geom, basis, 0)
    # triangles span total degree <= p only, which also bounds the mixed mesh
    check_poly_reproduction(topo, geom, basis, degree, total=True)


@pytest.mark.parametrize('degree', [0, 1])
def test_unstructured_discont(degree):
    topo, geom = mesh.unitsquare(3, 'triangle')
    basis = topo.basis('discont', degree=degree)
    check_pou(topo, basis)
    check_poly_reproduction(topo, geom, basis, degree, total=True)


def test_triangle_bubble():
    '''bubble basis: std1 plus one cubic bubble per triangle (reference:
    topology.py:2499 basis_bubble).'''
    topo, geom = mesh.unitsquare(2, 'triangle')
    try:
        basis = topo.basis('bubble')
    except (ValueError, NotImplementedError):
        pytest.skip('bubble basis not implemented for this topology')
    check_pou(topo, basis)


# ------------------------------------------------------------- hierarchical

@pytest.mark.parametrize('btype,degree', [('th-std', 1), ('th-std', 2),
                                          ('th-spline', 2), ('th-spline', 3)])
def test_hierarchical_poly_reproduction(btype, degree):
    '''truncated hierarchical bases still reproduce polynomials of the
    underlying degree (reference: topology.py:3061 THB truncation preserves
    the span on active regions).'''
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 3)] * 2)
    htopo = topo.refined_by([0])
    basis = htopo.basis(btype, degree=degree)
    check_pou(htopo, basis)
    check_poly_reproduction(htopo, geom, basis, degree)


@pytest.mark.parametrize('nref', [1, 2])
def test_hierarchical_nested_refinement_ndofs_monotone(nref):
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 3)] * 2)
    prev = topo.basis('std', degree=1).shape[0]
    htopo = topo
    for _ in range(nref):
        htopo = htopo.refined_by([0])
        cur = htopo.basis('h-std', degree=1).shape[0]
        assert cur > prev
        prev = cur


# ------------------------------------------------------------- multipatch

@pytest.mark.parametrize('degree', [1, 2])
@pytest.mark.parametrize('patchcontinuous', [True, False])
def test_multipatch_spline_options(degree, patchcontinuous):
    topo, geom = mesh.multipatch(
        patches=[[0, 1, 2, 3], [1, 4, 3, 5]],
        patchverts=[[0, 0], [1, 0], [0, 1], [1, 1], [2, 0], [2, 1]],
        nelems=2)
    basis = topo.basis('spline', degree=degree, patchcontinuous=patchcontinuous)
    check_pou(topo, basis)
    if patchcontinuous:
        check_basis = numpy.abs(_eval(topo.interfaces.sample('gauss', 2),
                                      function.jump(basis)))
        numpy.testing.assert_allclose(check_basis, 0.0, atol=1e-11)


def test_multipatch_basis_patch():
    '''basis_patch: one dof per patch, the patch indicator (reference:
    topology.py:3221).'''
    topo, geom = mesh.multipatch(
        patches=[[0, 1, 2, 3], [1, 4, 3, 5]],
        patchverts=[[0, 0], [1, 0], [0, 1], [1, 1], [2, 0], [2, 1]],
        nelems=2)
    try:
        basis = topo.basis('patch')
    except (ValueError, NotImplementedError):
        pytest.skip('patch basis not implemented')
    assert basis.shape[0] == 2
    check_pou(topo, basis)


# --------------------------------------------------------------- lagrange

@pytest.mark.parametrize('etype', ['triangle', 'square', 'mixed'])
@pytest.mark.parametrize('degree', [1, 2, 3])
def test_lagrange_basis(etype, degree):
    '''C0 nodal Lagrange on unstructured meshes (reference: topology.py:1801):
    partition of unity, continuity, total-degree polynomial reproduction, and
    the nodal (interpolatory) property at the element lattice.'''
    topo, geom = mesh.unitsquare(2, etype)
    plain = topo
    while hasattr(plain, 'parent'):
        plain = plain.parent
    basis = plain.basis('lagrange', degree=degree)
    check_pou(plain, basis)
    check_continuity(plain, geom, basis, 0)
    check_poly_reproduction(plain, geom, basis, degree, total=True)
    # nodal property: at every lattice node exactly one basis function is 1
    smp = plain.sample('bezier', degree + 1)
    B = _eval(smp, basis)
    if B.shape[0] == basis.shape[0]:
        B = B.T
    ones = numpy.isclose(B, 1.0, atol=1e-9).sum(axis=1)
    numpy.testing.assert_array_equal(ones, 1)
    # every row is a unit vector at the nodes (all other functions vanish)
    numpy.testing.assert_allclose(numpy.abs(B).max(axis=1), 1.0, atol=1e-9)
    numpy.testing.assert_allclose(numpy.sort(numpy.abs(B), axis=1)[:, :-1].max(),
                                  0.0, atol=1e-9)


@pytest.mark.parametrize('degree', [1, 2, 3])
def test_lagrange_matches_bernstein_span(degree):
    '''lagrange and bernstein (std) span the same space: the L2 projection of
    a smooth function onto either basis yields the same field.'''
    topo, geom = mesh.unitsquare(2, 'triangle')
    plain = topo
    while hasattr(plain, 'parent'):
        plain = plain.parent
    target = (geom ** 2).sum(-1) if degree >= 2 else geom.sum(-1)
    smp = plain.sample('gauss', 2 * degree)
    fields = []
    for btype in ('lagrange', 'std'):
        b = plain.basis(btype, degree=degree)
        B = _eval(smp, b)
        if B.shape[0] == b.shape[0]:
            B = B.T
        t = _eval(smp, target)
        coef, *_ = numpy.linalg.lstsq(B, t, rcond=None)
        fields.append(B @ coef)
    numpy.testing.assert_allclose(fields[0], fields[1], atol=1e-10)
