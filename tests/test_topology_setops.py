'''Topology set algebra (reference: topology.py:1498-1538 __or__/__and__/
__sub__ and tests/test_finitecell.py setoperations): unions, intersections
and complements of whole-element subsets, and the trim complement
``domain - trimmed``.'''

import numpy
import pytest

from nutils_tpu import function, mesh


def _area(topo, geom, degree=4):
    return float(numpy.asarray(topo.sample('gauss', degree).integrate(function.J(geom), {})))


@pytest.fixture(scope='module')
def square():
    return mesh.rectilinear([numpy.linspace(0, 1, 5)] * 2)


def test_subset_complement_partition(square):
    topo, geom = square
    left = topo.subset(numpy.arange(8))  # two leftmost element columns
    right = topo - left
    assert len(left) == 8 and len(right) == 8
    assert _area(left, geom) + _area(right, geom) == pytest.approx(1.0, abs=1e-12)
    assert _area(right, geom) == pytest.approx(0.5, abs=1e-12)


def test_or_reassembles_base(square):
    topo, geom = square
    left = topo.subset(numpy.arange(8))
    right = topo - left
    assert (left | right) is topo
    assert (left + right) is topo
    # overlapping union
    mid = topo.subset(numpy.arange(4, 12))
    both = left | mid
    assert len(both) == 12
    assert _area(both, geom) == pytest.approx(0.75, abs=1e-12)


def test_and_intersection(square):
    topo, geom = square
    left = topo.subset(numpy.arange(8))
    mid = topo.subset(numpy.arange(4, 12))
    inter = left & mid
    assert len(inter) == 4
    assert _area(inter, geom) == pytest.approx(0.25, abs=1e-12)
    # intersection with the base topology is the subset itself
    assert (topo & left) is left
    assert (left & topo) is left
    # disjoint intersection is empty
    right = topo - left
    assert len(left & right) == 0


def test_sub_between_subsets(square):
    topo, geom = square
    left = topo.subset(numpy.arange(8))
    mid = topo.subset(numpy.arange(4, 12))
    only_left = left - mid
    assert len(only_left) == 4
    assert _area(only_left, geom) == pytest.approx(0.25, abs=1e-12)


def test_trim_complement(square):
    '''domain - trimmed re-trims the negated levelset: measures partition
    exactly and the complement carries the same named rim.'''
    topo, geom = square
    x, y = geom
    ls = x + 0.3 * function.sin(numpy.pi * 3 * y) - 0.5
    pos = topo.trim(ls, maxrefine=2, name='cut')
    neg = topo - pos
    assert _area(pos, geom) + _area(neg, geom) == pytest.approx(1.0, abs=1e-12)
    lp = _area(pos.boundary['cut'], geom)
    ln = _area(neg.boundary['cut'], geom)
    assert lp == pytest.approx(ln, abs=1e-12)
    assert lp > 1.0  # the wavy chord is longer than the unit width


def test_sequential_trim_complement(square):
    topo, geom = square
    x, y = geom
    pos = topo.trim(x - 0.25, maxrefine=1, name='a').trim(0.75 - y, maxrefine=1, name='b')
    neg = topo - pos
    assert _area(pos, geom) + _area(neg, geom) == pytest.approx(1.0, abs=1e-12)
    # kept region is [0.25,1]x[0,0.75] (cuts aligned with element boundaries,
    # so the min-composed lattice represents the corner exactly)
    assert _area(pos, geom) == pytest.approx(0.5625, abs=1e-12)


def test_unstructured_take_complement():
    topo, geom = mesh.unitsquare(3, 'triangle')
    plain = topo
    while hasattr(plain, 'parent'):
        plain = plain.parent
    sub = plain.take(numpy.arange(6))
    comp = plain - sub
    assert len(sub) + len(comp) == len(plain)
    assert _area(sub, geom) + _area(comp, geom) == pytest.approx(1.0, abs=1e-12)
    rejoined = sub | comp
    assert rejoined is plain


def test_union_of_boundary_groups(square):
    '''Disjoint same-dimensional topologies without a common recorded parent
    fall back to a generic union that still samples and integrates.'''
    topo, geom = square
    both = topo.boundary['left'] | topo.boundary['right']
    assert _area(both, geom) == pytest.approx(2.0, abs=1e-12)


def test_mismatched_operands_raise(square):
    topo, geom = square
    line, _ = mesh.line(numpy.linspace(0, 1, 3), space='Z')
    with pytest.raises(TypeError):
        topo | line
    with pytest.raises(TypeError):
        topo - 3


def test_indicator(square):
    '''Topology.indicator of subset groups: 1 inside, 0 outside, integrates
    to the subset measure (reference: topology.py:760).'''
    topo, geom = square
    left = topo.subset(numpy.arange(8))
    chi = topo.indicator(left)
    area = float(numpy.asarray(topo.sample('gauss', 2).integrate(chi * function.J(geom), {})))
    assert area == pytest.approx(0.5, abs=1e-12)
    named = topo.withsubdomain(lhs=left)
    chi2 = named.indicator('lhs')
    area2 = float(numpy.asarray(named.sample('gauss', 2).integrate(chi2 * function.J(geom), {})))
    assert area2 == pytest.approx(0.5, abs=1e-12)


def test_select_returns_topology(square):
    '''select yields a real (samplable) subset topology, subset() and
    refined_by() accept topologies (reference: topology.py:765,531).'''
    topo, geom = square
    sel = topo.select(0.4 - geom[0])  # leftmost two element columns (x<0.4 at some point)
    assert len(sel) == 8
    assert _area(sel, geom) == pytest.approx(0.5, abs=1e-12)
    named = topo.subset(sel, newboundary='inner')
    assert _area(named, geom) == pytest.approx(0.5, abs=1e-12)
    refined = topo.refined_by(sel)
    assert len(refined) == (16 - 8) + 8 * 4
    assert _area(refined, geom) == pytest.approx(1.0, abs=1e-12)
    # refining a hierarchical topology by a select of itself
    again = refined.refined_by(refined.select(0.15 - geom[0]))
    assert _area(again, geom) == pytest.approx(1.0, abs=1e-12)
    assert len(again) > len(refined)
