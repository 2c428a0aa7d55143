'''Builder-rewrite equivalence suite (VERDICT round-1 item 4).

Every builder function in ``evaluable.py`` (``sum_``, ``multiply``,
``gather_along``, ``take``, ``transpose``, ``insertaxis``, ``ravel``,
``inflate``, ``add``, ``power``) may rewrite the expression it builds —
localizing contractions against Inflate scatters, distributing gathers,
folding sums.  Each rewrite must be *semantically invisible*: the built node
must evaluate identically to the naive (rewrite-free) raw node.

This suite checks exactly that, over a library of structured operands
(Inflate-, InsertAxis-, Transpose-, Concatenate-, Sum-of-product-wrapped
arguments) and randomized compositions: the oracle class of test that
catches bugs like the round-1 reverted ``gather_along`` InsertAxis-pushdown
(which silently changed finitestrain results 3-7% and was invisible to every
unit test).  Reference scope model: tests/test_evaluable.py (per-node
simplify/eval consistency).
'''

import itertools

import numpy
import pytest

from nutils_tpu import evaluable as ev


# ------------------------------------------------------------ infrastructure

def bindings_for(*nodes, seed=0):
    '''Random float bindings for every Argument and (unbound) Leaf.'''
    rng = numpy.random.RandomState(seed)
    args, leaves = {}, {}
    for node in nodes:
        for a in node.arguments:
            assert a.dtype == float, 'int arguments not supported by the random oracle'
            args.setdefault(a.name, rng.uniform(-1, 1, a.shape))
        for l in node.leafdeps:
            if l.value is None:
                assert l.dtype == float
                leaves.setdefault(l.key, rng.uniform(-1, 1, l.shape))
    return args, leaves


def assert_equiv(built, naive, seed=0):
    '''The built (possibly rewritten) node must match the naive node.'''
    assert built.shape == naive.shape, (built.shape, naive.shape)
    assert built.dtype == naive.dtype
    args, leaves = bindings_for(built, naive, seed=seed)
    a = ev.eval_once(built, args, leaves)
    b = ev.eval_once(naive, args, leaves)
    numpy.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-14)


# A library of structured operands, all of shape SHAPE, each built so the
# rewrite rules have structure to act on.  Every factory takes an rng and a
# name-prefix so two independent operands can coexist in one expression.
SHAPE = (4, 3, 5)


def op_constant(rng, prefix):
    return ev.constant(rng.uniform(-1, 1, SHAPE))


def op_argument(rng, prefix):
    return ev.Argument(prefix + 'arg', SHAPE)


def op_insertaxis(rng, prefix):
    # axis 1 broadcast from a (4, 5) argument
    return ev.insertaxis(ev.Argument(prefix + 'ia', (4, 5)), 1, 3)


def op_insertaxis_raw(rng, prefix):
    # raw InsertAxis node (no builder), so pushdown rules meet it directly
    return ev.InsertAxis(ev.Argument(prefix + 'iar', (4, 5)), 1, 3)


def op_transpose(rng, prefix):
    return ev.transpose(ev.Argument(prefix + 'tr', (3, 5, 4)), (2, 0, 1))


def op_inflate_last(rng, prefix):
    # scatter a local axis of length 2 into the last axis (length 5), with a
    # duplicate dof per row to exercise accumulation
    L = 2
    dofs = rng.randint(0, SHAPE[2], (SHAPE[0], 1, L))
    vals = ev.Argument(prefix + 'inf', (SHAPE[0], SHAPE[1], L))
    return ev.inflate(vals, ev.constant(dofs), SHAPE[2], 2)


def op_inflate_middle(rng, prefix):
    L = 2
    dofs = rng.randint(0, SHAPE[1], (SHAPE[0], L, 1))
    vals = ev.Argument(prefix + 'infm', (SHAPE[0], L, SHAPE[2]))
    return ev.inflate(vals, ev.constant(dofs), SHAPE[1], 1)


def op_concatenate(rng, prefix):
    a = ev.Argument(prefix + 'cc0', (4, 3, 2))
    b = ev.Argument(prefix + 'cc1', (4, 3, 3))
    return ev.Concatenate((a, b), 2)


def op_sum_of_product(rng, prefix):
    # a contraction whose operand hides an Inflate: Sum(Multiply) over a
    # fourth axis, leaving shape SHAPE
    L = 2
    dofs = rng.randint(0, 6, (SHAPE[0], 1, 1, L))
    vals = ev.Argument(prefix + 'sp', (SHAPE[0], SHAPE[1], SHAPE[2], L))
    infl = ev.inflate(vals, ev.constant(dofs), 6, 3)
    weight = ev.insertaxis(ev.insertaxis(ev.insertaxis(
        ev.Argument(prefix + 'spw', (6,)), 0, SHAPE[0]), 1, SHAPE[1]), 2, SHAPE[2])
    return ev.sum_(ev.multiply(infl, weight), 3)


OPERANDS = [op_constant, op_argument, op_insertaxis, op_insertaxis_raw,
            op_transpose, op_inflate_last, op_inflate_middle, op_concatenate,
            op_sum_of_product]


def _make(factory, seed, prefix):
    return factory(numpy.random.RandomState(seed), prefix)


# ------------------------------------------------------------ builder == raw

@pytest.mark.parametrize('factory', OPERANDS, ids=lambda f: f.__name__[3:])
@pytest.mark.parametrize('axes', [(0,), (1,), (2,), (0, 1), (0, 2), (1, 2), (0, 1, 2)])
def test_sum_equiv(factory, axes):
    o = _make(factory, 1, 'a')
    assert_equiv(ev.sum_(o, axes), ev.Sum(o, axes))


@pytest.mark.parametrize('fa,fb', list(itertools.combinations_with_replacement(OPERANDS, 2)),
                         ids=lambda f: getattr(f, '__name__', str(f))[3:])
def test_multiply_equiv(fa, fb):
    a = _make(fa, 2, 'a')
    b = _make(fb, 3, 'b')
    assert_equiv(ev.multiply(a, b), ev.Multiply(a, b))


@pytest.mark.parametrize('fa,fb', list(itertools.combinations_with_replacement(OPERANDS, 2)),
                         ids=lambda f: getattr(f, '__name__', str(f))[3:])
def test_contraction_equiv(fa, fb):
    '''The bread-and-butter pattern: sum over a product — the basis-dot-
    argument contraction the localization rules exist for.'''
    a = _make(fa, 4, 'a')
    b = _make(fb, 5, 'b')
    for axes in [(2,), (0, 2), (0, 1, 2)]:
        assert_equiv(ev.sum_(ev.multiply(a, b), axes),
                     ev.Sum(ev.Multiply(a, b), axes))


@pytest.mark.parametrize('factory', OPERANDS, ids=lambda f: f.__name__[3:])
@pytest.mark.parametrize('axis', [0, 1, 2])
def test_gather_along_equiv(factory, axis):
    o = _make(factory, 6, 'a')
    rng = numpy.random.RandomState(7)
    L = 3
    dshape = tuple(1 if i != axis else L for i in range(len(SHAPE)))
    dofs = ev.constant(rng.randint(0, SHAPE[axis], dshape))
    assert_equiv(ev.gather_along(o, dofs, axis, L), ev.GatherAlong(o, dofs, axis))


@pytest.mark.parametrize('factory', OPERANDS, ids=lambda f: f.__name__[3:])
@pytest.mark.parametrize('axis', [0, 1, 2])
def test_gather_along_batched_dofs_equiv(factory, axis):
    '''Per-batch (element-varying) gather indices, the localization shape.'''
    o = _make(factory, 8, 'a')
    rng = numpy.random.RandomState(9)
    L = 2
    dshape = tuple(SHAPE[0] if i == 0 else 1 for i in range(len(SHAPE)))
    dshape = dshape[:axis] + (L,) + dshape[axis + 1:]
    if axis == 0:
        dshape = (L,) + (1,) * (len(SHAPE) - 1)
    dofs = ev.constant(rng.randint(0, SHAPE[axis], dshape))
    assert_equiv(ev.gather_along(o, dofs, axis, L), ev.GatherAlong(o, dofs, axis))


@pytest.mark.parametrize('factory', OPERANDS, ids=lambda f: f.__name__[3:])
@pytest.mark.parametrize('axis,vary', [(a, v) for a in range(3) for v in range(3) if a != v])
def test_gather_along_dofs_vary_along_other_axis_equiv(factory, axis, vary):
    '''Gather indices that vary along an axis OTHER than the gathered one —
    the shape on which a naive broadcast-pushdown rule (the round-1 reverted
    ``gather_along`` InsertAxis pushdown) silently drops the variation.'''
    o = _make(factory, 17, 'a')
    rng = numpy.random.RandomState(18)
    L = 2
    dshape = tuple(SHAPE[i] if i == vary else 1 for i in range(len(SHAPE)))
    dshape = dshape[:axis] + (L,) + dshape[axis + 1:]
    dofs = ev.constant(rng.randint(0, SHAPE[axis], dshape))
    assert_equiv(ev.gather_along(o, dofs, axis, L), ev.GatherAlong(o, dofs, axis))


@pytest.mark.parametrize('factory', OPERANDS, ids=lambda f: f.__name__[3:])
@pytest.mark.parametrize('axis', [0, 1, 2])
def test_take_equiv(factory, axis):
    o = _make(factory, 10, 'a')
    rng = numpy.random.RandomState(11)
    idx = ev.constant(rng.randint(0, SHAPE[axis], (2,)))
    assert_equiv(ev.take(o, idx, axis), ev.Take(o, idx, axis))


@pytest.mark.parametrize('factory', OPERANDS, ids=lambda f: f.__name__[3:])
@pytest.mark.parametrize('perm', list(itertools.permutations(range(3))))
def test_transpose_equiv(factory, perm):
    o = _make(factory, 12, 'a')
    built = ev.transpose(o, perm)
    naive = ev.Transpose(o, perm)
    assert_equiv(built, naive)


@pytest.mark.parametrize('factory', OPERANDS, ids=lambda f: f.__name__[3:])
@pytest.mark.parametrize('axis', [0, 1, 2, 3])
def test_insertaxis_equiv(factory, axis):
    o = _make(factory, 13, 'a')
    assert_equiv(ev.insertaxis(o, axis, 6), ev.InsertAxis(o, axis, 6))


@pytest.mark.parametrize('factory', OPERANDS, ids=lambda f: f.__name__[3:])
@pytest.mark.parametrize('axis', [0, 1])
def test_ravel_equiv(factory, axis):
    o = _make(factory, 14, 'a')
    assert_equiv(ev.ravel(o, axis), ev.Ravel(o, axis))


@pytest.mark.parametrize('factory', OPERANDS, ids=lambda f: f.__name__[3:])
def test_add_equiv(factory):
    a = _make(factory, 15, 'a')
    b = _make(factory, 16, 'b')
    assert_equiv(ev.add(a, b), ev.Add(a, b))


# ------------------------------------------------------ randomized programs

def _random_program(seed, steps=6):
    '''Build a random expression with the builders while tracking an exact
    numpy shadow value; any semantics-changing rewrite breaks the pair.'''
    rng = numpy.random.RandomState(seed)
    args = {}

    def fresh(shape):
        name = f'x{len(args)}'
        args[name] = rng.uniform(-1, 1, shape)
        return ev.Argument(name, shape)

    # start from a structured operand
    factory = OPERANDS[rng.randint(len(OPERANDS))]
    node = factory(rng, 'p')
    for a in node.arguments:
        args[a.name] = rng.uniform(-1, 1, a.shape)
    val = numpy.asarray(ev.eval_once(node, args))

    for _ in range(steps):
        op = rng.randint(6)
        if op == 0 and node.ndim < 4:
            axis = rng.randint(node.ndim + 1)
            n = rng.randint(1, 4)
            node = ev.insertaxis(node, axis, n)
            val = numpy.broadcast_to(numpy.expand_dims(val, axis),
                                     val.shape[:axis] + (n,) + val.shape[axis:]).copy()
        elif op == 1 and node.ndim >= 1:
            perm = tuple(rng.permutation(node.ndim))
            node = ev.transpose(node, perm)
            val = numpy.transpose(val, perm)
        elif op == 2 and node.ndim >= 1:
            axis = rng.randint(node.ndim)
            L = rng.randint(1, 4)
            dshape = tuple(1 if i != axis else L for i in range(node.ndim))
            dofs = rng.randint(0, node.shape[axis], dshape)
            node = ev.gather_along(node, ev.constant(dofs), axis, L)
            val = numpy.take_along_axis(val, numpy.broadcast_to(dofs, val.shape[:axis] + (L,) + val.shape[axis + 1:]), axis=axis)
        elif op == 3 and node.ndim >= 1:
            naxes = rng.randint(1, node.ndim + 1)
            axes = tuple(sorted(rng.permutation(node.ndim)[:naxes].tolist()))
            node = ev.sum_(node, axes)
            val = val.sum(axis=axes)
        elif op == 4:
            other = fresh(node.shape)
            node = ev.multiply(node, ev.Argument(f'x{len(args) - 1}', node.shape))
            val = val * args[f'x{len(args) - 1}']
        elif op == 5 and node.ndim >= 1 and node.ndim < 4:
            # scatter the last axis into a longer one
            axis = node.ndim - 1
            L = node.shape[axis]
            N = L + rng.randint(1, 4)
            dshape = (1,) * axis + (L,)
            dofs = rng.randint(0, N, dshape)
            node = ev.inflate(node, ev.constant(dofs), N, axis)
            new = numpy.zeros(val.shape[:axis] + (N,), dtype=val.dtype)
            for l in range(L):
                new[..., dofs[..., l].item()] += val[..., l]
            val = new
        if node.ndim == 0:
            break
    return node, args, val


@pytest.mark.parametrize('seed', range(40))
def test_random_program_matches_numpy_shadow(seed):
    node, args, val = _random_program(seed)
    out = numpy.asarray(ev.eval_once(node, args))
    numpy.testing.assert_allclose(out, val, rtol=1e-11, atol=1e-13)
