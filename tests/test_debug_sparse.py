'''The NUTILS_TPU_DEBUG=sparse sanitizer: every rewriting builder verifies
its output against the naive node at the call site (reference analogue:
NUTILS_DEBUG=sparse ``verify_sparse_chunks``, evaluable.py:440).'''

import numpy
import pytest

from nutils_tpu import evaluable as ev
from nutils_tpu.utils import config


def test_sanitizer_passes_on_valid_rewrites():
    with config.debug({'sparse'}):
        rng = numpy.random.RandomState(0)
        E, P, L, N = 4, 2, 3, 9
        B = ev.constant(rng.rand(E, P, L))
        D = ev.constant(rng.randint(0, N, (E, 1, L)))
        basis = ev.inflate(B, D, N, 2)
        arg = ev.Argument('u', (N,))
        argb = ev.insertaxis(ev.insertaxis(arg, 0, E), 1, P)
        u = ev.sum_(ev.multiply(basis, argb), 2)  # localization fires, verified
        w = ev.insertaxis(ev.constant(rng.rand(E, P)), 2, N)
        res = ev.sum_(ev.multiply(basis, w), (0, 1))  # fold-into-inflate, verified
        out = ev.eval_once(res)
        assert out.shape == (N,)


def test_sanitizer_catches_broken_rewrite():
    a = ev.Argument('a', (3,))
    b = ev.Argument('b', (3,))
    good = ev.Add(a, b)
    broken = ev.Multiply(a, b)  # stand-in for a semantics-changing rewrite
    with pytest.raises(AssertionError, match='sparse-debug'):
        ev._assert_rewrite_equivalent(broken, good, 'add')


def test_sanitizer_catches_shape_change():
    a = ev.Argument('a', (3, 2))
    with pytest.raises(AssertionError, match='shape'):
        ev._assert_rewrite_equivalent(ev.Sum(a, (0,)), ev.Sum(a, (1,)), 'sum_')


def test_sanitizer_off_by_default():
    assert not config.debug_enabled('sparse')


def test_system_build_clean_under_sanitizer():
    '''Building a full FEM residual/jacobian with the sanitizer on: every
    localization rewrite in the real assembly pipeline is verified.'''
    from nutils_tpu import function, mesh
    from nutils_tpu.solver import System
    with config.debug({'sparse'}):
        topo, geom = mesh.unitsquare(3, 'square')
        u = topo.field('u', btype='std', degree=2)
        g = function.grad(u, geom)
        J = function.J(geom)
        energy = topo.integral(((g @ g) / 2 - u) * J, degree=4)
        system = System(energy, trial='u')
        ndofs = system.trial_shapes[0][0]
        jac, res = system.assemble_jacobian_residual({'u': numpy.zeros(ndofs)})
        assert numpy.isfinite(res).all()


def test_debug_evalf_flag():
    '''NUTILS_TPU_DEBUG=evalf asserts every intermediate's shape/dtype
    (reference: evaluable.py:6963 generated assertions).'''
    import numpy
    from nutils_tpu import evaluable as ev
    from nutils_tpu.utils import config
    old = config.debug.value
    config.debug.value = frozenset({'evalf'})
    try:
        a = ev.Argument('a', (3, 4))
        out = ev.eval_once(ev.sum_(ev.multiply(a, a), (0, 1)), {'a': numpy.ones((3, 4))})
        assert float(out) == 12.0
        # a node lying about its shape must be caught
        class Bad(ev.Array):
            def __init__(self, func):
                super().__init__((func,), (), (5, 5), float)  # wrong shape
            def evalf(self, f):
                return f
        import pytest
        with pytest.raises(AssertionError, match='evalf-debug'):
            ev.eval_once(Bad(ev.constant(numpy.ones((3, 4)))))
    finally:
        config.debug.value = old


def test_debug_compile_flag(caplog):
    '''NUTILS_TPU_DEBUG=compile logs the traced program (reference:
    evaluable.py:6835 generated-source dump).'''
    import logging
    import numpy
    from nutils_tpu import evaluable as ev
    from nutils_tpu.utils import config
    old = config.debug.value
    config.debug.value = frozenset({'compile'})
    try:
        a = ev.Argument('acmp', (3,))
        comp = ev.Compiled(ev.sum_(ev.multiply(a, a), 0))
        with caplog.at_level(logging.INFO):
            out = comp({'acmp': numpy.ones(3)})
        assert float(out) == 3.0
        assert any('compiled program' in r.message for r in caplog.records)
    finally:
        config.debug.value = old
