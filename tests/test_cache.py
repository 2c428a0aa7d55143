'''Disk memoization and checkpoint/resume (reference: cache.py; resume
behavior mirrors tests/test_solver.py:42-62 _test_recursion_cache).'''

import os
import tempfile

import pytest

from nutils_tpu import cache


class Fibonacci(cache.Recursion, length=2):

    calls = []

    def __init__(self, x0, x1):
        self.x0 = x0
        self.x1 = x1

    def resume(self, history):
        if len(history) == 0:
            yield self.x0
            history.append(self.x0)
        if len(history) == 1:
            yield self.x1
            history.append(self.x1)
        while True:
            value = history[-2] + history[-1]
            Fibonacci.calls.append(value)
            yield value
            history = history[-1], value


def take(it, n):
    out = []
    for _, v in zip(range(n), it):
        out.append(v)
    return out


def test_recursion_uncached():
    assert take(Fibonacci(1, 1), 6) == [1, 1, 2, 3, 5, 8]


def test_recursion_cache_replay_and_resume():
    with tempfile.TemporaryDirectory() as d, cache.enable(d):
        Fibonacci.calls = []
        assert take(Fibonacci(1, 1), 5) == [1, 1, 2, 3, 5]
        assert Fibonacci.calls == [2, 3, 5]
        # full replay: no recomputation
        Fibonacci.calls = []
        assert take(Fibonacci(1, 1), 5) == [1, 1, 2, 3, 5]
        assert Fibonacci.calls == []
        # extend: resumes from cached history, computes only the tail
        assert take(Fibonacci(1, 1), 7) == [1, 1, 2, 3, 5, 8, 13]
        assert Fibonacci.calls == [8, 13]
        # truncate the cache: replays head, recomputes tail
        subdir = os.path.join(d, sorted(os.listdir(d))[0])
        for f in sorted(os.listdir(subdir))[3:]:
            os.unlink(os.path.join(subdir, f))
        Fibonacci.calls = []
        assert take(Fibonacci(1, 1), 6) == [1, 1, 2, 3, 5, 8]
        assert Fibonacci.calls == [3, 5, 8]
        # different seed: different cache entry
        assert take(Fibonacci(2, 1), 4) == [2, 1, 3, 4]


def test_function_memoization():
    calls = []

    @cache.function
    def f(x):
        calls.append(x)
        return x * 2

    with tempfile.TemporaryDirectory() as d, cache.enable(d):
        assert f(3) == 6
        assert f(3) == 6
        assert calls == [3]
        assert f(4) == 8
        assert calls == [3, 4]


def test_solve_disk_cache(tmp_path):
    '''System.solve results are disk-memoized when caching is enabled
    (reference: @cache.function on System.solve, solver.py:440).'''
    import numpy
    from nutils_tpu import cache, function, mesh
    from nutils_tpu.solver import System

    def build():
        topo, geom = mesh.rectilinear([4, 4])
        u = topo.field('u', btype='std', degree=1)
        g = function.grad(u, geom)
        J = function.J(geom)
        return System(topo.integral((function.sum_(g * g, 0) / 2 + u * u / 2 - u) * J, degree=2), trial='u')

    with cache.enable(str(tmp_path)):
        a1 = build().solve()
        files = {f for f in tmp_path.iterdir() if f.name.startswith('solve-')}
        assert files, 'solve result not stored'
        a2 = build().solve()  # fresh System, same content hash -> cache hit
    numpy.testing.assert_array_equal(a1['u'], a2['u'])
