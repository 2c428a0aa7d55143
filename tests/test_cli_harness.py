'''CLI driver, testing harness, warnings, and unit-shim coverage (reference
models: tests/test_cli.py, tests/test_testing.py, tests/test_warnings.py,
tests/test_unit.py).'''

import os
import unittest
import warnings as _pywarnings

import numpy
import pytest

from nutils_tpu import cli, testing, unit, warnings


# ------------------------------------------------------------------- cli.run

def test_run_parses_typed_arguments():
    seen = {}

    def main(nelems: int = 4, degree: int = 1, name: str = 'x', scale: float = 1.0,
             flag: bool = False):
        seen.update(nelems=nelems, degree=degree, name=name, scale=scale, flag=flag)

    cli.run(main, argv=['nelems=8', 'scale=2.5', 'name=hello', 'flag=yes'])
    assert seen == dict(nelems=8, degree=1, name='hello', scale=2.5, flag=True)


def test_run_rejects_unknown_argument():
    def main(nelems: int = 4):
        pass
    with pytest.raises(SystemExit):
        cli.run(main, argv=['bogus=1'])
    with pytest.raises(SystemExit):
        cli.run(main, argv=['positional'])


def test_run_propagates_exception():
    def main():
        raise ValueError('boom')
    with pytest.raises(ValueError):
        cli.run(main, argv=[])


def test_choose_dispatches_by_name():
    seen = []

    def alpha(n: int = 1):
        seen.append(('alpha', n))

    def beta(n: int = 1):
        seen.append(('beta', n))

    cli.choose(alpha, beta, argv=['beta', 'n=3'])
    assert seen == [('beta', 3)]


def test_run_htmllog(tmp_path, monkeypatch):
    monkeypatch.setenv('NUTILS_TPU_OUTDIR', str(tmp_path))

    def main():
        pass

    cli.run(main, argv=[])
    logs = list(tmp_path.rglob('log.html'))
    assert len(logs) == 1 and logs[0].stat().st_size > 0


# -------------------------------------------------------------- testing glue

class _Probe(testing.TestCase):

    def test_scratch_dir(self):
        # TestCase chdirs into a scratch directory so figure output is isolated
        open('figure.png', 'w').write('x')
        self.assertTrue(os.path.exists('figure.png'))

    def test_packed_roundtrip(self):
        data = numpy.linspace(-1, 1, 7)
        from nutils_tpu.utils import numeric
        packed = numeric.base64_pack(data, 2e-15, 2e-3, 'int16')
        self.assertAlmostEqual64(data, packed)

    def test_packed_mismatch_fails(self):
        from nutils_tpu.utils import numeric
        packed = numeric.base64_pack(numpy.zeros(3), 2e-15, 2e-3, 'int16')
        with self.assertRaises(self.failureException):
            self.assertAlmostEqual64(numpy.ones(3), packed)

    def test_all_almost_equal(self):
        self.assertAllAlmostEqual([1.0, 2.0], numpy.array([1.0, 2.0 + 1e-9]))
        with self.assertRaises(self.failureException):
            self.assertAllAlmostEqual([1.0], [1.1])


def test_testcase_probe_suite():
    suite = unittest.defaultTestLoader.loadTestsFromTestCase(_Probe)
    result = unittest.TestResult()
    suite.run(result)
    assert result.testsRun == 4
    assert not result.failures and not result.errors, (result.failures, result.errors)


@testing.parametrize
class _Param(testing.TestCase):

    def test_value(self):
        self.assertIn(self.n, (1, 2))


_Param(n=1)
_Param(n=2)


def test_parametrize_generates_cases():
    names = [n for n in dir(__import__('sys').modules[__name__]) if n.startswith('_Param_')]
    assert len(names) == 2


# ------------------------------------------------------------------ warnings

def test_warning_hierarchy():
    assert issubclass(warnings.NutilsDeprecationWarning, DeprecationWarning)
    assert issubclass(warnings.NutilsDeprecationWarning, warnings.NutilsWarning)
    assert issubclass(warnings.NutilsInefficiencyWarning, warnings.NutilsWarning)


def test_warn_and_deprecation():
    with _pywarnings.catch_warnings(record=True) as caught:
        _pywarnings.simplefilter('always')
        warnings.warn('generic')
        warnings.deprecation('old api')
    assert [type(c.message) for c in caught] == \
        [warnings.NutilsWarning, warnings.NutilsDeprecationWarning]


def test_warnings_via_redirect():
    lines = []
    with warnings.via(lines.append):
        _pywarnings.warn('routed', warnings.NutilsWarning)
    assert any('routed' in line for line in lines)


# ------------------------------------------------------------------ unit shim

def test_unit_create():
    U = unit.create(m=1.0, s=1.0, g=1e-3)
    assert float(U('2km')) == pytest.approx(2000.0)
    assert float(U('3m/s')) == pytest.approx(3.0)
    with pytest.raises(ValueError):
        U('3blorp')
