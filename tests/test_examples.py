'''End-to-end example regression tests against the reference's embedded data
(the reference's own regression strategy: examples/__init__.py:5-14 loads each
example's ``test`` class; we collect them via pytest).'''

import unittest

import pytest


def _load(name):
    import importlib
    return importlib.import_module(name)


@pytest.mark.parametrize('example', ['laplace', 'poisson', 'elasticity', 'finitestrain', 'burgers', 'drivencavity', 'cylinderflow', 'platewithhole', 'torsion', 'adaptivity', 'cahnhilliard', 'coil', 'turek'])
def test_example_regressions(example):
    mod = _load(example)
    suite = unittest.defaultTestLoader.loadTestsFromTestCase(mod.test)
    result = unittest.TestResult()
    suite.run(result)
    msgs = [f'{t}: {tb}' for t, tb in result.failures + result.errors]
    assert result.wasSuccessful(), '\n'.join(msgs)
