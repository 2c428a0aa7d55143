'''End-to-end example regression tests against the reference's embedded data
(the reference's own regression strategy: examples/__init__.py:5-14 loads each
example's ``test`` class; we collect them via pytest).

Env matrix: setting ``NUTILS_TPU_TEST_MESH=8`` re-runs every example under an
8-virtual-device mesh (``config.mesh``) — the analogue of the reference CI's
full-suite NUTILS_NPROCS=2 rows (.github/workflows/test.yaml:58).'''

import os
import unittest

import pytest


@pytest.fixture(autouse=True)
def _mesh_mode():
    n = int(os.environ.get('NUTILS_TPU_TEST_MESH', '0'))
    if n:
        from nutils_tpu.utils import config
        with config.mesh(n):
            yield
    else:
        yield


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
