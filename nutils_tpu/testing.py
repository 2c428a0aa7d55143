'''Regression test harness (reference: testing.py).

``assertAlmostEqual64`` consumes the reference's embedded base64-packed int16
regression strings verbatim (same asinh quantization, see utils.numeric), so
solution parity with the reference is checked at packed precision without
rerunning it.
'''

import binascii
import os
import tempfile
import unittest
import zlib

import numpy

from .utils import numeric


class TestCase(unittest.TestCase):
    '''Test case that runs in a scratch directory (figure output) and offers
    packed-data comparison.'''

    maxDiff = None

    def setUp(self):
        super().setUp()
        self._tmpdir = tempfile.TemporaryDirectory()
        self._oldcwd = os.getcwd()
        os.chdir(self._tmpdir.name)
        self.addCleanup(self._restore)

    def _restore(self):
        os.chdir(self._oldcwd)
        self._tmpdir.cleanup()

    def assertAllAlmostEqual(self, actual, desired, **kwargs):
        actual = numpy.asarray(actual)
        desired = numpy.asarray(desired)
        self.assertEqual(actual.shape, desired.shape)
        for a, d in zip(actual.ravel(), desired.ravel()):
            self.assertAlmostEqual(a, d, **kwargs)

    def assertAlmostEqual64(self, actual, desired, *, atol=2e-15, rtol=2e-3, dtype='int16', noise=0.0):
        '''Compare against base64/zlib/int16 asinh-packed data
        (reference: testing.py:187).  ``noise`` adds absolute slack to the
        comparison (not the decoding) for entries dominated by solver rounding.'''
        actual = numpy.asarray(actual)
        try:
            des = numeric.unpack(numpy.frombuffer(zlib.decompress(binascii.a2b_base64(desired)), dtype=dtype), atol, rtol).reshape(actual.shape)
        except Exception as e:
            status = [f'failed to decode data: {e}']
        else:
            error = abs(actual - des)
            spacing = numpy.sqrt(atol ** 2 + (des * rtol) ** 2) + noise
            fail = numpy.logical_xor(numpy.isnan(actual), numpy.isnan(des))
            numpy.greater(error, spacing, where=~numpy.isnan(error), out=fail)
            nfail = int(fail.sum())
            if not nfail:
                return
            status = [f'{nfail}/{fail.size} values do not match up to atol={atol:.2e}, rtol={rtol:.2e}:']
            status.extend(f'{list(map(int, index))} desired: {des[index]:+.4e}, actual: {actual[index]:+.4e}'
                          for index in zip(*fail.nonzero()))
            if nfail > 10:
                status[6:-5] = ['...']
        status.append('If this is expected, update the base64 string to:')
        s = numeric.base64_pack(actual, atol, rtol, dtype)
        status.extend(s[i:i + 80] for i in range(0, len(s), 80))
        self.fail('\n'.join(status))

    def require_module(self, *names):
        import importlib.util
        missing = [n for n in names if importlib.util.find_spec(n) is None]
        if missing:
            self.skipTest(f'missing module(s): {", ".join(missing)}')


class _ParametrizeMeta(type):
    pass


def parametrize(cls):
    '''Multiply a TestCase over parameter combinations declared by calling the
    decorated class (reference: testing.py:90).  Usage:

        @parametrize
        class mytest(testing.TestCase): ...
        mytest(degree=1)
        mytest(degree=2)
    '''
    import sys

    class _Registrar:

        def __init__(self, cls):
            self._cls = cls
            self._module = sys.modules[cls.__module__]

        def __call__(self, **params):
            name = cls.__name__ + ':' + ','.join(f'{k}={v}' for k, v in params.items())
            newcls = type(name.replace(':', '_').replace(',', '_').replace('=', '_'), (self._cls,), params)
            newcls.__module__ = cls.__module__
            setattr(self._module, newcls.__name__, newcls)
            return newcls

    return _Registrar(cls)
