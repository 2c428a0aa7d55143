'''Doctest layer (reference: tests/test_docs.py:60-79): collect doctests from
every nutils_tpu module with a ±-tolerance output checker (reference:
testing.py:275-338 FloatNeighborhoodOutputChecker).'''

import doctest
import importlib
import pkgutil
import re

import pytest

import nutils_tpu


class FloatNeighborhoodOutputChecker(doctest.OutputChecker):
    '''Accepts ``want`` patterns of the form ``1.234±1e-3``: any float within
    the stated tolerance of the stated value matches.'''

    posfloat = r'(?:\d+\.\d*(?:e[+-]?\d+)?|\.?\d+(?:e[+-]?\d+)?)'
    refloat = re.compile(fr'(-?{posfloat})±({posfloat})')

    def check_output(self, want, got, optionflags):
        if super().check_output(want, got, optionflags):
            return True
        if '±' not in want:
            return False
        pos = 0
        pattern = []
        tols = []
        for m in self.refloat.finditer(want):
            pattern.append(re.escape(want[pos:m.start()]))
            pattern.append(fr'({self.posfloat[4:-1]}|-?{self.posfloat})')
            tols.append((float(m.group(1)), float(m.group(2))))
            pos = m.end()
        pattern.append(re.escape(want[pos:]))
        m = re.fullmatch(''.join(pattern), got, flags=re.DOTALL)
        if not m:
            return False
        return all(abs(float(g) - v) <= tol for g, (v, tol) in zip(m.groups(), tols))


def _modules():
    names = ['nutils_tpu']
    for info in pkgutil.walk_packages(nutils_tpu.__path__, prefix='nutils_tpu.'):
        if 'native' not in info.name:
            names.append(info.name)
    return names


@pytest.mark.parametrize('name', _modules())
def test_module_doctests(name):
    mod = importlib.import_module(name)
    finder = doctest.DocTestFinder(exclude_empty=True)
    runner = doctest.DocTestRunner(checker=FloatNeighborhoodOutputChecker(),
                                   optionflags=doctest.ELLIPSIS | doctest.NORMALIZE_WHITESPACE)
    failures = 0
    for test in finder.find(mod, name, globs={}):
        if test.examples:
            result = runner.run(test)
            failures += result.failed
    assert failures == 0, f'{failures} doctest failure(s) in {name}'
