'''Warning categories routed through the log (reference: warnings.py).'''

import contextlib
import warnings as _w


class NutilsWarning(Warning):
    pass


class NutilsDeprecationWarning(NutilsWarning, DeprecationWarning):
    pass


class NutilsInefficiencyWarning(NutilsWarning):
    pass


def warn(message, category=NutilsWarning, stacklevel=2):
    _w.warn(message, category, stacklevel=stacklevel)


def deprecation(message):
    warn(message, NutilsDeprecationWarning, stacklevel=3)


@contextlib.contextmanager
def via(print_func):
    '''Context manager redirecting warnings to ``print_func``.'''
    with _w.catch_warnings():
        _w.simplefilter('always')

        def showwarning(message, category, filename, lineno, file=None, line=None):
            print_func(f'{category.__name__}: {message}')
        old = _w.showwarning
        _w.showwarning = showwarning
        try:
            yield
        finally:
            _w.showwarning = old
