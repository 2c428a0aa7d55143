"""Minimal treelog-compatible shim, sufficient to import and run the
reference nutils (/root/reference) for CPU baseline measurements
(BASELINE.md items 1-2).  API surface mirrors what the reference actually
touches: info/debug/warning/error/user, context, withcontext, iter.*,
set/add, RecordLog (with pickle+replay for cache.py), userfile/infofile,
proto.Level, and the sink classes cli.py instantiates.
"""

import builtins
import contextlib
import enum
import functools
import io
import os
import sys
import tempfile


_VERBOSE = os.environ.get('NUTILS_REFSHIM_LOG', '') not in ('', '0', 'no')


def _emit(level, *args, sep=' '):
    if _VERBOSE:
        print('[{}]'.format(level), sep.join(str(a) for a in args), file=sys.stderr)


def info(*args, **kw):
    _emit('info', *args, **kw)


def debug(*args, **kw):
    _emit('debug', *args, **kw)


def warning(*args, **kw):
    _emit('warning', *args, **kw)


def error(*args, **kw):
    _emit('error', *args, **kw)


def user(*args, **kw):
    _emit('user', *args, **kw)


@contextlib.contextmanager
def context(title, *initargs, **initkwargs):
    if initargs or initkwargs:
        title = title.format(*initargs, **initkwargs)
    _emit('context', title)
    yield


def withcontext(f):
    @functools.wraps(f)
    def wrapped(*args, **kwargs):
        with context(f.__name__):
            return f(*args, **kwargs)
    return wrapped


class _IterWrap:
    '''Passthrough stand-in for treelog's progress iterator: supports both
    `for x in wrap` and `with wrap as it: for x in it` (parallel.ctxrange
    uses the latter).'''

    def __init__(self, iterables):
        self._it = builtins.iter(iterables[0]) if len(iterables) == 1 else zip(*iterables)

    def __iter__(self):
        return self._it

    def __next__(self):
        return next(self._it)

    def __enter__(self):
        return self._it

    def __exit__(self, *exc):
        return False


class _Iter:
    '''treelog.iter: progress-logging iterator wrappers (passthrough).'''

    @staticmethod
    def plain(title, *iterables):
        return _IterWrap(iterables)

    @staticmethod
    def fraction(title, *iterables):
        return _IterWrap(iterables)

    @staticmethod
    def percentage(title, *iterables):
        return _IterWrap(iterables)

    @staticmethod
    def wrap(text, *iterables):
        return _IterWrap(iterables)


iter = _Iter()


class _Proto:
    class Level(enum.IntEnum):
        debug = 0
        info = 1
        user = 2
        warning = 3
        error = 4


proto = _Proto()


class _Log:
    def __init__(self, *args, **kwargs):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class StdoutLog(_Log):
    pass


class RichOutputLog(_Log):
    pass


class NullLog(_Log):
    pass


class LoggingLog(_Log):
    pass


class DataLog(_Log):
    pass


class HtmlLog(_Log):
    def __init__(self, outdir, *args, **kwargs):
        self.filename = os.path.join(str(outdir), 'log.html')


class FilterLog(_Log):
    def __init__(self, log, minlevel=None, **kwargs):
        self._log = log


class RecordLog(_Log):
    '''Records nothing; replay is a no-op.  cache.py pickles this alongside
    cached values and calls .replay() on load.'''

    def __init__(self, simplify=True):
        pass

    def replay(self):
        pass


@contextlib.contextmanager
def set(log):
    yield log


@contextlib.contextmanager
def add(log):
    yield log


@contextlib.contextmanager
def userfile(name, mode):
    path = os.path.join(tempfile.gettempdir(), 'nutils_refshim_' + os.path.basename(name))
    with open(path, mode) as f:
        yield f


infofile = userfile


def current():
    return NullLog()
