'''Hierarchical logging, a lean stand-in for the reference's ``treelog`` sink.

Provides the subset of the treelog API the framework and examples use
(reference: treelog usage throughout src/nutils: ``log.context``,
``log.info/user/warning/error``, ``log.iter.fraction/percentage``,
``@log.withcontext``), implemented over the stdlib ``logging`` module so test
harnesses can capture it.  Verbosity is controlled by the standard logging
level of the ``nutils_tpu`` logger.
'''

import contextlib
import functools
import logging

_logger = logging.getLogger('nutils_tpu')
_context_stack = []


def _emit(level, msg, *args):
    if args:
        msg = msg.format(*args)
    prefix = ' > '.join(_context_stack)
    _logger.log(level, f'{prefix} > {msg}' if prefix else msg)


def debug(msg, *args):
    _emit(logging.DEBUG, msg, *args)


def info(msg, *args):
    _emit(logging.INFO, msg, *args)


def user(msg, *args):
    _emit(logging.INFO, msg, *args)


def warning(msg, *args):
    _emit(logging.WARNING, msg, *args)


def error(msg, *args):
    _emit(logging.ERROR, msg, *args)


@contextlib.contextmanager
def context(title, *args):
    if args:
        title = title.format(*args)
    _context_stack.append(title)
    try:
        yield
    finally:
        _context_stack.pop()


def withcontext(f):
    @functools.wraps(f)
    def wrapped(*args, **kwargs):
        with context(f.__name__):
            return f(*args, **kwargs)
    return wrapped


class _Iter:

    @staticmethod
    def fraction(title, iterable, length=None):
        items = list(iterable) if length is None else iterable
        n = length if length is not None else len(items)
        for i, item in enumerate(items):
            with context(f'{title} {i}/{n}'):
                yield item

    percentage = fraction

    @staticmethod
    def plain(title, iterable):
        for item in iterable:
            with context(title):
                yield item


iter = _Iter()
