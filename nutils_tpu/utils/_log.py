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
    if _htmllog[0] is not None:
        _htmllog[0].line(logging.getLevelName(level), msg)


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


# ------------------------------------------------------------ HTML log sink

class _HtmlLog:
    '''Collects log lines and figure references and writes a standalone
    ``log.html`` (the analogue of the reference's HTML log with embedded
    figures, _util.py:641-686).'''

    def __init__(self, outdir, title):
        import os
        self.outdir = outdir
        self.title = title
        self.entries = []  # (level, context, message) or ('figure', name)
        os.makedirs(outdir, exist_ok=True)

    def line(self, levelname, message):
        self.entries.append((levelname, ' > '.join(_context_stack), message))

    def figure(self, name):
        self.entries.append(('figure', '', name))

    def write(self):
        import html
        import os
        parts = ['<!DOCTYPE html><html><head><meta charset="utf-8">',
                 f'<title>{html.escape(self.title)}</title>',
                 '<style>body{font-family:monospace;margin:1em}'
                 '.WARNING{color:#b60}.ERROR{color:#c00}'
                 '.ctx{color:#888}img{max-width:45em;display:block;margin:.5em 0}</style>',
                 '</head><body>', f'<h1>{html.escape(self.title)}</h1>']
        for level, ctx, msg in self.entries:
            if level == 'figure':
                parts.append(f'<img src="{html.escape(msg)}" alt="{html.escape(msg)}">')
            else:
                c = f'<span class="ctx">{html.escape(ctx)} &gt; </span>' if ctx else ''
                parts.append(f'<div class="{level}">{c}{html.escape(str(msg))}</div>')
        parts.append('</body></html>')
        with open(os.path.join(self.outdir, 'log.html'), 'w') as f:
            f.write('\n'.join(parts))


_htmllog = [None]


@contextlib.contextmanager
def htmllog(outdir, title='log'):
    '''Route log lines and saved figures into ``outdir/log.html``
    (reference: add_htmllog, _util.py:641).'''
    h = _HtmlLog(outdir, title)
    _htmllog[0] = h
    try:
        yield h
    finally:
        _htmllog[0] = None
        h.write()
        info(f'log written to {h.outdir}/log.html')


def _notify_html(levelname, message):
    if _htmllog[0] is not None:
        _htmllog[0].line(levelname, message)


def notify_figure(name):
    if _htmllog[0] is not None:
        _htmllog[0].figure(name)
