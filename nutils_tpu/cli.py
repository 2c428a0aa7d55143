'''Command line driver (reference: cli.py): parse ``name=value`` arguments
typed from the main function's signature and run it with logging configured.'''

import inspect
import logging
import sys

from .utils import _log as log


def _parse(value, annotation):
    if annotation in (int, float, str):
        return annotation(value)
    if annotation is bool:
        return value.lower() in ('1', 'true', 'yes', 'on')
    return value


def run(main, *, argv=None):
    logging.basicConfig(level=logging.INFO, format='%(message)s')
    argv = sys.argv[1:] if argv is None else argv
    sig = inspect.signature(main)
    kwargs = {}
    for arg in argv:
        if '=' not in arg:
            raise SystemExit(f'arguments must be name=value pairs, got {arg!r}')
        name, value = arg.split('=', 1)
        if name not in sig.parameters:
            raise SystemExit(f'unknown argument {name!r}; options: {", ".join(sig.parameters)}')
        kwargs[name] = _parse(value, sig.parameters[name].annotation)
    log.info(f'running {main.__module__}.{main.__name__} {kwargs}')
    return main(**kwargs)


def choose(*mains, argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        raise SystemExit('choose: ' + ' '.join(m.__name__ for m in mains))
    name, *rest = argv
    for m in mains:
        if m.__name__ == name:
            return run(m, argv=rest)
    raise SystemExit(f'unknown command {name!r}')
