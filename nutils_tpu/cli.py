'''Command line driver (reference: cli.py): parse ``name=value`` arguments
typed from the main function's signature and run it with logging configured.'''

import inspect
import os
import logging
import sys

from .utils import _log as log


def _parse(value, annotation):
    if annotation in (int, float, str):
        return annotation(value)
    if annotation is bool:
        return value.lower() in ('1', 'true', 'yes', 'on')
    try:
        from . import SI
        if isinstance(annotation, SI.Dimension):
            return annotation(value)
    except ImportError:  # pragma: no cover
        pass
    # dataclass (possibly Union) annotations accept 'Name' or 'Name{k=v,...}'
    # (case-insensitive, parens allowed) sub-parameter syntax (reference: cli
    # dataclass support via stringly, _util.py:698)
    import dataclasses
    import re
    import typing
    options = typing.get_args(annotation) or (annotation,)
    classes = [cls for cls in options if isinstance(cls, type) and dataclasses.is_dataclass(cls)]
    if classes:
        m = re.fullmatch(r'(\w+)(?:[{(](.*)[)}])?', value.strip())
        if m:
            for cls in classes:
                if cls.__name__.lower() == m.group(1).lower():
                    kwargs = {}
                    if m.group(2):
                        hints = typing.get_type_hints(cls)
                        for item in m.group(2).split(','):
                            k, v = item.split('=', 1)
                            k = k.strip()
                            kwargs[k] = _parse(v.strip().strip("'\""), hints.get(k, str))
                    return cls(**kwargs)
        raise SystemExit(f'invalid value {value!r}; choose from '
                         + ', '.join(f'{cls.__name__}{{{", ".join(f.name + "=" for f in dataclasses.fields(cls))}}}' for cls in classes))
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

    def invoke():
        try:
            return main(**kwargs)
        except Exception:
            # log the traceback through the sink(s) and optionally drop into
            # the post-mortem debugger (reference: log_traceback/post_mortem,
            # _util.py:517,548, env NUTILS_PDB)
            import traceback
            for line in traceback.format_exc().rstrip().split('\n'):
                log.error(line)
            if os.environ.get('NUTILS_TPU_PDB', '').lower() in ('1', 'yes', 'true'):
                import pdb
                pdb.post_mortem()
            raise

    outroot = os.environ.get('NUTILS_TPU_OUTDIR')
    if outroot:
        # HTML log with embedded figures (reference: cli stacks add_htmllog
        # writing ~/public_html/<script>/<timestamp>/log.html, _util.py:641)
        import datetime
        outdir = os.path.join(outroot, main.__module__,
                              datetime.datetime.now().strftime('%Y-%m-%d_%H-%M-%S'))
        with log.htmllog(outdir, f'{main.__module__}.{main.__name__}'):
            return invoke()
    return invoke()


def choose(*mains, argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        raise SystemExit('choose: ' + ' '.join(m.__name__ for m in mains))
    name, *rest = argv
    for m in mains:
        if m.__name__ == name:
            return run(m, argv=rest)
    raise SystemExit(f'unknown command {name!r}')
