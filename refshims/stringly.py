"""Minimal stringly shim for importing the reference nutils.  Only the
pieces _util.py touches at import/cli time."""


class _Util:
    class DocString:
        def __init__(self, f):
            doc = f.__doc__ or ''
            self.text = doc
            self.presets = {}
            self.argdocs = {}

        def __str__(self):
            return self.text


util = _Util()


class error(Exception):
    pass


def loads(T, s):
    if T is bool:
        return s.lower() in ('1', 'true', 'yes', 'on')
    return T(s)


def dumps(T, v):
    return str(v)
