"""Minimal ags (ucsl/yaml) shim for importing the reference nutils.
Provides `from ags import yaml, ucsl, load` with just enough behavior for
env-var/CLI value parsing (NUTILS_* deserialization) and argument echo."""

import typing


class _Ucsl:
    @staticmethod
    def loads(s, T):
        origin = typing.get_origin(T)
        if origin is not None:
            T = origin
        if T is bool:
            return s.lower() in ('1', 'true', 'yes', 'on')
        if T in (int, float, str):
            return T(s)
        try:
            return T(s)
        except Exception:
            return s

    @staticmethod
    def dumps(v, T=None):
        return str(v)


class _Yaml:
    @staticmethod
    def dumps(obj, sig=None):
        if isinstance(obj, dict):
            return '\n'.join('{}: {}'.format(k, v) for k, v in obj.items())
        return str(obj)

    @staticmethod
    def loads(s, T=None):
        raise NotImplementedError('refshim ags.yaml.loads')


ucsl = _Ucsl()
yaml = _Yaml()


def load(path, T=None):
    raise NotImplementedError('refshim ags.load')
