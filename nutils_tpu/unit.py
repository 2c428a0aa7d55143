'''Legacy stringly-typed unit framework (reference: unit.py, deprecated shim
over the SI module).  ``create(**units)`` builds a unit system from base units
and derived-unit expression strings; instances parse quantity strings such as
``'2.5km/h'`` to plain floats in the base system, and bound unit types
(``U['km/h']``) validate dimensional consistency on parsing.'''

import re

from . import warnings


_PREFIX = dict(Y=1e24, Z=1e21, E=1e18, P=1e15, T=1e12, G=1e9, M=1e6, k=1e3, h=1e2,
               d=1e-1, c=1e-2, m=1e-3, μ=1e-6, n=1e-9, p=1e-12, f=1e-15, a=1e-18, z=1e-21, y=1e-24)
_WORDS = re.compile('([a-zA-Zα-ωΑ-Ω]+)')


class _Quantity:
    'dimensional number: value plus a dict of unit powers'

    def __init__(self, value, powers=None):
        self.value = float(value)
        self.powers = dict(powers or {})

    def __mul__(self, other):
        powers = dict(self.powers)
        for k, v in other.powers.items():
            powers[k] = powers.get(k, 0) + v
            if not powers[k]:
                del powers[k]
        return _Quantity(self.value * other.value, powers)

    def __pow__(self, n):
        return _Quantity(self.value ** n, {k: v * n for k, v in self.powers.items()})


class _System:
    'a resolved collection of units'

    def __init__(self, units):
        seen = {}

        def depth(name):
            if name not in units:
                name = name[1:]  # strip prefix
            if name not in seen:
                value = units.get(name)
                seen[name] = isinstance(value, str) and sum(map(depth, _WORDS.findall(value)), 1)
            return seen[name]

        self.quantities = {}
        for name in sorted(units, key=depth):  # resolve in dependency order
            value = units[name]
            self.quantities[name] = self.parse(value) if isinstance(value, str) else _Quantity(value, {name: 1})

    def parse(self, s):
        parts = _WORDS.split(s)
        q = _Quantity(parts[0].rstrip('*/') or 1)
        for i in range(1, len(parts), 2):
            power = int(parts[i + 1].rstrip('*/') or 1)
            if parts[i - 1].endswith('/'):
                power = -power
            name = parts[i]
            if name not in self.quantities:
                if name[0] not in _PREFIX or name[1:] not in self.quantities:
                    raise ValueError(f'unknown unit: {name}')
                q = q * _Quantity(_PREFIX[name[0]] ** power)
                name = name[1:]
            q = q * self.quantities[name] ** power
        return q


def _f2s(v):
    'format a float without trailing zeros'
    return f'{v:f}'.rstrip('0').rstrip('.')


class _Unbound(type):
    'metaclass for unbound unit types: U("2km") parses, U["km"] binds'

    def __call__(cls, s):
        return cls[s.lstrip('1234567890.*')](s)

    def __getitem__(cls, s):
        return _Bound(f'{cls.__name__}:{s}', (float,), dict(_system=cls._system, _unit=s))


class _Bound(type):
    'metaclass for unit types bound to specific dimensions'

    def __call__(cls, s):
        return super().__call__(cls.__stringly_loads__(s))

    def __stringly_loads__(cls, s):
        q = cls._system.parse(s)
        powers = cls._system.parse(cls._unit).powers
        if q.powers != powers:
            raise ValueError(f'invalid unit: expected {powers}, got {q.powers}')
        return q.value

    def __stringly_dumps__(cls, v):
        if not isinstance(v, (int, float)):
            raise ValueError(f'can only dump numerical values as unit, got {type(v)!r}')
        return _f2s(v / cls._system.parse(cls._unit).value) + cls._unit


def create(_typename='unit', **units):
    '''Create a new unit type from base units (numbers) and derived units
    (expression strings), e.g. ``create(m=1, s=1, g=1e-3, N='kg*m/s2')``;
    calling the type parses quantity strings: ``U('2km') == 2000.0``
    (reference: unit.py:47).'''
    warnings.deprecation('unit.create is deprecated; use the SI module instead')
    return _Unbound(_typename, (float,), dict(_system=_System(units)))
