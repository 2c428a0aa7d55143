'''SI units on top of plain numbers, numpy arrays and function arrays.

The TPU-native counterpart of the reference's SI module (reference: SI.py):
a ``Dimension`` metaclass whose instances are Quantity subclasses identified
by their base-dimension powers, a ``Quantity`` wrapper that carries a value
(scalar, numpy array or function.Array) expressed in SI reference units, a
prefix-aware unit registry, and string parsing/formatting ('5cm',
'{:.0μJ/m}').  Dimension-changing operations on function arrays route through
the function layer's dispatch hook (function._register_dispatchee).
'''

import fractions
import operator

import numpy

from . import function


class DimensionError(TypeError):
    pass


def _factors(s):
    '''Split a unit expression 'kg*m/s2' into (base, power, in_numerator).'''
    for group in s.split('*'):
        numer = True
        for part in group.split('/'):
            if part:
                base = part.rstrip('0123456789_')
                tail = part[len(base):]
                num, _, den = tail.partition('_')
                yield base, fractions.Fraction(int(num or 1), int(den or 1)), numer
            numer = False


class Dimension(type):

    _registry = {}

    @classmethod
    def create(mcls, symbol):
        assert isinstance(symbol, str)
        return mcls.from_powers({symbol: fractions.Fraction(1)})

    @classmethod
    def from_powers(mcls, powers):
        powers = {b: fractions.Fraction(p) for b, p in powers.items() if p}
        # Canonical name, parseable by _factors: positive powers joined with
        # '*', negative powers each prefixed '/', both ordered by descending
        # power then reverse-alphabetical base; exponent rendered as
        # [numerator][_denominator] with unit parts elided.
        def fmt(base, p):
            num, den = abs(p.numerator), p.denominator
            if num != 1:
                base += str(num)
            if den != 1:
                base += '_' + str(den)
            return base
        ordered = sorted(((p, b) for b, p in powers.items()), reverse=True)
        numer = '*'.join(fmt(b, p) for p, b in ordered if p > 0)
        denom = ''.join('/' + fmt(b, p) for p, b in ordered if p < 0)
        name = numer + denom
        cls = mcls._registry.get(name)
        if cls is None:
            cls = mcls(f'[{name}]', (Quantity,), {})
            cls._powers = powers
            mcls._registry[name] = cls
        return cls

    def __bool__(cls):
        return bool(cls._powers)

    def __or__(cls, other):
        import typing
        return typing.Union[cls, other]

    __ror__ = __or__

    def __mul__(cls, other):
        if not isinstance(other, Dimension):
            return NotImplemented
        return Dimension.from_powers({b: cls._powers.get(b, 0) + other._powers.get(b, 0)
                                      for b in set(cls._powers) | set(other._powers)})

    def __truediv__(cls, other):
        if not isinstance(other, Dimension):
            return NotImplemented
        return Dimension.from_powers({b: cls._powers.get(b, 0) - other._powers.get(b, 0)
                                      for b in set(cls._powers) | set(other._powers)})

    def __pow__(cls, n):
        return Dimension.from_powers({b: p * fractions.Fraction(n) for b, p in cls._powers.items()})

    def __call__(cls, value):
        if cls is Quantity:
            raise TypeError('Quantity base class cannot be instantiated')
        if isinstance(value, cls):
            return value
        if not isinstance(value, str):
            raise ValueError(f'expected a str, got {type(value).__name__}')
        q = parse(value)
        expect = float if not cls._powers else cls
        if type(q) != expect:
            got = type(q).__name__
            raise DimensionError(f'expected {expect.__name__}, got {got}')
        return q

    def wrap(cls, value):
        '''Wrap a raw value expressed in SI reference units.'''
        if not cls._powers:
            return value
        return super().__call__(value)

    @property
    def zero(cls):
        '''The zero quantity of this dimension (reference: nutils-units
        Quantity.zero, used by examples/turek.py).'''
        return cls.wrap(0.)


def parse(s):
    """Parse a quantity string into a Quantity (or float if dimensionless).

    >>> from nutils_tpu.SI import parse, Length
    >>> parse('2.5cm')
    0.025[L]
    >>> Length('2.5cm') / 'mm'
    25.0
    >>> parse('3m/s')
    3.0[L/T]
    """
    if not isinstance(s, str):
        raise ValueError(f'expected a str, got {type(s).__name__}')
    tail = s.lstrip('+-0123456789.')
    q = float(s[:len(s) - len(tail)] or 1)
    for expr, power, numer in _factors(tail):
        u = expr.lstrip('+-0123456789.')
        try:
            v = float(expr[:len(expr) - len(u)] or 1) * getattr(units, u) ** power
        except (ValueError, AttributeError):
            raise ValueError(f'invalid unit (sub)expression {expr!r}') from None
        q = q * v if numer else q / v
    if isinstance(q, Quantity):
        q._parsed_from = s
    return q


def _dim_of(x):
    return type(x) if isinstance(x, Quantity) else Dimensionless


def _val_of(x):
    return x._value if isinstance(x, Quantity) else x


class Quantity(metaclass=Dimension):

    def __init__(self, value):
        self._value = value

    def unwrap(self):
        return self._value

    # ------------------------------------------------------------ container

    @property
    def shape(self):
        return self._value.shape

    @property
    def ndim(self):
        return getattr(self._value, 'ndim', 0)

    def __len__(self):
        return len(self._value)

    def __iter__(self):
        return map(type(self).wrap, self._value)

    def __bool__(self):
        return bool(self._value)

    def __hash__(self):
        return hash((type(self), self._value))

    def __repr__(self):
        return repr(self._value) + type(self).__name__

    __str__ = __repr__

    def __format__(self, spec):
        if not spec:
            return repr(self)
        n = len(spec) - len(spec.lstrip('0123456789.,'))
        v = self / type(self)(spec[n:])
        return v.__format__(spec[:n] + 'f') + spec[n:]

    # ------------------------------------------------------------ arithmetic

    def _same(self, other, op):
        if _dim_of(other) is not type(self):
            raise DimensionError(f'incompatible dimensions for {op}: {type(self).__name__}, {_dim_of(other).__name__}')
        return _val_of(other)

    def __add__(self, other):
        return type(self).wrap(self._value + self._same(other, 'add'))

    __radd__ = __add__

    def __sub__(self, other):
        return type(self).wrap(self._value - self._same(other, 'sub'))

    def __rsub__(self, other):
        return type(self).wrap(self._same(other, 'sub') - self._value)

    def __mul__(self, other):
        if isinstance(other, str):
            other = parse(other)
        dim = type(self) * _dim_of(other)
        return dim.wrap(self._value * _val_of(other))

    __rmul__ = __mul__

    def __matmul__(self, other):
        dim = type(self) * _dim_of(other)
        return dim.wrap(self._value @ _val_of(other))

    def __rmatmul__(self, other):
        dim = type(self) * _dim_of(other)
        return dim.wrap(_val_of(other) @ self._value)

    def __truediv__(self, other):
        if isinstance(other, str):
            other = parse(other)
        dim = type(self) / _dim_of(other)
        return dim.wrap(self._value / _val_of(other))

    def __rtruediv__(self, other):
        if isinstance(other, str):
            other = parse(other)
        dim = _dim_of(other) / type(self)
        return dim.wrap(_val_of(other) / self._value)

    def __pow__(self, n):
        return (type(self) ** n).wrap(self._value ** n)

    def __neg__(self):
        return type(self).wrap(-self._value)

    def __pos__(self):
        return self

    def __abs__(self):
        return type(self).wrap(abs(self._value))

    def __getitem__(self, item):
        return type(self).wrap(self._value[item])

    def _cmp(self, other, op):
        return op(self._value, self._same(other, op.__name__))

    def __lt__(self, other):
        return self._cmp(other, operator.lt)

    def __le__(self, other):
        return self._cmp(other, operator.le)

    def __gt__(self, other):
        return self._cmp(other, operator.gt)

    def __ge__(self, other):
        return self._cmp(other, operator.ge)

    def __eq__(self, other):
        return _dim_of(other) is type(self) and numpy.all(self._value == _val_of(other))

    def __round__(self):
        return type(self).wrap(round(self._value))

    @property
    def T(self):
        return type(self).wrap(self._value.T)

    # ------------------------------------------------------------- numpy

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        if method != '__call__':
            return NotImplemented
        dims = [_dim_of(a) for a in inputs]
        vals = [_val_of(a) for a in inputs]
        if ufunc in (numpy.add, numpy.subtract, numpy.maximum, numpy.minimum, numpy.hypot):
            if dims[0] is not dims[1]:
                raise DimensionError(f'incompatible dimensions for {ufunc.__name__}')
            return dims[0].wrap(ufunc(*vals, **kwargs))
        if ufunc in (numpy.multiply, numpy.matmul):
            return (dims[0] * dims[1]).wrap(ufunc(*vals, **kwargs))
        if ufunc is numpy.true_divide:
            return (dims[0] / dims[1]).wrap(ufunc(*vals, **kwargs))
        if ufunc in (numpy.negative, numpy.positive, numpy.absolute, numpy.conjugate):
            return dims[0].wrap(ufunc(*vals, **kwargs))
        if ufunc is numpy.sqrt:
            return (dims[0] ** fractions.Fraction(1, 2)).wrap(ufunc(*vals, **kwargs))
        if ufunc is numpy.power:
            return (dims[0] ** vals[1]).wrap(vals[0] ** vals[1])
        if ufunc in (numpy.less, numpy.less_equal, numpy.greater, numpy.greater_equal):
            if dims[0] is not dims[1]:
                raise DimensionError(f'incompatible comparison')
            return ufunc(*vals, **kwargs)
        return NotImplemented

    def __array_function__(self, func, types, args, kwargs):
        if func in (numpy.amax, numpy.amin, numpy.max, numpy.min, numpy.mean, numpy.sum,
                    numpy.transpose, numpy.reshape, numpy.broadcast_to, numpy.take,
                    numpy.trace, numpy.ptp, numpy.real, numpy.absolute, numpy.ravel,
                    numpy.repeat, numpy.quantile, numpy.diff):
            (q, *rest) = args
            return type(q).wrap(func(_val_of(q), *rest, **kwargs))
        if func is numpy.linalg.norm:
            return type(args[0]).wrap(func(_val_of(args[0]), *args[1:], **kwargs))
        if func is numpy.stack or func is numpy.concatenate:
            seq = args[0]
            dim = _dim_of(seq[0])
            if not all(_dim_of(a) is dim for a in seq):
                raise DimensionError(f'incompatible dimensions for {func.__name__}')
            return dim.wrap(func([_val_of(a) for a in seq], *args[1:], **kwargs))
        if func is numpy.hypot:
            return self.__array_ufunc__(numpy.hypot, '__call__', *args, **kwargs)
        return NotImplemented

    # -------------------------------------------------- function-layer hook

    @classmethod
    def __nutils_dispatch__(cls, func, args, kwargs):
        name = getattr(func, '__name__', None)
        dims = [_dim_of(a) for a in args]
        vals = [_val_of(a) for a in args]
        if name in ('negative', 'opposite', 'jump', 'mean', 'factor', 'transpose', 'sum_',
                    'getitem', 'insertaxis', 'trace', 'normalized', 'abs_'):
            return dims[0].wrap(func(vals[0], *args[1:], **kwargs))
        if name in ('add', 'subtract', 'min_', 'max_'):
            if dims[0] is not dims[1]:
                raise DimensionError(f'incompatible dimensions for {name}')
            return dims[0].wrap(func(*vals, **kwargs))
        if name in ('multiply', 'matmul', 'dot'):
            return (dims[0] * dims[1]).wrap(func(*vals, **kwargs))
        if name == 'divide':
            return (dims[0] / dims[1]).wrap(func(*vals, **kwargs))
        if name == 'sqrt':
            return (dims[0] ** fractions.Fraction(1, 2)).wrap(func(vals[0], **kwargs))
        if name == 'power':
            return (dims[0] ** args[1]).wrap(func(vals[0], args[1], **kwargs))
        if name == 'asarray':
            return dims[0].wrap(func(vals[0]))
        if name == 'grad':
            arg, geom = args[0], args[1]
            return (_dim_of(arg) / _dim_of(geom)).wrap(func(_val_of(arg), _val_of(geom), *args[2:], **kwargs))
        if name in ('div', 'curl'):
            return (_dim_of(args[0]) / _dim_of(args[1])).wrap(func(_val_of(args[0]), _val_of(args[1]), **kwargs))
        if name == 'laplace':
            return (_dim_of(args[0]) / _dim_of(args[1]) ** 2).wrap(func(_val_of(args[0]), _val_of(args[1]), **kwargs))
        if name == 'normal':
            return func(_val_of(args[0]), *args[1:], **kwargs)
        if name in ('jacobian', 'J'):
            geom = args[0]
            v = _val_of(geom)
            out = func(v, *args[1:], **kwargs)
            # the measure scales with geom^k, k being the sample dimension:
            # the declared ndims when given, else the geometry's length
            n = args[1] if name == 'jacobian' and len(args) > 1 else kwargs.get('ndims')
            k = n if n is not None else v.shape[0]
            return (_dim_of(geom) ** k).wrap(out)
        if name in ('stack', 'concatenate'):
            seq = args[0]
            dim = _dim_of(seq[0])
            if not all(_dim_of(a) is dim for a in seq):
                raise DimensionError(f'incompatible dimensions for {name}')
            return dim.wrap(func([_val_of(a) for a in seq], *args[1:], **kwargs))
        if name in ('replace_arguments', 'derivative', 'linearize'):
            return dims[0].wrap(func(vals[0], *args[1:], **kwargs))
        if name == 'eval':
            funcs = args[0]
            single = not isinstance(funcs, (list, tuple))
            flist = [funcs] if single else list(funcs)
            out = func([_val_of(f) for f in flist], *args[1:], **kwargs)
            out = [(_dim_of(f)).wrap(o) for f, o in zip(flist, out)]
            return out[0] if single else out
        if name == 'arguments_for':
            return func(*[_val_of(a) for a in args], **kwargs)
        if name in ('integral', 'bind'):
            # sample methods: (sample, integrand)
            return dims[1].wrap(func(args[0], vals[1], **kwargs))
        return NotImplemented


function._register_dispatchee(Quantity)


class Units(dict):

    _prefix = dict(Y=1e24, Z=1e21, E=1e18, P=1e15, T=1e12, G=1e9, M=1e6, k=1e3, h=1e2,
                   d=1e-1, c=1e-2, m=1e-3, μ=1e-6, u=1e-6, n=1e-9, p=1e-12, f=1e-15,
                   a=1e-18, z=1e-21, y=1e-24)

    def __setattr__(self, name, value):
        if not isinstance(value, Quantity):
            value = parse(value)
        if name in self:
            raise ValueError(f'unit {name!r} is already defined')
        scaled = {p + name: value * s for p, s in self._prefix.items()}
        clash = set(scaled) & set(self)
        if clash:
            raise ValueError(f'unit {name!r} collides with ' + ', '.join(sorted(clash)))
        self[name] = value
        self.update(scaled)

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None


# ------------------------------------------------------------ SI dimensions

Dimensionless = Dimension.from_powers({})

Time = Dimension.create('T')
Length = Dimension.create('L')
Mass = Dimension.create('M')
ElectricCurrent = Dimension.create('I')
Temperature = Dimension.create('θ')
AmountOfSubstance = Dimension.create('N')
LuminousFlux = LuminousIntensity = Dimension.create('J')

Area = Length**2
Volume = Length**3
WaveNumber = Vergence = Length**-1
Velocity = Speed = Length / Time
Acceleration = Velocity / Time
Force = Weight = Mass * Acceleration
Pressure = Stress = Force / Area
Tension = Force / Length
Energy = Work = Heat = Force * Length
Power = Energy / Time
Density = Mass / Volume
SpecificVolume = Density**-1
SurfaceDensity = Mass / Area
Viscosity = Pressure * Time
Frequency = Radioactivity = Time**-1
CurrentDensity = ElectricCurrent / Area
MagneticFieldStrength = ElectricCurrent / Length
Charge = ElectricCurrent * Time
ElectricPotential = Power / ElectricCurrent
Capacitance = Charge / ElectricPotential
Resistance = Impedance = Reactance = ElectricPotential / ElectricCurrent
Conductance = Resistance**-1
MagneticFlux = ElectricPotential * Time
MagneticFluxDensity = MagneticFlux / Area
Inductance = MagneticFlux / ElectricCurrent
Illuminance = LuminousFlux / Area
AbsorbedDose = EquivalentDose = Energy / Mass
Concentration = AmountOfSubstance / Volume
CatalyticActivity = AmountOfSubstance / Time


# ------------------------------------------------------------ SI units

units = Units()

units.m = Length.wrap(1.)
units.s = Time.wrap(1.)
units.g = Mass.wrap(1e-3)
units.A = ElectricCurrent.wrap(1.)
units.K = Temperature.wrap(1.)
units.mol = AmountOfSubstance.wrap(1.)
units.cd = LuminousIntensity.wrap(1.)

units.N = 'kg*m/s2'
units.Pa = 'N/m2'
units.J = 'N*m'
units.W = 'J/s'
units.Hz = '/s'
units.C = 'A*s'
units.V = 'J/C'
units.F = 'C/V'
units.Ω = 'V/A'
units.S = '/Ω'
units.Wb = 'V*s'
units.T = 'Wb/m2'
units.H = 'Wb/A'
units.lm = 'cd'
units.lx = 'lm/m2'
units.Bq = '/s'
units.Gy = 'J/kg'
units.Sv = 'J/kg'
units.kat = 'mol/s'

units.min = '60s'
units.h = '60min'
units.day = '24h'
units.au = '149597870700m'
units.ha = 'hm2'
units.L = 'dm3'
units.t = '1000kg'
units.Da = '1.66053904020yg'
units.eV = '.1602176634aJ'
units['in'] = 25.4 * units.mm
