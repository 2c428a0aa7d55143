'''Tensor-index expression language and Namespace (reference: expression_v2.py).

Implements the nutils v2 expression grammar: Einstein-summed products with
index notation (``a_ij b_j``), fractions, ``+``/``-`` with index alignment,
powers, compound/jump/mean brackets, numeral item selection (``x_0``), traces
(``b_iji``), and pointwise function calls with generated axes (``∇_i(u)``).
The parser is a fresh recursive-descent implementation over a simple
tokenizer; fragments carry (array, index-string) pairs and contraction happens
pairwise during product parsing.
'''

import re
import unicodedata

import numpy

from . import function


class ExpressionSyntaxError(Exception):
    pass


_TOKEN = re.compile(r'''
      (?P<number>(?:\d+\.\d*|\.\d+|\d+)(?:[eE][-+]?\d+)?)
    | (?P<name>[^\W\d_0-9]\w*|[^\x00-\x7F][\w]*)
    | (?P<lpar>\()|(?P<rpar>\))
    | (?P<lbrk>\[)|(?P<rbrk>\])
    | (?P<lbrc>\{)|(?P<rbrc>\})
    | (?P<pow>\^)
    | (?P<slash>/)
    | (?P<plus>\+)
    | (?P<minus>-)
    | (?P<under>_)
''', re.VERBOSE | re.UNICODE)


def _isname_char(c):
    return c.isalpha() and not c.isdigit() or not c.isascii() and unicodedata.category(c).startswith(('L', 'S', 'M'))


class _Token:
    __slots__ = 'kind', 'text', 'spaced'

    def __init__(self, kind, text, spaced):
        self.kind = kind
        self.text = text
        self.spaced = spaced  # whitespace preceded this token

    def __repr__(self):
        return f'{self.kind}:{self.text}'


def _tokenize(s):
    tokens = []
    i = 0
    n = len(s)
    while i < n:
        spaced = False
        while i < n and s[i].isspace():
            spaced = True
            i += 1
        if i >= n:
            break
        c = s[i]
        if c.isdigit() or c == '.':
            m = re.match(r'(?:\d+\.\d*|\.\d+|\d+)(?:[eE][-+]?\d+)?', s[i:])
            tokens.append(_Token('number', m.group(), spaced))
            i += m.end()
        elif c in '()[]{}^/+-_':
            kind = {'(': 'lpar', ')': 'rpar', '[': 'lbrk', ']': 'rbrk', '{': 'lbrc', '}': 'rbrc',
                    '^': 'pow', '/': 'slash', '+': 'plus', '-': 'minus', '_': 'under'}[c]
            tokens.append(_Token(kind, c, spaced))
            i += 1
        elif _isname_char(c):
            j = i + 1
            while j < n and (_isname_char(s[j]) or s[j].isdigit()):
                j += 1
            tokens.append(_Token('name', s[i:j], spaced))
            i = j
        else:
            raise ExpressionSyntaxError(f'unexpected character {c!r} in expression {s!r}')
    return tokens


class _Frag:
    '''A parsed fragment: array plus one index character per axis.'''

    __slots__ = 'array', 'indices'

    def __init__(self, array, indices):
        self.array = function.asarray(array)
        assert self.array.ndim == len(indices), (self.array.shape, indices)
        self.indices = indices


def _align(frag, out_indices):
    '''Transpose/broadcast a fragment's array to the given index order.'''
    a, ai = frag.array, frag.indices
    assert all(i in out_indices for i in ai)
    perm = sorted(range(len(ai)), key=lambda k: out_indices.index(ai[k]))
    if perm != list(range(len(ai))):
        a = function.transpose(a, perm)
        ai = ''.join(ai[k] for k in perm)
    for pos, idx in enumerate(out_indices):
        if idx not in ai:
            length = 1  # resolved by broadcasting in multiply/add
            a = function.insertaxis(a, pos, 1)
            ai = ai[:pos] + idx + ai[pos:]
    return a


def _mul(a, b, s):
    '''Product of fragments with Einstein summation over shared indices.'''
    shared = [i for i in a.indices if i in b.indices]
    out = ''.join(dict.fromkeys(a.indices + b.indices))
    A = _align(a, out)
    B = _align(b, out)
    r = function.multiply(A, B)
    indices = out
    for i in shared:
        ax = indices.index(i)
        r = function.sum_(r, ax)
        indices = indices[:ax] + indices[ax + 1:]
    return _Frag(r, indices)


def _addsub(a, b, op, s):
    if set(a.indices) != set(b.indices):
        raise ExpressionSyntaxError(f'index mismatch between terms of {s!r}: {a.indices!r} vs {b.indices!r}')
    B = _align(b, a.indices)
    r = function.add(a.array, B) if op == '+' else function.subtract(a.array, B)
    return _Frag(r, a.indices)


class _Parser:

    def __init__(self, namespace, s):
        self.ns = namespace
        self.s = s
        self.toks = _tokenize(s)
        self.pos = 0

    def peek(self, k=0):
        return self.toks[self.pos + k] if self.pos + k < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise ExpressionSyntaxError(f'unexpected end of expression {self.s!r}')
        self.pos += 1
        return t

    def expect(self, kind):
        t = self.next()
        if t.kind != kind:
            raise ExpressionSyntaxError(f'expected {kind} but found {t.text!r} in {self.s!r}')
        return t

    # expression := ['-'] term (('+'|'-') term)*
    def parse_expression(self):
        neg = False
        t = self.peek()
        if t is not None and t.kind == 'minus':
            self.next()
            neg = True
        frag = self.parse_term()
        if neg:
            frag = _Frag(function.negative(frag.array), frag.indices)
        while True:
            t = self.peek()
            if t is None or t.kind not in ('plus', 'minus'):
                break
            op = self.next().text
            rhs = self.parse_term()
            frag = _addsub(frag, rhs, op, self.s)
        return frag

    # term := factors ['/' factors]...
    def parse_term(self):
        frag = self.parse_factors(allow_leading_number=True)
        while True:
            t = self.peek()
            if t is None or t.kind != 'slash':
                break
            self.next()
            den = self.parse_factors(allow_leading_number=True)
            if den.indices:
                raise ExpressionSyntaxError(f'denominator must be scalar in {self.s!r}')
            frag = _Frag(function.divide(frag.array, den.array), frag.indices)
        return frag

    def parse_factors(self, allow_leading_number):
        frag = self.parse_factor(allow_number=allow_leading_number)
        summed = set()
        while True:
            t = self.peek()
            if t is None or t.kind in ('plus', 'minus', 'slash', 'rpar', 'rbrk', 'rbrc'):
                break
            if not t.spaced and t.kind not in ('name', 'number', 'lpar', 'lbrk', 'lbrc'):
                break
            rhs = self.parse_factor(allow_number=False)
            reused = (set(frag.indices) | set(rhs.indices)) & summed
            if reused:
                raise ExpressionSyntaxError(
                    f'index {sorted(reused)[0]!r} occurs more than twice in a term of {self.s!r}')
            summed |= set(frag.indices) & set(rhs.indices)
            frag = _mul(frag, rhs, self.s)
        return frag

    # factor := atom ['^' exponent]
    def parse_factor(self, allow_number):
        frag = self.parse_atom(allow_number)
        t = self.peek()
        if t is not None and t.kind == 'pow':
            self.next()
            exp = self.parse_exponent()
            frag = _Frag(function.power(frag.array, exp), frag.indices)
        return frag

    def parse_exponent(self):
        t = self.next()
        if t.kind == 'minus':
            t2 = self.expect('number')
            return -_number(t2.text)
        if t.kind == 'number':
            return _number(t.text)
        if t.kind == 'lpar':
            frag = self.parse_expression()
            self.expect('rpar')
            if frag.indices:
                raise ExpressionSyntaxError(f'exponent must be scalar in {self.s!r}')
            return frag.array
        if t.kind == 'name':
            frag = self._resolve(t.text, '')
            if frag.indices:
                raise ExpressionSyntaxError(f'exponent must be scalar in {self.s!r}')
            return frag.array
        raise ExpressionSyntaxError(f'invalid exponent near {t.text!r} in {self.s!r}')

    def parse_atom(self, allow_number):
        t = self.next()
        if t.kind == 'number':
            if not allow_number:
                raise ExpressionSyntaxError(f'numbers are only allowed at the start of a term: {self.s!r}')
            return _Frag(function.asarray(_number(t.text)), '')
        if t.kind == 'lpar':
            frag = self.parse_expression()
            self.expect('rpar')
            return frag
        if t.kind == 'lbrk':
            frag = self.parse_expression()
            self.expect('rbrk')
            return _Frag(function.jump(frag.array), frag.indices)
        if t.kind == 'lbrc':
            frag = self.parse_expression()
            self.expect('rbrc')
            return _Frag(function.mean(frag.array), frag.indices)
        if t.kind == 'name':
            name = t.text
            indices = ''
            nt = self.peek()
            if nt is not None and nt.kind == 'under' and not nt.spaced:
                self.next()
                it = self.next()
                if it.kind not in ('name', 'number') or not it.text.isalnum():
                    raise ExpressionSyntaxError(f'expected indices after underscore in {self.s!r}')
                indices = it.text
                # a digit-leading subscript tokenizes as number + name
                # ('t3_0jk' -> '0', 'jk'): keep consuming adjacent runs
                while True:
                    ct2 = self.peek()
                    if ct2 is None or ct2.spaced or ct2.kind not in ('name', 'number') \
                            or not ct2.text.isalnum():
                        break
                    indices += self.next().text
            # function call: name or name_gen directly followed by '('
            ct = self.peek()
            if ct is not None and ct.kind == 'lpar' and not ct.spaced:
                value = getattr(self.ns, name, None)
                if value is None:
                    raise ExpressionSyntaxError(f'unknown function {name!r} in {self.s!r}')
                if not callable(value):
                    raise ExpressionSyntaxError(f'{name!r} is not callable in {self.s!r}')
                self.next()
                arg = self.parse_expression()
                self.expect('rpar')
                out = function.asarray(value(arg.array))
                ngen = out.ndim - arg.array.ndim
                if len(indices) != ngen:
                    raise ExpressionSyntaxError(
                        f'function {name!r} generates {ngen} axes but {len(indices)} indices given in {self.s!r}')
                frag = _Frag(out, arg.indices + indices)
                return _trace_repeated(frag, self.s)
            return self._resolve(name, indices)
        raise ExpressionSyntaxError(f'unexpected {t.text!r} in {self.s!r}')

    def _resolve(self, name, indices):
        value = getattr(self.ns, name, None)
        if value is None:
            raise ExpressionSyntaxError(f'unknown variable {name!r} in expression {self.s!r}')
        arr = function.asarray(value)
        if len(indices) != arr.ndim:
            raise ExpressionSyntaxError(
                f'variable {name!r} has {arr.ndim} axes but got indices {indices!r} in {self.s!r}')
        # numeral indices select items
        out_indices = ''
        for ch in indices:
            if ch.isdigit():
                ax = len(out_indices)
                arr = function.getitem(arr, (slice(None),) * ax + (int(ch),))
            else:
                out_indices += ch
        return _trace_repeated(_Frag(arr, out_indices), self.s)


def _trace_repeated(frag, s):
    arr, indices = frag.array, frag.indices
    while True:
        dup = None
        for i, ch in enumerate(indices):
            j = indices.find(ch, i + 1)
            if j != -1:
                dup = (i, j, ch)
                break
        if dup is None:
            return _Frag(arr, indices)
        i, j, ch = dup
        if indices.count(ch) > 2:
            raise ExpressionSyntaxError(f'index {ch!r} repeated more than twice in {s!r}')
        arr = function.trace(arr, i, j)
        indices = ''.join(c for k, c in enumerate(indices) if k not in (i, j))


def _number(text):
    return float(text) if ('.' in text or 'e' in text or 'E' in text) else float(int(text))


def parse(string, namespace):
    p = _Parser(namespace, string)
    frag = p.parse_expression()
    if p.peek() is not None:
        raise ExpressionSyntaxError(f'unexpected trailing input {p.peek().text!r} in {string!r}')
    return frag


def _grad(geom, spaces, arg):
    return function.grad(arg, geom)


def _curl(geom, spaces, arg):
    '''Two-generated-axes curl: curl_ki(u...) = ε_kji ∇_j(u...), used as
    curl_ki(u_i) (reference: expression_v2.py:542,714).'''
    arg = function.asarray(arg)
    g = function.grad(arg, geom)  # [..., j]
    g = function.insertaxis(g, g.ndim - 1, 3)   # [..., k, j]
    g = function.insertaxis(g, g.ndim, 3)       # [..., k, j, i]
    eps = function.levicivita(3)                # [k, j, i]
    return function.sum_(function.multiply(g, eps), g.ndim - 2)  # [..., k, i]


class Namespace:
    '''Namespace with expression-string assignment (reference:
    expression_v2.py:546).

    Attribute assignment parses tensor-index expression strings into
    :class:`nutils_tpu.function.Array` objects; ``expr @ ns`` evaluates an
    expression in the namespace:

    >>> import numpy
    >>> from nutils_tpu import mesh, function
    >>> from nutils_tpu.expression import Namespace
    >>> ns = Namespace()
    >>> topo, ns.x = mesh.rectilinear([2, 2])
    >>> ns.define_for('x', gradient='∇', jacobians=('dV', 'dS'))
    >>> ns.u = 'x_0^2 + sin(x_1)'
    >>> ns.v_i = '∇_i(u)'
    >>> smp = topo.locate(ns.x, numpy.array([[1.0, 0.5]]), tol=1e-12)
    >>> vals = numpy.asarray(smp.eval('v_i' @ ns, {}))
    >>> numpy.round(vals, 10).tolist()
    [[2.0, 0.8775825619]]
    '''

    def __init__(self):
        self.opposite = function.opposite
        self.sin = function.sin
        self.cos = function.cos
        self.tan = function.tan
        self.sinh = function.sinh
        self.cosh = function.cosh
        self.tanh = function.tanh
        self.arcsin = function.arcsin
        self.arccos = function.arccos
        self.arctan = function.arctan
        self.arctanh = function.arctanh
        self.exp = function.exp
        self.abs = function.abs_
        self.ln = function.ln
        self.log = function.ln
        self.log2 = function.log2
        self.log10 = function.log10
        self.sqrt = function.sqrt
        self.sign = function.sign
        self.conj = function.conjugate
        self.real = function.real
        self.imag = function.imag

    def __setattr__(self, attr, value):
        name, underscore, indices = attr.partition('_')
        if isinstance(value, (int, float, complex, numpy.ndarray)):
            value = function.asarray(value)
        if isinstance(value, function._DISPATCHEES):
            # unit-carrying wrappers (SI.Quantity) are stored as-is; the
            # fragment operations dispatch through the function layer
            if underscore:
                raise AttributeError('cannot assign an array to an attribute with an underscore')
            object.__setattr__(self, name, value)
        elif isinstance(value, function.Array):
            if underscore:
                raise AttributeError('cannot assign an array to an attribute with an underscore')
            object.__setattr__(self, name, value)
        elif isinstance(value, str):
            frag = parse(value, self)
            if set(frag.indices) != set(indices) or len(set(indices)) != len(indices):
                raise AttributeError(
                    f'expression indices {frag.indices!r} do not match attribute indices {indices!r}')
            arr = _align(frag, indices) if frag.indices != indices else frag.array
            object.__setattr__(self, name, arr)
        elif callable(value):
            if underscore:
                raise AttributeError('cannot assign a function to an attribute with an underscore')
            object.__setattr__(self, name, value)
        else:
            raise AttributeError(f'cannot assign {type(value)} to namespace')

    def __rmatmul__(self, expression):
        if isinstance(expression, str):
            frag = parse(expression, self)
            out = ''.join(sorted(frag.indices))
            return _align(frag, out) if frag.indices != out else frag.array
        if isinstance(expression, (tuple, list)):
            return type(expression)(item @ self for item in expression)
        return NotImplemented

    def define_for(self, __name, *, gradient=None, curl=None, normal=None, jacobians=(), spaces=None):
        '''Define gradient/normal/jacobian helpers for a geometry
        (reference: expression_v2.py:668).'''
        import functools
        geom = getattr(self, __name)
        if gradient:
            setattr(self, gradient, functools.partial(_grad, geom, spaces))
        if curl:
            if geom.shape != (3,):
                raise ValueError('curl requires a 3-D geometry')
            setattr(self, curl, functools.partial(_curl, geom, spaces))
        if normal:
            setattr(self, normal, function.normal(geom))
        size = geom.shape[0] if geom.ndim else 1
        for i, jacobian in enumerate(jacobians):
            if i > size:
                raise ValueError(f'cannot define jacobian {jacobian!r}: dimension is negative')
            setattr(self, jacobian, function.jacobian(geom, size - i))

    def add_field(self, __names, *__bases, shape=(), dtype=float):
        for name in (__names,) if isinstance(__names, str) else __names:
            setattr(self, name, function.field(name, *__bases, shape=shape, dtype=dtype))

    def copy_(self, **replacements):
        ns = Namespace()
        for attr, value in vars(self).items():
            if replacements and isinstance(value, function.Array):
                value = function.replace_arguments(value, replacements)
            object.__setattr__(ns, attr, value)
        return ns
