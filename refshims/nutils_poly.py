"""Pure-numpy nutils_poly shim implementing the reverse-lexicographic
multivariate polynomial layout the reference nutils depends on
(/root/reference/src/nutils/evaluable.py:4327-4340 defines the layout:
coefficient for powers j precedes that for k iff j_i > k_i at the *last*
non-matching index i; total degree sum(k) <= p).

Only used to run the reference on this host for CPU baseline measurements
(BASELINE.md items 1-2).  Not part of nutils_tpu — the TPU framework has its
own polynomial path (nutils_tpu/native/poly.cpp + evaluable.Monomials).

API surface mirrors the Rust crate as consumed by the reference:
degree, ncoeffs, eval_outer, MulVar, MulPlan, GradPlan, mul_same_vars,
mul_different_vars, change_degree, composition_with_inner_matrix.
"""

import enum
import functools
import itertools
from math import comb

import numpy


def ncoeffs(nvars, degree):
    '''Number of coefficients of a polynomial in `nvars` variables of total
    degree `degree`: C(degree+nvars, nvars).'''
    if degree < 0:
        raise ValueError('negative degree')
    return comb(int(degree) + nvars, nvars)


def degree(nvars, ncoeffs_):
    '''Inverse of :func:`ncoeffs`; raises ValueError if `ncoeffs_` does not
    correspond to a complete polynomial basis.'''
    ncoeffs_ = int(ncoeffs_)
    if ncoeffs_ < 1:
        raise ValueError('invalid ncoeffs')
    if nvars == 0:
        if ncoeffs_ != 1:
            raise ValueError('invalid ncoeffs for nvars=0')
        return 0
    d = 0
    while comb(d + nvars, nvars) < ncoeffs_:
        d += 1
    if comb(d + nvars, nvars) != ncoeffs_:
        raise ValueError('ncoeffs {} does not match a complete degree for nvars {}'.format(ncoeffs_, nvars))
    return d


@functools.lru_cache(maxsize=None)
def _powers(nvars, degree_):
    '''All multi-indices with total degree <= degree_ in canonical
    (descending reverse-lex) order, as an int array (ncoeffs, nvars).'''
    if nvars == 0:
        return numpy.zeros((1, 0), dtype=int)
    idx = [k for k in itertools.product(range(degree_ + 1), repeat=nvars) if sum(k) <= degree_]
    idx.sort(key=lambda k: tuple(reversed(k)), reverse=True)
    return numpy.array(idx, dtype=int)


@functools.lru_cache(maxsize=None)
def _index(nvars, degree_):
    '''dict: multi-index tuple -> position in the canonical layout.'''
    return {tuple(k): i for i, k in enumerate(_powers(nvars, degree_))}


def eval_outer(coeffs, points):
    '''Evaluate polynomials with coefficients `coeffs[..., c]` at
    `points[..., v]`, with outer broadcasting: result shape is
    points.shape[:-1] + coeffs.shape[:-1].'''
    coeffs = numpy.asarray(coeffs, dtype=float)
    points = numpy.asarray(points, dtype=float)
    nvars = points.shape[-1]
    d = degree(nvars, coeffs.shape[-1])
    pw = _powers(nvars, d)  # (ncoeffs, nvars)
    mon = numpy.prod(points[..., None, :] ** pw, axis=-1)  # points.shape[:-1] + (ncoeffs,)
    return numpy.tensordot(mon, coeffs, axes=(-1, -1))


class MulVar(enum.Enum):
    Left = 0
    Right = 1
    Both = 2

    def __repr__(self):
        return 'MulVar.' + self.name


class MulPlan:
    '''Plan for multiplying two polynomials.  `vars[i]` declares whether
    output variable i exists in the left operand, the right, or both.
    Calling the plan with coefficient arrays returns the coefficients of the
    product in the combined variable set.'''

    def __init__(self, vars, degree_left, degree_right):
        vars = tuple(vars)
        nvars = len(vars)
        dl = int(degree_left)
        dr = int(degree_right)
        left_vars = [i for i, v in enumerate(vars) if v != MulVar.Right]
        right_vars = [i for i, v in enumerate(vars) if v != MulVar.Left]
        pl = _powers(len(left_vars), dl)
        pr = _powers(len(right_vars), dr)
        dout = dl + dr
        nout = ncoeffs(nvars, dout)
        lookup = _index(nvars, dout)
        # dense matrix: prod[pair] -> out coefficients, pair = (il, ir) raveled
        mat = numpy.zeros((len(pl) * len(pr), nout))
        for il, kl in enumerate(pl):
            for ir, kr in enumerate(pr):
                full = [0] * nvars
                for v, p in zip(left_vars, kl):
                    full[v] += int(p)
                for v, p in zip(right_vars, kr):
                    full[v] += int(p)
                mat[il * len(pr) + ir, lookup[tuple(full)]] = 1.0
        self._mat = mat
        self._nl = len(pl)
        self._nr = len(pr)
        self.vars = vars

    @classmethod
    def same_vars(cls, nvars, degree_left, degree_right):
        return cls((MulVar.Both,) * nvars, degree_left, degree_right)

    @classmethod
    def different_vars(cls, nvars_left, nvars_right, degree_left, degree_right):
        return cls((MulVar.Left,) * nvars_left + (MulVar.Right,) * nvars_right, degree_left, degree_right)

    def __call__(self, coeffs_left, coeffs_right):
        a = numpy.asarray(coeffs_left, dtype=float)
        b = numpy.asarray(coeffs_right, dtype=float)
        assert a.shape[-1] == self._nl and b.shape[-1] == self._nr
        pairs = a[..., :, None] * b[..., None, :]
        pairs = pairs.reshape(*pairs.shape[:-2], self._nl * self._nr)
        return pairs @ self._mat


class GradPlan:
    '''Plan for the gradient of a polynomial in `nvars` variables of total
    degree `degree`.  Calling the plan with coefficients (..., ncoeffs)
    returns (..., nvars, ncoeffs_out) with ncoeffs_out at degree-1.'''

    def __init__(self, nvars, degree_):
        d = int(degree_)
        self.nvars = nvars
        pin = _powers(nvars, d)
        dout = max(0, d - 1)
        nout = ncoeffs(nvars, dout)
        lookup = _index(nvars, dout)
        G = numpy.zeros((nvars, nout, len(pin)))
        for i, k in enumerate(pin):
            for v in range(nvars):
                if k[v] > 0:
                    kd = list(k)
                    kd[v] -= 1
                    G[v, lookup[tuple(kd)], i] = float(k[v])
        self._G = G

    def __call__(self, coeffs):
        coeffs = numpy.asarray(coeffs, dtype=float)
        return numpy.einsum('...c,voc->...vo', coeffs, self._G)


def mul_same_vars(coeffs_left, coeffs_right, nvars):
    coeffs_left = numpy.asarray(coeffs_left, dtype=float)
    coeffs_right = numpy.asarray(coeffs_right, dtype=float)
    dl = degree(nvars, coeffs_left.shape[-1])
    dr = degree(nvars, coeffs_right.shape[-1])
    return MulPlan((MulVar.Both,) * nvars, dl, dr)(coeffs_left, coeffs_right)


def mul_different_vars(coeffs_left, coeffs_right, nvars_left, nvars_right):
    coeffs_left = numpy.asarray(coeffs_left, dtype=float)
    coeffs_right = numpy.asarray(coeffs_right, dtype=float)
    dl = degree(nvars_left, coeffs_left.shape[-1])
    dr = degree(nvars_right, coeffs_right.shape[-1])
    vars = (MulVar.Left,) * nvars_left + (MulVar.Right,) * nvars_right
    return MulPlan(vars, dl, dr)(coeffs_left, coeffs_right)


def change_degree(coeffs, nvars, degree_):
    '''Embed coefficients into the (larger) layout of total degree `degree_`.'''
    coeffs = numpy.asarray(coeffs, dtype=float)
    dold = degree(nvars, coeffs.shape[-1])
    dnew = int(degree_)
    if dnew < dold:
        raise ValueError('cannot lower degree')
    pold = _powers(nvars, dold)
    lookup = _index(nvars, dnew)
    out = numpy.zeros((*coeffs.shape[:-1], ncoeffs(nvars, dnew)))
    newidx = numpy.array([lookup[tuple(k)] for k in pold], dtype=int)
    out[..., newidx] = coeffs
    return out


def _mul_dense(a, b, nvars, da, db):
    '''coefficient vectors a (degree da), b (degree db) -> product (da+db).'''
    pa = _powers(nvars, da)
    pb = _powers(nvars, db)
    lookup = _index(nvars, da + db)
    out = numpy.zeros(ncoeffs(nvars, da + db))
    nz_a = numpy.nonzero(a)[0]
    nz_b = numpy.nonzero(b)[0]
    for i in nz_a:
        ka = pa[i]
        for j in nz_b:
            out[lookup[tuple(ka + pb[j])]] += a[i] * b[j]
    return out


def composition_with_inner_matrix(inner, nvars_outer, nvars_inner, degree_):
    '''Matrix M such that for outer coefficients c (over nvars_outer, total
    degree `degree_`), einsum('ij,...j->...i', M, c) gives the coefficients
    of the composed polynomial x -> p(q(x)) over the inner variables, where
    q_i is given by inner[i] (coefficients over nvars_inner).  For affine
    inner maps (degree 1) the composed degree equals `degree_` and M is
    square.'''
    inner = numpy.asarray(inner, dtype=float)
    assert inner.shape[0] == nvars_outer
    dinner = degree(nvars_inner, inner.shape[-1])
    d = int(degree_)
    dcomp = d * dinner if d else 0
    pout = _powers(nvars_outer, d)
    nin = ncoeffs(nvars_inner, dcomp)
    M = numpy.zeros((nin, len(pout)))
    # precompute powers of each inner poly up to degree d
    pows = []  # pows[i][m] = inner_i^m as coeff vector at degree m*dinner
    for i in range(nvars_outer):
        pi = [numpy.ones(1)]
        for m in range(1, d + 1):
            pi.append(_mul_dense(pi[-1], inner[i], nvars_inner, (m - 1) * dinner, dinner))
        pows.append(pi)
    for j, k in enumerate(pout):
        term = numpy.ones(1)
        dterm = 0
        for i in range(nvars_outer):
            if k[i]:
                term = _mul_dense(term, pows[i][k[i]], nvars_inner, dterm, int(k[i]) * dinner)
                dterm += int(k[i]) * dinner
        if dterm < dcomp:
            term = change_degree(term, nvars_inner, dcomp)
        M[:, j] = term
    return M
