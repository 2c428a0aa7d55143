'''B-spline basis construction (host-side setup, numpy).

Computes, per knot span, the polynomial coefficients (power basis in the local
coordinate t in [0,1]) of the p+1 B-splines supported on that span, via the
standard Piegl-Tiller "basis funs" recurrence (The NURBS Book, Algorithm A2.2)
carried out in exact polynomial arithmetic.  Knot-vector semantics (default
multiplicities, boundary clamping, periodic wrap-around, dof offsets) follow
the reference's spline basis contract (reference: topology.py:2209-2361) so
that dof numbering matches the regression data.

Coefficient layout: ``coeffs[ielem, ifunc, k]`` is the coefficient of t**k of
local basis function ``ifunc``; global 1-D dof of (ielem, ifunc) is
``(offset[ielem] + ifunc) % ndofs``.
'''

import numpy


def _basisfuns_poly(lknots):
    '''Coefficients [p+1, p+1] of the B-splines on the central span of the
    2p-vector ``lknots`` as polynomials in local t (span endpoints map to 0,1).
    '''
    p = len(lknots) // 2
    assert len(lknots) == 2 * p
    # polynomial xi(t) = t * (k_p - k_{p-1}) + k_{p-1}, coefficients lowest-first
    a = lknots[p] - lknots[p - 1]
    b = lknots[p - 1]
    assert a > 0, 'degenerate knot span'

    def shift(poly, c):
        # poly(t) * (xi(t) + c) = poly * (a t + (b + c))
        out = numpy.zeros(len(poly) + 1)
        out[:-1] += poly * (b + c)
        out[1:] += poly * a
        return out

    N = [numpy.array([1.0])]
    for i in range(p):
        saved = numpy.array([0.0])
        newN = []
        for r in range(i + 1):
            denom = lknots[p + r] - lknots[p + r - i - 1]
            temp = N[r] / denom
            # right[r] = lknots[p+r] - xi;  left[i-r] = xi - lknots[p-i+r-1]
            right_term = shift(-temp, 0)  # -xi * temp
            right_term[:-1] += lknots[p + r] * temp
            newN.append(_padd(saved, right_term))
            left_term = shift(temp, 0)
            left_term[:-1] -= lknots[p - (i - r) - 1] * temp
            saved = left_term
        newN.append(saved)
        N = newN
    out = numpy.zeros((p + 1, p + 1))
    for i, Ni in enumerate(N):
        out[i, :len(Ni)] = Ni
    return out


def _padd(a, b):
    n = max(len(a), len(b))
    out = numpy.zeros(n)
    out[:len(a)] += a
    out[:len(b)] += b
    return out


def splinebasis_1d(nelems, degree, *, periodic=False, knotvalues=None, knotmultiplicities=None, continuity=-1):
    '''Per-dimension spline basis tables.

    Returns (offsets [nelems], coeffs [nelems, p+1, p+1], ndofs) with the dof
    and knot conventions of the reference (topology.py:2245-2323): default
    uniform knots, internal multiplicity p - c (c = continuity, default p-1),
    clamped ends (multiplicity p, plus one extra dof), and modular dof
    numbering for periodic splines.
    '''
    p = degree
    n = nelems
    if p == 0:  # piecewise constants: one dof per element
        return numpy.arange(n), numpy.ones((n, 1, 1)), n
    c = continuity
    if c < 0:
        c += p
    assert -1 <= c < p

    k = numpy.arange(n + 1, dtype=float) if knotvalues is None else numpy.asarray(knotvalues, dtype=float)
    while len(k) < n + 1:
        k_ = numpy.empty(len(k) * 2 - 1)
        k_[::2] = k
        k_[1::2] = (k[:-1] + k[1:]) / 2
        k = k_
    assert len(k) == n + 1, 'knot values do not match the topology size'

    if knotmultiplicities is None:
        m = numpy.repeat(p - c, n + 1)
    else:
        m = numpy.asarray(knotmultiplicities, dtype=int).copy()
        assert m.min() > 0 and m.max() <= p + 1
        assert len(m) == n + 1

    if periodic and not (m[0] == m[n] == p + 1):
        assert m[0] == m[n], 'periodic spline multiplicity mismatch'
        dk = k[n] - k[0]
        m = m[:n].copy()
        k = k[:n].copy()
        nd = int(m.sum())
        while m[n:].sum() < p - m[0] + 2:
            k = numpy.concatenate([k, k + dk])
            m = numpy.concatenate([m, m])
            dk *= 2
        km = numpy.repeat(k, m).astype(float)
        if p > m[0]:
            km = numpy.concatenate([km[-(p - m[0]):] - dk, km])
    else:
        m = m.copy()
        m[0] = m[-1] = p
        nd = int(m[:n].sum()) + 1
        km = numpy.repeat(k, m).astype(float)

    offsets = numpy.cumsum(m[:n]) - m[0]
    coeffs = numpy.empty((n, p + 1, p + 1))
    cache = {}
    for ielem, offset in enumerate(offsets):
        lknots = km[offset:offset + 2 * p]
        key = tuple(lknots - lknots[0]) if len(lknots) else ()
        if key not in cache:
            cache[key] = _basisfuns_poly(lknots)
        coeffs[ielem] = cache[key]
    return offsets.astype(int), coeffs, nd


def tensor_tables(offsets_per_dim, coeffs_per_dim, ndofs_per_dim, elem_multi_index):
    '''Combine per-dimension spline tables into per-element dof/coeff tables.

    ``elem_multi_index``: [nelems, ndims] int.  Returns (dofs [nelems, L],
    coeffs [nelems, L, K_1, ..., K_d]) with C-order local and global dof
    numbering (matching reference StructuredBasis, function.py:3082-3103):
    global dof = ((d_0 * n_1) + d_1) * n_2 + ...; local index l likewise over
    the per-dimension local function indices.
    '''
    ndims = len(offsets_per_dim)
    nelems = elem_multi_index.shape[0]
    dofs = None
    coeffs = None
    for i in range(ndims):
        p1, K = coeffs_per_dim[i].shape[1:]  # p+1 local functions, p+1 powers
        nd = ndofs_per_dim[i]
        idx = elem_multi_index[:, i]
        d_i = (offsets_per_dim[i].astype(numpy.int32)[idx][:, None]
               + numpy.arange(p1, dtype=numpy.int32)[None, :]) % numpy.int32(nd)  # [E, p+1]
        c_i = coeffs_per_dim[i][idx]  # [E, p+1, K]
        if dofs is None:
            dofs = d_i
            coeffs = c_i
        else:
            Lprev = dofs.shape[1]
            Kprev = coeffs.shape[2:]
            dofs = (dofs[:, :, None] * nd + d_i[:, None, :]).reshape(nelems, Lprev * p1)
            A = coeffs.reshape(nelems, Lprev, 1, int(numpy.prod(Kprev)), 1)
            B = c_i.reshape(nelems, 1, p1, 1, K)
            coeffs = (A * B).reshape((nelems, Lprev * p1) + Kprev + (K,))
    return dofs, coeffs


def tensor_tables_factored(offsets_per_dim, coeffs_per_dim, ndofs_per_dim, elem_multi_index):
    '''Variant-compressed version of :func:`tensor_tables`.

    On a structured grid almost every element shares the same local
    polynomial coefficients (all of them for uniform knots; all but the
    first/last ``p`` per dimension for clamped splines), so the dense
    ``[nelems, L, K...]`` coefficient table is a few distinct rows repeated
    ~nelems times.  Returns ``(dofs [E, L], variants [V, L, K...],
    vindex [E])`` with ``coeffs[e] == variants[vindex[e]]`` — O(n) host work
    and memory instead of O(nelems * L * prod(K)).
    '''
    ndims = len(offsets_per_dim)
    nelems = elem_multi_index.shape[0]
    dofs = None
    uniq = []      # per-dim unique coefficient rows [v_i, p+1, K_i]
    vcombo = numpy.zeros(nelems, dtype=numpy.int64)
    for i in range(ndims):
        ci = coeffs_per_dim[i]
        n_i, p1, K = ci.shape
        u, inv = numpy.unique(ci.reshape(n_i, p1 * K), axis=0, return_inverse=True)
        uniq.append(u.reshape(len(u), p1, K))
        idx = elem_multi_index[:, i]
        vcombo = vcombo * len(u) + inv[idx]
        nd = ndofs_per_dim[i]
        d_i = (offsets_per_dim[i].astype(numpy.int32)[idx][:, None]
               + numpy.arange(p1, dtype=numpy.int32)[None, :]) % numpy.int32(nd)  # [E, p+1]
        if dofs is None:
            dofs = d_i
        else:
            dofs = (dofs[:, :, None] * nd + d_i[:, None, :]).reshape(nelems, -1)
    realized, vindex = numpy.unique(vcombo, return_inverse=True)
    # decode each realized combo back to per-dim variant ids and build its row
    variants = None
    for i in range(ndims - 1, -1, -1):
        v_i = len(uniq[i])
        c_i = uniq[i][realized % v_i]  # [V, p+1, K_i]
        realized = realized // v_i
        if variants is None:
            variants = c_i
        else:
            V, p1, K = c_i.shape
            Lprev = variants.shape[1]
            Kprev = variants.shape[2:]
            A = c_i.reshape(V, p1, 1, K, 1)
            B = variants.reshape(V, 1, Lprev, 1, int(numpy.prod(Kprev)))
            variants = (A * B).reshape((V, p1 * Lprev, K) + Kprev)
    return dofs, variants, vindex.astype(numpy.int64)
