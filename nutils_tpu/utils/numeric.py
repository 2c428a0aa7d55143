'''Host-side numpy helpers.

Includes the lossy asinh-quantized float packing used for regression data.
The packed format is defined by its mathematical spec (reference:
numeric.py:321-420 ``pack``/``unpack`` docstrings): an integer ``n`` maps to
``sinh(n*rtol)*atol/rtol`` with the extreme integers reserved for +/-inf and
NaN.  Our implementation is written from that spec so the reference's embedded
base64 regression strings can be consumed verbatim (bit-compatible).
'''

import numpy


def unpack(n, atol, rtol):
    '''Decode asinh-packed signed integers to floats.

    The most negative integer decodes to NaN, +/-(maximum) to +/-inf, and any
    other value ``n`` to ``sinh(n*rtol) * atol/rtol``, giving absolute spacing
    ``atol`` near zero and relative spacing ``rtol`` in the bulk of the range.
    '''
    n = numpy.asarray(n)
    iinfo = numpy.iinfo(n.dtype)
    assert iinfo.kind == 'i', 'packed data must be signed integers'
    a = numpy.asarray(numpy.sinh(n * rtol) * (atol / rtol))
    a[numpy.equal(n, iinfo.max)] = numpy.inf
    a[numpy.equal(n, -iinfo.max)] = -numpy.inf
    a[numpy.equal(n, iinfo.min)] = numpy.nan
    return a[()]


def pack(a, atol, rtol, dtype):
    '''Encode floats as asinh-quantized signed integers (inverse of unpack).

    Values are clipped to the representable range (mapping to +/-inf on
    decode); NaN maps to the most negative integer.
    '''
    iinfo = numpy.iinfo(dtype)
    assert iinfo.kind == 'i', 'dtype must be a signed integer type'
    amax = numpy.sinh(iinfo.max * rtol) * (atol / rtol)
    a = numpy.asarray(a)
    # NaN lanes survive clip/arcsinh and would warn on the integer cast; the
    # cast result there is discarded (overwritten with iinfo.min below), so
    # silence the invalid-cast warning deliberately.
    with numpy.errstate(invalid='ignore'):
        n = numpy.asarray((numpy.arcsinh(a.clip(-amax, amax) * (rtol / atol)) / rtol).round().astype(iinfo.dtype))
    n[numpy.isnan(a)] = iinfo.min
    return n[()]


def base64_pack(a, atol=2e-15, rtol=2e-3, dtype='int16'):
    '''Pack a float array into the zlib+base64 string format of regression data.'''
    import binascii
    import zlib
    s = binascii.b2a_base64(zlib.compress(pack(a, atol, rtol, dtype).tobytes(), 9)).decode().rstrip()
    return s


def base64_unpack(s, atol=2e-15, rtol=2e-3, dtype='int16'):
    '''Decode a zlib+base64 regression string into a flat float array.'''
    import binascii
    import zlib
    return unpack(numpy.frombuffer(zlib.decompress(binascii.a2b_base64(s)), dtype=dtype), atol, rtol)


def compress_indices(rows, nrows):
    '''Convert sorted COO row indices to a CSR row-pointer array.'''
    return numpy.concatenate([[0], numpy.cumsum(numpy.bincount(rows, minlength=nrows))]).astype(rows.dtype if rows.dtype.kind == 'i' else numpy.int64)

def accumulate(data, index, shape):
    '''Dense scatter-add: out[index] += data with multi-axis integer indices.'''
    out = numpy.zeros(shape, dtype=data.dtype)
    numpy.add.at(out, tuple(index), data)
    return out


def meshgrid(*args, dtype=None):
    '''Like numpy.meshgrid with ij-indexing, stacked along a first axis.'''
    grids = numpy.meshgrid(*args, indexing='ij')
    return numpy.stack(grids).astype(dtype) if dtype else numpy.stack(grids)


def isint(x):
    return isinstance(x, (int, numpy.integer))


def invmap(indices, length, missing=-1):
    '''Inverse of an injective index map: out[indices[i]] = i.'''
    out = numpy.full(length, missing, dtype=int)
    out[indices] = numpy.arange(len(indices))
    return out


def simplex_grid(shape, spacing):
    '''Equilateral-simplex point cloud filling the orthotope [0, shape] with
    nearest-neighbour distance ``spacing`` (reference: numeric.py:167): a
    rectangular grid with row spacings sqrt((1+i/2)/(1+i)), odd stripes
    staggered by half a step, recentered in the box.'''
    shape = numpy.asarray(shape, dtype=float)
    nd = len(shape)
    hs = [numpy.sqrt((1 + i / 2) / (1 + i)) * spacing for i in range(nd)]
    axes = [numpy.arange(0, shape[i], hs[i]) for i in range(nd)]
    grids = numpy.meshgrid(*axes, indexing='ij')
    for i in range(nd - 1):
        sl = (slice(None),) * (i + 1) + (slice(1, None, 2),)
        grids[i][sl] += hs[i] * (i + 1) / (i + 2)
    pts = numpy.stack([g.ravel() for g in grids], axis=1)
    pts = pts[(pts < shape).all(axis=1)]
    pts += (shape - pts.max(axis=0)) / 2
    return pts
