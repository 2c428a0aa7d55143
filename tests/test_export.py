'''Export suite (reference scope model: tests/test_export.py): byte-level
legacy-binary-VTK checks with expectations built independently via struct,
plus triplot smoke/contract tests across 1-D/2-D/3-D.'''

import io
import struct

import numpy
import pytest

import matplotlib
matplotlib.use('Agg')

from nutils_tpu import export


# ----------------------------------------------------------------- vtk

def be(fmt, *vals):
    return struct.pack('>' + fmt, *vals)


def header(npoints, tname):
    return (b'# vtk DataFile Version 3.0\nvtk output\nBINARY\nDATASET UNSTRUCTURED_GRID\n'
            + f'POINTS {npoints} {tname}\n'.encode())


def cells_block(cells):
    ncells, nverts = cells.shape
    out = f'CELLS {ncells} {ncells * (nverts + 1)}\n'.encode()
    for c in cells:
        out += be('I', nverts) + b''.join(be('I', v) for v in c)
    out += f'\nCELL_TYPES {ncells}\n'.encode()
    ct = {2: 3, 3: 5, 4: 10}[nverts]
    out += be('I', ct) * ncells + b'\n'
    return out


def write_vtk(cells, points, **data):
    buf = io.BytesIO()
    export.vtk(buf, numpy.asarray(cells), points, **data)
    return buf.getvalue()


def test_vtk_line_f4():
    points = numpy.array([[0.], [1.], [2.], [3.]], dtype='f4')
    cells = numpy.array([[0, 1], [1, 2], [2, 3]])
    got = write_vtk(cells, points)
    exp = header(4, 'float')
    for x in (0., 1., 2., 3.):
        exp += be('fff', x, 0., 0.)
    exp += b'\n' + cells_block(cells)
    assert got == exp


def test_vtk_triangle_f8_pointdata_scalar():
    points = numpy.array([[0, 0], [0, 1], [1, 0], [1, 1]], dtype='f8')
    cells = numpy.array([[0, 1, 2], [1, 2, 3]])
    p = numpy.arange(4, dtype='f8')
    got = write_vtk(cells, points, p=p)
    exp = header(4, 'double')
    for xy in points:
        exp += be('ddd', xy[0], xy[1], 0.)
    exp += b'\n' + cells_block(cells)
    exp += b'POINT_DATA 4\nSCALARS p double 1\nLOOKUP_TABLE default\n'
    exp += b''.join(be('d', v) for v in p) + b'\n'
    assert got == exp


def test_vtk_vectors_padded_to_three():
    points = numpy.array([[0, 0], [0, 1], [1, 0], [1, 1]], dtype='f4')
    cells = numpy.array([[0, 1, 2], [1, 2, 3]])
    v = numpy.arange(8, dtype='f4').reshape(4, 2)
    got = write_vtk(cells, points, v=v)
    tail = got.split(b'POINT_DATA 4\n')[1]
    assert tail.startswith(b'VECTORS v float\n')
    body = tail[len(b'VECTORS v float\n'):-1]
    exp = b''.join(be('fff', row[0], row[1], 0.) for row in v)
    assert body == exp


def test_vtk_tensors_padded_to_three_by_three():
    points = numpy.array([[0, 0], [0, 1], [1, 0], [1, 1]], dtype='f4')
    cells = numpy.array([[0, 1, 2], [1, 2, 3]])
    t = numpy.arange(16, dtype='i1').reshape(4, 2, 2)
    got = write_vtk(cells, points, t=t)
    tail = got.split(b'POINT_DATA 4\n')[1]
    assert tail.startswith(b'TENSORS t char\n')
    body = tail[len(b'TENSORS t char\n'):-1]
    exp = b''
    for blk in t:
        padded = numpy.zeros((3, 3), dtype='i1')
        padded[:2, :2] = blk
        exp += padded.tobytes()
    assert body == exp


def test_vtk_celldata_vs_pointdata_by_length():
    points = numpy.array([[0, 0, 0], [0, 1, 0], [1, 0, 0], [0, 0, 1]], dtype='f4')
    cells = numpy.array([[0, 1, 2, 3]])  # one tet
    got = write_vtk(cells, points, c=numpy.array([7], dtype='i1'),
                    p=numpy.arange(4, dtype='i2'))
    assert b'POINT_DATA 4\nSCALARS p short 1\nLOOKUP_TABLE default\n' in got
    assert b'CELL_DATA 1\nSCALARS c char 1\nLOOKUP_TABLE default\n' in got
    # point data precedes cell data
    assert got.index(b'POINT_DATA') < got.index(b'CELL_DATA')
    # tet cell type id 10
    assert be('I', 10) in got.split(b'CELL_TYPES 1\n')[1][:4]


def test_vtk_integer_type_names():
    points = numpy.array([[0, 0], [0, 1], [1, 0], [1, 1]], dtype='i4')
    cells = numpy.array([[0, 1, 2], [1, 2, 3]])
    got = write_vtk(cells, points,
                    a=numpy.arange(4, dtype='u1'),
                    b=numpy.arange(4, dtype='u2'),
                    c=numpy.arange(4, dtype='i4'))
    assert got.startswith(header(4, 'int'))
    assert b'SCALARS a unsigned_char 1' in got
    assert b'SCALARS b unsigned_short 1' in got
    assert b'SCALARS c int 1' in got


def test_vtk_int64_narrowing():
    points = numpy.array([[0, 0], [0, 1], [1, 0], [1, 1]], dtype='f4')
    cells = numpy.array([[0, 1, 2], [1, 2, 3]])
    got = write_vtk(cells, points, n=numpy.arange(4))  # default int64
    assert b'SCALARS n int 1' in got
    with pytest.raises(ValueError, match='64-bit'):
        write_vtk(cells, points, n=numpy.array([2 ** 40] * 4))


def test_vtk_rejects_unmatched_length_and_bad_shape():
    points = numpy.array([[0, 0], [0, 1], [1, 0], [1, 1]], dtype='f4')
    cells = numpy.array([[0, 1, 2], [1, 2, 3]])
    with pytest.raises(ValueError, match='neither points'):
        write_vtk(cells, points, bad=numpy.arange(3, dtype='f4'))
    with pytest.raises(ValueError, match='no VTK representation'):
        write_vtk(cells, points, bad=numpy.zeros((4, 5), dtype='f4'))


def test_vtk_filename_and_suffix(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    points = numpy.array([[0.], [1.]], dtype='f8')
    cells = numpy.array([[0, 1]])
    export.vtk('out', cells, points)
    data = (tmp_path / 'out.vtk').read_bytes()
    assert data == write_vtk(cells, points)


# ----------------------------------------------------------------- triplot

@pytest.fixture
def simplex():
    def make(ndims):
        coords = numpy.zeros([ndims + 1, ndims])
        coords[1:] = numpy.eye(ndims)
        tri = numpy.arange(ndims + 1)[numpy.newaxis]
        hull = numpy.array([tri[0, ~m] for m in numpy.eye(ndims + 1, dtype=bool)])
        if ndims == 3:
            tri = hull
            hull = numpy.array([[i, j] for i in range(4) for j in range(i)])
        values = numpy.arange(ndims + 1, dtype=float) * ndims
        return coords, tri, hull, values
    return make


@pytest.mark.parametrize('ndims', [1, 2, 3])
def test_triplot_filename(tmp_path, monkeypatch, simplex, ndims):
    monkeypatch.chdir(tmp_path)
    coords, tri, hull, values = simplex(ndims)
    export.triplot('test.png', coords, values, tri=tri, hull=hull)
    p = tmp_path / 'test.png'
    assert p.exists() and p.read_bytes()[:8] == b'\x89\x50\x4E\x47\x0D\x0A\x1A\x0A'


@pytest.mark.parametrize('ndims', [1, 2, 3])
def test_triplot_axes_mode(simplex, ndims):
    import matplotlib.pyplot as plt
    coords, tri, hull, values = simplex(ndims)
    fig = plt.figure()
    try:
        ax = fig.add_subplot(111, projection='3d' if ndims == 3 else None)
        im = export.triplot(ax, coords, values, tri=tri, hull=hull)
        if ndims == 1:
            assert im is None
        elif ndims == 2:
            numpy.testing.assert_array_equal(im.get_array(), values)
        else:
            numpy.testing.assert_array_equal(im.get_array(), values[tri].mean(1))
    finally:
        plt.close(fig)


def test_triplot_rejects_bad_points():
    with pytest.raises(ValueError, match='2-dimensional'):
        export.triplot('x.png', numpy.zeros(4))
    with pytest.raises(ValueError, match='invalid spatial dimension'):
        export.triplot('x.png', numpy.zeros((4, 5)))


def test_plotlines_both_orientations():
    import matplotlib.pyplot as plt
    fig = plt.figure()
    try:
        ax = fig.add_subplot(111)
        xy = numpy.array([[0., 0.], [1., 0.], [1., 1.], [0., 1.]])
        lines = numpy.array([[0, 1], [2, 3]])
        lc1 = export.plotlines_(ax, xy.T, lines)  # reference contract [ndims, npoints]
        lc2 = export.plotlines_(ax, xy, lines)    # tolerated [npoints, ndims]
        seg1 = numpy.asarray(lc1.get_segments())
        seg2 = numpy.asarray(lc2.get_segments())
        numpy.testing.assert_array_equal(seg1, seg2)
        numpy.testing.assert_array_equal(seg1, xy[lines])
    finally:
        plt.close(fig)
