'''Visualization export (reference: export.py): mplfigure, triplot over 1-D/
2-D/3-D point sets, and legacy *binary* VTK unstructured-grid output with
point/cell data (reference: export.py:199).'''

import contextlib
import os

import numpy

from .utils import _log as log


@contextlib.contextmanager
def mplfigure(name, **kwargs):
    '''Context manager yielding a matplotlib figure saved to ``name`` on exit
    (reference: export.py:9).'''
    import matplotlib
    matplotlib.use('Agg', force=False)
    import matplotlib.pyplot as plt
    fig = plt.figure(**kwargs)
    try:
        yield fig
    finally:
        outdir = getattr(log, '_htmllog', [None])[0]
        if outdir is not None:
            name = os.path.join(outdir.outdir, name)
        fig.savefig(name)
        plt.close(fig)
        log.notify_figure(os.path.basename(name))
        log.info(f'saved figure {name}')


def _draw_1d(ax, points, values, tri, hull, cmap, clim, linewidth, linecolor, plabel, vlabel):
    if hull is not None:
        for x in points[hull[:, 0], 0]:
            ax.axvline(x, color=linecolor, linewidth=linewidth)
    if tri is not None:
        y = values if values is not None else numpy.zeros(len(points))
        for seg in tri:
            ax.plot(points[seg, 0], y[seg], color='C0')
    elif values is not None:
        ax.plot(points[:, 0], values, '.')
    if plabel:
        ax.set_xlabel(plabel)
    if vlabel:
        ax.set_ylabel(vlabel)
    ax.autoscale(enable=True, axis='x', tight=True)
    if clim is not None:
        ax.set_ylim(clim)
    return None


def _draw_2d(ax, points, values, tri, hull, cmap, clim, linewidth, linecolor, plabel, vlabel):
    im = None
    if values is not None and tri is not None:
        import matplotlib.tri
        t = matplotlib.tri.Triangulation(points[:, 0], points[:, 1], tri)
        im = ax.tripcolor(t, values, shading='gouraud', cmap=cmap, rasterized=True)
        if clim is not None:
            im.set_clim(clim)
    if hull is not None:
        plotlines_(ax, points.T, hull, colors=linecolor, linewidths=linewidth,
                   alpha=.5 if im is not None else 1)
    if plabel:
        ax.set_xlabel(plabel)
        ax.set_ylabel(plabel)
    ax.set_aspect('equal')
    ax.autoscale(enable=True, axis='both', tight=True)
    return im


def _draw_3d(ax, points, values, tri, hull, cmap, clim, linewidth, linecolor, plabel, vlabel):
    '''3-D data can only be triangulated on 2-D manifolds (e.g. the boundary
    of a volume); the hull wireframe is drawn without occlusion.'''
    im = None
    if tri is not None:
        im = ax.plot_trisurf(points[:, 0], points[:, 1], points[:, 2], triangles=tri,
                             cmap=cmap, rasterized=True, antialiased=True)
        if values is not None:
            im.set_array(numpy.nanmean(numpy.asarray(values)[tri], axis=1))
            if clim is not None:
                im.set_clim(clim)
    if hull is not None:
        plotlines_(ax, points.T, hull, colors=linecolor, linewidths=linewidth,
                   alpha=.5 if im is not None else 1)
    lo = points.min(axis=0)
    hi = points.max(axis=0)
    ax.set_xlim3d(lo[0], hi[0])
    ax.set_ylim3d(lo[1], hi[1])
    ax.set_zlim3d(lo[2], hi[2])
    if plabel:
        ax.set_xlabel(plabel)
        ax.set_ylabel(plabel)
        ax.set_zlabel(plabel)
    ax.set_box_aspect(hi - lo)  # equal aspect per unit length in all three axes
    return im


_DRAW = {1: _draw_1d, 2: _draw_2d, 3: _draw_3d}


def triplot(name, points, values=None, *, tri=None, hull=None, cmap='viridis', clim=None,
            linewidth=.1, linecolor='k', plabel=None, vlabel=None, **fig_kwargs):
    '''Plot a sampled scalar field over a triangulated point set
    (reference: export.py:109).  1-D domains render as graphs, 2-D as gouraud
    surface plots, 3-D (manifold triangulations) in an ortholinear projection.
    When ``name`` is a matplotlib axes object, draw into it and return the
    scalar mappable (the reference's axes-mode); when it is a filename, save
    the figure with a colorbar.'''
    points = numpy.asarray(points)
    if points.ndim != 2:
        raise ValueError(f'points must be a 2-dimensional array, got shape {points.shape}')
    nd = points.shape[1]
    draw = _DRAW.get(nd)
    if draw is None:
        raise ValueError(f'invalid spatial dimension: {nd}')
    args = points, values, tri, hull, cmap, clim, linewidth, linecolor, plabel, vlabel
    if not isinstance(name, str):
        return draw(name, *args)
    with mplfigure(name, **fig_kwargs) as fig:
        ax = fig.add_subplot(111, projection='3d' if nd == 3 else None)
        im = draw(ax, *args)
        if im is not None:
            fig.colorbar(im, ax=ax, label=vlabel, **(dict(shrink=.5, pad=.1) if nd == 3 else {}))


def plotlines_(ax, xy, lines, **kwargs):
    '''Add a line collection (element hulls) to an axis (reference:
    export.py:42); ``xy`` is [ndims, npoints] (the reference contract) or
    [npoints, ndims].'''
    xy = numpy.asarray(xy)
    if xy.shape[0] in (2, 3):  # reference contract: first axis is ndims
        xy = xy.T
    ndims = xy.shape[1]
    if ndims == 3:
        from mpl_toolkits.mplot3d.art3d import Line3DCollection as LineCollection
    else:
        from matplotlib.collections import LineCollection
    lc = LineCollection(xy[numpy.asarray(lines)], **kwargs)
    ax.add_collection(lc)
    return lc


# legacy VTK constants: cell type ids by vertex count (simplices only) and
# scalar type names, from the published VTK file-format spec
_VTK_CELLTYPE = {2: 3, 3: 5, 4: 10}  # VTK_LINE, VTK_TRIANGLE, VTK_TETRA
_VTK_TYPENAME = {'i1': 'char', 'u1': 'unsigned_char',
                 'i2': 'short', 'u2': 'unsigned_short',
                 'i4': 'int', 'u4': 'unsigned_int',
                 'f4': 'float', 'f8': 'double'}
_VTK_ATTR = {1: 'SCALARS {} {} 1\nLOOKUP_TABLE default\n',
             2: 'VECTORS {} {}\n',
             3: 'TENSORS {} {}\n'}


def _vtk_block(a):
    '''Big-endian copy of ``a`` with every trailing axis zero-padded to length
    3 (VTK vectors/tensors are always 3-component).  int64/float16 inputs are
    narrowed to the nearest VTK-expressible type (int64 loss-checked).'''
    a = numpy.asarray(a)
    if a.ndim > 3 or any(n > 3 for n in a.shape[1:]):
        raise ValueError(f'vtk: array of shape {a.shape} has no VTK representation '
                         '(at most rank-2 attributes with axes of length <= 3)')
    if a.dtype.kind in 'iu' and a.dtype.itemsize == 8:
        narrowed = a.astype(a.dtype.kind + '4')
        if not numpy.array_equal(narrowed, a):
            raise ValueError('vtk: 64-bit integer data does not fit 32 bits')
        a = narrowed
    elif a.dtype == numpy.float16:
        a = a.astype(numpy.float32)
    key = f'{a.dtype.kind}{a.dtype.itemsize}'
    if key not in _VTK_TYPENAME:
        raise ValueError(f'vtk: unsupported dtype {a.dtype}')
    out = numpy.zeros((len(a),) + (3,) * (a.ndim - 1), dtype='>' + key)
    out[tuple(slice(n) for n in a.shape)] = a
    return out


def vtk(name, cells, points, /, **data):
    '''Write a legacy *binary* VTK unstructured grid (reference:
    export.py:199).  Simplex cells only (line/triangle/tetrahedron by vertex
    count); ``data`` arrays attach as POINT_DATA or CELL_DATA depending on
    whether their length matches the number of points or of cells, rendered
    as SCALARS/VECTORS/TENSORS by rank.  ``name`` may be a filename (``.vtk``
    appended when missing, routed into the active HTML-log directory) or any
    binary file object.'''
    cells = numpy.asarray(cells)
    points_blk = _vtk_block(points)
    npoints = len(points_blk)
    ncells, nverts = cells.shape
    celltype = _VTK_CELLTYPE.get(nverts)
    if celltype is None:
        raise ValueError(f'vtk: cells must be simplices (2-4 vertices), got {nverts}')

    point_data = []
    cell_data = []
    for key, val in data.items():
        blk = _vtk_block(val)
        if len(blk) == npoints:
            point_data.append((key, blk))
        elif len(blk) == ncells:
            cell_data.append((key, blk))
        else:
            raise ValueError(f'vtk: data {key!r} has length {len(blk)}, matching '
                             f'neither points ({npoints}) nor cells ({ncells})')

    conn = numpy.empty((ncells, nverts + 1), dtype='>u4')
    conn[:, 0] = nverts
    conn[:, 1:] = cells

    if hasattr(name, 'write'):
        opener = contextlib.nullcontext(name)
    else:
        if not name.endswith('.vtk'):
            name += '.vtk'
        outdir = getattr(log, '_htmllog', [None])[0]
        if outdir is not None:
            name = os.path.join(outdir.outdir, name)
        opener = open(name, 'wb')

    with opener as f:
        f.write(b'# vtk DataFile Version 3.0\nvtk output\nBINARY\nDATASET UNSTRUCTURED_GRID\n')
        f.write(f'POINTS {npoints} {_VTK_TYPENAME[f"{points_blk.dtype.kind}{points_blk.dtype.itemsize}"]}\n'.encode())
        f.write(points_blk.tobytes())
        f.write(b'\n')
        f.write(f'CELLS {ncells} {conn.size}\n'.encode())
        f.write(conn.tobytes())
        f.write(f'\nCELL_TYPES {ncells}\n'.encode())
        f.write(numpy.full(ncells, celltype, dtype='>u4').tobytes())
        f.write(b'\n')
        for section, n, items in (('POINT_DATA', npoints, point_data),
                                  ('CELL_DATA', ncells, cell_data)):
            if not items:
                continue
            f.write(f'{section} {n}\n'.encode())
            for key, blk in items:
                tname = _VTK_TYPENAME[f'{blk.dtype.kind}{blk.dtype.itemsize}']
                f.write(_VTK_ATTR[blk.ndim].format(key, tname).encode())
                f.write(blk.tobytes())
                f.write(b'\n')
    if isinstance(name, str):
        log.info(f'saved {name}')
