'''Visualization export (reference: export.py): triplot and legacy VTK.'''

import contextlib

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
        import os
        outdir = getattr(log, '_htmllog', [None])[0]
        if outdir is not None:
            name = os.path.join(outdir.outdir, name)
        fig.savefig(name)
        plt.close(fig)
        log.notify_figure(os.path.basename(name))
        log.info(f'saved figure {name}')


def triplot(name, points, values=None, *, tri=None, hull=None, cmap='viridis', clim=None, linewidth=.1, linecolor='k', **fig_kwargs):
    '''Plot a sampled scalar field over a triangulated point set
    (reference: export.py:109).  Supports 1-D (line plot) and 2-D domains.
    When ``name`` is a matplotlib axes object, draw into it and return the
    mappable (the reference's axes-mode).'''
    if not isinstance(name, str):
        ax = name
        points = numpy.asarray(points)
        im = None
        if values is not None and tri is not None and points.shape[1] == 2:
            import matplotlib.tri
            t = matplotlib.tri.Triangulation(points[:, 0], points[:, 1], tri)
            im = ax.tripcolor(t, values, shading='gouraud', cmap=cmap)
            if clim is not None:
                im.set_clim(*clim)
        if hull is not None and points.shape[1] == 2:
            import matplotlib.collections
            ax.add_collection(matplotlib.collections.LineCollection(points[hull], colors=linecolor, linewidths=linewidth))
        ax.set_aspect('equal')
        ax.autoscale(enable=True, axis='both', tight=True)
        return im
    points = numpy.asarray(points)
    with mplfigure(name, **fig_kwargs) as fig:
        ax = fig.add_subplot(111)
        if points.shape[1] == 1:
            order = None
            if tri is not None:
                for seg in tri:
                    ax.plot(points[seg, 0], values[seg] if values is not None else numpy.zeros(len(seg)), color='C0')
            elif values is not None:
                ax.plot(points[:, 0], values, '.')
        elif points.shape[1] == 2:
            if values is not None and tri is not None:
                import matplotlib.tri
                t = matplotlib.tri.Triangulation(points[:, 0], points[:, 1], tri)
                im = ax.tripcolor(t, values, shading='gouraud', cmap=cmap)
                if clim is not None:
                    im.set_clim(*clim)
                fig.colorbar(im, ax=ax)
            if hull is not None:
                import matplotlib.collections
                lines = matplotlib.collections.LineCollection(points[hull], colors=linecolor, linewidths=linewidth)
                ax.add_collection(lines)
            ax.set_aspect('equal')
            ax.autoscale(enable=True, axis='both', tight=True)
        else:
            log.warning('triplot: 3-D rendering not implemented; skipping plot')


def plotlines_(ax, xy, lines, **kwargs):
    '''Add a line collection (element hulls) to an axis (reference: export.py
    helper used by the examples); xy is [2, npoints] or [npoints, 2].'''
    import matplotlib.collections
    import numpy as np
    xy = numpy.asarray(xy)
    if xy.shape[0] == 2 and xy.shape[1] != 2:
        xy = xy.T
    lc = matplotlib.collections.LineCollection(xy[numpy.asarray(lines)], **kwargs)
    ax.add_collection(lc)
    return lc


def vtk(name, cells, points, /, **data):
    '''Write a legacy ASCII VTK unstructured grid (reference: export.py:199
    writes the binary variant; ASCII keeps this dependency-free).'''
    cells = numpy.asarray(cells)
    points = numpy.asarray(points)
    npoints, ndims = points.shape
    ncells, nverts = cells.shape
    celltype = {2: 3, 3: 5, 4: 10}[nverts]  # line, triangle, tetra
    if not name.endswith('.vtk'):
        name += '.vtk'
    with open(name, 'w') as f:
        f.write('# vtk DataFile Version 3.0\nnutils_tpu export\nASCII\nDATASET UNSTRUCTURED_GRID\n')
        f.write(f'POINTS {npoints} double\n')
        for p in points:
            f.write(' '.join(f'{x:.17g}' for x in numpy.pad(p, (0, 3 - ndims))) + '\n')
        f.write(f'CELLS {ncells} {ncells * (nverts + 1)}\n')
        for c in cells:
            f.write(f'{nverts} ' + ' '.join(map(str, c)) + '\n')
        f.write(f'CELL_TYPES {ncells}\n')
        for _ in range(ncells):
            f.write(f'{celltype}\n')
        if data:
            f.write(f'POINT_DATA {npoints}\n')
            for key, val in data.items():
                val = numpy.asarray(val)
                if val.ndim == 1:
                    f.write(f'SCALARS {key} double\nLOOKUP_TABLE default\n')
                    for x in val:
                        f.write(f'{x:.17g}\n')
                else:
                    f.write(f'VECTORS {key} double\n')
                    for row in val:
                        f.write(' '.join(f'{x:.17g}' for x in numpy.pad(row, (0, 3 - val.shape[1]))) + '\n')
    log.info(f'saved {name}')
