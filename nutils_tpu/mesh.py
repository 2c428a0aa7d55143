'''Mesh generators (reference: mesh.py:34 rectilinear, :686 unitsquare).'''

import numpy

from . import function, topology
from .utils import numeric


class _RectilinearGeom(function.Array):
    '''Piecewise-linear map from root coordinates to vertex positions:
    x_i = v_i[e_i] + (root_i - e_i) * (v_i[e_i+1] - v_i[e_i]), with constant
    per-element tables (differentiable in the root coordinates).'''

    def __init__(self, space, verts, shape):
        self.space = space
        self.verts = [numpy.asarray(v, dtype=float) for v in verts]
        self.grid_shape = tuple(shape)
        super().__init__((len(verts),), float, frozenset({space}), {})

    def lower(self, args):
        from . import evaluable as ev
        multi = numpy.stack(numpy.unravel_index(args.index, self.grid_shape), axis=1)  # [E, d]
        c0 = numpy.empty(multi.shape, dtype=float)
        c1 = numpy.empty(multi.shape, dtype=float)
        for i, v in enumerate(self.verts):
            dv = numpy.diff(v)
            c1[:, i] = dv[multi[:, i]]
            c0[:, i] = v[multi[:, i]] - multi[:, i] * dv[multi[:, i]]
        E, P = args.points_shape
        c0x = ev.insertaxis(ev.constant(c0), 1, P)
        c1x = ev.insertaxis(ev.constant(c1), 1, P)
        return ev.add(c0x, ev.multiply(c1x, args.X))


def rectilinear(richshape, periodic=(), space='X'):
    'Structured mesh: integer axis sizes or explicit vertex positions.'
    verts = [numpy.arange(v + 1, dtype=float) if numeric.isint(v) else numpy.asarray(v, dtype=float) for v in richshape]
    shape = [len(v) - 1 for v in verts]
    topo = topology.StructuredTopology(space, shape, periodic)
    if all(numeric.isint(v) for v in richshape):
        geom = function._RootCoords(space, len(shape))
    else:
        geom = _RectilinearGeom(space, verts, shape)
    return topo, geom


def line(nodes, periodic=False, space='X'):
    '''1-D mesh with scalar geometry (reference: mesh.py:66).'''
    topo, geom = rectilinear([nodes], periodic=(0,) if periodic else (), space=space)
    return topo, geom[0]


def unitsquare(nelems, etype='square'):
    '''Unit square [0,1]^2 (reference: mesh.py:686).'''
    if etype in ('square', 'rectilinear'):
        topo, geom = rectilinear([nelems, nelems])
        return topo, geom / nelems
    raise NotImplementedError(f'unitsquare etype {etype!r} pending (simplex topologies)')
