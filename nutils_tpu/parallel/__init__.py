'''Multi-device parallelism over a JAX device mesh.

The reference's only parallelism is a fork+shared-memory loop over elements
with scatter-add into shared output arrays (reference: parallel.py,
evaluable.py:6763-7013).  The TPU-native equivalent implemented here
(SURVEY.md §2.9/§5.8):

* **Element-batch data parallelism**: every sample's per-element tables
  (coordinates, weights, dof/coefficient tables) are sharded over the mesh's
  ``'e'`` axis; assembly einsums run shard-local and the dof scatter-add
  becomes an XLA segment-sum + all-reduce over ICI, inserted automatically by
  GSPMD from the input shardings.

* **Dof-partitioned Krylov** (the TP analogue): CSR values/column indices are
  sharded over nnz; the CG matvec's segment-sum reduces across shards.

No communication code is written by hand: shardings are declared on the
constant tables, jit propagates them, XLA chooses the collectives.
'''

import numpy


def device_mesh(n_devices=None, axis='e'):
    '''A 1-D device mesh over the first ``n_devices`` devices.'''
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(numpy.asarray(devs), (axis,))


def _shard_spec(mesh, ndim, axis=0):
    from jax.sharding import NamedSharding, PartitionSpec
    spec = [None] * ndim
    spec[axis] = mesh.axis_names[0]
    return NamedSharding(mesh, PartitionSpec(*spec))


def shard_samples(mesh, *objects):
    '''Shard the element axis of the coordinate tables of the given samples
    (or of every sample reachable from the given Systems) over the mesh.

    Tables whose element count does not divide the mesh size are left
    replicated (correct, just not distributed).
    '''
    import jax
    n = mesh.devices.size
    leaves = []
    for obj in objects:
        from ..sample import Sample
        from ..solver import System
        if isinstance(obj, Sample):
            leaves.append(obj.lower_args().X)
        elif isinstance(obj, System):
            leaves.extend(node for node in obj._comp.leafnodes.values() if node.value is not None)
            obj._cache.pop('tables', None)  # re-derive device bindings with shardings
        else:
            raise TypeError(type(obj))
    for leaf in leaves:
        val = numpy.asarray(leaf.value)
        if val.ndim >= 1 and val.shape[0] % n == 0:
            leaf.value = jax.device_put(val, _shard_spec(mesh, val.ndim, 0))
    return leaves


def sharded_cg_arrays(mesh, matrix_):
    '''Device-put a Matrix's value/index arrays sharded over nnz.'''
    import jax
    n = mesh.devices.size
    data = numpy.asarray(matrix_.data)
    indices = numpy.asarray(matrix_.indices)
    if len(data) % n == 0:
        sh = _shard_spec(mesh, 1, 0)
        return jax.device_put(data, sh), jax.device_put(indices, sh)
    return jax.device_put(data), jax.device_put(indices)
