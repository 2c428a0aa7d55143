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

_default_meshes = {}


def default_mesh():
    '''The process-wide device mesh implied by ``config.mesh``
    (``NUTILS_TPU_MESH=N``), or None when multi-device mode is off (the
    default, or fewer than two devices available).  N beyond the visible
    device count is clamped; N = -1 uses every device.  This is what makes
    multi-device an *execution mode* rather than an opt-in helper: with the
    setting active, ``System`` shards its element tables and the matrix
    backends shard their solve operands automatically (the analogue of the
    reference's default-on ``NUTILS_NPROCS`` element loop, reference:
    parallel.py:21).'''
    from ..utils import config
    n = int(config.mesh.value)
    if n == 0:
        return None
    import jax
    ndev = len(jax.devices())
    n = ndev if n < 0 else min(n, ndev)
    if n < 2:
        return None
    mesh = _default_meshes.get(n)
    if mesh is None:
        mesh = _default_meshes[n] = device_mesh(n)
    return mesh


def mesh_token():
    '''Hashable identity of the active default mesh, for invalidating caches
    of device-committed (possibly sharded) arrays when the mode toggles.'''
    mesh = default_mesh()
    return None if mesh is None else mesh.devices.size


def put_table(val, mesh):
    '''device_put a table, sharded over axis 0 (the element-batch axis of
    sample tables) when the mesh is active and the axis divides evenly;
    replicated otherwise.  Sharding is a layout declaration only — GSPMD
    inserts whatever collectives downstream consumers need, so any table is
    safe to shard.'''
    import jax
    if mesh is not None and val.ndim >= 1 and val.shape[0] >= mesh.devices.size \
            and val.shape[0] % mesh.devices.size == 0:
        return jax.device_put(val, _shard_spec(mesh, val.ndim, 0))
    return jax.device_put(val)


def shard_device_op(mv_kind, ops, mesh):
    '''Shard the operand arrays of a ``Matrix._device_op`` over the mesh.

    * stencil / blockgrid weights ``[W, *grid]``: sharded over the largest
      grid axis divisible by the mesh size — the shifted-slice matvec then
      partitions row-wise and GSPMD inserts halo exchanges
      (collective-permute) for the shifted reads (tests/test_parallel.py).
    * bell / ell / csr operands: sharded over the leading (row-block / row /
      nnz) axis; the dof scatter becomes a sharded segment-sum + all-reduce.
    '''
    import jax
    from jax.sharding import NamedSharding, PartitionSpec
    n = mesh.devices.size
    name = mesh.axis_names[0]

    def put(arr, first_axis):
        shape = arr.shape
        divisible = [i for i in range(first_axis, len(shape))
                     if shape[i] >= n and shape[i] % n == 0]
        if not divisible:
            return arr
        ax = max(divisible, key=lambda i: shape[i])
        spec = [None] * len(shape)
        spec[ax] = name
        return jax.device_put(arr, NamedSharding(mesh, PartitionSpec(*spec)))

    first_axis = 1 if mv_kind[0] in ('stencil', 'blockgrid') else 0
    return tuple(put(arr, first_axis) for arr in ops)


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
