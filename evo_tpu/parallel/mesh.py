"""Device-mesh data parallelism — the TPU-native replacement for the
reference's MPI layer (reference: evo/utils/parallel.py).

Mapping (SURVEY §2.3):
  MPI world                 -> jax.sharding.Mesh(devices, ('data',))
  Scatterv rows to ranks    -> device_put with NamedSharding P(None, 'data')
                               on the blocked [nb, B, ...] batch axis
  Allreduce of suff. stats  -> plain jnp.sum over the sharded axis inside the
                               jitted em_step (GSPMD inserts psums over ICI)
  Bcast of random inits     -> identical seed on every host
  Gatherv of reconstructions-> jax.device_get / process_allgather

Nothing else is needed: all collectives live *inside* the compiled epoch
step, removing the reference's per-epoch Python-level communication
entirely.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


_default_mesh: Optional[Mesh] = None


def get_mesh() -> Mesh:
    global _default_mesh
    if _default_mesh is None:
        _default_mesh = make_mesh()
    return _default_mesh


def shard_blocked(tree, mesh: Optional[Mesh] = None):
    """Place a blocked pytree ([nb, B, ...] leaves) so the B axis is sharded
    over the mesh's data axis.  Scalars / param leaves are replicated."""
    mesh = mesh or get_mesh()

    def put(a):
        a = jax.numpy.asarray(a)
        if a.ndim >= 2:
            spec = P(None, DATA_AXIS)
        else:
            spec = P()
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(tree, mesh: Optional[Mesh] = None):
    mesh = mesh or get_mesh()
    return jax.tree.map(
        lambda a: jax.device_put(jax.numpy.asarray(a), NamedSharding(mesh, P())), tree
    )


def pprint(*args, **kwargs):
    """Process-0-only print (reference parallel.py:23-42)."""
    if jax.process_index() == 0:
        print(*args, **kwargs)


def gather_to_host(x) -> np.ndarray:
    """Fetch the FULL global value of a (possibly multi-process sharded)
    array to host memory (reference gather_from_processes,
    parallel.py:154-173): process_allgather across hosts when multi-process,
    a plain device transfer otherwise."""
    from evo_tpu.parallel.distributed import gather_global

    return gather_global(x)
