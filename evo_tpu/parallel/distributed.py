"""Multi-process (multi-host) distribution.

TPU-native replacement for the reference's `mpirun -n K` deployment model
(reference README.md:18-25; evo/utils/parallel.py:117-173 Scatterv/Gatherv):

  mpirun -n K python main.py      ->  one Python process per host, each
                                      calling init_distributed() first
  Scatterv rows to ranks          ->  each process loads ONLY its local rows;
                                      make_global_data assembles them into one
                                      global jax.Array sharded over the mesh
                                      (jax.make_array_from_process_local_data)
  Gatherv to rank 0               ->  gather_global(): process_allgather for
                                      multi-process, device_get otherwise
  rank-0 bcast of random draws    ->  same seed on every process (params);
                                      per-process folded seed for local state
                                      draws (matches the reference, whose
                                      initial K^(n) draws are also rank-local:
                                      evo/variational/utils.py:100-138)

Single-process (including single-process-many-devices) is the degenerate
case of the same code paths: with process_count == 1 the process-local data
IS the global data, so everything below works unchanged — which is what the
tests exercise on the 8-virtual-device CPU mesh.

Multi-host recipe (v5e pod slice or CPU test cluster):

    # on every host, before any other jax call:
    from evo_tpu.parallel import init_distributed, make_mesh
    init_distributed()            # reads JAX_COORDINATOR_ADDRESS etc., or
                                  # pass coordinator_address/num_processes/
                                  # process_id explicitly
    mesh = make_mesh()            # jax.devices() is global across processes

    # each process loads its OWN slice of the data (equal row counts):
    data = make_global_data(y_local, n_blocks=nb, mesh=mesh)
    cfg, estate = init_states(N=..., ...)        # N = GLOBAL row count
    estate = distribute_estate(estate, mesh)     # local rows -> global array

    # the jitted em_step is unchanged: GSPMD inserts ICI/DCN collectives
    # for the cross-shard reductions exactly where the reference called
    # Allreduce.  Reconstructions come back with gather_global(y_rec).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from evo_tpu.parallel.mesh import DATA_AXIS, get_mesh

_ENV_TRIGGERS = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> Tuple[int, int]:
    """Initialize the JAX distributed runtime when running multi-process;
    a no-op for single-process runs (the common case on one chip / one host).

    Activation: explicit arguments, or a coordinator address in the
    environment (JAX_COORDINATOR_ADDRESS — also what jax.distributed's own
    auto-detection for SLURM/GKE clusters sets up).  Returns
    (process_index, process_count).

    This replaces the implicit `MPI_Init` the reference gets from importing
    mpi4py (reference evo/utils/parallel.py:7-8).
    """
    want = (
        coordinator_address is not None
        or num_processes is not None
        or any(os.environ.get(k) for k in _ENV_TRIGGERS)
    )
    # IMPORTANT: do not touch jax.process_count() (or any device API) before
    # deciding — it initializes the XLA backend, after which
    # jax.distributed.initialize() unconditionally raises.  The idempotency
    # guard must come from the distributed-client state itself.
    if want and not jax.distributed.is_initialized():
        # the CPU backend has no cross-process collectives unless gloo is
        # selected (the TPU backend rides ICI/DCN natively) — required for
        # the 2-process CPU test cluster this module documents
        platforms = jax.config.jax_platforms or os.environ.get(
            "JAX_PLATFORMS", "")
        if "cpu" in str(platforms):
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        kwargs = {}
        if coordinator_address is None:
            # jax.distributed only auto-reads the JAX_-prefixed variable;
            # honor the bare COORDINATOR_ADDRESS trigger by forwarding its
            # value explicitly (otherwise triggering on it would crash
            # initialize() with "coordinator_address should be defined")
            coordinator_address = os.environ.get("COORDINATOR_ADDRESS") or None
        if coordinator_address is not None:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        if local_device_ids is not None:
            kwargs["local_device_ids"] = local_device_ids
        jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def _blocked_spec(a) -> P:
    """Blocked layout [nb, B, ...]: shard the B axis over 'data'."""
    return P(None, DATA_AXIS) if np.ndim(a) >= 2 else P()


def make_global_array(local, mesh=None, spec: Optional[P] = None):
    """Assemble per-process local blocks into one global jax.Array.

    `local` is this process's rows of the blocked layout: [nb, B_local, ...]
    where B_global = B_local * process_count (every process must pass the
    same shape, like the reference's equal Scatterv chunks,
    parallel.py:88-115).  With process_count == 1 this is an ordinary
    device_put-style placement of the full array.
    """
    mesh = mesh or get_mesh()
    local = np.asarray(local)
    if spec is None:
        spec = _blocked_spec(local)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local)


def distribute_tree(tree_local, mesh=None):
    """make_global_array over every leaf of a blocked pytree (Data, EState)."""
    mesh = mesh or get_mesh()
    return jax.tree.map(lambda a: make_global_array(a, mesh), tree_local)


def distribute_estate(estate, mesh=None):
    """EState with process-local rows -> globally sharded EState."""
    return distribute_tree(estate, mesh)


def make_global_data(
    y_local: np.ndarray,
    x_local: Optional[np.ndarray] = None,
    n_blocks: int = 1,
    mesh=None,
    dtype=np.float32,
):
    """Build a globally-sharded Data pytree from process-local observations.

    Every process passes its own [N_local, D] rows (missing entries NaN, as
    in make_data); N_local must be equal across processes and divisible by
    n_blocks (pad upstream with NaN-free dummy rows if needed — row_valid
    marks them out... but note make_data-style auto-padding can't be done
    *here* in the multi-process case, since padding must be symmetric).

    The global array interleaves process rows along the sharded B axis;
    datapoint order is irrelevant to the EM (all reductions are
    order-invariant sums), exactly as the reference's Scatterv chunk
    assignment is arbitrary.
    """
    from evo_tpu.models.base import Data

    mesh = mesh or get_mesh()
    y_local = np.asarray(y_local)
    N_local, D = y_local.shape
    assert N_local % n_blocks == 0, (
        f"N_local={N_local} must divide n_blocks={n_blocks} in multi-process "
        "mode (pad rows upstream)"
    )
    x_infr = ~np.isnan(y_local)
    incomplete_local = bool((~x_infr).any())
    y_local = np.where(x_infr, y_local, 0.0).astype(np.dtype(dtype))
    if x_local is None:
        x_local = x_infr.copy()
    else:
        x_local = np.asarray(x_local).astype(bool)
    row_valid = np.ones(N_local, dtype=bool)

    def blk(a):
        return np.ascontiguousarray(
            a.reshape((n_blocks, N_local // n_blocks) + a.shape[1:])
        )

    if jax.process_count() > 1:
        # the static `incomplete` flag must agree across processes (it picks
        # code paths at trace time) — OR-reduce it over hosts
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([incomplete_local])
        )
        incomplete = bool(np.asarray(flags).any())
    else:
        incomplete = incomplete_local

    return Data(
        y=make_global_array(blk(y_local), mesh),
        x_infr=make_global_array(blk(x_infr), mesh),
        x=make_global_array(blk(x_local), mesh),
        row_valid=make_global_array(blk(row_valid), mesh),
        incomplete=incomplete,
    )


def allsum_host(*arrays) -> tuple:
    """Sum each host-side array across all processes (every process gets the
    global sums) — the reference's `comm.allreduce` for init-time statistics
    (reference _models.py:242-263 allmean; sssc.py:150-160).  A no-op for
    single-process runs."""
    if jax.process_count() == 1:
        return tuple(np.asarray(a) for a in arrays)
    from jax.experimental import multihost_utils

    out = []
    for a in arrays:
        a = np.asarray(a)
        # untiled process_allgather stacks the per-process values along a
        # new leading axis -> [P, ...]; summing it is the allreduce
        parts = multihost_utils.process_allgather(a)
        out.append(np.asarray(parts).sum(axis=0))
    return tuple(out)


def local_host_rows(data):
    """This process's rows of a (possibly multi-process) blocked Data pytree
    as flat host arrays: (y [N_loc, D], m [N_loc, D], valid [N_loc]).

    Single-process: the full arrays.  Multi-process: the addressable shards
    only (a global sharded array cannot be np.asarray'd) — sufficient for
    any order-invariant statistic."""

    def loc(a):
        arr = getattr(a, "addressable_shards", None)
        if arr is None or getattr(a, "is_fully_addressable", True):
            return np.asarray(a)
        shards = sorted(
            a.addressable_shards,
            key=lambda s: tuple(sl.start or 0 for sl in s.index),
        )
        return np.concatenate([np.asarray(s.data) for s in shards], axis=1)

    y = loc(data.y)
    m = loc(data.x_infr)
    valid = loc(data.row_valid)
    D = y.shape[-1]
    return (y.reshape(-1, D), m.reshape(-1, D), valid.reshape(-1))


def global_init_stats(data, y_host=None, D: int = None):
    """Global data statistics for standard_init, identical on every process
    — the multi-process-safe replacement for host-side means over
    np.asarray(data.y).  Mirrors the reference's allmean + allreduce init
    contract (reference _models.py:242-276: every rank derives the same
    Theta^0 from GLOBAL statistics).

    Returns (N, y_mean [D], ss_resid, m_sum): global row count, global
    masked data mean (sum(y*m)/N — the reference's incomplete-data
    normalization, _models.py:249), the global masked squared residual
    sum((y - y_mean)*m)^2, and the global observed-entry count sum(m).
    With complete data m == 1 everywhere, so ss_resid/m_sum etc. reduce to
    the usual moments."""
    if y_host is not None:
        y_raw = np.asarray(y_host).reshape(-1, D)
        m = ~np.isnan(y_raw)
        y = np.where(m, y_raw, 0.0)
    else:
        y, m, valid = local_host_rows(data)
        y, m = y[valid], m[valid]
    y = y.astype(np.float64)
    mf = m.astype(np.float64)

    (part,) = allsum_host(
        np.concatenate([
            [np.float64(y.shape[0])], (y * mf).sum(0), [mf.sum()]
        ])
    )
    N = part[0]
    y_mean = part[1:-1] / N
    m_sum = part[-1]
    (ss_resid,) = allsum_host(np.asarray([(((y - y_mean) * mf) ** 2).sum()]))
    return N, y_mean, float(ss_resid[0]), float(m_sum)


def gather_global(x) -> np.ndarray:
    """Full global value of a (possibly multi-process sharded) array on every
    host — the reference's Gatherv-to-rank-0 (parallel.py:154-173), except
    every process gets the result (cheaper than a broadcast afterwards and
    what the patch-merge/PSNR consumers want)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(jax.device_get(x))
