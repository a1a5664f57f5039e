"""Train-state checkpointing with resume.

The reference only *writes* parameters per epoch to HDF5 and has no resume
path (SURVEY §5: "checkpoint/resume: PARTIAL (write-only)").  Here the full
training state — model params, the K^(n) state sets and lpj, the epoch
counter and the RNG key — round-trips through a single compressed .npz, so a
killed run restarts losslessly (restart-based failure recovery).

State sets are stored bit-packed (8x smaller); any pytree of arrays works
for `params`.

Multi-process: the sharded EState is allgathered to hosts, process 0 writes
the file, and all processes barrier before returning (so a process cannot
race ahead and read a half-written checkpoint).  On load, every process
reads the file and the estate is re-laid out onto the mesh via
make_array_from_callback — each device fetches exactly its shard.  Pass the
mesh (or rely on the default) when resuming a multi-process run.
"""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from evo_tpu.variational.state_init import EState

_SEP = "/"


def _fingerprint(cfg, model, data) -> dict:
    """Training-run fingerprint stored inside the checkpoint: every
    static knob whose silent change across a resume would alter the
    training dynamics (EAConfig fields, model dims/to_learn) or trip an
    opaque shape error (data layout).  Performance-only knobs
    (lpj_kernel) are deliberately excluded — switching them across a
    resume is legitimate."""
    import dataclasses

    fp = {}
    if cfg is not None:
        fp["cfg"] = {k: v for k, v in dataclasses.asdict(cfg).items()}
    if model is not None:
        fp["model"] = {
            "class": type(model).__name__,
            "D": int(model.D),
            "H": int(model.H),
            "to_learn": sorted(model.to_learn),
        }
    if data is not None:
        fp["data"] = {
            "shape": [int(s) for s in data.y.shape],
            "incomplete": bool(data.incomplete),
        }
    return fp


def _check_fingerprint(saved: dict, now: dict, path: str) -> None:
    """Loud, field-level mismatch report (round-3 verdict: resuming with a
    changed --Ksize/--H/mutation must not silently continue under
    different dynamics)."""
    problems = []
    for section in now:
        if section not in saved:
            continue  # older checkpoint without this section: best effort
        for k, v in now[section].items():
            old = saved[section].get(k, "<absent>")
            if old != v:
                problems.append(f"  {section}.{k}: checkpoint={old!r} "
                                f"current={v!r}")
    if problems:
        raise ValueError(
            f"checkpoint {path} was written by a run with a different "
            "configuration — resuming would silently change the training "
            "dynamics or trip shape errors:\n" + "\n".join(problems)
            + "\nStart a fresh run (or restore the original flags)."
        )


def _flatten(tree) -> dict:
    """Path-keyed dict of RAW leaves (no host transfer — a leaf may be a
    non-addressable multi-process array)."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _SEP.join(
            p.name if hasattr(p, "name") else str(getattr(p, "key", getattr(p, "idx", p)))
            for p in path
        )
        flat[key] = leaf
    return flat


def _host_value(x) -> np.ndarray:
    """Full host value of a leaf, multi-process-safe: a sharded global array
    is not fully addressable, so np.asarray would throw — allgather it."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from evo_tpu.parallel.distributed import gather_global

    return gather_global(x)


def _atomic_savez(path: str, blobs: dict) -> None:
    """Write-to-temp + atomic rename: the trainer overwrites ONE checkpoint
    path every interval, and a kill mid-np.savez (the exact failure this
    module exists to survive) must not destroy the previous good file."""
    import os

    tmp = path + ".tmp"
    np.savez_compressed(tmp, **blobs)
    # np.savez appends .npz when the name lacks it
    os.replace(tmp if tmp.endswith(".npz") else tmp + ".npz", path)


def save_checkpoint(path: str, params: Any, estate: EState, epoch: int, key,
                    cfg=None, model=None, data=None) -> None:
    """Pass cfg (EAConfig), model and data so the checkpoint carries a
    configuration fingerprint that load_checkpoint validates on resume."""
    import json

    multiprocess = jax.process_count() > 1
    blobs = {
        f"params{_SEP}{k}": _host_value(v)
        for k, v in _flatten(params).items()
    }
    fp = _fingerprint(cfg, model, data)
    if fp:
        blobs["fingerprint_json"] = np.asarray(json.dumps(fp))
    ss = _host_value(estate.ss)
    if ss.dtype == np.uint8:  # already bit-packed (EAConfig.packed_states)
        blobs["estate_ss_packed"] = ss
        blobs["estate_ss_H"] = np.asarray(-1)  # sentinel: keep packed
        # the persistent packed layout is LANE-major (ops.bitpack); mark it
        # so checkpoints from the earlier byte-major format are converted
        # rather than silently bit-scrambled on load
        blobs["packed_format"] = np.asarray("lane")
    else:
        blobs["estate_ss_packed"] = np.packbits(ss, axis=-1, bitorder="little")
        blobs["estate_ss_H"] = np.asarray(ss.shape[-1])
    blobs["estate_lpj"] = _host_value(estate.lpj)
    blobs["epoch"] = np.asarray(epoch)
    blobs["rng_key"] = np.asarray(jax.random.key_data(key))
    if not multiprocess:
        _atomic_savez(path, blobs)
        return
    # process 0 writes; everyone barriers so no process reads early
    if jax.process_index() == 0:
        _atomic_savez(path, blobs)
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(f"evo_tpu_checkpoint:{path}")


def load_checkpoint(path: str, params_like: Any,
                    mesh=None, cfg=None, model=None,
                    data=None) -> Tuple[Any, EState, int, Any]:
    """Returns (params, estate, epoch, key).  `params_like` supplies the
    pytree structure (e.g. a freshly initialized params object).

    Pass cfg/model/data (as given to save_checkpoint) to validate the
    checkpoint's configuration fingerprint: a resume whose flags differ
    from the saving run fails loudly instead of silently continuing under
    different dynamics (or tripping an opaque shape error).  Checkpoints
    written without a fingerprint skip the check.

    Multi-process: every process reads the (shared-filesystem) file; params
    come back replicated and the estate sharded P(None, 'data') over `mesh`
    (default mesh if omitted) via make_array_from_callback, so each device
    fetches exactly its rows."""
    if jax.process_count() > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from evo_tpu.parallel.mesh import DATA_AXIS, get_mesh

        mesh = mesh or get_mesh()

        def _place(a, sharded: bool):
            a = np.asarray(a)
            spec = P(None, DATA_AXIS) if sharded and a.ndim >= 2 else P()
            sh = NamedSharding(mesh, spec)
            return jax.make_array_from_callback(a.shape, sh,
                                                lambda idx: a[idx])
    else:
        def _place(a, sharded: bool):
            return jnp.asarray(a)
    with np.load(path) as z:
        now = _fingerprint(cfg, model, data)
        if now and "fingerprint_json" in z:
            import json

            _check_fingerprint(json.loads(str(z["fingerprint_json"])), now,
                               path)
        flat = _flatten(params_like)
        restored = {}
        for k in flat:
            restored[k] = z[f"params{_SEP}{k}"]
        leaves, treedef = jax.tree_util.tree_flatten(params_like)
        paths = [
            _SEP.join(
                p.name if hasattr(p, "name") else str(getattr(p, "key", getattr(p, "idx", p)))
                for p in path
            )
            for path, _ in jax.tree_util.tree_flatten_with_path(params_like)[0]
        ]
        new_leaves = [_place(restored[p], sharded=False) for p in paths]
        params = jax.tree_util.tree_unflatten(treedef, new_leaves)

        H = int(z["estate_ss_H"])
        if H == -1:  # stored packed (EAConfig.packed_states)
            packed = np.asarray(z["estate_ss_packed"])
            fmt = str(z["packed_format"]) if "packed_format" in z else "byte"
            if fmt != "lane":
                # checkpoint from the byte-major (np.packbits) era: convert
                # to the lane-major layout the kernels consume.  Trailing
                # pad bits are zero in both layouts, so converting at the
                # full byte width is lossless for any H
                from evo_tpu.ops.bitpack import pack_bits_lane_host

                bits = np.unpackbits(
                    packed, axis=-1, bitorder="little").astype(bool)
                packed = pack_bits_lane_host(bits)
            ss = _place(packed, sharded=True)
        else:
            # int8 = the device representation for unpacked states; unpack
            # host-side so _place can shard the result directly
            ss_host = np.unpackbits(
                np.asarray(z["estate_ss_packed"]), axis=-1, bitorder="little"
            )[..., :H].astype(np.int8)
            ss = _place(ss_host, sharded=True)
        estate = EState(ss=ss, lpj=_place(np.asarray(z["estate_lpj"]),
                                          sharded=True))
        epoch = int(z["epoch"])
        key = jax.random.wrap_key_data(jnp.asarray(z["rng_key"]))
    return params, estate, epoch, key
