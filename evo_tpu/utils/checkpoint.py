"""Train-state checkpointing with resume.

The reference only *writes* parameters per epoch to HDF5 and has no resume
path (SURVEY §5: "checkpoint/resume: PARTIAL (write-only)").  Here the full
training state — model params, the K^(n) state sets and lpj, the epoch
counter and the RNG key — round-trips through a single compressed .npz, so a
killed run restarts losslessly (restart-based failure recovery).

State sets are stored bit-packed (8x smaller); any pytree of arrays works
for `params`.
"""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from evo_tpu.ops.bitpack import unpack_bits_u8
from evo_tpu.variational.state_init import EState

_SEP = "/"


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _SEP.join(
            p.name if hasattr(p, "name") else str(getattr(p, "key", getattr(p, "idx", p)))
            for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(path: str, params: Any, estate: EState, epoch: int, key) -> None:
    blobs = {f"params{_SEP}{k}": v for k, v in _flatten(params).items()}
    ss = np.asarray(estate.ss)
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
    blobs["estate_lpj"] = np.asarray(estate.lpj)
    blobs["epoch"] = np.asarray(epoch)
    blobs["rng_key"] = np.asarray(jax.random.key_data(key))
    np.savez_compressed(path, **blobs)


def load_checkpoint(path: str, params_like: Any) -> Tuple[Any, EState, int, Any]:
    """Returns (params, estate, epoch, key).  `params_like` supplies the
    pytree structure (e.g. a freshly initialized params object)."""
    with np.load(path) as z:
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
        new_leaves = [jnp.asarray(restored[p]) for p in paths]
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
            ss = jnp.asarray(packed)
        else:
            # int8 = the device representation for unpacked states
            ss = unpack_bits_u8(
                jnp.asarray(z["estate_ss_packed"]), H=H
            ).astype(jnp.int8)
        estate = EState(ss=ss, lpj=jnp.asarray(z["estate_lpj"]))
        epoch = int(z["epoch"])
        key = jax.random.wrap_key_data(jnp.asarray(z["rng_key"]))
    return params, estate, epoch, key
