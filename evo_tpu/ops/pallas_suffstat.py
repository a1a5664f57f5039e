"""Fused Pallas TPU kernel for the BSC M-step sufficient statistics.

Computes, per block of datapoints b with the merged state sets ss2 and
posterior responsibilities rs (reference bsc.py:173-223 accumulators):

    rho[b, h]  = sum_s rs[b,s] * ss2[b,s,h]          (-> pies, Wp)
    sabs[b, s] = sum_h ss2[b,s,h]                     (-> sigma residual)
    Wq[h, k]  += sum_{b,s} rs[b,s] ss2[b,s,h] ss2[b,s,k]   (MXU)

XLA evaluates these as three separate passes over the [B,S,H] f32 cast of
the states (the rho reduce alone cost ~9 ms/epoch at the benchmark config);
this kernel reads the bool states once per grid step, casts in VMEM, runs
the Wq contraction on the MXU in true f32 (better than XLA's default-
precision bf16 pass), and accumulates Wq across grid steps in the output
block (constant index_map => the block stays resident in VMEM).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from evo_tpu.ops.pallas_lpj import unpack_lane_f32


def _make_kernel(packed: bool, H: int):
    def _kernel(ss_ref, rs_ref, rho_ref, sabs_ref, wq_ref):
        bb, S = ss_ref.shape[:2]
        if packed:
            sf = unpack_lane_f32(ss_ref[:])  # [bb, S, H] in VMEM
        else:
            sf = ss_ref[:].astype(jnp.float32)
        rs = rs_ref[:]  # [bb, S]
        w = rs[..., None] * sf  # [bb, S, H]
        rho_ref[:] = jnp.sum(w, axis=1)
        sabs_ref[:] = jnp.sum(sf, axis=-1)
        contrib = jax.lax.dot_general(
            w.reshape(bb * S, H),
            sf.reshape(bb * S, H),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, H] on the MXU

        @pl.when(pl.program_id(0) == 0)
        def _():
            wq_ref[:] = contrib

        @pl.when(pl.program_id(0) != 0)
        def _():
            wq_ref[:] = wq_ref[:] + contrib

    return _kernel


@partial(jax.jit, static_argnames=("H", "block_rows", "interpret"))
def bsc_suffstat_pallas(ss, rs, H: int = None, block_rows: int = 64,
                        interpret: bool = False):
    """ss: int8 0/1 [B, S, H] or lane-major packed uint8 [B, S, H/8]
    (pass H explicitly for packed input); rs: f32 [B, S].  Returns
    (rho [B,H], sabs [B,S], Wq [H,H]), all f32.  Requires
    B % block_rows == 0."""
    B, S, Win = ss.shape
    packed = ss.dtype == jnp.uint8
    if H is None:
        assert not packed, "packed input requires explicit H"
        H = Win
    assert (Win == -(-H // 8)) if packed else (Win == H), (ss.shape, H)
    assert B % block_rows == 0, (B, block_rows)
    bb = block_rows

    return pl.pallas_call(
        _make_kernel(packed, H),
        out_shape=(
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, S), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B // bb,),
            in_specs=[
                pl.BlockSpec((bb, S, Win), lambda i: (i, 0, 0)),
                pl.BlockSpec((bb, S), lambda i: (i, 0)),
            ],
            out_specs=(
                pl.BlockSpec((bb, H), lambda i: (i, 0)),
                pl.BlockSpec((bb, S), lambda i: (i, 0)),
                pl.BlockSpec((H, H), lambda i: (0, 0)),
            ),
        ),
        interpret=interpret,
    )(ss if ss.dtype in (jnp.int8, jnp.uint8) else ss.astype(jnp.int8),
      rs.astype(jnp.float32))


def pallas_suffstat_applicable(B: int, S: int, H: int,
                               block_rows: int = 64) -> bool:
    """Same profitability envelope as the lpj kernel: TPU, H >= 32 (this
    kernel needs no lane alignment at all — Mosaic pads internally; the
    floor only keeps tiny-Gram problems on the cheap einsum path),
    VMEM-sized tiles.  Mask-independent (works for incomplete data too)."""
    if jax.default_backend() not in ("tpu",):
        return False
    # sf + w f32 copies dominate VMEM: 2 * bb * S * H * 4 bytes
    vmem = block_rows * S * H * (4 + 4 + 1) + 2 * H * H * 4
    return (
        B % block_rows == 0
        and H >= 32
        and vmem < 12 * 2**20
    )
