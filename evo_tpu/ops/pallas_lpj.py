"""Fused Pallas TPU kernel for the BSC log-pseudo-joint.

Computes, for a block of datapoints b and all K candidate states per point,

    lpj[b,k] = pre1 * ( y2[b] - 2 * <s_bk, Wty_b> + s_bk^T G s_bk )
             + pil_bar * |s_bk|

XLA's einsum lowering materializes the f32 cast of the states [B*K, H] and
the intermediate t = sf @ G in HBM (~0.5 GB of traffic per 4096-row block at
the benchmark config).  This kernel keeps both in VMEM: per grid step it
reads only the bool states tile, the per-datapoint Wty/y2 slices and the
shared Gram matrix, casts the states to f32 *in VMEM*, runs the
[bb*K, H] x [H, H] contraction on the MXU, and fuses the quadratic-form
epilogue on the VPU.

Used for the complete-data K-state evaluation AND the per-generation
children evaluation (v2); the masked (per-datapoint Gram) path stays on the
XLA einsum (G too large for VMEM).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from evo_tpu.ops.bitpack import hash_halfwords


def unpack_lane_f32(pk):
    """In-VMEM unpack of lane-major packed states (ops.bitpack format):
    int [..., W8] -> f32 [..., 8*W8].  pltpu.repeat tiles the byte vector
    along the lane axis (r[.., h] = pk[.., h mod W8]), and bit (h div W8)
    of r[.., h] is latent h by construction of the lane-major layout."""
    W8 = pk.shape[-1]
    H = 8 * W8
    r = pltpu.repeat(pk.astype(jnp.int32), 8, axis=pk.ndim - 1)
    j = jax.lax.broadcasted_iota(jnp.int32, pk.shape[:-1] + (H,),
                                 pk.ndim - 1) // W8
    return jnp.bitwise_and(jax.lax.shift_right_logical(r, j), 1).astype(
        jnp.float32)


def _make_kernel(packed: bool, emit_keys: bool):
    def _kernel(scal_ref, ss_ref, wty_ref, y2_ref, G_ref, out_ref,
                *keys_ref):
        bb, K = ss_ref.shape[:2]
        H = G_ref.shape[0]
        if packed:
            sf = unpack_lane_f32(ss_ref[:])  # [bb, K, H] in VMEM
        else:
            sf = ss_ref[:].astype(jnp.float32)
        sf2 = sf.reshape(bb * K, H)
        t = jnp.dot(sf2, G_ref[:], preferred_element_type=jnp.float32)  # MXU
        sGs = jnp.sum(t * sf2, axis=-1).reshape(bb, K)
        s_abs = jnp.sum(sf, axis=-1)  # [bb, K]
        sWty = jnp.sum(sf * wty_ref[:][:, None, :], axis=-1)  # [bb, K]
        pre1 = scal_ref[0, 0]
        pil_bar = scal_ref[0, 1]
        quad = y2_ref[:] - 2.0 * sWty + sGs
        out_ref[:] = pre1 * quad + pil_bar * s_abs

        if emit_keys:
            # dedup key half-words from the states already resident in
            # VMEM, via an exact f32 matmul on the MXU (Mosaic cannot split
            # the lane dim for a [.., W, 32] reshape): halfword v packs
            # latents [16v, 16v+16) little-endian, with weights <= 2^15 and
            # sums <= 2^16-1 — all exactly representable in f32.
            #
            # Layout lessons (device-trace-measured, in order tried):
            # (1) minor-axis halfwords [B, K, 16] tile-pad 16 lanes to 128
            #     — an 8x HBM bloat every consumer re-reads (~12 ms/ep);
            # (2) finalizing to u32 [B, K, 2] keys IN VMEM poisons the
            #     downstream dedup fusions (82 vs 46 ms/ep);
            # (3) this form: emit TRANSPOSED [W16, bb*K] via a second MXU
            #     contraction (same FLOPs, reversed operand order), lane
            #     dim bb*K fully dense; the multilinear hash then reduces
            #     over the MAJOR axis with no padding anywhere.
            W16 = H // 16
            hh = jax.lax.broadcasted_iota(jnp.int32, (W16, H), 1)
            ww = jax.lax.broadcasted_iota(jnp.int32, (W16, H), 0)
            P16T = jnp.where(hh // 16 == ww,
                             (jnp.int32(1) << (hh % 16)).astype(jnp.float32),
                             0.0)  # [W16, H]
            wT = jax.lax.dot_general(
                P16T, sf2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [W16, bb*K]
            keys_ref[0][:] = wT.astype(jnp.int32)

    return _kernel


@partial(jax.jit, static_argnames=("block_rows", "interpret", "emit_keys"))
def bsc_lpj_pallas(ss, Wty, y2, G, pre1, pil_bar, block_rows: int = 64,
                   interpret: bool = False, emit_keys: bool = False):
    """ss: int8 0/1 [B, K, H] (the framework's device state representation;
    bool inputs are cast — int8 avoids the pred->s8 HBM round-trip and the
    f32 cast happens in VMEM) OR lane-major packed uint8 [B, K, H/8]
    (EAConfig.packed_states: unpacked entirely in VMEM — the 8x-smaller HBM
    read is the fastest path); Wty: f32 [B, H]; y2: f32 [B]; G: f32 [H, H]
    (shared Gram, complete data).  Returns lpj f32 [B, K] — or, with
    emit_keys, (lpj, FINAL dedup keys uint32 [B, K, W] bit-identical to
    ops.bitpack.dedup_keys of the same states: exact pack_states words when
    W = ceil(H/32) <= 2, else the 2-word canonical halfword hash).  The
    kernel emits 16-bit halfwords from the VMEM-resident states (so the
    dedup path never re-reads the state array from HBM); the cheap
    word-combine / hash_halfwords finalize runs as XLA ops on the
    transposed [H/16, B*K] kernel output — deliberately, see the layout
    note inside _make_kernel (finalizing in VMEM poisons the downstream
    fusion layouts and was measured slower).

    Requires B % block_rows == 0.  H is lane-padded to a multiple of 32
    inside this wrapper (zero pad latents contribute nothing to any lpj
    term, and the padded halfword count 2*ceil(H/32) is exactly what
    ops.bitpack.dedup_keys hashes, so emitted keys stay bit-identical to
    the XLA path for EVERY H); multiples of 128 get full lane utilization
    (callers' profitability gate)."""
    B, K, Win = ss.shape
    H = G.shape[0]
    packed = ss.dtype == jnp.uint8
    assert (Win == -(-H // 8)) if packed else (Win == H), (ss.shape, H)
    Hp = max(32, -(-H // 32) * 32)
    if packed:
        # the in-VMEM unpack yields exactly 8*ceil(H/8) lanes; padding a
        # packed tile inside VMEM isn't worth the complexity, so the packed
        # path keeps the aligned-H requirement (it only runs at the
        # benchmark-scale configs, which satisfy it)
        assert H % 32 == 0 and H == Hp, H
    elif Hp != H:
        # lane-pad states/model so the kernel sees an aligned problem; the
        # pad columns are identically zero => lpj and keys are exact
        ss = jnp.pad(ss if ss.dtype == jnp.int8 else ss.astype(jnp.int8),
                     ((0, 0), (0, 0), (0, Hp - H)))
        Wty = jnp.pad(Wty, ((0, 0), (0, Hp - H)))
        G = jnp.pad(G, ((0, Hp - H), (0, Hp - H)))
        H = Hp
        Win = ss.shape[2]
    bb = _resolve_block_rows(block_rows, B, K, emit_keys)
    assert B % bb == 0, (B, bb)
    assert not emit_keys or (bb * K) % 128 == 0, (
        f"emit_keys needs a 128-multiple halfword block (bb*K = {bb}*{K}); "
        "B is too small to grow bb — gate callers with "
        "pallas_lpj_applicable (Mosaic lowering would fail opaquely)")
    grid = (B // bb,)
    scal = jnp.stack([pre1, pil_bar]).astype(jnp.float32).reshape(1, 2)
    W16 = H // 16 if emit_keys else 0

    out_shape = jax.ShapeDtypeStruct((B, K), jnp.float32)
    out_specs = pl.BlockSpec((bb, K), lambda i: (i, 0))
    if emit_keys:
        # transposed halfwords [W16, B*K]: each grid step's rows are a
        # contiguous column span, and the lane dim stays tile-dense
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((W16, B * K), jnp.int32))
        out_specs = (out_specs,
                     pl.BlockSpec((W16, bb * K), lambda i: (0, i)))

    out = pl.pallas_call(
        _make_kernel(packed, emit_keys),
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((bb, K, Win), lambda i: (i, 0, 0)),
                pl.BlockSpec((bb, H), lambda i: (i, 0)),
                pl.BlockSpec((bb, 1), lambda i: (i, 0)),
                pl.BlockSpec((H, H), lambda i: (0, 0)),
            ],
            out_specs=out_specs,
        ),
        interpret=interpret,
    )(scal,
      ss if ss.dtype in (jnp.int8, jnp.uint8) else ss.astype(jnp.int8),
      Wty.astype(jnp.float32),
      y2.astype(jnp.float32).reshape(B, 1), G.astype(jnp.float32))
    if emit_keys:
        lpj, hwT = out  # [H/16, B*K] int32 halfwords in [0, 2^16)
        hwT = hwT.reshape(W16, B, K)  # free: same linear element order
        if H <= 64:  # exact ops.bitpack.pack_states words
            lo = hwT[0::2].astype(jnp.uint32)
            hi = hwT[1::2].astype(jnp.uint32)
            return lpj, jnp.moveaxis(lo | (hi << 16), 0, -1)
        return lpj, hash_halfwords(hwT, axis=0)
    return out


def _resolve_block_rows(block_rows: int, B: int, K: int,
                        emit_keys: bool) -> int:
    """With emit_keys, the transposed halfword output block is
    (W16, bb*K) and Mosaic requires the last block dim to be a multiple
    of 128 (or the full array dim) — bb*K = 64*15 = 960 at the reference
    feature-learning S=15 is not.  Doubling bb until bb*K % 128 == 0
    restores lowering for every K (worst case bb = 128, since
    128*K % 128 == 0); B stays divisible because callers pad B to 1024
    multiples."""
    bb = block_rows
    if emit_keys:
        while (bb * K) % 128 != 0 and bb < B:
            bb *= 2
    return bb


def pallas_lpj_applicable(B: int, K: int, H: int, incomplete: bool,
                          block_rows: int = 64) -> bool:
    """The kernel pays off for MXU-sized complete-data problems.  H is
    lane-padded to a multiple of 32 inside the kernel wrapper, so any
    H >= 32 qualifies (below that the Gram is tiny and the einsum path is
    already cheap); the reference's own image-app default H=32
    (image-denoising/params.py) and feature-learning default H=100
    (feature-learning/params.py:30-43) both ride the kernel."""
    if incomplete:
        return False
    if jax.default_backend() not in ("tpu",):
        return False
    Hp = max(32, -(-H // 32) * 32)
    # assume emit_keys (the E-step path always emits dedup keys): bb may
    # be bumped so the transposed keys block stays 128-lane aligned
    bb = _resolve_block_rows(block_rows, B, K, emit_keys=True)
    vmem = bb * K * Hp * (4 + 4 + 1) + Hp * Hp * 4
    return (
        B % bb == 0
        and (bb * K) % 128 == 0
        and H >= 32
        and K >= 2
        and vmem < 12 * 2**20
    )
