"""Bit-packed binary-state keys and fixed-shape duplicate detection.

The reference deduplicates candidate states with a dynamic-shape void-view
``np.unique`` trick (reference: evo/variational/eas.py:252-257,
evo/variational/utils.py:279-285).  That is unusable under XLA tracing, so we
instead pack every H-bit state into ceil(H/32) uint32 words and detect
duplicates with fixed-shape pairwise word comparisons.  Duplicates are never
*dropped*; callers mask them (e.g. lpj -> -inf) so all shapes stay static.

For the candidate-set sizes that occur here (S + generations*children, i.e.
tens to a few hundreds per datapoint) the O(K^2 * ceil(H/32)) comparison is a
handful of cheap VPU integer ops and vectorizes perfectly over N.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

WORD_BITS = 32


def n_words(H: int) -> int:
    return -(-H // WORD_BITS)


def pack_states(ss: jnp.ndarray) -> jnp.ndarray:
    """Pack boolean states [..., H] into uint32 keys [..., ceil(H/32)].

    Bit h of word w corresponds to latent unit ``w*32 + h`` (little-endian),
    i.e. the packed key is a faithful, order-preserving encoding of the state.
    """
    H = ss.shape[-1]
    W = n_words(H)
    pad = W * WORD_BITS - H
    if pad:
        zeros = jnp.zeros(ss.shape[:-1] + (pad,), dtype=ss.dtype)
        ss = jnp.concatenate([ss, zeros], axis=-1)
    # select-then-reduce (not astype-then-multiply): XLA fuses the pred
    # select into the reduction, where an int->u32 convert of the full
    # [..., H] array would materialize 4 bytes/bit in HBM
    bits = ss.reshape(ss.shape[:-1] + (W, WORD_BITS)) != 0
    weights = (jnp.uint32(1) << jnp.arange(WORD_BITS, dtype=jnp.uint32)).astype(jnp.uint32)
    return jnp.sum(jnp.where(bits, weights, jnp.uint32(0)), axis=-1,
                   dtype=jnp.uint32)


def pack_bits_u8(ss: jnp.ndarray) -> jnp.ndarray:
    """Pack boolean states [..., H] to uint8 [..., ceil(H/8)] (little
    bitorder, matching np.packbits(..., bitorder='little')).  Used for the
    8x-compressed persistent storage of the K^(n) state sets."""
    H = ss.shape[-1]
    W8 = -(-H // 8)
    pad = W8 * 8 - H
    if pad:
        ss = jnp.concatenate(
            [ss, jnp.zeros(ss.shape[:-1] + (pad,), ss.dtype)], axis=-1
        )
    bits = ss.reshape(ss.shape[:-1] + (W8, 8)).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8)).astype(jnp.uint8)
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint8)


def unpack_bits_u8(packed: jnp.ndarray, H: int) -> jnp.ndarray:
    """uint8 [..., ceil(H/8)] (little bitorder) -> bool [..., H]."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(packed.shape[:-1] + (-1,))[..., :H].astype(bool)


# ---------------------------------------------------------------------------
# Lane-major packing: the persistent on-device format for bit-packed states.
#
# Latent unit l lives in byte (l mod W8), bit (l div W8), W8 = ceil(H/8) —
# the TRANSPOSE of np.packbits' byte-major order.  Chosen so a Pallas kernel
# can unpack a [*, W8] tile entirely in VMEM with lane-aligned ops:
# pltpu.repeat(pk, 8, axis=-1) tiles the byte vector (r[.., h] = pk[.., h mod
# W8]), and bit (h div W8) of r[.., h] is exactly latent h.
# ---------------------------------------------------------------------------


def n_bytes_lane(H: int) -> int:
    return -(-H // 8)


def pack_bits_lane(ss: jnp.ndarray) -> jnp.ndarray:
    """Binary states [..., H] -> lane-major packed uint8 [..., ceil(H/8)]."""
    H = ss.shape[-1]
    W8 = n_bytes_lane(H)
    pad = W8 * 8 - H
    if pad:
        ss = jnp.concatenate(
            [ss, jnp.zeros(ss.shape[:-1] + (pad,), ss.dtype)], axis=-1
        )
    bits = ss.reshape(ss.shape[:-1] + (8, W8)) != 0  # [.., j, b], l = j*W8+b
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))[:, None]
    return jnp.sum(jnp.where(bits, weights, jnp.uint8(0)), axis=-2,
                   dtype=jnp.uint8)


def unpack_bits_lane(packed: jnp.ndarray, H: int) -> jnp.ndarray:
    """Lane-major packed uint8 [..., ceil(H/8)] -> bool [..., H]."""
    shifts = jnp.arange(8, dtype=jnp.uint8).reshape(8, 1)
    bits = (packed[..., None, :] >> shifts) & jnp.uint8(1)  # [.., 8, W8]
    return bits.reshape(packed.shape[:-1] + (-1,))[..., :H].astype(bool)


def pack_bits_lane_host(ss) -> "np.ndarray":
    """NumPy twin of pack_bits_lane for host-side initialization."""
    import numpy as np

    H = ss.shape[-1]
    W8 = n_bytes_lane(H)
    pad = W8 * 8 - H
    if pad:
        ss = np.concatenate(
            [ss, np.zeros(ss.shape[:-1] + (pad,), ss.dtype)], axis=-1)
    bits = ss.reshape(ss.shape[:-1] + (8, W8)).astype(np.uint8)
    out = np.zeros(ss.shape[:-1] + (W8,), np.uint8)
    for j in range(8):
        out |= bits[..., j, :] << j
    return out


def dedup_keys_packed(packed: jnp.ndarray, exact: bool = False) -> jnp.ndarray:
    """Duplicate-detection keys from lane-major packed states [..., W8]:
    4 bytes -> 1 exact uint32 word; hashed to 2 words when more than 2
    (same policy as dedup_keys).  Keys are only compared against keys from
    this same function, so the byte order inside a word is irrelevant —
    it just has to be bijective."""
    W8 = packed.shape[-1]
    W4 = -(-W8 // 4)
    pad = W4 * 4 - W8
    if pad:
        packed = jnp.concatenate(
            [packed, jnp.zeros(packed.shape[:-1] + (pad,), jnp.uint8)],
            axis=-1)
    b = packed.reshape(packed.shape[:-1] + (W4, 4)).astype(jnp.uint32)
    weights = (jnp.uint32(1) << (8 * jnp.arange(4, dtype=jnp.uint32)))
    keys = jnp.sum(b * weights, axis=-1, dtype=jnp.uint32)
    if exact or keys.shape[-1] <= 2:
        return keys
    return hash_words(keys)


def _fmix32(k: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finalizer (avalanche), int32 carrier with logical shifts —
    bit-identical to the uint32 formulation, Mosaic-friendly."""
    srl = jax.lax.shift_right_logical

    def mul(a, c):
        return a * jnp.int32(np.int32(np.uint32(c)))

    k = k ^ srl(k, 16)
    k = mul(k, 0x85EBCA6B)
    k = k ^ srl(k, 13)
    k = mul(k, 0xC2B2AE35)
    return k ^ srl(k, 16)


def hash_halfwords(hw: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Canonical dedup hash: little-endian 16-bit halfword values
    [..., W16] (integer-valued, each < 2^16) -> 2 uint32 hash words
    [..., 2]: two independent multilinear sums k = sum_v c_v * h_v mod 2^32
    (fixed odd constants) with a murmur3 finalizer.

    Why this form: it is pure full-lane multiplies + one lane-reduction —
    no per-halfword lane extraction — so it fuses cleanly over the Pallas
    lpj kernel's transposed [H/16, B*K] halfword output (replacing a
    sequential FNV loop whose per-component steps forced component-major
    relayouts, ~6 ms/epoch at the benchmark config).  The halfword
    EMISSION happens inside the kernel from VMEM-resident states; this
    finalize runs as XLA ops on the kernel output (in-VMEM finalization
    was measured slower — see _make_kernel).  Arithmetic rides an int32 carrier
    (wraparound bits identical to uint32; shifts explicitly logical) since
    Mosaic's u32 support is narrower.

    Collisions: odd c_v makes states differing in a SINGLE halfword
    collision-free (c_v * d == 0 mod 2^32 has no solution for 0 < |d| <
    2^16); multi-halfword differences collide with probability ~2^-64
    (generic) and provably <= 2^-32 even for adversarial power-of-two
    difference patterns.  A false duplicate only suppresses one candidate
    state for one datapoint-epoch — negligible at any realistic scale
    (< 1e-9 per epoch at the N=100k benchmark config).  Callers keep exact
    keys when they fit 2 words (see dedup_keys).

    `axis` selects the halfword axis (the Pallas caller keeps halfwords on
    the MAJOR axis of a [W16, B, K] array so the lane dims stay dense —
    a minor-axis W16=16 would be tile-padded to 128 lanes, an 8x HBM
    bloat); the hash value is axis-invariant."""
    axis = axis % hw.ndim
    W16 = hw.shape[axis]
    # the odd constants are DERIVED by traced ops from an iota (splitmix32
    # scramble of the halfword index) — Pallas kernels cannot capture
    # constant arrays, and this way the kernel and the XLA path literally
    # share this code
    golden = jnp.int32(np.int32(np.uint32(0x9E3779B9)))
    cshape = tuple(W16 if d == axis else 1 for d in range(hw.ndim))
    i1 = jax.lax.broadcasted_iota(jnp.int32, cshape, axis)
    c1 = _fmix32((i1 + 1) * golden) | 1
    c2 = _fmix32((i1 + 1 + W16) * golden) | 1
    h = hw.astype(jnp.int32)
    k1 = jnp.sum(h * c1, axis=axis, dtype=jnp.int32)
    k2 = jnp.sum(h * c2, axis=axis, dtype=jnp.int32)
    out = jnp.stack([_fmix32(k1), _fmix32(k2)], axis=-1)
    return jax.lax.bitcast_convert_type(out, jnp.uint32)


def hash_words(keys: jnp.ndarray) -> jnp.ndarray:
    """Mix packed words [..., W] uint32 into 2 uint32 hash words [..., 2]
    by splitting each word into its (lo, hi) halfwords — the same
    little-endian halfword order the Pallas kernel's 16-bit packing yields
    — and feeding the canonical halfword hash."""
    lo = keys & jnp.uint32(0xFFFF)
    hi = keys >> 16
    hw = jnp.stack([lo, hi], axis=-1).reshape(keys.shape[:-1] + (-1,))
    return hash_halfwords(hw)


def dedup_keys(ss: jnp.ndarray, exact: bool = False) -> jnp.ndarray:
    """Duplicate-detection keys for states [..., H]: the exact packed words
    when they already fit in 2 (H <= 64) or exact=True, else a 64-bit hash."""
    keys = pack_states(ss)
    if exact or keys.shape[-1] <= 2:
        return keys
    return hash_words(keys)


def eq_matrix(keys_a: jnp.ndarray, keys_b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs equality of packed keys: [A, W] x [B, W] -> bool [A, B].

    The word dimension is unrolled in Python so every compare is a plain
    [A, B] tensor — a [A, B, W] layout with tiny W wastes most of the VPU's
    128 lanes in padding."""
    W = keys_a.shape[-1]
    eq = keys_a[:, None, 0] == keys_b[None, :, 0]
    for w in range(1, W):
        eq &= keys_a[:, None, w] == keys_b[None, :, w]
    return eq


def dup_within(keys: jnp.ndarray) -> jnp.ndarray:
    """dup[i] = True iff an *earlier* row j < i holds the same key.

    First occurrence wins — matching the semantics of np.unique's
    return_index (first index of each unique value) used by the reference.
    """
    K = keys.shape[0]
    eq = eq_matrix(keys, keys)
    earlier = jnp.tril(jnp.ones((K, K), dtype=bool), k=-1)
    return jnp.any(eq & earlier, axis=1)


def dup_against(keys: jnp.ndarray, seen_keys: jnp.ndarray, seen_valid: jnp.ndarray) -> jnp.ndarray:
    """dup[i] = True iff keys[i] equals any *valid* row of seen_keys.

    seen_keys: [M, W] uint32, seen_valid: [M] bool.
    """
    eq = eq_matrix(keys, seen_keys)
    return jnp.any(eq & seen_valid[None, :], axis=1)


def take_rows(mat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of a binary (bool/int8 0-1) matrix [K, H] by indices [M]
    via a one-hot matmul.  Vmapped dynamic row-gathers lower to very slow
    code on TPU; the equivalent one-hot contraction runs on the MXU (values
    are exact: 0/1 in bf16 with f32 accumulation).

    Returns int8 — the framework's device representation for states (bool
    operands force extra pred<->s8 HBM round-trips around the Pallas
    kernels; int8 feeds them directly).  uint8 inputs (lane-major packed
    states, values 0..255) pass through exactly: one-hot selection in bf16
    with f32 accumulation reproduces any integer <= 255 bit-for-bit."""
    K = mat.shape[0]
    oh = jax.nn.one_hot(idx, K, dtype=jnp.bfloat16)  # [M, K]
    out = jnp.dot(oh, mat.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    if mat.dtype == jnp.uint8:
        return out.astype(jnp.uint8)
    return (out > 0.5).astype(jnp.int8)
