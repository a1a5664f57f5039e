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

import jax.numpy as jnp

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
    bits = ss.reshape(ss.shape[:-1] + (W, WORD_BITS)).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(WORD_BITS, dtype=jnp.uint32)).astype(jnp.uint32)
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)


def eq_matrix(keys_a: jnp.ndarray, keys_b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs equality of packed keys: [A, W] x [B, W] -> bool [A, B]."""
    return jnp.all(keys_a[:, None, :] == keys_b[None, :, :], axis=-1)


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
