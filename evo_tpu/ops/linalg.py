"""Batched small-matrix linear algebra that is actually fast on TPU.

XLA lowers jnp.linalg.inv / slogdet through a pivoted LU whose sequential
per-matrix control flow is catastrophically slow for huge batches of small
matrices (measured: ~1 ms per SSSC datapoint at H=32).  The SSSC slab
marginalization only ever inverts symmetric positive-definite matrices
(Psi~ and M~, see models/sssc.py), for which an unpivoted recursive
Schur-complement inversion is stable and maps entirely onto batched matmuls
and elementwise ops:

    A = [[A11, B], [B^T, A22]],   S = A22 - B^T A11^-1 B   (PD)
    A^-1 = [[A11^-1 + C C2^T, -C], [-C^T, S^-1]],  C = (A11^-1 B) S^-1
    log det A = log det A11 + log det S

recursing on half-size blocks down to a closed 1x1/2x2 base case.  The
recursion depth is log2(H); every level is a handful of batched matmuls —
no data-dependent control flow, no pivoting, fully parallel over the batch.

Non-PD inputs produce inf/nan exactly like the reference's np.linalg.inv
on singular inputs, and are caught by the lpj reset clamping downstream.
"""

from __future__ import annotations

import jax.numpy as jnp


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _pd_inv_logdet_pow2(A):
    """[..., h, h] PD with h a power of two -> (A^-1, logdet)."""
    h = A.shape[-1]
    if h == 1:
        a = A[..., 0, 0]
        return (1.0 / a)[..., None, None], jnp.log(a)
    if h == 2:
        a = A[..., 0, 0]
        b = A[..., 0, 1]
        c = A[..., 1, 0]
        d = A[..., 1, 1]
        det = a * d - b * c
        inv = (
            jnp.stack(
                [jnp.stack([d, -b], -1), jnp.stack([-c, a], -1)], -2
            )
            / det[..., None, None]
        )
        return inv, jnp.log(det)
    m = h // 2
    A11 = A[..., :m, :m]
    B = A[..., :m, m:]
    A22 = A[..., m:, m:]
    inv11, ld1 = _pd_inv_logdet_pow2(A11)
    iB = inv11 @ B  # A11^-1 B
    S = A22 - jnp.swapaxes(B, -1, -2) @ iB  # Schur complement (PD)
    invS, ld2 = _pd_inv_logdet_pow2(S)
    C = iB @ invS
    TL = inv11 + C @ jnp.swapaxes(iB, -1, -2)
    top = jnp.concatenate([TL, -C], axis=-1)
    bot = jnp.concatenate([-jnp.swapaxes(C, -1, -2), invS], axis=-1)
    return jnp.concatenate([top, bot], axis=-2), ld1 + ld2


def pd_inverse_logdet(A):
    """Inverse and log-determinant of batched symmetric PD matrices
    [..., H, H]; H is identity-padded to a power of two internally (the
    padding contributes 0 to the logdet and an identity block to the
    inverse, which is sliced away)."""
    H = A.shape[-1]
    P = _next_pow2(H)
    if P != H:
        pad = P - H
        eye = jnp.zeros(A.shape[:-2] + (pad, pad), A.dtype) + jnp.eye(pad, dtype=A.dtype)
        z1 = jnp.zeros(A.shape[:-2] + (H, pad), A.dtype)
        z2 = jnp.zeros(A.shape[:-2] + (pad, H), A.dtype)
        A = jnp.concatenate(
            [jnp.concatenate([A, z1], -1), jnp.concatenate([z2, eye], -1)], -2
        )
    inv, ld = _pd_inv_logdet_pow2(A)
    if P != H:
        inv = inv[..., :H, :H]
    return inv, ld
