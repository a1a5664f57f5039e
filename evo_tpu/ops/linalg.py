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

import jax
import jax.numpy as jnp


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _pd_inv_logdet_pow2(A):
    """[..., h, h] PD with h a power of two -> (A^-1, logdet)."""
    h = A.shape[-1]
    # log|.| rather than log(.): matches the reference's use of
    # slogdet()[1] (log|det|, sign ignored — sssc.py:284,293), so mildly
    # indefinite matrices (possible for the learned Psi) yield finite
    # values instead of NaN
    if h == 1:
        a = A[..., 0, 0]
        return (1.0 / a)[..., None, None], jnp.log(jnp.abs(a))
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
        return inv, jnp.log(jnp.abs(det))
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


def equilibrated_pd_inverse(A, rel_ridge: float = 0.0):
    """Inverse of a symmetric PSD matrix [..., H, H], numerically hardened
    for f32 on TPU:

      1. optional relative Tikhonov ridge (rel_ridge * mean diag) — makes
         near-singular sufficient-statistic matrices (e.g. units that never
         activated) behave like the reference's pinv fallback instead of
         producing garbage,
      2. Jacobi equilibration D A D with D = diag(A)^(-1/2), which brings the
         matrix to unit diagonal before the Schur recursion (the raw
         sufficient-statistics matrices can be conditioned like N^2).
    """
    H = A.shape[-1]
    diag = jnp.diagonal(A, axis1=-2, axis2=-1)
    if rel_ridge:
        ridge = rel_ridge * jnp.mean(diag, axis=-1)[..., None]
        A = A + ridge[..., None] * jnp.eye(H, dtype=A.dtype)
        diag = diag + ridge
    d = 1.0 / jnp.sqrt(jnp.maximum(diag, jnp.finfo(A.dtype).tiny))
    An = A * d[..., :, None] * d[..., None, :]
    inv_n, _ = pd_inverse_logdet(An)
    return inv_n * d[..., :, None] * d[..., None, :]


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
    # TPU f32 matmuls run reduced-precision bf16 passes by default, which
    # wrecks Schur complements of large-magnitude matrices (observed: NaN
    # pivots and garbage inverses at Gram scales ~1e5); force true-f32
    with jax.default_matmul_precision("high"):
        inv, ld = _pd_inv_logdet_pow2(A)
    if P != H:
        inv = inv[..., :H, :H]
    return inv, ld
