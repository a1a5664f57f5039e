"""Numerical stabilization for log-pseudo-joints and free energies.

Mirrors the behavior of the reference:
  - B-shift stabilized logsumexp (reference: evo/models/_models.py:433-436,
    544-547; constants B_max=0.0, B_max_shft=inf at _models.py:55-56)
  - lpj reset/clamping of NaN / tiny / infinite values with observability
    counters (reference: evo/models/_models.py:567-596)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# Reference constants (_models.py:55-56): B_max = 0.0, B_max_shft = +inf.
B_MAX = 0.0
B_MAX_SHFT = jnp.inf


def eps_lpj(dtype) -> float:
    """Most negative representable lpj (reference uses finfo(float64).min)."""
    return float(jnp.finfo(dtype).min)


class LpjResetCounts(NamedTuple):
    n_nan: jnp.ndarray
    n_small: jnp.ndarray
    n_inf: jnp.ndarray


def reset_lpj(lpj: jnp.ndarray, valid=None):
    """Clamp NaN / sub-floor / infinite lpj values, counting occurrences.

    Masks are computed *before* any replacement and then applied in order
    (nan -> eps, < eps -> eps, +-inf -> B_max), exactly mirroring the mask
    semantics of reference _models.py:581-594.  Returns (lpj, counts) where
    counts holds the number of affected entries (the reference counts
    affected *calls*; entry counts are strictly more informative and are only
    used for logging).
    """
    floor = eps_lpj(lpj.dtype)
    is_nan = jnp.isnan(lpj)
    is_small = lpj < floor  # only -inf can be < finfo.min
    is_inf = jnp.isinf(lpj)
    out = jnp.where(is_nan, floor, lpj)
    out = jnp.where(is_small, floor, out)
    out = jnp.where(is_inf, jnp.asarray(B_MAX, lpj.dtype), out)
    if valid is None:
        counts = LpjResetCounts(is_nan.sum(), is_small.sum(), is_inf.sum())
    else:
        # valid broadcasts over trailing state axes
        v = valid.reshape(valid.shape + (1,) * (lpj.ndim - valid.ndim))
        counts = LpjResetCounts(
            (is_nan & v).sum(), (is_small & v).sum(), (is_inf & v).sum()
        )
    return out, counts


def row_shift(lpj: jnp.ndarray) -> jnp.ndarray:
    """Per-row stabilization shift B = min(B_max - max(lpj), B_max_shft)."""
    return jnp.minimum(B_MAX - jnp.max(lpj, axis=-1), B_MAX_SHFT)


def shifted_logsumexp(lpj: jnp.ndarray) -> jnp.ndarray:
    """logsumexp over the last axis with the reference's B-shift."""
    B = row_shift(lpj)
    return jnp.log(jnp.sum(jnp.exp(lpj + B[..., None]), axis=-1)) - B


def free_energy_from_lpj(lpj: jnp.ndarray, ljc, row_valid=None) -> jnp.ndarray:
    """F = ljc + (1/N) sum_n [logsumexp_s lpj[n, s]] over valid rows.

    Under a sharded batch axis the sums below are global (GSPMD inserts the
    cross-device psum), replacing the reference's comm.allreduce
    (_models.py:436).
    """
    lse = shifted_logsumexp(lpj)
    if row_valid is None:
        return ljc + jnp.sum(lse) / lpj.shape[0]
    w = row_valid.astype(lse.dtype)
    return ljc + jnp.sum(lse * w) / jnp.maximum(jnp.sum(w), 1.0)


def posterior_weights(lpj: jnp.ndarray) -> jnp.ndarray:
    """Truncated posterior responsibilities r[n,s] = pjc / sum_s' pjc.

    pjc = exp(lpj + B) per reference (e.g. bsc.py:176-177); the normalizer
    includes all (permanent + variational) states of the row.
    """
    B = row_shift(lpj)
    pjc = jnp.exp(lpj + B[..., None])
    denom = jnp.sum(pjc, axis=-1, keepdims=True)
    return pjc / jnp.maximum(denom, jnp.finfo(lpj.dtype).tiny)
