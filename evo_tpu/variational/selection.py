"""Parent selection for the evolutionary E-step.

Re-designs of reference eas.py:138-151.  The reference's
``np.random.choice(replace=False, p=fitness)`` performs successive
weight-proportional draws without replacement; the Gumbel-top-k trick below is
equal in distribution (Plackett-Luce sampling) and is vmappable with static
shapes on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gumbel_topk(key, log_weights, k: int):
    g = jax.random.gumbel(key, log_weights.shape, dtype=log_weights.dtype)
    return jax.lax.top_k(log_weights + g, k)[1]


def fitparents_idx(key, lpj, k: int):
    """Indices of k parents sampled w/o replacement with probability
    proportional to fitness = lpj - 2*min(min(lpj), 0) (reference
    eas.py:138-146; the normalization there is immaterial).

    Reset-floored lpjs (eps_lpj = finfo.min, from reset_lpj clamping a
    failed solve) are excluded from the shift and given zero weight:
    feeding finfo.min into the 2*min shift overflows the subtraction to
    +inf for EVERY candidate, which would silently turn the weighted
    sampling into deterministic first-k index order (the reference, f64
    end-to-end, would instead crash in np.random.choice on the
    inf/NaN probabilities).  For pools without floored entries —
    every healthy epoch — this is bit-identical to the plain formula."""
    floored = lpj <= 0.5 * jnp.finfo(lpj.dtype).min
    m = jnp.minimum(jnp.min(jnp.where(floored, 0.0, lpj)), 0.0)
    fitness = jnp.where(floored, 0.0, lpj - 2.0 * m)
    logw = jnp.log(fitness + jnp.finfo(lpj.dtype).tiny)
    return _gumbel_topk(key, logw, k)


def randparents_idx(key, n_candidates: int, k: int, dtype=jnp.float32):
    """Indices of k parents sampled uniformly w/o replacement
    (reference eas.py:149-151)."""
    return _gumbel_topk(key, jnp.zeros((n_candidates,), dtype), k)


def fitparents(key, candidates, n_parents: int, lpj):
    return candidates[fitparents_idx(key, lpj, n_parents)]


def randparents(key, candidates, n_parents: int, lpj=None):
    return candidates[randparents_idx(key, candidates.shape[0], n_parents)]


def select_idx(selection: str, key, lpj, n_candidates: int, k: int):
    if selection == "fit":
        return fitparents_idx(key, lpj, k)
    elif selection == "rand":
        return randparents_idx(key, n_candidates, k, lpj.dtype)
    raise ValueError(selection)
