"""Truncation-set update: merge new candidate states into K^(n).

Re-design of reference evo/variational/utils.py:231-337 (`vary_Kn`,
unification mode): pair the best new states with the worst old states and swap
wherever the new state is strictly better, with at most Mprime substitutions.
The result equals the top-S of (old K^(n) ∪ new uniques) limited to Mprime
substitutions — the reference's argpartition/unravel swap dance
(utils.py:294-319) computes exactly this; here it is two argsorts and a
masked scatter with static shapes.

Inputs are per-datapoint and meant to be vmapped.  `child_lpj` must carry
-inf at duplicate children (see evolve_states), which makes the reference's
re-deduplication against the current K^(n) (utils.py:279-285) unnecessary:
duplicates can never win a swap.  The reference's swap-only-if-better
invariant (assert at utils.py:318) holds by construction of the strict
comparison.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def vary_Kn(
    ss_n: jnp.ndarray,  # [S, H] bool
    lpj_n: jnp.ndarray,  # [S]
    children: jnp.ndarray,  # [T, H] bool
    child_lpj: jnp.ndarray,  # [T], -inf at duplicates
    Mprime: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (ss_new [S,H], lpj_new [S], n_subs scalar int)."""
    # at most min(#children, Mprime) substitutions (reference utils.py:294)
    Mprime = min(Mprime, child_lpj.shape[0])
    # best-Mprime new states, descending
    ord_new = jnp.argsort(-child_lpj)[:Mprime]
    # worst-Mprime old states, ascending
    ord_old = jnp.argsort(lpj_n)[:Mprime]
    new_vals = child_lpj[ord_new]
    old_vals = lpj_n[ord_old]
    do_swap = new_vals > old_vals  # [Mprime]; strict => -inf dups never enter

    src = children[ord_new]  # [Mprime, H]
    ss_rows = jnp.where(do_swap[:, None], src, ss_n[ord_old])
    lpj_rows = jnp.where(do_swap, new_vals, old_vals)
    ss_new = ss_n.at[ord_old].set(ss_rows)
    lpj_new = lpj_n.at[ord_old].set(lpj_rows)
    return ss_new, lpj_new, do_swap.sum()
