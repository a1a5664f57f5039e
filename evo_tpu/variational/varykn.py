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

import jax
import jax.numpy as jnp

from evo_tpu.ops.bitpack import take_rows


def _prune_to_mprime(child_lpj: jnp.ndarray, Mprime: int) -> jnp.ndarray:
    """Mask all but the Mprime best children to -inf (reference
    utils.py:294 takes argpartition's top-Mprime before merging).

    Every child strictly better than the Mprime-th value is kept; ties AT
    the Mprime-th value are broken deterministically by index (the
    reference's argpartition tie choice is arbitrary; equal-lpj states are
    interchangeable for the merge).  Naively keeping "the first Mprime with
    lpj >= kth by index" is WRONG: when the Mprime-th value is -inf (most
    children are duplicates), leading -inf duplicates would crowd out a
    strictly better child appearing later."""
    T = child_lpj.shape[0]
    if Mprime >= T:
        return child_lpj
    kth = jax.lax.top_k(child_lpj, Mprime)[0][-1]
    greater = child_lpj > kth
    n_greater = jnp.sum(greater.astype(jnp.int32))
    tie = child_lpj == kth
    tie_rank = jnp.cumsum(tie.astype(jnp.int32))  # 1-based among ties
    keep = greater | (tie & (tie_rank <= Mprime - n_greater))
    return jnp.where(keep, child_lpj, -jnp.inf)


def vary_Kn(
    ss_n: jnp.ndarray,  # [S, H] bool
    lpj_n: jnp.ndarray,  # [S]
    children: jnp.ndarray,  # [T, H] bool
    child_lpj: jnp.ndarray,  # [T], -inf at duplicates
    Mprime: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (ss_new [S,H], lpj_new [S], n_subs, idx [S]) where idx maps
    each new K^(n) member to its position in concat(old, children) — callers
    use it to gather per-candidate quantities computed during evaluation.

    Implementation: new K^(n) = top-S of (old ∪ eligible children) as a
    single top_k + gather.  This equals the reference's pairwise
    best-new-for-worst-old swapping: greedily swapping the j-th best new
    into the j-th worst old iff strictly better produces exactly the top-S
    of the union (standard exchange argument), and capping eligibility to
    the top-Mprime children caps the substitution count.  Old states come
    first in the concatenation, so ties keep the old state (top_k prefers
    lower indices), preserving the strictly-better swap rule.  No scatters —
    this is ~3x cheaper on TPU than the positional swap."""
    S = lpj_n.shape[0]
    # only the best Mprime children are eligible (reference utils.py:294)
    child_lpj = _prune_to_mprime(child_lpj, Mprime)
    combined_lpj = jnp.concatenate([lpj_n, child_lpj])
    vals, idx = jax.lax.top_k(combined_lpj, S)
    ss_new = take_rows(jnp.concatenate([ss_n, children], axis=0), idx)
    n_sub = jnp.sum(idx >= S)
    return ss_new, vals, n_sub, idx


def vary_Kn_swap(
    ss_n: jnp.ndarray,  # [S, H] bool/int8
    lpj_n: jnp.ndarray,  # [S]
    children: jnp.ndarray,  # [T, H] bool/int8
    child_lpj: jnp.ndarray,  # [T], -inf at duplicates
    Mprime: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Position-preserving form of `vary_Kn`: identical K^(n) SET, but rows
    that survive the merge KEEP their storage slot (the reference's own
    positional best-new-for-worst-old swapping, utils.py:294-319, rather
    than a sorted rebuild).

    Why it exists: it reproduces the reference's positional row semantics
    exactly (slots are stable across epochs), which the trajectory-exact EA
    mirror (variational/mirror.py) relies on.  It was ALSO hypothesized to
    be faster ("write only where a child won"), but measured ~1.8x SLOWER
    than vary_Kn's one-hot-matmul rebuild at the north-star config (83.8 vs
    46.0 ms/epoch, tools/measure_swap_merge.py): the per-child fused selects
    unroll into min(T, S) full [S, H] passes that XLA materializes.  Keep
    vary_Kn for perf; use this for reference-exact positional behavior.

    Equivalence: pairing the j-th best eligible child with the j-th worst
    old row and swapping iff strictly better yields exactly the top-S of
    (old ∪ eligible children) — the same exchange argument as vary_Kn's
    docstring, run in the reference's original direction.  Ties keep the
    old state (strict >), matching both vary_Kn and the reference.

    Returns (ss_new [S,H], lpj_new [S], n_subs, idx [S]) with idx mapping
    into concat(old, children) — identical contract to vary_Kn, only the
    row order differs (slot-stable instead of lpj-sorted).
    """
    S = lpj_n.shape[0]
    T = child_lpj.shape[0]
    child_lpj = _prune_to_mprime(child_lpj, Mprime)
    M = min(T, S)
    cval, cidx = jax.lax.top_k(child_lpj, M)  # best children, desc
    nwval, wpos = jax.lax.top_k(-lpj_n, M)  # worst old slots, asc lpj
    swap = cval > -nwval  # [M]; strictly-better-only (prefix-true)
    # the M best children in rank order (tiny reduction dim T)
    ch_sorted = take_rows(children, cidx).astype(ss_n.dtype)  # [M, H]
    iota = jnp.arange(S)
    out, lpj_out, idx = ss_n, lpj_n, iota
    for j in range(M):  # M ~ n_children; unrolls into fused selects
        m = swap[j] & (iota == wpos[j])
        out = jnp.where(m[:, None], ch_sorted[j][None, :], out)
        lpj_out = jnp.where(m, cval[j], lpj_out)
        idx = jnp.where(m, S + cidx[j], idx)
    return out, lpj_out, jnp.sum(swap), idx


def vary_Kn_whole_set(
    ss_n: jnp.ndarray,  # [S, H] bool
    lpj_n: jnp.ndarray,  # [S]
    children: jnp.ndarray,  # [S, H] bool — the full replacement set
    child_lpj_raw: jnp.ndarray,  # [S] — UNMASKED lpjs (duplicates keep theirs)
    new_unique: jnp.ndarray,  # [S] bool
    reject_worse: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Non-unification merge (reference utils.py:325-335): replace the ENTIRE
    K^(n) with the children — unconditionally when reject_worse is False,
    otherwise only if the summed log-pseudo-joint does not decrease.

    Mirrored reference details: the sum runs over ALL children including
    duplicates (the reference's lpj_new is the raw evaluated array), a tie
    accepts the replacement (`<` rejects), and on rejection BOTH counters
    are zero (utils.py:330-332) even though new uniques were evaluated.

    Returns (ss_new [S,H], lpj_new [S], n_uni, n_sub, idx [S]) — the counter
    pair comes from here (unlike unification mode) because rejection zeroes
    it; idx maps into concat(old, children) like vary_Kn's."""
    S = lpj_n.shape[0]
    assert children.shape[0] == S, "whole-set mode needs exactly S children"
    if reject_worse:
        accept = jnp.sum(child_lpj_raw) >= jnp.sum(lpj_n)
    else:
        accept = jnp.ones((), dtype=bool)
    ss_new = jnp.where(accept, children, ss_n)
    lpj_new = jnp.where(accept, child_lpj_raw, lpj_n)
    n = jnp.where(accept, jnp.sum(new_unique, dtype=jnp.int32),
                  jnp.zeros((), jnp.int32))
    idx = jnp.where(accept, S + jnp.arange(S), jnp.arange(S))
    return ss_new, lpj_new, n, n, idx
