"""Evolutionary generation of new candidate states (fixed shapes).

Re-design of reference evo/variational/eas.py:153-313 (`evolve_states`): a
multi-generation loop of parent selection -> mutation -> dedup against all
previously seen states.  Differences forced by XLA's static-shape model, all
free-energy-neutral:

  - every generation produces exactly `children_per_gen` children; duplicate
    children are *masked* (returned lpj = -inf, new_unique = False) instead of
    dropped, so `vary_Kn` can never swap them in — equivalent to the
    reference dropping them (eas.py:252-257).
  - log-pseudo-joints are evaluated for *all* children in one batched call
    instead of only for new-unique ones; a duplicate's recomputed lpj equals
    the value the reference recycles from storage (eas.py:271-293), so the
    selection pool for the next generation sees the same fitness values.
  - the next generation's parents are selected from this generation's full
    children array (with true lpjs); the reference selects from the
    generation's [unique + one-copy-of-each-regenerated] states.  Duplicated
    children thus carry proportionally more selection weight here; this is a
    statistical difference of the sampler only (the set of reachable states
    and the monotone K^(n) improvement are identical).

The whole function is per-datapoint and meant to be vmapped over the batch;
generations are unrolled (n_generations is small and the g=0 pool has a
different width than later pools).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from evo_tpu.ops.bitpack import (
    dedup_keys,
    dedup_keys_packed,
    dup_against,
    dup_within,
    n_bytes_lane,
    n_words,
    pack_bits_lane,
    take_rows,
    unpack_bits_lane,
)
from evo_tpu.variational.config import EAConfig
from evo_tpu.variational.mutation import MUTATION_FNS
from evo_tpu.variational.selection import select_idx

NEG_INF = -jnp.inf


def evolve_states(
    key: jax.Array,
    ss_n: jnp.ndarray,  # [S, H] bool — current K^(n)
    lpj_n: jnp.ndarray,  # [S] — their log-pseudo-joints (non-permanent part)
    lpj_fn: Callable[[jnp.ndarray], jnp.ndarray],  # [C, H] bool -> [C]
    cfg: EAConfig,
    sparseness,  # pi*H of the current model (dynamic)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (children [T,H] bool, child_lpj [T] with -inf at duplicates,
    new_unique [T] bool, child_lpj_raw [T] without the duplicate masking)
    where T = cfg.n_new.  The raw lpjs feed the whole-set merge mode
    (vary_Kn_whole_set), which compares summed joints over ALL children
    exactly as the reference does (utils.py:325-335)."""
    S, H = ss_n.shape
    assert H == cfg.H
    C = cfg.children_per_gen
    G = cfg.n_generations
    T = cfg.n_new
    W = min(n_words(H), 2)  # dedup keys: exact words for H <= 64, else hashed
    mutate = MUTATION_FNS[cfg.mutation_algorithm]

    # Seen-set buffer: permanent states + K^(n) + children added so far.
    cap = cfg.S_perm + S + T
    seen_keys = jnp.zeros((cap, W), dtype=jnp.uint32)
    seen_valid = jnp.zeros((cap,), dtype=bool)
    if cfg.allzero:
        zero_key = dedup_keys(jnp.zeros((1, H), dtype=bool))
        seen_keys = seen_keys.at[0:1].set(zero_key)
        seen_valid = seen_valid.at[0].set(True)
    off = cfg.S_perm
    seen_keys = jax.lax.dynamic_update_slice(seen_keys, dedup_keys(ss_n), (off, 0))
    seen_valid = jax.lax.dynamic_update_slice(seen_valid, jnp.ones((S,), bool), (off,))
    off += S

    pool_states, pool_lpj = ss_n, lpj_n
    out_states, out_lpj, out_new, out_raw = [], [], [], []

    for g in range(G):
        kg = jax.random.fold_in(key, g)
        k_sel, k_mut = jax.random.split(kg)

        n_par = min(pool_states.shape[0], cfg.n_parents)
        pidx = select_idx(cfg.parent_selection, k_sel, pool_lpj, pool_states.shape[0], n_par)
        parents = take_rows(pool_states, pidx).astype(bool)

        # background unit excluded from mutation, then forced back on
        # (reference eas.py:215-219, 236-239)
        children_m = mutate(
            k_mut, parents[:, : cfg.H_mut], cfg.n_children, sparseness, cfg.bitflip_prob
        )
        if cfg.background:
            bg = jnp.ones((children_m.shape[0], 1), dtype=bool)
            children = jnp.concatenate([children_m, bg], axis=1)
        else:
            children = children_m
        children = children.astype(ss_n.dtype)  # int8 on device (see take_rows)
        assert children.shape == (C, H)

        ckeys = dedup_keys(children)
        is_dup = dup_against(ckeys, seen_keys, seen_valid) | dup_within(ckeys)
        new_unique = ~is_dup

        child_lpj = lpj_fn(children)

        # register the new uniques in the seen set
        seen_keys = jax.lax.dynamic_update_slice(seen_keys, ckeys, (off, 0))
        seen_valid = jax.lax.dynamic_update_slice(seen_valid, new_unique, (off,))
        off += C

        out_states.append(children)
        out_lpj.append(jnp.where(new_unique, child_lpj, NEG_INF))
        out_new.append(new_unique)
        out_raw.append(child_lpj)

        # next generation selects among this generation's children
        # (reference eas.py:226-230)
        pool_states, pool_lpj = children, child_lpj

    children = jnp.concatenate(out_states, axis=0)
    child_lpj = jnp.concatenate(out_lpj, axis=0)
    new_unique = jnp.concatenate(out_new, axis=0)
    child_lpj_raw = jnp.concatenate(out_raw, axis=0)
    assert children.shape == (T, H)
    return children, child_lpj, new_unique, child_lpj_raw


def evolve_states_block(
    keys_b: jax.Array,  # [B] PRNG keys (one per datapoint)
    ss_b: jnp.ndarray,  # [B, S, H] int8/bool — or packed u8 [B, S, H/8]
    lpj_b: jnp.ndarray,  # [B, S]
    lpj_fn_block: Callable,  # [B, C, H or H/8] -> ([B, C], dkeys|None, aux)
    cfg: EAConfig,
    sparseness,  # pi*H of the current model (dynamic scalar)
    packed: bool = False,
    ss_dkeys=None,  # [B, S, W] u32 — precomputed dedup keys of ss_b
):
    """Block-level `evolve_states`: numerically identical to
    ``vmap(evolve_states)`` over the batch (same per-datapoint RNG stream,
    same dedup bookkeeping), but the children log-pseudo-joints are evaluated
    ONCE per generation for the whole [B, C, H] batch, so the caller can
    route the evaluation through an MXU/Pallas kernel instead of a vmapped
    einsum (which XLA surrounds with layout copies of the f32-cast states).

    With ``packed=True``, states flow through in the lane-major bit-packed
    uint8 format (ops.bitpack.pack_bits_lane): the seen-set keys come
    straight from the packed bytes, children are packed right after
    mutation, and only the tiny per-datapoint parent sets are ever unpacked
    — candidate state arrays never materialize unpacked in HBM.

    ``lpj_fn_block`` returns (lpj [B, C], dkeys, aux): dkeys is either the
    children's dedup keys ([B, C, W] u32, e.g. emitted by the Pallas lpj
    kernel from the states already in VMEM) or None (computed here from
    the states); aux values (e.g. lpj reset counters) are collected into a
    list and returned alongside.  ``ss_dkeys`` similarly short-circuits
    the seen-set initialization keys of ss_b.

    Returns (children [B,T,Hrep], child_lpj [B,T] with -inf at duplicates,
    new_unique [B,T], child_lpj_raw [B,T], aux_list).
    """
    B, S, Hrep = ss_b.shape
    H = cfg.H
    assert Hrep == (n_bytes_lane(H) if packed else H), (ss_b.shape, H)
    keys_of = dedup_keys_packed if packed else dedup_keys
    C = cfg.children_per_gen
    T = cfg.n_new
    W = min(n_words(H), 2)
    mutate = MUTATION_FNS[cfg.mutation_algorithm]
    cap = cfg.S_perm + S + T

    if ss_dkeys is None:
        ss_dkeys = jax.vmap(keys_of)(ss_b)
    assert ss_dkeys.shape == (B, S, W), (ss_dkeys.shape, (B, S, W))

    def init_seen(kk):
        seen_keys = jnp.zeros((cap, W), dtype=jnp.uint32)
        seen_valid = jnp.zeros((cap,), dtype=bool)
        if cfg.allzero:
            zero_key = keys_of(jnp.zeros(
                (1, Hrep), dtype=jnp.uint8 if packed else bool))
            seen_keys = seen_keys.at[0:1].set(zero_key)
            seen_valid = seen_valid.at[0].set(True)
        seen_keys = jax.lax.dynamic_update_slice(
            seen_keys, kk, (cfg.S_perm, 0))
        seen_valid = jax.lax.dynamic_update_slice(
            seen_valid, jnp.ones((S,), bool), (cfg.S_perm,))
        return seen_keys, seen_valid

    seen_keys, seen_valid = jax.vmap(init_seen)(ss_dkeys)
    pool_states, pool_lpj = ss_b, lpj_b
    out_states, out_lpj, out_new, out_raw, aux_list = [], [], [], [], []

    for g in range(cfg.n_generations):

        def sel_mut(key_n, pool_s, pool_l):
            # identical RNG stream to evolve_states: fold_in(key, g) + split
            kg = jax.random.fold_in(key_n, g)
            k_sel, k_mut = jax.random.split(kg)
            n_par = min(pool_s.shape[0], cfg.n_parents)
            pidx = select_idx(cfg.parent_selection, k_sel, pool_l,
                              pool_s.shape[0], n_par)
            parents = take_rows(pool_s, pidx)
            if packed:
                parents = unpack_bits_lane(parents, H)
            else:
                parents = parents.astype(bool)
            children_m = mutate(k_mut, parents[:, : cfg.H_mut],
                                cfg.n_children, sparseness, cfg.bitflip_prob)
            if cfg.background:
                bg = jnp.ones((children_m.shape[0], 1), dtype=bool)
                children_m = jnp.concatenate([children_m, bg], axis=1)
            if packed:
                return pack_bits_lane(children_m)
            return children_m.astype(ss_b.dtype)  # int8 on device

        children = jax.vmap(sel_mut)(keys_b, pool_states, pool_lpj)
        assert children.shape == (B, C, Hrep)
        child_lpj, cdkeys, aux = lpj_fn_block(children)
        aux_list.append(aux)
        if cdkeys is None:
            cdkeys = jax.vmap(keys_of)(children)
        assert cdkeys.shape == (B, C, W), (cdkeys.shape, (B, C, W))

        off = cfg.S_perm + S + g * C

        def dedup_one(ckeys, seen_k, seen_v):
            is_dup = dup_against(ckeys, seen_k, seen_v) | dup_within(ckeys)
            new_unique = ~is_dup
            seen_k = jax.lax.dynamic_update_slice(seen_k, ckeys, (off, 0))
            seen_v = jax.lax.dynamic_update_slice(seen_v, new_unique, (off,))
            return new_unique, seen_k, seen_v

        new_unique, seen_keys, seen_valid = jax.vmap(dedup_one)(
            cdkeys, seen_keys, seen_valid)

        out_states.append(children)
        out_lpj.append(jnp.where(new_unique, child_lpj, NEG_INF))
        out_new.append(new_unique)
        out_raw.append(child_lpj)
        pool_states, pool_lpj = children, child_lpj

    children = jnp.concatenate(out_states, axis=1)
    child_lpj = jnp.concatenate(out_lpj, axis=1)
    new_unique = jnp.concatenate(out_new, axis=1)
    child_lpj_raw = jnp.concatenate(out_raw, axis=1)
    assert children.shape == (B, T, Hrep)
    return children, child_lpj, new_unique, child_lpj_raw, aux_list
