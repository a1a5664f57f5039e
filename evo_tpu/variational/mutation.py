"""Mutation operators generating children bitstrings from parents.

Pure fixed-shape JAX re-designs of the reference operators
(reference: evo/variational/eas.py:10-135).  All operators act on a single
datapoint's parents [P, H] (bool) and return children [C, H]; they are meant
to be vmapped over the batch.  Randomness comes from explicit jax.random keys.
"""

from __future__ import annotations

from itertools import combinations

import jax
import jax.numpy as jnp


def randflip(key, parents, n_children: int, sparseness=None, p_bf=None):
    """Uniform unique bitflips: child k of parent p flips exactly one bit,
    distinct across the parent's children (reference eas.py:10-43, which draws
    n_children distinct flip positions per parent via argpartition of random
    uniforms and assigns one per child)."""
    P, H = parents.shape
    if n_children == 1:
        # single child per parent: one uniform flip index suffices (256x
        # less PRNG work than drawing [P, H] uniforms)
        flip_idx = jax.random.randint(key, (P, 1), 0, H)
    else:
        u = jax.random.uniform(key, (P, H))
        # the top-C indices of iid uniforms form a uniformly random C-subset
        # — same distribution as the reference's argpartition trick, but
        # top_k is far cheaper than a full sort on the VPU
        flip_idx = jax.lax.top_k(u, n_children)[1]  # [P, C]
    children = jnp.repeat(parents, n_children, axis=0)  # [P*C, H], parent-major
    onehot = jax.nn.one_hot(flip_idx.reshape(-1), H, dtype=bool)
    return jnp.logical_xor(children, onehot)


def sparseflip(key, parents, n_children: int, sparseness=None, p_bf=None):
    """Sparsity-targeting bitflips (reference eas.py:46-100): flip
    probabilities p_0 (0->1) and p_1 (1->0) are chosen per parent so that the
    expected number of flips is p_bf*H while driving the children's number of
    ON bits toward `sparseness` (= pi*H of the current model)."""
    P, H = parents.shape
    dtype = jnp.result_type(float)
    s_abs = parents.sum(axis=1).astype(dtype)  # [P]
    Hf = jnp.asarray(H, dtype)
    eps = jnp.finfo(dtype).tiny
    alpha = (
        (Hf - s_abs)
        * ((Hf * p_bf) - (sparseness - s_abs))
        / ((sparseness - s_abs + Hf * p_bf) * s_abs + eps)
    )
    p_0 = (Hf * p_bf) / (Hf + (alpha - 1.0) * s_abs + eps)  # [P]
    p_1 = alpha * p_0  # [P]
    p = jnp.where(parents, p_1[:, None], p_0[:, None])  # [P, H]
    p = jnp.repeat(p, n_children, axis=0)  # [P*C, H]
    children = jnp.repeat(parents, n_children, axis=0)
    flips = jax.random.uniform(key, (P * n_children, H), dtype=dtype) < p
    return jnp.logical_xor(children, flips)


def cross(key, parents, n_children: int = None, sparseness=None, p_bf=None):
    """One-point crossover of every unordered parent pair, two children per
    pair (head of a + tail of b, and vice versa), crossover point uniform in
    [1, H-1] (reference eas.py:103-125)."""
    P, H = parents.shape
    pairs = list(combinations(range(P), 2))  # static
    ia = jnp.array([p[0] for p in pairs])
    ib = jnp.array([p[1] for p in pairs])
    cp = jax.random.randint(key, (len(pairs),), 1, H)  # [npairs]
    tail = jnp.arange(H)[None, :] >= cp[:, None]  # [npairs, H]
    A, B = parents[ia], parents[ib]
    c1 = jnp.where(tail, B, A)
    c2 = jnp.where(tail, A, B)
    # interleave (c1_0, c2_0, c1_1, ...) as in the reference
    return jnp.stack([c1, c2], axis=1).reshape(2 * len(pairs), H)


def cross_randflip(key, parents, n_children: int = None, sparseness=None, p_bf=None):
    k1, k2 = jax.random.split(key)
    return randflip(k2, cross(k1, parents), 1)


def cross_sparseflip(key, parents, n_children: int = None, sparseness=None, p_bf=None):
    k1, k2 = jax.random.split(key)
    return sparseflip(k2, cross(k1, parents), 1, sparseness, p_bf)


MUTATION_FNS = {
    "randflip": randflip,
    "sparseflip": sparseflip,
    "cross": cross,
    "cross_randflip": cross_randflip,
    "cross_sparseflip": cross_sparseflip,
}
