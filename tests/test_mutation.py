import numpy as np
import jax
import jax.numpy as jnp

from evo_tpu.variational.mutation import (
    randflip,
    sparseflip,
    cross,
    cross_randflip,
    cross_sparseflip,
)


def hamming(a, b):
    return int(np.logical_xor(a, b).sum())


def test_randflip_exactly_one_flip_distinct_per_parent(rng):
    P, H, C = 5, 16, 3
    parents = jnp.asarray(rng.random((P, H)) < 0.3)
    children = np.asarray(randflip(jax.random.key(0), parents, C))
    assert children.shape == (P * C, H)
    pnp = np.asarray(parents)
    for p in range(P):
        flipped_bits = set()
        for c in range(C):
            child = children[p * C + c]
            assert hamming(child, pnp[p]) == 1
            bit = int(np.argmax(np.logical_xor(child, pnp[p])))
            flipped_bits.add(bit)
        # bitflips unique per parent (reference eas.py:29-33)
        assert len(flipped_bits) == C


def test_randflip_uniform_flip_distribution():
    P, H, C = 1, 8, 1
    parents = jnp.zeros((P, H), dtype=bool)
    counts = np.zeros(H)
    for i in range(400):
        child = np.asarray(randflip(jax.random.key(i), parents, C))[0]
        counts[np.argmax(child)] += 1
    assert counts.min() > 20  # roughly uniform (mean 50)


def test_sparseflip_shapes_and_flip_behaviour(rng):
    P, H, C = 4, 20, 2
    parents = jnp.asarray(rng.random((P, H)) < 0.3)
    children = np.asarray(
        sparseflip(jax.random.key(0), parents, C, sparseness=2.0, p_bf=0.1)
    )
    assert children.shape == (P * C, H)


def test_sparseflip_targets_sparseness(rng):
    # Parents denser than target sparseness: children should lose bits on
    # average (p_1 > p_0 when s_abs > sparseness)
    H, target = 40, 4.0
    parents = jnp.asarray(rng.random((3, H)) < 0.6)  # ~24 ON bits
    start_on = np.asarray(parents).sum(axis=1).mean()
    ch = []
    for i in range(50):
        ch.append(np.asarray(sparseflip(jax.random.key(i), parents, 2, target, 0.3)))
    mean_on = np.concatenate(ch).sum(axis=1).mean()
    assert mean_on < start_on - 1.0


def test_cross_structure(rng):
    P, H = 4, 12
    parents = jnp.asarray(rng.random((P, H)) < 0.5)
    children = np.asarray(cross(jax.random.key(3), parents))
    assert children.shape == (P * (P - 1), H)
    pnp = np.asarray(parents)
    # every child must be head of one parent + tail of another at some cp
    for child in children:
        ok = False
        for a in range(P):
            for b in range(P):
                if a == b:
                    continue
                for cp in range(1, H):
                    cand = np.concatenate([pnp[a][:cp], pnp[b][cp:]])
                    if (cand == child).all():
                        ok = True
        assert ok


def test_cross_variants_shapes(rng):
    P, H = 4, 12
    parents = jnp.asarray(rng.random((P, H)) < 0.5)
    c1 = np.asarray(cross_randflip(jax.random.key(0), parents))
    c2 = np.asarray(cross_sparseflip(jax.random.key(0), parents, None, 2.0, 0.1))
    assert c1.shape == (P * (P - 1), H)
    assert c2.shape == (P * (P - 1), H)
