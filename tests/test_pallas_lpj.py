"""The fused Pallas lpj kernel must match the XLA einsum path
(interpret mode on CPU; compiled-vs-XLA equality is exercised on TPU by
bench.py and the perf scripts)."""

import numpy as np
import jax
import jax.numpy as jnp

from evo_tpu.models.bsc import BSC
from evo_tpu.ops.pallas_lpj import bsc_lpj_pallas, pallas_lpj_applicable


def test_pallas_lpj_matches_xla(rng):
    B, K, H = 128, 16, 256
    ss = jnp.asarray(rng.random((B, K, H)) < 0.1)
    W = rng.standard_normal((H, H)).astype(np.float32)
    G = jnp.asarray(W.T @ W)
    Wty = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    y2 = jnp.asarray((rng.standard_normal(B).astype(np.float32)) ** 2 * 50)
    pre1 = jnp.asarray(-0.4, jnp.float32)
    pil = jnp.asarray(-1.5, jnp.float32)

    got = bsc_lpj_pallas(ss, Wty, y2, G, pre1, pil, interpret=True)
    want = jax.vmap(lambda s, w, yy: BSC._lpj_one(s, G, w, yy, pre1, pil))(
        ss, Wty, y2
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-3)


def test_pallas_gating():
    # CPU backend: never auto-selected
    assert not pallas_lpj_applicable(4096, 64, 256, incomplete=False)
    # incomplete data: never
    assert not pallas_lpj_applicable(4096, 64, 256, incomplete=True)
