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


def test_pallas_gating(monkeypatch):
    # CPU backend: never auto-selected
    assert not pallas_lpj_applicable(4096, 64, 256, incomplete=False)
    # incomplete data: never
    assert not pallas_lpj_applicable(4096, 64, 256, incomplete=True)

    # pure-logic part of the gate, with the backend check satisfied: the
    # reference-default configs EBSC H=32 (image apps) and H=100
    # (feature-learning) must pass once the batch is lane-padded
    from evo_tpu.ops import pallas_lpj, pallas_suffstat

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert pallas_lpj.pallas_lpj_applicable(4096, 20, 32, incomplete=False)
    assert pallas_lpj.pallas_lpj_applicable(2048, 15, 100, incomplete=False)
    assert pallas_suffstat.pallas_suffstat_applicable(4096, 20, 32)
    assert pallas_suffstat.pallas_suffstat_applicable(2048, 15, 100)
    # unpadded feature-learning batch (N=2000): still gated off
    assert not pallas_lpj.pallas_lpj_applicable(2000, 15, 100,
                                                incomplete=False)
    # tiny-Gram problems stay on the einsum path
    assert not pallas_lpj.pallas_lpj_applicable(4096, 20, 8, incomplete=False)


def test_pallas_lpj_lane_padded_H_matches_xla(rng):
    """H not a multiple of 128 (the reference defaults H=32 and H=100):
    the wrapper lane-pads to a multiple of 32; lpj must match the einsum
    oracle and emitted keys must match ops.bitpack.dedup_keys bit-for-bit
    (exact-words regime for H <= 64, hashed for H = 100 where the
    canonical hash covers 2*ceil(H/32) halfwords incl. the zero pad)."""
    from evo_tpu.ops.bitpack import dedup_keys

    for H in (32, 40, 100):
        B, K = 128, 10
        ss = jnp.asarray(rng.random((B, K, H)) < 0.2, jnp.int8)
        W = rng.standard_normal((H, H)).astype(np.float32)
        G = jnp.asarray(W.T @ W)
        Wty = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
        y2 = jnp.asarray((rng.standard_normal(B).astype(np.float32)) ** 2 * 9)
        pre1, pil = jnp.float32(-0.4), jnp.float32(-1.5)
        got, keys = bsc_lpj_pallas(ss, Wty, y2, G, pre1, pil,
                                   interpret=True, emit_keys=True)
        want = jax.vmap(lambda s, w, yy: BSC._lpj_one(s, G, w, yy, pre1, pil))(
            ss, Wty, y2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(keys),
                                      np.asarray(dedup_keys(ss)))


def test_pallas_suffstat_unaligned_H_matches_einsum(rng):
    from evo_tpu.ops.pallas_suffstat import bsc_suffstat_pallas

    B, S, H = 128, 12, 100
    ss_bool = rng.random((B, S, H)) < 0.2
    rs = jnp.asarray(rng.random((B, S)).astype(np.float32))
    sf = jnp.asarray(ss_bool, jnp.float32)
    rho, sabs, Wq = bsc_suffstat_pallas(jnp.asarray(ss_bool, jnp.int8), rs,
                                        H=H, interpret=True)
    np.testing.assert_allclose(
        np.asarray(rho), np.asarray(jnp.einsum("bs,bsh->bh", rs, sf)),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(sabs),
                                  np.asarray(jnp.sum(sf, axis=-1)))
    np.testing.assert_allclose(
        np.asarray(Wq),
        np.asarray(jnp.einsum("bs,bsh,bsk->hk", rs, sf, sf,
                              precision=jax.lax.Precision.HIGHEST)),
        rtol=1e-4, atol=1e-3)


def test_pallas_lpj_emit_keys_matches_dedup_keys(rng):
    """The FINAL dedup keys emitted by the kernel (exact f32 MXU packing
    into 16-bit halfwords, then in-VMEM finalization: exact u32 words for
    H <= 64, else the canonical halfword hash) must equal
    ops.bitpack.dedup_keys bit-for-bit — the cross-producer contract the
    seen-set bookkeeping in evolve_states_block relies on."""
    from evo_tpu.ops.bitpack import dedup_keys

    for H in (64, 256):  # exact-words and hashed regimes
        B, K = 128, 16
        ss = jnp.asarray(rng.random((B, K, H)) < 0.3, jnp.int8)
        G = jnp.asarray(np.eye(H, dtype=np.float32))
        Wty = jnp.zeros((B, H), jnp.float32)
        y2 = jnp.zeros((B,), jnp.float32)
        lpj, keys = bsc_lpj_pallas(ss, Wty, y2, G, jnp.float32(-0.5),
                                   jnp.float32(-1.0), interpret=True,
                                   emit_keys=True)
        assert keys.dtype == jnp.uint32
        want = np.asarray(dedup_keys(ss))
        np.testing.assert_array_equal(np.asarray(keys), want)


def test_pallas_lpj_packed_input_matches_unpacked(rng):
    """Lane-major bit-packed input (VMEM unpack) must give the same lpj as
    the int8 input."""
    from evo_tpu.ops.bitpack import pack_bits_lane

    B, K, H = 128, 16, 256
    ss_bool = rng.random((B, K, H)) < 0.15
    ss = jnp.asarray(ss_bool, jnp.int8)
    pk = pack_bits_lane(jnp.asarray(ss_bool))
    assert pk.dtype == jnp.uint8 and pk.shape == (B, K, H // 8)
    W = rng.standard_normal((H, H)).astype(np.float32)
    G = jnp.asarray(W.T @ W)
    Wty = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    y2 = jnp.asarray((rng.standard_normal(B).astype(np.float32)) ** 2)
    a = bsc_lpj_pallas(ss, Wty, y2, G, jnp.float32(-0.4), jnp.float32(-1.5),
                       interpret=True)
    b = bsc_lpj_pallas(pk, Wty, y2, G, jnp.float32(-0.4), jnp.float32(-1.5),
                       interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_suffstat_matches_einsum(rng):
    """rho / |s| / Wq from the fused kernel vs the XLA einsums, for both
    the int8 and the lane-major packed input paths."""
    from evo_tpu.ops.bitpack import pack_bits_lane
    from evo_tpu.ops.pallas_suffstat import bsc_suffstat_pallas

    B, S, H = 128, 12, 256
    ss_bool = rng.random((B, S, H)) < 0.2
    rs = jnp.asarray(rng.random((B, S)).astype(np.float32))
    sf = jnp.asarray(ss_bool, jnp.float32)
    want_rho = jnp.einsum("bs,bsh->bh", rs, sf)
    want_wq = jnp.einsum("bs,bsh,bsk->hk", rs, sf, sf,
                         precision=jax.lax.Precision.HIGHEST)
    want_sabs = jnp.sum(sf, axis=-1)

    for inp in (jnp.asarray(ss_bool, jnp.int8),
                pack_bits_lane(jnp.asarray(ss_bool))):
        rho, sabs, Wq = bsc_suffstat_pallas(inp, rs, H=H, interpret=True)
        np.testing.assert_allclose(np.asarray(rho), np.asarray(want_rho),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(sabs), np.asarray(want_sabs))
        np.testing.assert_allclose(np.asarray(Wq), np.asarray(want_wq),
                                   rtol=1e-4, atol=1e-3)


def test_pallas_lpj_odd_K_bumps_block_rows(rng):
    """The reference feature-learning S=15 makes the transposed keys
    block (W16, 64*15=960) violate Mosaic's 128-lane divisibility (seen
    as a lowering error on real TPU at H=100/K=15).  The wrapper must
    bump block_rows (64 -> 128 here, making bb*K = 1920) and stay
    numerically identical; the gate must agree."""
    from evo_tpu.ops.bitpack import dedup_keys
    from evo_tpu.ops.pallas_lpj import _resolve_block_rows

    H, B, K = 100, 128, 15
    assert _resolve_block_rows(64, B, K, emit_keys=True) == 128
    assert _resolve_block_rows(64, B, K, emit_keys=False) == 64
    ss = jnp.asarray(rng.random((B, K, H)) < 0.2, jnp.int8)
    W = rng.standard_normal((H, H)).astype(np.float32)
    G = jnp.asarray(W.T @ W)
    Wty = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    y2 = jnp.asarray((rng.standard_normal(B).astype(np.float32)) ** 2 * 9)
    pre1, pil = jnp.float32(-0.4), jnp.float32(-1.5)
    got, keys = bsc_lpj_pallas(ss, Wty, y2, G, pre1, pil,
                               interpret=True, emit_keys=True)
    want = jax.vmap(lambda s, w, yy: BSC._lpj_one(s, G, w, yy, pre1, pil))(
        ss, Wty, y2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(keys),
                                  np.asarray(dedup_keys(ss)))
