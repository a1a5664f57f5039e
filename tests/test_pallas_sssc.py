"""SSSC Pallas kernels vs the XLA slab-marginalization path (interpret
mode on CPU; the real kernels run the identical jaxpr on TPU).

The lpj kernel factors M' = Psi_s M_s (one unpivoted LU gives
log det M' = log det M_s + log det Psi_s and the lam_u solve) with the
per-state Psi_s G_ss product hoisted onto one MXU matmul; the suffstat
kernel re-solves the merged K^(n) and contracts the responsibilities
in-kernel.  Both must match models.sssc._lpj_states and the einsum
expectations at f32 tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from evo_tpu.models.sssc import SSSC
from evo_tpu.ops.pallas_sssc import (
    TB,
    TB_SS,
    sssc_lpj_pallas,
    sssc_suffstat_pallas,
)


def _problem(B, K, H, D, seed=0, p=0.25):
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((D, H)).astype(np.float32)
    Psi0 = rng.standard_normal((H, H)).astype(np.float32)
    Psi = (Psi0 @ Psi0.T / H + np.eye(H)).astype(np.float32)
    mus = rng.standard_normal(H).astype(np.float32)
    pil = rng.standard_normal(H).astype(np.float32)
    s2inv = np.float32(0.7)
    Y = rng.standard_normal((B, D)).astype(np.float32)
    G = (W.T @ W).astype(np.float32)
    Wty = (Y @ W).astype(np.float32)
    y2 = (Y * Y).sum(-1).astype(np.float32)
    ss = (rng.random((B, K, H)) < p).astype(np.int8)
    rs = rng.random((B, K)).astype(np.float32)
    rs /= rs.sum(1, keepdims=True)
    return dict(G=G, Psi=Psi, mus=mus, pil=pil, s2inv=s2inv, Wty=Wty,
                y2=y2, ss=ss, rs=rs)


def _oracle(p):
    return jax.vmap(
        SSSC._lpj_states, in_axes=(0, None, 0, 0, None, None, None, None)
    )(jnp.asarray(p["ss"]), jnp.asarray(p["G"]), jnp.asarray(p["Wty"]),
      jnp.asarray(p["y2"]), jnp.asarray(p["Psi"]), jnp.asarray(p["mus"]),
      jnp.asarray(p["s2inv"]), jnp.asarray(p["pil"]))


@pytest.mark.parametrize("H,K", [(12, 3), (32, 5)])
def test_lpj_kernel_matches_xla_path(H, K):
    B = TB  # one lane tile
    p = _problem(B, K, H, D=9)
    lpj_o = _oracle(p)[0]
    lpj_k, bad = sssc_lpj_pallas(
        jnp.asarray(p["ss"]), jnp.asarray(p["Wty"]), jnp.asarray(p["y2"]),
        jnp.asarray(p["G"]), jnp.asarray(p["Psi"]), jnp.asarray(p["mus"]),
        jnp.asarray(p["pil"]), p["s2inv"], interpret=True)
    assert float(bad.sum()) == 0
    np.testing.assert_allclose(np.asarray(lpj_k), np.asarray(lpj_o),
                               rtol=2e-4, atol=2e-3)


@pytest.mark.slow
def test_suffstat_kernel_matches_einsum_expectations():
    H, S, B = 16, 4, 2 * TB_SS
    p = _problem(B, S, H, D=11, seed=1)
    _, _, kappa_o, lam_o = _oracle(p)
    rs = jnp.asarray(p["rs"])
    sf = jnp.asarray(p["ss"], jnp.float32)
    want = dict(
        xpt_sz=jnp.einsum("bs,bsh->bh", rs, kappa_o),
        xpt_s=jnp.einsum("bs,bsh->bh", rs, sf),
        xpt_ss=jnp.einsum("bs,bsh,bsk->hk", rs, sf, sf),
        xpt_szsz=jnp.einsum("bs,bshj->hj", rs, lam_o)
        + jnp.einsum("bs,bsh,bsj->hj", rs, kappa_o, kappa_o),
    )
    want["s_sz"] = jnp.einsum("bh,bk->hk", want["xpt_s"], want["xpt_sz"])
    want["sz_sz"] = jnp.einsum("bh,bk->hk", want["xpt_sz"], want["xpt_sz"])

    out = sssc_suffstat_pallas(
        jnp.asarray(p["ss"]), rs, jnp.asarray(p["Wty"]),
        jnp.asarray(p["G"]), jnp.asarray(p["Psi"]), jnp.asarray(p["mus"]),
        p["s2inv"], interpret=True)
    names = ["xpt_sz", "xpt_s", "xpt_ss", "xpt_szsz", "s_sz", "sz_sz"]
    for name, got in zip(names, out):
        ref = np.asarray(want[name])
        scale = np.abs(ref).max() + 1e-6
        np.testing.assert_allclose(np.asarray(got) / scale, ref / scale,
                                   atol=2e-5, err_msg=name)


def _sparse_states(rng, B, K, H, max_active):
    """States with |s| <= max_active (plus some all-zero rows)."""
    ss = np.zeros((B, K, H), np.int8)
    n_act = rng.integers(0, max_active + 1, size=(B, K))
    for b in range(B):
        for k in range(K):
            idx = rng.choice(H, size=n_act[b, k], replace=False)
            ss[b, k, idx] = 1
    ss[0, 0] = 0  # guarantee an all-zero state exercises the rank-0 path
    return ss


@pytest.mark.slow
def test_lpj_compact_matches_full_and_oracle():
    """Active-set compaction (K_cap=8 at H=32) must be bit-comparable to
    the full-Hp path on sparse tiles AND route denser tiles through the
    exact fallback.  Slot 0 is all-sparse (compact branch), slot 1
    contains one |s|=20 state (whole tile falls back)."""
    H, K, B = 32, 2, TB
    rng = np.random.default_rng(3)
    p = _problem(B, K, H, D=9, seed=3)
    ss = _sparse_states(rng, B, K, H, max_active=8)
    ss[5, 1, :20] = 1  # poison slot 1's tile: |s| = 20 > K_cap
    p["ss"] = ss
    args = (jnp.asarray(ss), jnp.asarray(p["Wty"]), jnp.asarray(p["y2"]),
            jnp.asarray(p["G"]), jnp.asarray(p["Psi"]), jnp.asarray(p["mus"]),
            jnp.asarray(p["pil"]), p["s2inv"])
    lpj_full, bad_full = sssc_lpj_pallas(*args, interpret=True,
                                         compact=False)
    lpj_cmp, bad_cmp = sssc_lpj_pallas(*args, interpret=True, compact=True)
    assert float(bad_full.sum()) == 0
    np.testing.assert_array_equal(np.asarray(bad_cmp), np.asarray(bad_full))
    np.testing.assert_allclose(np.asarray(lpj_cmp), np.asarray(lpj_full),
                               rtol=3e-5, atol=1e-4)
    lpj_o = _oracle(p)[0]
    np.testing.assert_allclose(np.asarray(lpj_cmp), np.asarray(lpj_o),
                               rtol=2e-4, atol=2e-3)


@pytest.mark.slow
def test_suffstat_compact_matches_full():
    """Same equivalence for the suffstat kernel, with one tile of the
    merged set dense enough to take the fallback."""
    H, S, B = 32, 3, TB_SS
    rng = np.random.default_rng(4)
    p = _problem(B, S, H, D=11, seed=4)
    ss = _sparse_states(rng, B, S, H, max_active=8)
    ss[7, 2, :15] = 1  # slot 2's tile falls back
    rs = jnp.asarray(p["rs"])
    sargs = (jnp.asarray(ss), rs, jnp.asarray(p["Wty"]),
             jnp.asarray(p["G"]), jnp.asarray(p["Psi"]),
             jnp.asarray(p["mus"]), p["s2inv"])
    out_full = sssc_suffstat_pallas(*sargs, interpret=True, compact=False)
    out_cmp = sssc_suffstat_pallas(*sargs, interpret=True, compact=True)
    names = ["xpt_sz", "xpt_s", "xpt_ss", "xpt_szsz", "s_sz", "sz_sz"]
    for name, a, b in zip(names, out_cmp, out_full):
        ref = np.asarray(b)
        scale = np.abs(ref).max() + 1e-6
        np.testing.assert_allclose(np.asarray(a) / scale, ref / scale,
                                   atol=5e-5, err_msg=name)


def test_lpj_compact_flags_bad_solves():
    """The NaN sentinel for numerically-broken solves must survive the
    compact branch (a singular 1x1 compacted block)."""
    H, K, B = 32, 2, TB
    rng = np.random.default_rng(5)
    p = _problem(B, K, H, D=9, seed=5)
    s2inv = float(p["s2inv"])
    Psi_bad = p["Psi"].copy()
    Psi_bad[0, 0] = -1.0 / (s2inv * float(p["G"][0, 0]))
    ss = _sparse_states(rng, B, K, H, max_active=6)
    ss[:, 0, :] = 0
    ss[:, 0, 0] = 1  # slot 0 = the poisoned single-unit state, |s| = 1
    lpj_k, bad = sssc_lpj_pallas(
        jnp.asarray(ss), jnp.asarray(p["Wty"]), jnp.asarray(p["y2"]),
        jnp.asarray(p["G"]), jnp.asarray(Psi_bad), jnp.asarray(p["mus"]),
        jnp.asarray(p["pil"]), p["s2inv"], interpret=True, compact=True)
    flagged = np.asarray(bad)[:, 0] > 0
    lpjv = np.asarray(lpj_k)[:, 0]
    assert flagged.any()
    assert np.isnan(lpjv[flagged]).all()
    assert not np.isinf(lpjv[flagged]).any()


def test_lpj_kernel_flags_bad_solves():
    """A singular M' = I + s2inv Psi_s G_ss (possible when the learned Psi
    goes non-PD, which the reference's elementwise Psi update permits —
    sssc.py:738) must be reported through the bad flags or a non-finite
    lpj, mirroring the reference's np.linalg fallback (sssc.py:279-283).

    Note the M' factorization is strictly MORE robust than the
    reference's two-solve form: a merely-singular Psi_s has a finite
    lpj limit that M' computes where inv(Psi_s) overflows."""
    H, K, B = 8, 2, TB
    p = _problem(B, K, H, D=5, seed=2)
    s2inv = float(p["s2inv"])
    Psi_bad = p["Psi"].copy()
    # one-active-unit state: M' = 1 + s2inv * Psi[0,0] * G[0,0] == 0
    Psi_bad[0, 0] = -1.0 / (s2inv * float(p["G"][0, 0]))
    ss = np.zeros((B, K, H), np.int8)
    ss[:, 0, 0] = 1  # state selecting exactly the poisoned unit
    lpj_k, bad = sssc_lpj_pallas(
        jnp.asarray(ss), jnp.asarray(p["Wty"]), jnp.asarray(p["y2"]),
        jnp.asarray(p["G"]), jnp.asarray(Psi_bad), jnp.asarray(p["mus"]),
        jnp.asarray(p["pil"]), p["s2inv"], interpret=True)
    # slot 0 states hit the (numerically near-)zero pivot: either the bad
    # flag fires, the lpj is non-finite (both routed to the lpj floor by
    # reset_lpj), or the 1/pivot blow-up lands as an extreme negative lpj
    # — in every case the state is uncompetitive, never silent garbage
    flagged = np.asarray(bad)[:, 0] > 0
    lpjv = np.asarray(lpj_k)[:, 0]
    rejected = ~np.isfinite(lpjv) | (lpjv < -1e4)
    assert (flagged | rejected).all()

    # regression: after reset_lpj the flagged states must sit at the lpj
    # FLOOR, never at B_max.  The kernel's sentinel used to be -inf, which
    # reset_lpj (mirroring the reference's +-inf -> B_max = 0.0 rule,
    # _models.py:594) mapped to the DOMINANT lpj — numerically-broken
    # states won every merge on the Pallas path.  The sentinel is now NaN
    # (identical to the XLA path's failed solves), which reset_lpj floors.
    from evo_tpu.ops.numerics import eps_lpj, reset_lpj

    reset, counts = reset_lpj(lpj_k)
    r0 = np.asarray(reset)[:, 0]
    assert flagged.any()
    assert (r0[flagged] <= 0.5 * eps_lpj(np.float32)).all(), r0[flagged]
    # flagged rows carry the NaN sentinel, never +-inf (an unflagged
    # 1/pivot blow-up may legitimately saturate, per the assertion above)
    assert not np.isinf(lpjv[flagged]).any()


@pytest.mark.parametrize("H,K", [(40, 2), (64, 2)])
@pytest.mark.slow
def test_lpj_kernel_hp64_envelope(H, K):
    """H in (32, 64] pads to Hp=64 and runs smaller lane tiles
    (_tb_lpj=256) with K_cap=16 compaction; p=0.15 at these H gives a mix
    of tiles above and below the K_cap popcount bound, so both the
    compact and full-Hp branches execute."""
    B = 256  # one Hp=64 lane tile
    p = _problem(B, K, H, D=9, p=0.15)
    lpj_o = _oracle(p)[0]
    lpj_k, bad = sssc_lpj_pallas(
        jnp.asarray(p["ss"]), jnp.asarray(p["Wty"]), jnp.asarray(p["y2"]),
        jnp.asarray(p["G"]), jnp.asarray(p["Psi"]), jnp.asarray(p["mus"]),
        jnp.asarray(p["pil"]), p["s2inv"], interpret=True)
    assert float(bad.sum()) == 0
    np.testing.assert_allclose(np.asarray(lpj_k), np.asarray(lpj_o),
                               rtol=2e-4, atol=2e-3)


@pytest.mark.slow
def test_suffstat_kernel_hp64_envelope():
    H, S, B = 40, 2, 128  # one Hp=64 suffstat tile (_tb_ss=128)
    p = _problem(B, S, H, D=11, seed=3, p=0.15)
    _, _, kappa_o, lam_o = _oracle(p)
    rs = jnp.asarray(p["rs"])
    sf = jnp.asarray(p["ss"], jnp.float32)
    want = dict(
        xpt_sz=jnp.einsum("bs,bsh->bh", rs, kappa_o),
        xpt_s=jnp.einsum("bs,bsh->bh", rs, sf),
        xpt_ss=jnp.einsum("bs,bsh,bsk->hk", rs, sf, sf),
        xpt_szsz=jnp.einsum("bs,bshj->hj", rs, lam_o)
        + jnp.einsum("bs,bsh,bsj->hj", rs, kappa_o, kappa_o),
    )
    want["s_sz"] = jnp.einsum("bh,bk->hk", want["xpt_s"], want["xpt_sz"])
    want["sz_sz"] = jnp.einsum("bh,bk->hk", want["xpt_sz"], want["xpt_sz"])
    out = sssc_suffstat_pallas(
        jnp.asarray(p["ss"]), rs, jnp.asarray(p["Wty"]),
        jnp.asarray(p["G"]), jnp.asarray(p["Psi"]), jnp.asarray(p["mus"]),
        p["s2inv"], interpret=True)
    names = ["xpt_sz", "xpt_s", "xpt_ss", "xpt_szsz", "s_sz", "sz_sz"]
    for name, got in zip(names, out):
        ref = np.asarray(want[name])
        scale = np.abs(ref).max() + 1e-6
        np.testing.assert_allclose(np.asarray(got) / scale, ref / scale,
                                   atol=4e-5, err_msg=name)


@pytest.mark.parametrize("H,K", [(100, 2), (128, 2)])
@pytest.mark.slow
def test_lpj_kernel_hp128_buckets(H, K):
    """H in (64, 128] runs the popcount-bucketed kernels (no full-Hp
    path): tiles with max |s| <= Hp/16 take the small bucket, denser
    tiles the Hp/8 bucket.  States are drawn so both buckets execute."""
    from evo_tpu.ops.pallas_sssc import _buckets, _tb_lpj

    B = _tb_lpj(128) * 2  # two lane tiles
    K1, K2 = _buckets(128)
    rng = np.random.default_rng(7)
    p = _problem(B, K, H, D=9, seed=7)
    ss = _sparse_states(rng, B, K, H, max_active=K1 - 2)
    ss[3, 1] = 0
    ss[3, 1, :K1 + 4] = 1  # slot 1, tile 0: bucket-2 (K1 < |s| <= K2)
    p["ss"] = ss
    lpj_o = _oracle(p)[0]
    lpj_k, bad = sssc_lpj_pallas(
        jnp.asarray(ss), jnp.asarray(p["Wty"]), jnp.asarray(p["y2"]),
        jnp.asarray(p["G"]), jnp.asarray(p["Psi"]), jnp.asarray(p["mus"]),
        jnp.asarray(p["pil"]), p["s2inv"], interpret=True)
    assert float(bad.sum()) == 0
    np.testing.assert_allclose(np.asarray(lpj_k), np.asarray(lpj_o),
                               rtol=2e-4, atol=2e-3)


@pytest.mark.slow
def test_lpj_kernel_hp128_overflow_floors():
    """A state denser than the big bucket (|s| > Hp/8) must come back
    NaN + bad-flagged (-> reset_lpj floor), never silent garbage."""
    from evo_tpu.ops.pallas_sssc import _buckets, _tb_lpj

    H, K = 100, 2
    B = _tb_lpj(128)
    K1, K2 = _buckets(128)
    rng = np.random.default_rng(8)
    p = _problem(B, K, H, D=9, seed=8)
    ss = _sparse_states(rng, B, K, H, max_active=4)
    ss[5, 1] = 0
    ss[5, 1, :K2 + 3] = 1  # |s| = K2+3 > K2: unrepresentable
    lpj_k, bad = sssc_lpj_pallas(
        jnp.asarray(ss), jnp.asarray(p["Wty"]), jnp.asarray(p["y2"]),
        jnp.asarray(p["G"]), jnp.asarray(p["Psi"]), jnp.asarray(p["mus"]),
        jnp.asarray(p["pil"]), p["s2inv"], interpret=True)
    bad = np.asarray(bad)
    lpj_k = np.asarray(lpj_k)
    assert bad[5, 1] == 1 and np.isnan(lpj_k[5, 1])
    # everything else in the overflow state's tile stays exact
    p2 = dict(p); p2["ss"] = ss
    lpj_o = np.asarray(_oracle(p2)[0])
    mask = ~np.isnan(lpj_k)
    np.testing.assert_allclose(lpj_k[mask], lpj_o[mask],
                               rtol=2e-4, atol=2e-3)
    assert bad.sum() == 1


@pytest.mark.slow
def test_suffstat_kernel_hp128_buckets():
    """Suffstat bucketed kernels at H=100, with one tile dense enough for
    bucket 2 and one overflow state (excluded from kappa/lambda, its
    responsibility redistributed nowhere — consistent with its floored
    lpj)."""
    from evo_tpu.ops.pallas_sssc import _buckets, _tb_ss

    H, S = 100, 3
    B = _tb_ss(128) * 2
    K1, K2 = _buckets(128)
    rng = np.random.default_rng(9)
    p = _problem(B, S, H, D=11, seed=9)
    ss = _sparse_states(rng, B, S, H, max_active=K1 - 2)
    ss[2, 1] = 0
    ss[2, 1, :K1 + 6] = 1   # bucket-2 tile
    ss[4, 2] = 0
    ss[4, 2, :K2 + 5] = 1   # overflow state
    p["ss"] = ss
    _, _, kappa_o, lam_o = _oracle(p)
    rs_np = p["rs"].copy()
    # the oracle analog of overflow handling: zero that state's kappa and
    # its lambda weight
    kappa_o = np.asarray(kappa_o).copy()
    kappa_o[4, 2] = 0.0
    rs_lam = rs_np.copy()
    rs_lam[4, 2] = 0.0
    rs = jnp.asarray(rs_np)
    sf = jnp.asarray(ss, jnp.float32)
    kap = jnp.asarray(kappa_o)
    want = dict(
        xpt_sz=jnp.einsum("bs,bsh->bh", rs, kap),
        xpt_s=jnp.einsum("bs,bsh->bh", rs, sf),
        xpt_ss=jnp.einsum("bs,bsh,bsk->hk", rs, sf, sf),
        xpt_szsz=jnp.einsum("bs,bshj->hj", jnp.asarray(rs_lam), lam_o)
        + jnp.einsum("bs,bsh,bsj->hj", rs, kap, kap),
    )
    want["s_sz"] = jnp.einsum("bh,bk->hk", want["xpt_s"], want["xpt_sz"])
    want["sz_sz"] = jnp.einsum("bh,bk->hk", want["xpt_sz"], want["xpt_sz"])
    out = sssc_suffstat_pallas(
        jnp.asarray(ss), rs, jnp.asarray(p["Wty"]),
        jnp.asarray(p["G"]), jnp.asarray(p["Psi"]), jnp.asarray(p["mus"]),
        p["s2inv"], interpret=True)
    names = ["xpt_sz", "xpt_s", "xpt_ss", "xpt_szsz", "s_sz", "sz_sz"]
    for name, got in zip(names, out):
        ref = np.asarray(want[name])
        scale = np.abs(ref).max() + 1e-6
        np.testing.assert_allclose(np.asarray(got) / scale, ref / scale,
                                   atol=5e-5, err_msg=name)


# ------------------------------------------------- masked-Gram (incomplete)


def _masked_problem(B, K, H, D, seed=0, p=0.25, miss=0.15):
    """Incomplete-data analog of _problem: per-datapoint Gram
    G_n = W^T diag(m_n) W, masked Wty/y2 (reference sssc.py:268-318 with
    the storage-off incomplete branch, _models.py:426-431)."""
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((D, H)).astype(np.float32)
    Psi0 = rng.standard_normal((H, H)).astype(np.float32)
    Psi = (Psi0 @ Psi0.T / H + np.eye(H)).astype(np.float32)
    mus = rng.standard_normal(H).astype(np.float32)
    pil = rng.standard_normal(H).astype(np.float32)
    s2inv = np.float32(0.7)
    Y = rng.standard_normal((B, D)).astype(np.float32)
    m = (rng.random((B, D)) >= miss).astype(np.float32)
    Ym = Y * m
    Gn = np.einsum("di,bd,dj->bij", W, m, W).astype(np.float32)
    Wty = (Ym @ W).astype(np.float32)
    y2 = (Ym * Ym).sum(-1).astype(np.float32)
    ss = (rng.random((B, K, H)) < p).astype(np.int8)
    rs = rng.random((B, K)).astype(np.float32)
    rs /= rs.sum(1, keepdims=True)
    return dict(Gn=Gn, Psi=Psi, mus=mus, pil=pil, s2inv=s2inv, Wty=Wty,
                y2=y2, ss=ss, rs=rs)


def _oracle_masked(p):
    return jax.vmap(
        SSSC._lpj_states, in_axes=(0, 0, 0, 0, None, None, None, None)
    )(jnp.asarray(p["ss"]), jnp.asarray(p["Gn"]), jnp.asarray(p["Wty"]),
      jnp.asarray(p["y2"]), jnp.asarray(p["Psi"]), jnp.asarray(p["mus"]),
      jnp.asarray(p["s2inv"]), jnp.asarray(p["pil"]))


@pytest.mark.parametrize("H,K", [(12, 3), (32, 5), (48, 4)])
def test_lpj_masked_kernel_matches_xla_path(H, K):
    from evo_tpu.ops.pallas_sssc import _tb_masked
    from evo_tpu.ops.linalg import _next_pow2

    B = _tb_masked(max(8, _next_pow2(H))) * 2
    p = _masked_problem(B, K, H, D=9)
    lpj_o = _oracle_masked(p)[0]
    lpj_k, bad = sssc_lpj_pallas(
        jnp.asarray(p["ss"]), jnp.asarray(p["Wty"]), jnp.asarray(p["y2"]),
        jnp.asarray(p["Gn"]), jnp.asarray(p["Psi"]), jnp.asarray(p["mus"]),
        jnp.asarray(p["pil"]), p["s2inv"], interpret=True)
    assert float(bad.sum()) == 0
    np.testing.assert_allclose(np.asarray(lpj_k), np.asarray(lpj_o),
                               rtol=2e-4, atol=2e-3)


def test_suffstat_masked_kernel_matches_einsum_expectations():
    from evo_tpu.ops.pallas_sssc import _tb_masked

    H, S = 16, 4
    B = _tb_masked(16) * 2
    p = _masked_problem(B, S, H, D=11, seed=1)
    _, _, kappa_o, lam_o = _oracle_masked(p)
    rs = jnp.asarray(p["rs"])
    sf = jnp.asarray(p["ss"], jnp.float32)
    want = dict(
        xpt_sz=jnp.einsum("bs,bsh->bh", rs, kappa_o),
        xpt_s=jnp.einsum("bs,bsh->bh", rs, sf),
        xpt_ss=jnp.einsum("bs,bsh,bsk->hk", rs, sf, sf),
        xpt_szsz=jnp.einsum("bs,bshj->hj", rs, lam_o)
        + jnp.einsum("bs,bsh,bsj->hj", rs, kappa_o, kappa_o),
    )
    want["s_sz"] = jnp.einsum("bh,bk->hk", want["xpt_s"], want["xpt_sz"])
    want["sz_sz"] = jnp.einsum("bh,bk->hk", want["xpt_sz"], want["xpt_sz"])
    out = sssc_suffstat_pallas(
        jnp.asarray(p["ss"]), rs, jnp.asarray(p["Wty"]),
        jnp.asarray(p["Gn"]), jnp.asarray(p["Psi"]), jnp.asarray(p["mus"]),
        p["s2inv"], interpret=True)
    names = ["xpt_sz", "xpt_s", "xpt_ss", "xpt_szsz", "s_sz", "sz_sz"]
    for name, got in zip(names, out):
        ref = np.asarray(want[name])
        scale = np.abs(ref).max() + 1e-6
        np.testing.assert_allclose(np.asarray(got) / scale, ref / scale,
                                   atol=5e-5, err_msg=name)


def test_masked_gate():
    from evo_tpu.ops.pallas_sssc import pallas_sssc_applicable

    # CPU backend: never applicable (the tests' conftest forces CPU)
    assert not pallas_sssc_applicable(512, 20, 32, incomplete=True)
