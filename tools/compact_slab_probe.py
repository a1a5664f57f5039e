"""A/B measurement: active-set COMPACTION of the SSSC slab kernels.

The production kernels (evo_tpu/ops/pallas_sssc.py) compact each state's
active units into a K_cap x K_cap top-left block (the reference's
|s|^3-vs-H^3 memoization insight, reference evo/models/sssc.py:268-318,
recast fixed-shape) with an exact full-Hp fallback per tile.  This tool
times the production kernels with compaction forced ON vs OFF at the
bench config, on sparse inputs (|s| <= K_cap, so every tile takes the
compact branch — the realistic regime: real trainings at H=32 never
exceed |s| ~ 6).

Measured on v5e (round 3, kernel-level A/B at N=4096/H=32, sparse):
lpj 1.46x, suffstat 1.30x.  Run on a healthy axon tunnel:

    python tools/compact_slab_probe.py            # time on the TPU
    EVO_PROBE_VERIFY_ONLY=1 python tools/...      # interpret-mode check

(The interpret check duplicates tests/test_pallas_sssc.py's compact
equivalence tests; it exists so one command validates before timing.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from evo_tpu.ops import pallas_sssc as prod


def _problem(B, K, H, D, seed=0, max_active=8):
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((D, H)).astype(np.float32) / np.sqrt(D)
    Psi = (0.3 * np.eye(H) + 0.02).astype(np.float32)
    mus = rng.standard_normal(H).astype(np.float32) * 0.5
    Y = rng.standard_normal((B, D)).astype(np.float32)
    # sparse states (|s| <= max_active): every tile takes the compact branch
    ss = np.zeros((B, K, H), np.int8)
    for b in range(0, B, 128):  # block-draw for speed
        n_act = rng.integers(0, max_active + 1, size=(128, K))
        for kk in range(K):
            for bb in range(128):
                idx = rng.choice(H, size=n_act[bb, kk], replace=False)
                ss[b + bb, kk, idx] = 1
    G = (W.T @ W).astype(np.float32)
    Wty = (Y @ W).astype(np.float32)
    y2 = (Y * Y).sum(-1).astype(np.float32)
    rs = rng.random((B, K)).astype(np.float32)
    rs /= rs.sum(-1, keepdims=True)
    return dict(W=W, Psi=Psi, mus=mus, G=G, Wty=Wty, y2=y2, ss=ss, rs=rs,
                pil=np.log(0.1 / 0.9) * np.ones(H, np.float32),
                s2inv=np.float32(1.3))


def verify(B=None, K=3, H=32, D=25):
    """Interpret-mode compact == full on one tile (CPU-safe)."""
    B = B or prod.TB
    p = _problem(B, K, H, D)
    args = (jnp.asarray(p["ss"]), jnp.asarray(p["Wty"]), jnp.asarray(p["y2"]),
            jnp.asarray(p["G"]), jnp.asarray(p["Psi"]), jnp.asarray(p["mus"]),
            jnp.asarray(p["pil"]), p["s2inv"])
    lpj_f, bad_f = prod.sssc_lpj_pallas(*args, interpret=True, compact=False)
    lpj_c, bad_c = prod.sssc_lpj_pallas(*args, interpret=True, compact=True)
    np.testing.assert_allclose(np.asarray(lpj_c), np.asarray(lpj_f),
                               rtol=3e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(bad_c), np.asarray(bad_f))
    print("lpj compact == full (interpret)", file=sys.stderr)

    sargs = (jnp.asarray(p["ss"][:, :, :]), jnp.asarray(p["rs"]),
             jnp.asarray(p["Wty"]), jnp.asarray(p["G"]),
             jnp.asarray(p["Psi"]), jnp.asarray(p["mus"]), p["s2inv"])
    out_f = prod.sssc_suffstat_pallas(*sargs, interpret=True, compact=False)
    out_c = prod.sssc_suffstat_pallas(*sargs, interpret=True, compact=True)
    for a, b, name in zip(out_c, out_f, ("xpt_sz", "xpt_s", "xpt_ss",
                                         "xpt_szsz", "s_sz", "sz_sz")):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   atol=5e-5, err_msg=name)
    print("suffstat compact == full (interpret)", file=sys.stderr)


def measure():
    """Pipelined A/B timing on the TPU at the bench config."""
    from evo_tpu.apps.common import warm_d2h_async

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    warm = warm_d2h_async(verbose=True)
    B, K, S, H, D = 4096, 30, 20, 32, 25
    # TWO input instances, alternated inside the timed loop: identical
    # repeated inputs have been served from a result cache on this machine
    # (CLAUDE.md measurement notes)
    probs = [_problem(B, K, H, D, seed=s) for s in (0, 1)]
    argsets = [tuple(jnp.asarray(p[k]) for k in ("ss", "Wty", "y2", "G",
                                                 "Psi", "mus", "pil"))
               + (p["s2inv"],) for p in probs]
    sargsets = [(jnp.asarray(p["ss"][:, :S]), jnp.asarray(p["rs"][:, :S]),
                 jnp.asarray(p["Wty"]), jnp.asarray(p["G"]),
                 jnp.asarray(p["Psi"]), jnp.asarray(p["mus"]), p["s2inv"])
                for p in probs]
    warm.join()

    def timeit(fn, sets, name, n=20, **kw):
        out = fn(*sets[0], **kw)
        float(jnp.ravel(jax.tree.leaves(out)[0])[0])  # compile + warm
        t0 = time.time()
        for i in range(n):
            out = fn(*sets[i % 2], **kw)
        float(jnp.ravel(jax.tree.leaves(out)[0])[0])  # completion barrier
        ms = (time.time() - t0) / n * 1e3
        print(f"{name:40s} {ms:8.2f} ms", file=sys.stderr)
        return ms

    r = {}
    r["lpj_full"] = timeit(prod.sssc_lpj_pallas, argsets, "lpj full",
                           compact=False)
    r["lpj_compact"] = timeit(prod.sssc_lpj_pallas, argsets, "lpj compact",
                              compact=True)
    r["ss_full"] = timeit(prod.sssc_suffstat_pallas, sargsets,
                          "suffstat full", compact=False)
    r["ss_compact"] = timeit(prod.sssc_suffstat_pallas, sargsets,
                             "suffstat compact", compact=True)
    print({k: round(v, 2) for k, v in r.items()})
    print(f"speedups: lpj {r['lpj_full']/r['lpj_compact']:.2f}x, "
          f"suffstat {r['ss_full']/r['ss_compact']:.2f}x", file=sys.stderr)


if __name__ == "__main__":
    if os.environ.get("EVO_PROBE_VERIFY_ONLY"):
        verify()  # B = one full lane tile (the wrappers assert B % TB == 0)
    else:
        measure()
