"""Microbenchmark: formulations of the SSSC batched 32x32 PD inverse+logdet
on the TPU, plus a breakdown of the SSSC em_step epoch.

Run:  python tools/microbench_sssc.py          (uses the TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

H = 32
BATCH = 4096 * 30  # one scan block's worth of state evals (B * (S + children))


def _sync(out):
    """Value readback as the completion barrier: block_until_ready has
    been observed to return before enqueued work finishes on the tunneled
    device; materializing an element cannot."""
    leaf = jax.tree.leaves(out)[0]
    float(jnp.ravel(leaf)[0])


def timeit(fn, *args, n=5, name=""):
    """Pipelined timing: enqueue n calls, end the window on ONE value
    readback (CLAUDE.md: blocking per call pays the ~35 ms tunnel dispatch
    round-trip, which dominates ms-scale kernels and misranks variants).

    CAVEAT: repeated calls with IDENTICAL inputs have been observed to
    be served from a result cache on this machine (apparent throughput far
    beyond hardware peak).  Cross-check any surprising number against a
    device trace (tools/profile_epoch.py) before believing it."""
    out = fn(*args)
    _sync(out)  # compile + warmup outside the window
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _sync(out)  # value readback: nothing can materialize early
    med = (time.time() - t0) / n
    print(f"{name:45s} {med*1000:9.2f} ms", file=sys.stderr)
    return out, med


# ---------------------------------------------------------------- variants


def batch_major(A):
    from evo_tpu.ops.linalg import pd_inverse_logdet

    return pd_inverse_logdet(A)


def _inv_lane(A):
    """Lane-major Schur recursion: A is [m, m, batch]; batch rides the
    TPU lane dimension, matrix ops become vectorized elementwise chains."""
    m = A.shape[0]
    if m == 1:
        a = A[0, 0]
        return (1.0 / a)[None, None, :], jnp.log(jnp.abs(a))
    if m == 2:
        a, b, c, d = A[0, 0], A[0, 1], A[1, 0], A[1, 1]
        det = a * d - b * c
        inv = jnp.stack([jnp.stack([d, -b]), jnp.stack([-c, a])]) / det
        return inv, jnp.log(jnp.abs(det))
    h = m // 2
    A11, B, A22 = A[:h, :h], A[:h, h:], A[h:, h:]
    inv11, ld1 = _inv_lane(A11)
    iB = jnp.einsum("ijb,jkb->ikb", inv11, B)
    S = A22 - jnp.einsum("jib,jkb->ikb", B, iB)
    invS, ld2 = _inv_lane(S)
    C = jnp.einsum("ijb,jkb->ikb", iB, invS)
    TL = inv11 + jnp.einsum("ijb,kjb->ikb", C, iB)
    top = jnp.concatenate([TL, -C], axis=1)
    bot = jnp.concatenate([-jnp.transpose(C, (1, 0, 2)), invS], axis=1)
    return jnp.concatenate([top, bot], axis=0), ld1 + ld2


def lane_major(A):  # A: [batch, m, m]
    At = jnp.transpose(A, (1, 2, 0))
    inv, ld = _inv_lane(At)
    return jnp.transpose(inv, (2, 0, 1)), ld


def _mm_bcast(X, Y):  # [i,j,b] @ [j,k,b] -> [i,k,b] via explicit bcast-reduce
    return jnp.sum(X[:, :, None, :] * Y[None, :, :, :], axis=1)


def _inv_lane_bcast(A):
    m = A.shape[0]
    if m == 1:
        a = A[0, 0]
        return (1.0 / a)[None, None, :], jnp.log(jnp.abs(a))
    if m == 2:
        a, b, c, d = A[0, 0], A[0, 1], A[1, 0], A[1, 1]
        det = a * d - b * c
        inv = jnp.stack([jnp.stack([d, -b]), jnp.stack([-c, a])]) / det
        return inv, jnp.log(jnp.abs(det))
    h = m // 2
    A11, B, A22 = A[:h, :h], A[:h, h:], A[h:, h:]
    inv11, ld1 = _inv_lane_bcast(A11)
    iB = _mm_bcast(inv11, B)
    S = A22 - _mm_bcast(jnp.transpose(B, (1, 0, 2)), iB)
    invS, ld2 = _inv_lane_bcast(S)
    C = _mm_bcast(iB, invS)
    TL = inv11 + _mm_bcast(C, jnp.transpose(iB, (1, 0, 2)))
    top = jnp.concatenate([TL, -C], axis=1)
    bot = jnp.concatenate([-jnp.transpose(C, (1, 0, 2)), invS], axis=1)
    return jnp.concatenate([top, bot], axis=0), ld1 + ld2


def lane_major_bcast(A):
    At = jnp.transpose(A, (1, 2, 0))
    inv, ld = _inv_lane_bcast(At)
    return jnp.transpose(inv, (2, 0, 1)), ld


def cholesky_xla(A):
    L = jnp.linalg.cholesky(A)
    ld = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    inv = jax.scipy.linalg.cho_solve((L, True), eye)
    return inv, ld


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    from evo_tpu.apps.common import warm_d2h_async

    # first d2h readback stalls 80-180 s; absorb it up front
    warm = warm_d2h_async(verbose=True)

    rng = np.random.default_rng(0)
    R = rng.standard_normal((BATCH, H, H)).astype(np.float32)
    A_host = R @ np.transpose(R, (0, 2, 1)) + H * np.eye(H, dtype=np.float32)
    A = jnp.asarray(A_host)
    jax.block_until_ready(A)
    warm.join()

    flops_per = 2 * H**3  # rough: inverse+logdet ~ 2 H^3
    total_flops = flops_per * BATCH

    results = {}
    with jax.default_matmul_precision("high"):
        for name, fn in [
            ("batch_major (current)", batch_major),
            ("lane_major einsum", lane_major),
            ("lane_major bcast-reduce", lane_major_bcast),
            ("cholesky_xla", cholesky_xla),
        ]:
            try:
                jfn = jax.jit(fn)
                (inv, ld), med = timeit(jfn, A, name=name)
                results[name] = (inv, ld, med)
                print(f"    -> {total_flops/med/1e12:.2f} TFLOP/s effective",
                      file=sys.stderr)
            except Exception as e:
                print(f"{name} FAILED: {type(e).__name__}: {e}", file=sys.stderr)

    # correctness cross-check on a small slice
    ref_inv = np.linalg.inv(A_host[:64].astype(np.float64))
    ref_ld = np.linalg.slogdet(A_host[:64].astype(np.float64))[1]
    for name, (inv, ld, med) in results.items():
        ei = float(np.max(np.abs(np.asarray(inv[:64]) - ref_inv)))
        el = float(np.max(np.abs(np.asarray(ld[:64]) - ref_ld)))
        print(f"{name:45s} max|dinv|={ei:.2e} max|dlogdet|={el:.2e}",
              file=sys.stderr)

    # ---- Woodbury building-block costs (D=25 denoising shape) ----
    D = 25
    W = jnp.asarray(rng.standard_normal((D, H)).astype(np.float32))
    Psi = jnp.asarray(np.eye(H, dtype=np.float32) + 0.1)
    sf = jnp.asarray((rng.random((BATCH, H)) < 0.3).astype(np.float32))

    def build_C(sf):
        As = sf[:, None, :] * W[None, :, :]          # [b, D, H]
        APsi = jnp.einsum("bdh,hk->bdk", As, Psi)     # big matmul
        C = jnp.einsum("bdh,beh->bde", APsi, As)      # batched small
        return C + jnp.eye(D, dtype=C.dtype)

    with jax.default_matmul_precision("high"):
        jb = jax.jit(build_C)
        _, med = timeit(jb, sf, name="woodbury build C_s [b,25,25]")

        def full_woodbury(sf):
            C = build_C(sf)
            return lane_major_bcast(C)

        _, med = timeit(jax.jit(full_woodbury), sf,
                        name="woodbury build + lane-bcast solve")

    # ---- SSSC em_step breakdown ----
    from evo_tpu.models.base import make_data
    from evo_tpu.models.sssc import SSSC
    from evo_tpu.variational.state_init import init_states

    Hs, Ss, Ds, NBs, Bs = 32, 20, 25, 4, 4096
    Ns = NBs * Bs
    Ys = (rng.random((Ns, Hs)) <= 2 / Hs).astype(np.float32) @ \
        rng.standard_normal((Ds, Hs)).astype(np.float32).T \
        + rng.standard_normal((Ns, Ds)).astype(np.float32)
    smodel = SSSC(D=Ds, H=Hs)
    sdata = make_data(Ys, n_blocks=NBs)
    scfg, sestate = init_states(N=Ns, S=Ss, H=Hs, no_parents=10,
                                no_children=1, no_generations=1,
                                n_blocks=NBs, seed=0)
    sparams = smodel.standard_init(sdata, seed=0, y_host=Ys)

    def step(p, e, key):
        return smodel.em_step(p, e, sdata, key, scfg)

    sp, se, _, _ = step(sparams, sestate, jax.random.key(0))
    _sync(se.lpj)
    t0 = time.time()
    sp2, se2, _, _ = step(sp, se, jax.random.key(1))
    _sync(se2.lpj)
    print(f"sssc em_step full epoch: {(time.time()-t0)*1000:.1f} ms",
          file=sys.stderr)

    # lpj-only pass: evaluate the K set once per datapoint (no EA, no M-step)
    from evo_tpu.models.base import block_gram

    pre = smodel._precompute(smodel.check_params(sp), sdata)

    @jax.jit
    def lpj_only(params, ss):
        params = smodel.check_params(params)
        W_, Psi_, mus_ = params.W, params.Psi, params.mus
        s2inv = 1.0 / params.sigma2

        def block_fn(c, xs):
            y_b, xinf_b, ss_b = xs
            G_b, Wty_b, y2_b = block_gram(W_, y_b, xinf_b, False)

            def one(ss_n, Wty_n, y2_n):
                return smodel._lpj_states(
                    ss_n, G_b, Wty_n, y2_n, Psi_, mus_, s2inv,
                    pre["pil_bar"])[0]

            lpj = jax.vmap(one)(ss_b, Wty_b, y2_b)
            return c + jnp.sum(lpj), None

        tot, _ = jax.lax.scan(
            block_fn, jnp.zeros((), jnp.float32),
            (sdata.y, sdata.x_infr, ss))
        return tot

    _, med = timeit(lpj_only, sp, se.ss, name="sssc lpj-only (K set, S=20)")
    print("done", file=sys.stderr)


if __name__ == "__main__":
    main()
