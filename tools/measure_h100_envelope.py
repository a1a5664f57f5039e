"""One-attach TPU measurement for the round-4 VERDICT items:

  kernel phase:
    SSSC H=100 (the reference feature-learning default,
    /root/reference/examples/feature-learning/params.py:30-43) at N=2048
    on the bucketed Pallas kernels, + N=16384 scaling — ms/epoch
    (VERDICT r3 item 1).
  bsc phase:
    EBSC H=32 at denoising scale (house x0.4: N=9604 -> padded 10240)
    and EBSC H=100 at feature-learning scale — the two BSC configs the
    lane-padded kernel gate (ops/pallas_lpj.py) newly covers.
  xla phase (slow compiles — run separately with a long timeout):
    SSSC H=100 XLA path: resolve (new default) vs stash A/B (VERDICT r3
    item 6: ms/epoch + device peak memory), and kernel-vs-XLA F parity
    over 5 shared-key epochs.  Splittable: `xla-resolve` runs the resolve
    leg + the F-parity loop + the kernel re-time (ONE slow compile, the
    headline numbers); `xla-stash` runs only the stash A/B leg (the other
    slow compile); `xla` runs both.  Each slow compile ran >31 min on the
    remote TPU compiler the one time it was attempted, so budget ~45 min
    per leg and run them in separate processes.

Run from the repo root (phases as argv, any subset/order):

    timeout 1700 python -u tools/measure_h100_envelope.py kernel bsc
    timeout 3000 python -u tools/measure_h100_envelope.py xla-resolve
    timeout 3000 python -u tools/measure_h100_envelope.py xla-stash
"""
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))

import numpy as np

T0 = time.time()


def _p(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def make_sssc_problem(N, H, D, seed=0):
    rng = np.random.default_rng(seed)
    W_gen = rng.standard_normal((D, H)).astype(np.float32)
    s_gen = rng.random((N, H)) <= 2.0 / H
    z = 1.0 + 0.3 * rng.standard_normal((N, H)).astype(np.float32)
    Y = ((s_gen * z).astype(np.float32) @ W_gen.T
         + rng.standard_normal((N, D)).astype(np.float32))
    return Y


def run_epochs(model, params, estate, data, cfg, n, key, tag=""):
    import jax

    for e in range(n):
        params, estate, stats, _ = model.em_step(
            params, estate, data, jax.random.fold_in(key, e), cfg)
    F = float(stats.F)  # value readback barrier (CLAUDE.md)
    return params, estate, F


def timed_epochs(model, params, estate, data, cfg, key, n=10):
    import jax

    t0 = time.time()
    for e in range(n):
        params, estate, stats, _ = model.em_step(
            params, estate, data, jax.random.fold_in(key, 100 + e), cfg)
    F = float(stats.F)
    return (time.time() - t0) / n, F


# Env-tunable problem size (EVO_H100_{H,D,N}: smoke-test the phases on CPU
# at a tiny H>64 before burning a slow TPU compile on the real config).
_H = int(os.environ.get("EVO_H100_H", "100"))
_D = int(os.environ.get("EVO_H100_D", "64"))
_N = int(os.environ.get("EVO_H100_N", "2048"))


def _sssc_setup(N, n_blocks, seed=0):
    from evo_tpu.models.base import make_data
    from evo_tpu.models.sssc import SSSC
    from evo_tpu.variational.state_init import init_states

    H, D, S = _H, _D, 15
    Y = make_sssc_problem(N, H, D, seed=seed)
    data = make_data(Y, n_blocks=n_blocks)
    cfg, estate = init_states(N=N, S=S, H=H, no_parents=5, no_children=2,
                              no_generations=1, n_blocks=n_blocks, seed=0)
    params = SSSC(D=D, H=H).standard_init(data, seed=0, y_host=Y)
    return data, cfg, estate, params


def kernel_phase():
    import jax

    from evo_tpu.models.sssc import SSSC
    from evo_tpu.ops.pallas_sssc import pallas_sssc_applicable

    H, D = _H, _D
    N = _N
    _p("kernel phase: building N=2048 problem")
    data, cfg, estate0, params0 = _sssc_setup(N, n_blocks=1)
    assert pallas_sssc_applicable(N, 15, H), "kernel gate should cover H=100"

    model_k = SSSC(D=D, H=H, lpj_kernel="pallas")
    _p("compiling kernel em_step (H=100, bucketed)...")
    pk, ek, Fk = run_epochs(model_k, params0, estate0, data, cfg, 1,
                            jax.random.key(7))
    _p(f"kernel compile+first epoch done, F={Fk:.2f}")
    pk, ek, _ = run_epochs(model_k, pk, ek, data, cfg, 3, jax.random.key(8))
    dt_k, Fk = timed_epochs(model_k, pk, ek, data, cfg, jax.random.key(9))
    _p(f"SSSC H=100 N=2048 kernel: {dt_k*1000:.2f} ms/epoch (F={Fk:.2f})")

    # --- N=16k kernel scaling
    N2 = 16384
    _p("building N=16384 problem")
    data2, cfg2, estate2, params2 = _sssc_setup(N2, n_blocks=4, seed=1)
    _p("compiling N=16k (new block shape)...")
    p2, e2, _ = run_epochs(model_k, params2, estate2, data2, cfg2, 4,
                           jax.random.key(11))
    dt2, F2 = timed_epochs(model_k, p2, e2, data2, cfg2, jax.random.key(12))
    _p(f"SSSC H=100 N=16384 kernel: {dt2*1000:.2f} ms/epoch (F={F2:.2f})")


def bsc_phase():
    import jax

    from evo_tpu.models.base import make_data
    from evo_tpu.models.bsc import BSC
    from evo_tpu.variational.state_init import init_states

    rng = np.random.default_rng(0)
    # (tag, N_raw, D, H, S, parents, children)
    configs = [
        ("EBSC denoise-scale H=32 (house x0.4: N=9604, D=25)",
         9604, 25, 32, 20, 10, 1),
        ("EBSC feature-learning H=100 (N=2000, D=64)",
         2000, 64, 100, 15, 5, 2),
    ]
    for tag, Nr, D, H, S, npar, nch in configs:
        W_gen = rng.standard_normal((D, H)).astype(np.float32)
        s_gen = rng.random((Nr, H)) <= 2.0 / H
        Y = (s_gen.astype(np.float32) @ W_gen.T
             + rng.standard_normal((Nr, D)).astype(np.float32))
        data = make_data(Y, n_blocks=1, pad_multiple=1024)
        Np = data.y.shape[0] * data.y.shape[1]
        model = BSC(D=D, H=H)
        cfg, estate = init_states(N=Np, S=S, H=H, no_parents=npar,
                                  no_children=nch, no_generations=1,
                                  n_blocks=1, seed=0)
        params = model.standard_init(data, seed=0, y_host=Y)
        _p(f"compiling {tag}...")
        p, e, _ = run_epochs(model, params, estate, data, cfg, 4,
                             jax.random.key(1))
        dt, F = timed_epochs(model, p, e, data, cfg, jax.random.key(2))
        _p(f"{tag}: {dt*1000:.2f} ms/epoch (N_padded={Np}, F={F:.2f})")


def _xla_setup():
    import jax

    H, D = _H, _D
    N = _N
    data, cfg, estate0, params0 = _sssc_setup(N, n_blocks=1)

    def _peak_mib():
        stats = jax.local_devices()[0].memory_stats() or {}
        return stats.get("peak_bytes_in_use", -1) / 2**20

    def _ab(tag, model):
        _p(f"compiling {tag} (H={H}, slow — remote XLA compile)...")
        t0 = time.time()
        p, e, F1 = run_epochs(model, params0, estate0, data, cfg, 1,
                              jax.random.key(1))
        compile_s = time.time() - t0
        _p(f"{tag} compiled+first epoch in {compile_s:.0f}s, F={F1:.2f}")
        p, e, _ = run_epochs(model, p, e, data, cfg, 3, jax.random.key(2))
        dt, F = timed_epochs(model, p, e, data, cfg, jax.random.key(3), n=5)
        _p(f"SSSC H={H} N={N} {tag}: {dt*1000:.1f} ms/epoch "
           f"(compile {compile_s:.0f}s, F={F:.2f}, "
           f"peak_mem={_peak_mib():.0f} MiB)")
        return dt

    return (H, D), (data, cfg, estate0, params0), _ab


def xla_resolve_phase():
    """Resolve-path A/B leg + kernel-vs-XLA F parity (ONE slow compile).

    MEASURED 2026-08-19 on the v5e (H=100 N=2048): resolve 2590.6 ms/epoch
    (compile 2225 s), stash 2346.5 ms/epoch (compile 2182 s) — stash wins
    1.10x, so STASH_MAX_H now defaults to 128 and this leg FORCES the
    resolve path to stay reproducible."""
    import jax

    import evo_tpu.models.sssc as sssc_mod
    from evo_tpu.models.sssc import SSSC

    (H, D), (data, cfg, estate0, params0), _ab = _xla_setup()

    # --- XLA resolve path: A/B leg 1. Its compile is reused by the parity
    # loop below (same model dataclass, no clear_caches in between), so
    # the leg pays one slow compile.
    saved = sssc_mod.STASH_MAX_H
    sssc_mod.STASH_MAX_H = 0  # force re-solve (stash is the default now)
    jax.clear_caches()
    model_x = SSSC(D=D, H=H, lpj_kernel="xla")
    try:
        dt_x = _ab("xla_resolve", model_x)

        # --- kernel-vs-XLA F parity over 5 epochs with shared keys
        # (still inside the forced-resolve scope: the parity loop reuses
        # model_x's compiled resolve-path executable)
        from evo_tpu.ops.pallas_sssc import pallas_sssc_applicable

        B = data.y.shape[1]  # per-block batch, the kernel's tiling unit
        if not pallas_sssc_applicable(B, cfg.S, H):
            _p("pallas kernels not applicable on this backend/config — "
               "skipping the F-parity sub-step (CPU smoke mode)")
            return
        model_k = SSSC(D=D, H=H, lpj_kernel="pallas")
        Fks, Fxs = [], []
        pk, ek = params0, estate0
        px, ex = params0, estate0
        _p("F parity: 5 shared-key epochs kernel vs xla...")
        for e in range(5):
            key = jax.random.fold_in(jax.random.key(5), e)
            pk, ek, sk, _ = model_k.em_step(pk, ek, data, key, cfg)
            px, ex, sx, _ = model_x.em_step(px, ex, data, key, cfg)
            Fks.append(float(sk.F)); Fxs.append(float(sx.F))
        _p("F parity (kernel vs xla): "
           f"{list(zip([round(f,3) for f in Fks], [round(f,3) for f in Fxs]))}")
        pk, ek, _ = run_epochs(model_k, pk, ek, data, cfg, 3,
                               jax.random.key(8))
        dt_k, Fk = timed_epochs(model_k, pk, ek, data, cfg,
                                jax.random.key(9))
        _p(f"kernel re-timed: {dt_k*1000:.2f} ms/epoch "
           f"-> {dt_x/dt_k:.1f}x over XLA-resolve")
    finally:
        sssc_mod.STASH_MAX_H = saved
        jax.clear_caches()


def xla_stash_phase():
    """Stash-path A/B leg (VERDICT item 6; the other slow compile)."""
    import jax

    import evo_tpu.models.sssc as sssc_mod
    from evo_tpu.models.sssc import SSSC

    (H, D), _, _ab = _xla_setup()

    saved = sssc_mod.STASH_MAX_H
    sssc_mod.STASH_MAX_H = 128  # the default since the 2026-08-19 A/B
    jax.clear_caches()
    try:
        dt_s = _ab("xla_stash", SSSC(D=D, H=H, lpj_kernel="xla"))
        _p(f"stash leg: {dt_s*1000:.1f} ms/epoch — compare against the "
           "xla_resolve line from the xla-resolve run")
    finally:
        sssc_mod.STASH_MAX_H = saved
        jax.clear_caches()


def xla_phase():
    xla_resolve_phase()
    xla_stash_phase()


def main():
    import jax
    import jax.numpy as jnp

    phases = sys.argv[1:] or ["kernel", "bsc", "xla"]
    _p(f"devices: {jax.devices()}  phases: {phases}")
    x = jnp.ones((256, 256))
    _p(f"health matmul: {float((x @ x).sum()):.0f}")
    from evo_tpu.apps.common import warm_d2h_async
    warm_d2h_async(verbose=True)

    fns = {"kernel": kernel_phase, "bsc": bsc_phase, "xla": xla_phase,
           "xla-resolve": xla_resolve_phase, "xla-stash": xla_stash_phase}
    for ph in phases:
        try:
            fns[ph]()
        except Exception as ex:
            _p(f"{ph} phase FAILED: {type(ex).__name__}: {ex}")


if __name__ == "__main__":
    main()
