"""One-attach refresh of the SSSC headline numbers after the active-set
compaction integration (commit 9ea8144): N=16k and N=65k epoch times plus a
device trace of the compacted epoch.  Chained into one process because the
axon tunnel wedges on rapid reattach (CLAUDE.md).

Run from the repo root:  timeout 1500 python tools/refresh_sssc_headline.py
"""
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import numpy as np


def measure_epoch(n_blocks, label):
    import jax
    from evo_tpu.models.base import make_data
    from evo_tpu.models.sssc import SSSC
    from evo_tpu.variational.state_init import init_states

    B, H, S, D = 4096, 32, 20, 25
    N = n_blocks * B
    rng = np.random.default_rng(0)
    W_gen = rng.standard_normal((D, H)).astype(np.float32)
    s_gen = rng.random((N, H)) <= 2.0 / H
    Y = (s_gen.astype(np.float32) @ W_gen.T
         + rng.standard_normal((N, D)).astype(np.float32))
    model = SSSC(D=D, H=H)
    data = make_data(Y, n_blocks=n_blocks)
    cfg, estate = init_states(N=N, S=S, H=H, no_parents=10, no_children=1,
                              no_generations=1, n_blocks=n_blocks, seed=0)
    params = model.standard_init(data, seed=0, y_host=Y)
    key = jax.random.key(0)
    params, estate, stats, _ = model.em_step(params, estate, data, key, cfg)
    float(stats.F)  # compile + one-time runtime cost + readback warm
    for e in range(3):  # warm epochs (CLAUDE.md)
        params, estate, stats, _ = model.em_step(
            params, estate, data, jax.random.fold_in(key, e), cfg)
    float(stats.F)
    t0 = time.time()
    n = 10
    for e in range(n):
        params, estate, stats, _ = model.em_step(
            params, estate, data, jax.random.fold_in(key, 100 + e), cfg)
    float(stats.F)  # value readback = completion barrier (CLAUDE.md)
    dt = (time.time() - t0) / n
    print(f"{label}: {dt*1000:.1f} ms/epoch  (F={float(stats.F):.3f})",
          flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    print(f"devices: {jax.devices()}", flush=True)
    x = jnp.ones((256, 256))
    print(f"health matmul: {float((x @ x).sum()):.0f} "
          f"({time.time()-t0:.1f}s incl. first readback)", flush=True)

    measure_epoch(4, "sssc N=16k H=32 S=20")
    measure_epoch(16, "sssc N=65k H=32 S=20")

    os.environ["MODEL"] = "sssc"
    import profile_epoch

    logdir = "/tmp/evo_trace_sssc_compact"
    print("== SSSC device trace (compacted) ==", flush=True)
    profile_epoch.run_epochs(logdir)
    profile_epoch.parse(logdir)


if __name__ == "__main__":
    main()
