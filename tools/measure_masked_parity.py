"""TPU F-parity + epoch-time A/B of the masked-Gram SSSC kernels vs the
masked XLA path (the incomplete-data / inpainting production path,
reference examples/image-inpainting/main.py:100-111).

Runs the same incomplete-data EM (shared data, shared Theta^0, shared
per-epoch keys) once with lpj_kernel='auto' (masked Pallas kernels) and
once with 'xla', printing per-epoch F both ways.  Small default config so
both compiles stay in minutes; env-tunable like tools/profile_epoch.py
(NB, B, H, S, D, MISS, EPOCHS).

Run from the repo root on the TPU:  python tools/measure_masked_parity.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax

    def _env(name, default):
        return int(os.environ.get(name, default))

    NB, B = _env("NB", 4), _env("B", 4096)
    H, S, D = _env("H", 32), _env("S", 20), _env("D", 75)
    miss = float(os.environ.get("MISS", "0.1"))
    epochs = _env("EPOCHS", 5)
    N = NB * B

    from evo_tpu.models.base import make_data
    from evo_tpu.models.sssc import SSSC
    from evo_tpu.variational.state_init import init_states

    rng = np.random.default_rng(0)
    W_gen = rng.standard_normal((D, H)).astype(np.float32)
    s_gen = rng.random((N, H)) <= 2.0 / H
    Y = (s_gen.astype(np.float32) @ W_gen.T
         + rng.standard_normal((N, D)).astype(np.float32))
    Y[rng.random((N, D)) < miss] = np.nan
    data = make_data(Y, n_blocks=NB)
    assert data.incomplete

    cfg, estate0 = init_states(N=N, S=S, H=H, no_parents=10, no_children=1,
                               no_generations=1, n_blocks=NB, seed=0)
    key = jax.random.key(0)
    results = {}
    for mode in ("auto", "xla"):
        model = SSSC(D=D, H=H, to_learn=("W", "pies", "sigma2"),
                     lpj_kernel=mode)
        params = model.standard_init(data, seed=0, y_host=Y)
        estate = estate0
        t0 = time.time()
        Fs = []
        for e in range(epochs):
            params, estate, stats, _ = model.em_step(
                params, estate, data, jax.random.fold_in(key, e), cfg,
                do_reconstruction=True)
            Fs.append(float(stats.F))  # value readback ends each epoch
            if e == 0:
                print(f"[{mode}] compile+epoch1 {time.time() - t0:.1f} s",
                      flush=True)
        # pipelined timing (enqueue, block once on a value)
        t0 = time.time()
        for e in range(5):
            params, estate, stats, _ = model.em_step(
                params, estate, data, jax.random.fold_in(key, 100 + e), cfg,
                do_reconstruction=True)
        _ = float(stats.F)
        dt = (time.time() - t0) / 5
        results[mode] = (Fs, dt)
        print(f"[{mode}] F per epoch: {['%.3f' % f for f in Fs]}", flush=True)
        print(f"[{mode}] pipelined {dt * 1e3:.1f} ms/epoch", flush=True)

    fa, fx = results["auto"][0], results["xla"][0]
    dmax = max(abs(a - b) / max(1.0, abs(b)) for a, b in zip(fa, fx))
    print(f"max relative F deviation over {epochs} shared-key epochs: "
          f"{dmax:.2e}")
    print(f"kernel speedup: {results['xla'][1] / results['auto'][1]:.2f}x")


if __name__ == "__main__":
    main()
