"""Measure the position-preserving swap merge (EAConfig.swap_merge) against
the lpj-sorted top-k merge at the north-star BSC config, plus a block-size
sweep — ONE process, pipelined timing, value-readback barriers (CLAUDE.md).

Usage: python tools/measure_swap_merge.py
"""

import dataclasses
import sys
import time

import numpy as np


def main():
    import jax

    from evo_tpu.models.bsc import BSC
    from evo_tpu.models.base import make_data
    from evo_tpu.variational.state_init import init_states

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    H = D = 256
    S = 64
    rng = np.random.default_rng(0)
    W_gen = rng.standard_normal((D, H)).astype(np.float32)
    N_max = 102400
    s_gen = rng.random((N_max, H)) <= 2.0 / H
    Y_all = (s_gen.astype(np.float32) @ W_gen.T
             + rng.standard_normal((N_max, D)).astype(np.float32))
    model = BSC(D=D, H=H)

    # (B, n_blocks, swap_merge); 4096x25 is the bench config;
    # the 8192x12 / 2048x48 rows share N=98304 for a fair B sweep
    variants = [
        (4096, 25, False),
        (4096, 25, True),
        (4096, 24, True),
        (8192, 12, True),
        (2048, 48, True),
    ]
    results = []
    for B, NB, swap in variants:
        N = B * NB
        Y = Y_all[:N]
        data = make_data(Y, n_blocks=NB)
        cfg, estate = init_states(N=N, S=S, H=H, no_parents=10, no_children=1,
                                  no_generations=1, n_blocks=NB, seed=0)
        cfg = dataclasses.replace(cfg, swap_merge=swap)
        params = model.standard_init(data, seed=0, y_host=Y)
        t0 = time.time()
        params, estate, stats, _ = model.em_step(
            params, estate, data, jax.random.key(1), cfg)
        jax.block_until_ready(estate.lpj)
        compile_s = time.time() - t0
        for e in range(3):
            params, estate, stats, _ = model.em_step(
                params, estate, data, jax.random.fold_in(jax.random.key(1), e),
                cfg)
        float(stats.F)  # warmup barrier
        EPOCHS = 10
        t0 = time.time()
        for e in range(EPOCHS):
            params, estate, stats, _ = model.em_step(
                params, estate, data, jax.random.fold_in(jax.random.key(2), e),
                cfg)
        F_last = float(stats.F)  # value readback = completion barrier
        per_epoch = (time.time() - t0) / EPOCHS
        # normalize to the bench's N=102400 for comparability
        norm = per_epoch * (102400 / N)
        print(f"B={B:5d} nb={NB:2d} swap={int(swap)}  "
              f"{per_epoch*1e3:6.1f} ms/epoch  ({norm*1e3:6.1f} norm)  "
              f"F={F_last:.2f}  compile={compile_s:.0f}s", file=sys.stderr)
        results.append((B, NB, swap, per_epoch, norm, F_last))
    print([(b, nb, sw, round(pe * 1e3, 2), round(no * 1e3, 2))
           for b, nb, sw, pe, no, _ in results])


if __name__ == "__main__":
    main()
