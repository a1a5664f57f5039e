"""Measure the position-preserving swap merge (EAConfig.swap_merge) against
the lpj-sorted top-k merge at the north-star BSC config, plus an 8192-row
block variant — ONE process, ONE host->device transfer of the big state
array (1.7 GB estate.ss would otherwise crawl through the axon tunnel per
variant), pipelined timing, value-readback barriers (CLAUDE.md).

Usage (from the repo root): python tools/measure_swap_merge.py
(the stdin form `python - < tools/measure_swap_merge.py` also works)
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))
                                   ) if "__file__" in globals() else ".")


def main():
    import jax
    import jax.numpy as jnp

    from evo_tpu.models.bsc import BSC
    from evo_tpu.models.base import Data, make_data
    from evo_tpu.variational.state_init import EState, init_states

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    from evo_tpu.apps.common import warm_d2h_async

    # first d2h readback stalls 80-180 s; absorb it up front
    warm = warm_d2h_async(verbose=True)

    H = D = 256
    S = 64
    NB, B = 25, 4096
    N = NB * B
    rng = np.random.default_rng(0)
    W_gen = rng.standard_normal((D, H)).astype(np.float32)
    s_gen = rng.random((N, H)) <= 2.0 / H
    Y = (s_gen.astype(np.float32) @ W_gen.T
         + rng.standard_normal((N, D)).astype(np.float32))
    model = BSC(D=D, H=H)
    t0 = time.time()
    data = make_data(Y, n_blocks=NB)
    cfg0, estate0 = init_states(N=N, S=S, H=H, no_parents=10, no_children=1,
                                no_generations=1, n_blocks=NB, seed=0)
    estate0 = jax.device_put(estate0)
    jax.block_until_ready(estate0.ss)
    params = model.standard_init(data, seed=0, y_host=Y)
    print(f"setup+h2d: {time.time()-t0:.0f}s", file=sys.stderr)
    warm.join()

    def reblock(tree_data, tree_estate, nb2, B2):
        """Derive an [nb2, B2, ...] layout on device from the resident
        arrays (drop trailing blocks if nb*B doesn't divide)."""
        keep = (nb2 * B2) // B
        assert keep * B == nb2 * B2

        def rb(a):
            return a[:keep].reshape((nb2, B2) + a.shape[2:])

        d = Data(y=rb(tree_data.y), x_infr=rb(tree_data.x_infr),
                 x=rb(tree_data.x), row_valid=rb(tree_data.row_valid),
                 incomplete=tree_data.incomplete)
        e = EState(ss=rb(tree_estate.ss), lpj=rb(tree_estate.lpj))
        return d, e

    def measure(tag, d, e, cfg):
        Nv = d.y.shape[0] * d.y.shape[1]
        t0 = time.time()
        p1, e1, st, _ = model.em_step(params, e, d, jax.random.key(1), cfg)
        jax.block_until_ready(e1.lpj)
        compile_s = time.time() - t0
        for k in range(3):
            p1, e1, st, _ = model.em_step(
                p1, e1, d, jax.random.fold_in(jax.random.key(1), k), cfg)
        float(st.F)  # warmup barrier
        EPOCHS = 10
        t0 = time.time()
        for k in range(EPOCHS):
            p1, e1, st, _ = model.em_step(
                p1, e1, d, jax.random.fold_in(jax.random.key(2), k), cfg)
        F_last = float(st.F)  # value readback = completion barrier
        per = (time.time() - t0) / EPOCHS
        norm = per * (N / Nv)
        print(f"{tag:24s} {per*1e3:6.1f} ms/epoch ({norm*1e3:6.1f} norm) "
              f"F={F_last:.2f} compile={compile_s:.0f}s", file=sys.stderr)
        return per, norm

    results = {}
    results["topk_4096x25"] = measure(
        "topk 4096x25", data, estate0, cfg0)
    cfg_sw = dataclasses.replace(cfg0, swap_merge=True)
    results["swap_4096x25"] = measure(
        "swap 4096x25", data, estate0, cfg_sw)
    d12, e12 = reblock(data, estate0, 12, 8192)
    cfg12 = dataclasses.replace(cfg_sw, n_blocks=12)
    results["swap_8192x12"] = measure(
        "swap 8192x12", d12, e12, cfg12)
    d48, e48 = reblock(data, estate0, 48, 2048)
    cfg48 = dataclasses.replace(cfg_sw, n_blocks=48)
    results["swap_2048x48"] = measure(
        "swap 2048x48", d48, e48, cfg48)
    print({k: (round(v[0] * 1e3, 2), round(v[1] * 1e3, 2))
           for k, v in results.items()})


if __name__ == "__main__":
    main()
