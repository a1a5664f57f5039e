"""Capture a jax.profiler device trace of the north-star BSC epoch and print
an op-level time breakdown (uses tensorboard_plugin_profile to parse the
xplane).  Run on the TPU: `python tools/profile_epoch.py [logdir]`."""

import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def run_epochs(logdir, n_trace=3):
    import jax
    import jax.numpy as jnp

    from evo_tpu.models.bsc import BSC
    from evo_tpu.models.base import make_data
    from evo_tpu.variational.state_init import init_states

    N_BLOCKS, B, H, S, D = 25, 4096, 256, 64, 256
    N = N_BLOCKS * B
    model = BSC(D=D, H=H)
    rng = np.random.default_rng(0)
    W_gen = rng.standard_normal((D, H)).astype(np.float32)
    s_gen = rng.random((N, H)) <= 2.0 / H
    Y = (s_gen.astype(np.float32) @ W_gen.T
         + rng.standard_normal((N, D)).astype(np.float32))
    data = make_data(Y, n_blocks=N_BLOCKS)
    cfg, estate = init_states(N=N, S=S, H=H, no_parents=10, no_children=1,
                              no_generations=1, n_blocks=N_BLOCKS, seed=0)
    params = model.standard_init(data, seed=0, y_host=Y)

    key = jax.random.key(0)
    # warmup/compile
    params, estate, stats, _ = model.em_step(params, estate, data, key, cfg)
    jax.block_until_ready(estate.lpj)
    t0 = time.time()
    params, estate, stats, _ = model.em_step(params, estate, data, key, cfg)
    jax.block_until_ready(estate.lpj)
    print(f"epoch (untraced): {time.time()-t0:.3f}s", file=sys.stderr)

    with jax.profiler.trace(logdir):
        for i in range(n_trace):
            params, estate, stats, _ = model.em_step(
                params, estate, data, jax.random.fold_in(key, i), cfg)
        jax.block_until_ready(estate.lpj)


def parse(logdir, n_trace=3):
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rttd

    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    assert xplanes, f"no xplane under {logdir}"
    xp = sorted(xplanes)[-1]
    data, _ = rttd.xspace_to_tool_data([xp], "framework_op_stats", {})
    # data is a JSON-ish string or bytes for the op profile tool
    if isinstance(data, bytes):
        data = data.decode()
    return data


def parse_hlo(logdir, n_trace):
    """Aggregate device events from the trace_viewer JSON instead (more
    robust across plugin versions)."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rttd

    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    xp = sorted(xplanes)[-1]
    data, _ = rttd.xspace_to_tool_data([xp], "trace_viewer", {})
    if isinstance(data, bytes):
        data = data.decode()
    tr = json.loads(data)
    events = tr["traceEvents"] if isinstance(tr, dict) else tr
    agg = {}
    total = 0.0
    for ev in events:
        if not isinstance(ev, dict) or ev.get("ph") != "X":
            continue
        # device lanes only: XLA Ops live on TensorCore pids
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e6  # us -> s
        cat = (ev.get("args") or {}).get("l", "") if ev.get("args") else ""
        pid = ev.get("pid")
        agg.setdefault((pid, name.split(".")[0]), [0.0, 0])
        agg[(pid, name.split(".")[0])][0] += dur
        agg[(pid, name.split(".")[0])][1] += 1
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    for (pid, name), (dur, cnt) in rows[:60]:
        print(f"{dur/n_trace*1e3:9.3f} ms/epoch  x{cnt:5d}  pid={pid}  {name}")


if __name__ == "__main__":
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/evo_trace"
    n_trace = 3
    if not os.environ.get("PARSE_ONLY"):
        run_epochs(logdir, n_trace)
    parse_hlo(logdir, n_trace)
