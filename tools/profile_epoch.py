"""Capture a jax.profiler device trace of the north-star BSC epoch and print
an op-level time breakdown.  Run on the TPU from the repo root:

    python tools/profile_epoch.py [logdir]          # trace + parse
    PARSE_ONLY=1 python tools/profile_epoch.py ...  # parse an existing trace

Parsing reads the xplane protobuf directly (tensorflow.tsl's xplane_pb2 with
the pure-python protobuf impl — the tensorboard_plugin_profile converters in
this image are broken against the installed TF).  Summing the "XLA Ops" line
per event name gives per-op device time; divide by the number of traced
epochs for ms/epoch.  NOTE on this machine: wall-clock microbenchmarks of
single ops are misleading (dispatch overlap makes small kernels appear
impossibly fast); trust the device trace and pipelined end-to-end timings.
"""

import glob
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

N_TRACE = 3


def run_epochs(logdir):
    import jax

    print(f"device attach: {jax.devices()}", file=sys.stderr, flush=True)

    from evo_tpu.models.base import make_data
    from evo_tpu.variational.state_init import init_states

    rng = np.random.default_rng(0)
    # config env overrides (e.g. NB=16 to trace the N=65k SSSC headline, or
    # H=100 S=15 D=64 for the feature-learning-default bucketed kernels)
    def _env(name, default):
        return int(os.environ.get(name, default))

    # INCOMPLETE=<fraction> NaNs that fraction of entries (MCAR) and runs
    # the masked/reconstruction path (sssc only) — traces the inpainting
    # production config, e.g. MODEL=sssc NB=37 B=4096 D=75 INCOMPLETE=0.1.
    miss_frac = float(os.environ.get("INCOMPLETE", "0"))
    if os.environ.get("MODEL", "bsc") == "sssc":
        from evo_tpu.models.sssc import SSSC

        N_BLOCKS, B = _env("NB", 4), _env("B", 4096)
        H, S, D = _env("H", 32), _env("S", 20), _env("D", 25)
        N = N_BLOCKS * B
        to_learn = (("W", "pies", "sigma2") if miss_frac > 0
                    else SSSC.to_learn)
        # LPJ_KERNEL={auto,pallas,pallas_full,xla} forces the lpj path
        # (anything not in the pallas set disables the kernels) — used for
        # the masked-path kernel-vs-XLA A/B at the inpainting config.
        model = SSSC(D=D, H=H, to_learn=to_learn,
                     lpj_kernel=os.environ.get("LPJ_KERNEL", "auto"))
    else:
        from evo_tpu.models.bsc import BSC

        N_BLOCKS, B = _env("NB", 25), _env("B", 4096)
        H, S, D = _env("H", 256), _env("S", 64), _env("D", 256)
        N = N_BLOCKS * B
        model = BSC(D=D, H=H)
    print(f"config: N={N_BLOCKS}x{B} H={H} S={S} D={D}",
          file=sys.stderr, flush=True)
    W_gen = rng.standard_normal((D, H)).astype(np.float32)
    s_gen = rng.random((N, H)) <= 2.0 / H
    Y = (s_gen.astype(np.float32) @ W_gen.T
         + rng.standard_normal((N, D)).astype(np.float32))
    if miss_frac > 0:
        Y[rng.random((N, D)) < miss_frac] = np.nan
    data = make_data(Y, n_blocks=N_BLOCKS)
    cfg, estate = init_states(N=N, S=S, H=H, no_parents=10, no_children=1,
                              no_generations=1, n_blocks=N_BLOCKS, seed=0)
    params = model.standard_init(data, seed=0, y_host=Y)
    step = (lambda p, e, d, k, c: model.em_step(p, e, d, k, c,
                                                do_reconstruction=True)) \
        if data.incomplete else model.em_step

    key = jax.random.key(0)
    # compile + absorb the one-time post-compile runtime cost.  NOTE: end
    # every timed/traced window on a VALUE readback — block_until_ready can
    # silently stop blocking after tunnel restarts (CLAUDE.md), which both
    # corrupts the wall-clock number and truncates the profiler trace.
    params, estate, stats, _ = step(params, estate, data, key, cfg)
    print("compiled; waiting on first readback", file=sys.stderr, flush=True)
    float(stats.F)
    print("first readback done", file=sys.stderr, flush=True)
    for e in range(3):
        params, estate, stats, _ = step(
            params, estate, data, jax.random.fold_in(key, e), cfg)
    float(stats.F)
    t0 = time.time()
    for e in range(10):
        params, estate, stats, _ = step(
            params, estate, data, jax.random.fold_in(key, 100 + e), cfg)
    float(stats.F)
    print(f"pipelined: {(time.time()-t0)/10*1e3:.1f} ms/epoch",
          file=sys.stderr)

    with jax.profiler.trace(logdir):
        for i in range(N_TRACE):
            params, estate, stats, _ = step(
                params, estate, data, jax.random.fold_in(key, 200 + i), cfg)
        float(stats.F)


def parse(logdir, top: int = 30):
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    assert xplanes, f"no xplane under {logdir}"
    xs = xplane_pb2.XSpace()
    with open(sorted(xplanes)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        md = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            agg = defaultdict(lambda: [0.0, 0])
            for ev in line.events:
                name = md.get(ev.metadata_id, str(ev.metadata_id))
                agg[name][0] += ev.duration_ps / 1e12
                agg[name][1] += 1
            total = sum(v[0] for v in agg.values())
            print(f"\n-- {plane.name} / {line.name} "
                  f"(sum {total/N_TRACE*1e3:.1f} ms/epoch)")
            rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
            for name, (dur, cnt) in rows:
                print(f"{dur/N_TRACE*1e3:9.3f} ms/ep x{cnt:6d}  {name[:100]}")


if __name__ == "__main__":
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/evo_trace"
    if not os.environ.get("PARSE_ONLY"):
        run_epochs(logdir)
    parse(logdir)
