"""Measure the reference (NumPy/mpi4py-stub, /root/reference unmodified) at
the two example-default configs that still lack a CPU baseline for the
PARITY perf table (VERDICT r3 item 2):

  1. EBSC at the image-denoising defaults (H=32, S=20, D=25 — 5x5 patches;
     image-denoising/params.py) at the house-x0.4 patch count N=9604.
  2. ES3C at the feature-learning defaults (H=100, S=15;
     feature-learning/params.py:30-43) at its N=2000 patch count.

The reference E-step is a per-datapoint Python loop (linear in N), so each
config is timed at a reduced N and extrapolated — same method as
tools/measure_reference_baseline.py (the north-star calibration).

Run on an IDLE box (any CPU contention inflates the baseline):

    python tools/measure_ref_configs.py
"""
import json
import os
import sys
import time

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
from measure_reference_baseline import install_mpi_stub  # noqa: E402


def measure_bsc(N_measure, N_target, H, S, D, epochs=3, parents=10,
                children=1):
    from evo.models import BSC
    from evo.variational.utils import init_states

    rng = np.random.RandomState(0)
    model = BSC(D, H, S)
    theta_gen = {"W": rng.randn(D, H), "pi": 2.0 / H, "sigma": 1.0}
    np.random.seed(0)
    data = model.generate_data(theta_gen, N_measure)
    my_data = {"y": data["y"],
               "x_infr": np.ones((N_measure, D), dtype=bool)}
    theta = model.check_params(model.standard_init(my_data))
    my_suff_stat = init_states(N_measure, S, H, "fit", "randflip",
                               parents, children, 1)
    times = []
    for e in range(epochs):
        t0 = time.time()
        F, _, _, theta = model.step(theta, my_suff_stat, my_data)
        times.append(time.time() - t0)
        print(f"  bsc epoch {e}: {times[-1]:.2f}s F={F:.3f}",
              file=sys.stderr, flush=True)
    return min(times) * (N_target / N_measure), min(times)


def measure_sssc(N_measure, N_target, H, S, D, epochs=3):
    from evo.models import SSSC
    from evo.variational.utils import init_states

    rng = np.random.RandomState(0)
    model = SSSC(D, H, S)
    np.random.seed(0)
    theta_gen = {"W": rng.randn(D, H), "pies": np.full(H, 2.0 / H),
                 "mus": np.ones(H), "Psi": np.eye(H), "sigma2": 1.0}
    data = model.generate_data(theta_gen, N_measure)
    my_data = {"y": data["y"],
               "x_infr": np.ones((N_measure, D), dtype=bool)}
    theta = model.check_params(model.standard_init(my_data))
    my_suff_stat = init_states(N_measure, S, H, "fit", "randflip", 5, 2, 1)
    times = []
    for e in range(epochs):
        t0 = time.time()
        F, _, _, theta = model.step(theta, my_suff_stat, my_data)
        times.append(time.time() - t0)
        print(f"  sssc epoch {e}: {times[-1]:.2f}s F={F:.3f}",
              file=sys.stderr, flush=True)
    return min(times) * (N_target / N_measure), min(times)


def main():
    install_mpi_stub()
    sys.path.insert(0, "/root/reference")
    out = {"method": "reference from /root/reference via mpi4py stub, "
                     "1 rank; per-datapoint loop => linear-in-N "
                     "extrapolation from N_measure (min over epochs)"}

    print("EBSC denoise-scale (H=32, S=20, D=25, N=9604)...", flush=True)
    s, raw = measure_bsc(N_measure=1000, N_target=9604, H=32, S=20, D=25)
    out["ebsc_denoise_H32_N9604_s_per_epoch"] = s
    out["ebsc_denoise_H32_measured_at_N1000"] = raw
    print(f"  -> {s:.1f} s/epoch extrapolated", flush=True)

    print("ES3C feature-learning (H=100, S=15, D=64, N=2000)...", flush=True)
    s, raw = measure_sssc(N_measure=250, N_target=2000, H=100, S=15, D=64)
    out["es3c_fl_H100_N2000_s_per_epoch"] = s
    out["es3c_fl_H100_measured_at_N250"] = raw
    print(f"  -> {s:.1f} s/epoch extrapolated", flush=True)

    print("EBSC feature-learning (H=100, S=15, D=64, N=2000)...", flush=True)
    s, raw = measure_bsc(N_measure=1000, N_target=2000, H=100, S=15, D=64,
                         parents=5, children=2)
    out["ebsc_fl_H100_N2000_s_per_epoch"] = s
    out["ebsc_fl_H100_measured_at_N1000"] = raw
    print(f"  -> {s:.1f} s/epoch extrapolated", flush=True)

    path = os.path.join(os.path.dirname(_here), "BASELINE_CONFIGS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
