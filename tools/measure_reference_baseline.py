"""Measure the reference (NumPy/mpi4py) EM-epoch wall-clock to calibrate
bench.py's vs_baseline ratio.

The reference is pure NumPy + mpi4py; mpi4py is not installed in this image,
so a minimal single-rank stub is injected (rank 0, size 1: allreduce =
identity, Allreduce = copy, bcast = identity).  This runs the reference's own
code from /root/reference unmodified — the most faithful baseline obtainable
here (BASELINE.md: "baseline must be measured").

North-star config (BASELINE.json): N=100k, H=256, S=64.  The reference's
E-step is a per-datapoint Python loop, so wall-clock is linear in N; we time
N_MEASURE datapoints and extrapolate.  Run:

    python tools/measure_reference_baseline.py
"""

import json
import os
import sys
import time
import types

import numpy as np


def install_mpi_stub():
    mpi4py = types.ModuleType("mpi4py")
    MPI = types.ModuleType("mpi4py.MPI")

    class FakeComm:
        rank = 0
        size = 1

        def allreduce(self, x, op=None):
            return x

        def Allreduce(self, src, dst, op=None):
            a = src[0] if isinstance(src, (list, tuple)) else src
            b = dst[0] if isinstance(dst, (list, tuple)) else dst
            np.copyto(b, a)

        def bcast(self, x, root=0):
            return x

        def Bcast(self, x, root=0):
            return x

        def Barrier(self):
            pass

        def Scatterv(self, send, recv, root=0):
            np.copyto(recv, send[0])

        def Gatherv(self, chunk, recv, root=0):
            np.copyto(recv[0], chunk)

    MPI.COMM_WORLD = FakeComm()
    for name in ("DOUBLE", "FLOAT", "BOOL", "SHORT", "INT", "LONG",
                 "UNSIGNED_SHORT", "UNSIGNED_INT", "UNSIGNED_LONG", "SUM"):
        setattr(MPI, name, name)
    MPI.Wtime = time.time
    mpi4py.MPI = MPI
    sys.modules["mpi4py"] = mpi4py
    sys.modules["mpi4py.MPI"] = MPI


def main(N_measure=500, H=256, S=64, D=256, epochs=1, N_target=100_000):
    install_mpi_stub()
    sys.path.insert(0, "/root/reference")
    from evo.models import BSC  # reference code, unmodified
    from evo.variational.utils import init_states

    rng = np.random.RandomState(0)
    W_gen = rng.randn(D, H)
    model = BSC(D, H, S)
    theta_gen = {"W": W_gen, "pi": 2.0 / H, "sigma": 1.0}
    np.random.seed(0)
    data = model.generate_data(theta_gen, N_measure)
    my_data = {"y": data["y"], "x_infr": np.ones((N_measure, D), dtype=bool)}

    theta = model.standard_init(my_data)
    theta = model.check_params(theta)

    t0 = time.time()
    my_suff_stat = init_states(N_measure, S, H, "fit", "randflip", 10, 1, 1)
    t_init = time.time() - t0

    times = []
    for e in range(epochs):
        t0 = time.time()
        F, S_nunique, S_sub, theta = model.step(theta, my_suff_stat, my_data)
        times.append(time.time() - t0)
        print(f"epoch {e}: {times[-1]:.2f}s  F={F:.3f}", file=sys.stderr)

    per_epoch = min(times)
    scaled = per_epoch * (N_target / N_measure)
    lpj_evals = N_measure * (S + 10 * 1 * 1)  # S old states + children/epoch
    result = {
        "config": {"N_measure": N_measure, "N_target": N_target, "H": H, "S": S,
                   "D": D},
        "reference_epoch_s_at_N_measure": per_epoch,
        "reference_epoch_s_at_N_target_extrapolated": scaled,
        "reference_lpj_evals_per_s": lpj_evals / per_epoch,
        "init_states_s": t_init,
        # Multi-rank projections under IDEAL linear scaling (this container
        # has a single CPU core, so contention cannot be measured; ideal
        # scaling is the most favorable assumption for the reference — its
        # per-datapoint loops are independent and its collectives tiny, so
        # real mpirun numbers would be slightly worse than these).
        "reference_epoch_s_at_N_target_ideal_multirank": {
            str(r): scaled / r for r in (8, 64, 256)
        },
        "method": "reference code from /root/reference run single-rank via "
                  "mpi4py stub; per-datapoint Python loop => linear in N; "
                  "extrapolated from N_measure to N_target; multirank = "
                  "ideal linear scaling (1-core container, see comment)",
    }
    print(json.dumps(result, indent=2))
    # write next to the repo root regardless of CWD: bench.py loads the file
    # from ITS own directory, so a CWD-relative write would silently have
    # no effect on vs_baseline
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_MEASURED.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
