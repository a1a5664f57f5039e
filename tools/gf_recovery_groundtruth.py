"""Ground-truth dictionary recovery at the H=100 feature-learning default.

PARITY.md's barbara head-to-head found only 44/100 reference GFs with an
evo_tpu match at cosine > 0.8 (median best-match 0.76) and attributed the
gap to the degenerate solution set of an overcomplete model on natural
images — asserted, not demonstrated.  This experiment settles it with a
KNOWN generating dictionary: draw W_gen (D=64, H=100, unit atoms scaled to
amplitude 10 vs sigma=1 noise, i.e. the bars-test SNR), generate N=2000
datapoints from the BSC generative model at pi = 2/H, then train BOTH the
actual reference EBSC (via the mpi4py stub,
/root/reference/examples/feature-learning/params.py:30-43 defaults: H=100,
S=15, fit/randflip, no_parents=5, no_children=2, 200 epochs) and evo_tpu
EBSC from an IDENTICAL W/pi/sigma init, and Hungarian-match each learned
dictionary against W_gen on |cosine|.

If both sides recover a similar fraction of the true atoms, the barbara
overlap gap is a property of the problem (degenerate optima), not of
evo_tpu.  Output: one JSON line with per-side matched fractions + medians.

Run from the repo root:  python tools/gf_recovery_groundtruth.py
(CPU; ~5 min — the reference side is ~1.2 s/epoch).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
sys.path.insert(0, HERE)

REF = "/root/reference"

H, S = 100, 15
N_PAR, N_CH, N_GEN = 5, 2, 1
D, N = 64, 2000
AMP, SIGMA, PI = 10.0, 1.0, 2.0 / H


def make_groundtruth(seed=0):
    """W_gen: unit-norm Gaussian atoms scaled to AMP (incoherent w.h.p. at
    D=64, the standard identifiable sparse-coding setup); data from the BSC
    generative model (s ~ Bernoulli(PI), y = W s + sigma eps)."""
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((D, H))
    W = AMP * W / np.linalg.norm(W, axis=0, keepdims=True)
    s = rng.random((N, H)) < PI
    Y = s @ W.T + SIGMA * rng.standard_normal((N, D))
    return W, Y.astype(np.float64)


def shared_init(Y, seed=4):
    ymean = Y.mean(0)
    sig0 = float(np.sqrt(((Y - ymean) ** 2).mean(0).sum() / D))
    W0 = ymean[:, None] + np.random.default_rng(seed).normal(
        scale=sig0 / 4, size=(D, H))
    return W0, sig0


def hungarian_cosines(W_learned, W_gen):
    """|cosine| of the optimal 1:1 assignment learned-atom -> true-atom
    (scipy Hungarian on cost = -|cos|); DC removal like the barbara
    analysis so an additive patch offset cannot mask shape agreement."""
    from scipy.optimize import linear_sum_assignment

    A = np.asarray(W_learned, float).copy()
    B = np.asarray(W_gen, float).copy()
    A -= A.mean(0, keepdims=True)
    B -= B.mean(0, keepdims=True)
    A /= np.linalg.norm(A, axis=0, keepdims=True) + 1e-12
    B /= np.linalg.norm(B, axis=0, keepdims=True) + 1e-12
    C = np.abs(A.T @ B)  # [H_learned, H_gen]
    r, c = linear_sum_assignment(-C)
    return np.sort(C[r, c])[::-1]


def run_reference(Y, W0, sig0, epochs, seed=0):
    from measure_reference_baseline import install_mpi_stub

    install_mpi_stub()
    sys.path.insert(0, REF)
    from evo.models import BSC as RefBSC
    from evo.variational.utils import init_states as ref_init_states

    np.random.seed(seed)
    model = RefBSC(D, H, S)
    theta = {"W": W0.copy(), "pi": 1.0 / H, "sigma": sig0}
    suff = ref_init_states(N, S, H, "fit", "randflip", N_PAR, N_CH, N_GEN)
    data = {"y": Y.copy(), "x_infr": np.ones((N, D), bool)}
    F = None
    for e in range(epochs):
        F, _, _, theta = model.step(theta, suff, data)
        if e % 40 == 0:
            print(f"  ref epoch {e}: F={F:.3f}", file=sys.stderr)
    return float(F), theta


def run_evo(Y, W0, sig0, epochs, seed=0):
    import jax

    from evo_tpu.models.base import make_data
    from evo_tpu.models.bsc import BSC, BSCParams
    from evo_tpu.variational.state_init import init_states
    import jax.numpy as jnp

    model = BSC(D=D, H=H)
    params = BSCParams(W=jnp.asarray(W0, jnp.float32),
                       pi=jnp.asarray(1.0 / H), sigma=jnp.asarray(sig0),
                       pies=jnp.full((H,), 1.0 / H))
    data = make_data(Y)
    cfg, estate = init_states(N=N, S=S, H=H, no_parents=N_PAR,
                              no_children=N_CH, no_generations=N_GEN,
                              seed=seed)
    for e in range(epochs):
        params, estate, stats, _ = model.em_step(
            params, estate, data, jax.random.fold_in(jax.random.key(seed), e),
            cfg)
        if e % 40 == 0:
            print(f"  evo epoch {e}: F={float(stats.F):.3f}", file=sys.stderr)
    return float(stats.F), params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    W_gen, Y = make_groundtruth(args.seed)
    W0, sig0 = shared_init(Y)
    print(f"ground-truth recovery: D={D} H={H} N={N} pi={PI} "
          f"amp/sigma={AMP/SIGMA}, {args.epochs} epochs", file=sys.stderr)

    t0 = time.time()
    F_e, params_e = run_evo(Y, W0, sig0, args.epochs, seed=args.seed)
    t_e = time.time() - t0
    t0 = time.time()
    F_r, theta_r = run_reference(Y, W0, sig0, args.epochs, seed=args.seed)
    t_r = time.time() - t0

    cos_e = hungarian_cosines(np.asarray(params_e.W), W_gen)
    cos_r = hungarian_cosines(theta_r["W"], W_gen)
    res = {
        "epochs": args.epochs, "seed": args.seed,
        "F_evo": F_e, "F_ref": F_r,
        "sigma_evo": float(params_e.sigma), "sigma_ref": float(theta_r["sigma"]),
        "pi_evo": float(params_e.pi), "pi_ref": float(theta_r["pi"]),
        "matched_gt0.8_evo": int((cos_e > 0.8).sum()),
        "matched_gt0.8_ref": int((cos_r > 0.8).sum()),
        "matched_gt0.95_evo": int((cos_e > 0.95).sum()),
        "matched_gt0.95_ref": int((cos_r > 0.95).sum()),
        "median_cos_evo": float(np.median(cos_e)),
        "median_cos_ref": float(np.median(cos_r)),
        "wall_s_evo": round(t_e, 1), "wall_s_ref": round(t_r, 1),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
