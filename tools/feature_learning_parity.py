"""Feature-learning quality parity at natural-image scale.

Head-to-head EBSC feature learning on the reference's own barbara patch set
(/root/reference/examples/feature-learning/data/barbara-2k-patches.npz,
N=2000 raw 8x8 pixel patches) at the reference feature-learning defaults
(H=100, S=15, fit/randflip, no_parents=5, no_children=2, no_generations=1,
200 epochs — reference params.py:20-94), identical data and identical W/pi/
sigma init for both runs.  Records final F / sigma / pi and saves both GF
grids for visual comparison.

Run from the repo root: python tools/feature_learning_parity.py [--epochs N]
(reference side runs the actual reference code on CPU via the mpi4py stub;
evo_tpu side runs on whatever device JAX finds).
"""

import argparse
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
sys.path.insert(0, HERE)

REF = "/root/reference"
NPZ = os.path.join(REF, "examples/feature-learning/data/barbara-2k-patches.npz")

H, S = 100, 15
N_PAR, N_CH, N_GEN = 5, 2, 1


def load_patches():
    with np.load(NPZ) as d:
        Y = d["data"].astype(np.float64)
        ph, pw = int(d["patch_height"]), int(d["patch_width"])
    return Y, ph, pw


def shared_init(Y, seed=4):
    D = Y.shape[1]
    ymean = Y.mean(0)
    sig0 = float(np.sqrt(((Y - ymean) ** 2).mean(0).sum() / D))
    W0 = ymean[:, None] + np.random.default_rng(seed).normal(
        scale=sig0 / 4, size=(D, H))
    return W0, sig0


def run_reference(Y, W0, sig0, epochs, seed=0):
    from measure_reference_baseline import install_mpi_stub

    install_mpi_stub()
    sys.path.insert(0, REF)
    from evo.models import BSC as RefBSC
    from evo.variational.utils import init_states as ref_init_states

    N, D = Y.shape
    np.random.seed(seed)
    model = RefBSC(D, H, S)
    theta = {"W": W0.copy(), "pi": 1.0 / H, "sigma": sig0}
    suff = ref_init_states(N, S, H, "fit", "randflip", N_PAR, N_CH, N_GEN)
    data = {"y": Y.copy(), "x_infr": np.ones((N, D), bool)}
    t0, F = time.time(), None
    for e in range(epochs):
        F, _, _, theta = model.step(theta, suff, data)
        if e % 20 == 0:
            print(f"  ref epoch {e}: F={F:.3f}", file=sys.stderr)
    dt = time.time() - t0
    return float(F), theta, dt / epochs


def run_evo(Y, W0, sig0, epochs, seed=0):
    import jax
    import jax.numpy as jnp

    from evo_tpu.models.bsc import BSC, BSCParams
    from evo_tpu.models.base import make_data
    from evo_tpu.variational.state_init import init_states

    N, D = Y.shape
    model = BSC(D=D, H=H)
    params = BSCParams(W=jnp.asarray(W0, jnp.float32),
                       pi=jnp.asarray(1.0 / H), sigma=jnp.asarray(sig0),
                       pies=jnp.full((H,), 1.0 / H))
    data = make_data(Y)
    cfg, estate = init_states(N=N, S=S, H=H, no_parents=N_PAR,
                              no_children=N_CH, no_generations=N_GEN,
                              seed=seed)
    # compile warmup
    p, e_, st, _ = model.em_step(params, estate, data, jax.random.key(99), cfg)
    jax.block_until_ready(e_.lpj)
    t0, F = time.time(), None
    for e in range(epochs):
        params, estate, stats, _ = model.em_step(
            params, estate, data, jax.random.fold_in(jax.random.key(seed), e),
            cfg)
        if e % 20 == 0:
            print(f"  evo epoch {e}: F={float(stats.F):.3f}", file=sys.stderr)
    F = float(stats.F)
    dt = time.time() - t0
    return F, params, dt / epochs


def save_gf_grid(W, ph, pw, path):
    from evo_tpu.prepost import save_grid

    gfs = np.asarray(W, dtype=float).T.reshape(-1, ph, pw)  # [n, h, w]
    save_grid(path, gfs, ncol=10)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--out", type=str, default="/tmp/fl_parity")
    ap.add_argument("--platform", type=str, default="cpu",
                    help="JAX platform for the evo_tpu side (cpu is robust; "
                         "the problem is tiny)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)

    Y, ph, pw = load_patches()
    W0, sig0 = shared_init(Y)
    print(f"barbara patches: N={Y.shape[0]} D={Y.shape[1]} ({ph}x{pw}), "
          f"H={H} S={S}, {args.epochs} epochs", file=sys.stderr)

    F_e, params_e, s_e = run_evo(Y, W0, sig0, args.epochs)
    F_r, theta_r, s_r = run_reference(Y, W0, sig0, args.epochs)

    import json
    np.savez(os.path.join(args.out, "learned_W.npz"),
             W_ref=theta_r["W"], W_evo=np.asarray(params_e.W))
    res = {
        "F_ref": F_r, "F_evo": F_e,
        "sigma_ref": float(theta_r["sigma"]), "sigma_evo": float(params_e.sigma),
        "pi_ref": float(theta_r["pi"]), "pi_evo": float(params_e.pi),
        "s_per_epoch_ref": s_r, "s_per_epoch_evo": s_e,
        "epochs": args.epochs,
    }
    print(json.dumps(res, indent=1))

    try:  # visuals are best-effort; the JSON above is the record
        save_gf_grid(theta_r["W"], ph, pw, os.path.join(args.out, "gf_ref.png"))
        save_gf_grid(params_e.W, ph, pw, os.path.join(args.out, "gf_evo.png"))
    except Exception as exc:  # pragma: no cover
        print(f"grid save failed: {exc}", file=sys.stderr)


if __name__ == "__main__":
    main()
