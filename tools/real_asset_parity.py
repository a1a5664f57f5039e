"""Head-to-head parity on the reference's OWN image assets at the
reference's OWN default configs (VERDICT r2 item 3):

  denoise: house.png x0.4, AWGN sigma=25, 5x5 patches stride 1, ES3C
           H=32 S=20 fit/randflip parents=10 children=1 gens=1, 50 epochs
           (reference examples/image-denoising/params.py defaults)
  inpaint: castle.jpg x0.1 RGB, 10% pixels MCAR NaN, 5x5 patches, ES3C
           restricted to_learn=[W, pies, sigma2], reconstruction every
           epoch (reference examples/image-inpainting/params.py defaults)

Both sides consume IDENTICAL data (seeded noise/missingness, saved to the
setup npz) and IDENTICAL Theta^0 (reference-style standard_init computed
once in f64).  The reference side runs the actual reference code via the
mpi4py stub; the evo_tpu side runs f32 on whatever device JAX finds.

Usage (from the repo root):
  python tools/real_asset_parity.py denoise --side ref   # slow, CPU
  python tools/real_asset_parity.py denoise --side evo
  python tools/real_asset_parity.py inpaint --side ref
  python tools/real_asset_parity.py inpaint --side evo
Each side writes <out>/<task>_<side>.json; run both, then compare.
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
HOUSE = os.path.join(REF, "examples/image-denoising/img/house.png")
CASTLE = os.path.join(REF, "examples/image-inpainting/img/castle.jpg")

H, S = 32, 20
N_PAR, N_CH, N_GEN = 10, 1, 1
PATCH = 5


def make_setup(task: str, out: str) -> str:
    """Build (or reuse) the shared data + init file; deterministic."""
    path = os.path.join(out, f"{task}_setup.npz")
    if os.path.exists(path):
        return path
    from evo_tpu.apps.images import get_image

    rng = np.random.default_rng(0)
    if task == "denoise":
        clean = get_image(HOUSE, rescale=0.4)  # [102, 102] f64
        corrupted = clean + rng.normal(scale=25.0, size=clean.shape)
        from evo_tpu.prepost import OverlappingPatches

        ovp = OverlappingPatches(corrupted, PATCH, PATCH, 1)
        to_learn = ("W", "pies", "mus", "sigma2", "Psi")
    else:
        clean = get_image(CASTLE, rescale=0.1)  # [48, 32, 3] f64
        corrupted = clean.copy()
        corrupted[rng.random(clean.shape) <= 0.10] = np.nan
        from evo_tpu.prepost import MultiDimOverlappingPatches

        ovp = MultiDimOverlappingPatches(corrupted, PATCH, PATCH, 1)
        to_learn = ("W", "pies", "sigma2")
    Y = ovp.get().T.astype(np.float64)  # [N, D], NaN where missing
    N, D = Y.shape

    # reference-style standard_init, f64, shared by both sides
    # (reference sssc.py:104-197)
    r1 = np.random.default_rng(1)
    pies0 = r1.uniform(0.1, 0.5, H)
    mus0 = r1.normal(0, 1, H) if "mus" in to_learn else np.ones(H)
    m = ~np.isnan(Y)
    yz = np.where(m, Y, 0.0)
    incomplete = not m.all()
    if incomplete:
        y_mean = (yz * m).sum(0) / N
        sig20 = float((((yz - y_mean) * m) ** 2).sum() / m.sum() + 0.001)
    else:
        y_mean = Y.mean(0)
        sig20 = float(np.mean(np.diag(np.cov(Y.T))) + 0.001)
    W0 = y_mean[:, None] + r1.normal(scale=np.sqrt(sig20) / 4, size=(D, H))

    np.savez(path, clean=clean, corrupted=corrupted, Y=Y,
             pies0=pies0, mus0=mus0, sig20=sig20, W0=W0,
             to_learn=np.asarray(to_learn))
    print(f"setup -> {path}  N={N} D={D} incomplete={incomplete}",
          file=sys.stderr)
    return path


def merge_and_psnr(task, setup, y_rec_rows):
    """Merge reconstructed patch rows back into the image; PSNR vs clean."""
    from evo_tpu.prepost import (
        MultiDimOverlappingPatches,
        OverlappingPatches,
        mean_merger,
        median_merger,
        psnr,
    )

    clean = setup["clean"]
    corrupted = setup["corrupted"]
    OVP = OverlappingPatches if clean.ndim == 2 else MultiDimOverlappingPatches
    ovp = OVP(corrupted, PATCH, PATCH, 1)
    out = {}
    for name, merger in (("mean", mean_merger), ("median", median_merger)):
        merged = ovp.set_and_merge(y_rec_rows.T, merger)
        out[f"psnr_{name}"] = float(psnr(clean, merged))
    return out


def run_ref(task, setup, epochs):
    from measure_reference_baseline import install_mpi_stub

    install_mpi_stub()
    sys.path.insert(0, REF)
    from evo.models import SSSC as RefSSSC

    from evo.variational.utils import init_states as ref_init

    Y = setup["Y"]
    N, D = Y.shape
    to_learn = [str(x) for x in setup["to_learn"]]
    incomplete = bool(np.isnan(Y).any())
    model = RefSSSC(D, H, S, to_learn=to_learn)
    theta = {
        "W": setup["W0"].copy(), "pies": setup["pies0"].copy(),
        "mus": setup["mus0"].copy(), "Psi": np.eye(H),
        "sigma2": np.float64(setup["sig20"]),
    }
    np.random.seed(0)
    suff = ref_init(N, S, H, "fit", "randflip", N_PAR, N_CH, N_GEN)
    x_infr = ~np.isnan(Y)
    data = {
        "y": np.where(x_infr, Y, 0.0) if incomplete else Y.copy(),
        "x_infr": x_infr,
        "x": x_infr.copy() if incomplete else np.zeros((N, D), bool),
    }
    if incomplete:
        # the reference consumes y with NaNs masked out via x_infr; it
        # indexes y[x_infr] so the fill value is irrelevant
        data["y"][~x_infr] = 0.0
    t0 = F = None
    t0 = time.time()
    for e in range(epochs):
        rec = incomplete or (e == epochs - 1)
        F, _, _, theta = model.step(theta, suff, data, do_reconstruction=rec)
        if e % 5 == 0 or e == epochs - 1:
            print(f"  ref epoch {e}: F={F:.3f} "
                  f"({(time.time()-t0)/(e+1):.1f} s/epoch)", file=sys.stderr)
    dt = (time.time() - t0) / epochs
    y_rec = data["y_reconstructed"]
    return float(F), y_rec, dt


def run_evo(task, setup, epochs):
    import jax
    import jax.numpy as jnp

    from evo_tpu.models.base import make_data
    from evo_tpu.models.sssc import SSSC, SSSCParams
    from evo_tpu.variational.state_init import init_states

    Y = setup["Y"]
    N, D = Y.shape
    to_learn = tuple(str(x) for x in setup["to_learn"])
    incomplete = bool(np.isnan(Y).any())
    model = SSSC(D=D, H=H, to_learn=to_learn)
    params = SSSCParams(
        W=jnp.asarray(setup["W0"], jnp.float32),
        pies=jnp.asarray(setup["pies0"], jnp.float32),
        mus=jnp.asarray(setup["mus0"], jnp.float32),
        Psi=jnp.eye(H, dtype=jnp.float32),
        sigma2=jnp.asarray(float(setup["sig20"]), jnp.float32),
    )
    x_infr = ~np.isnan(Y)
    pad_multiple = 1024 if jax.default_backend() == "tpu" else 1
    data = make_data(Y, x=x_infr.copy() if incomplete
                     else np.zeros((N, D), bool), pad_multiple=pad_multiple)
    N_padded = data.y.shape[0] * data.y.shape[1]
    cfg, estate = init_states(N=N_padded, S=S, H=H, no_parents=N_PAR,
                              no_children=N_CH, no_generations=N_GEN,
                              n_blocks=data.y.shape[0], seed=0)
    y_rec = None
    # timing rules (CLAUDE.md): absorb compile + the one-time post-compile
    # runtime cost outside the timed window, and never block per step —
    # the timed loop enqueues every epoch and ends on ONE value readback.
    # The warmup step's outputs are DISCARDED so the trained trajectory
    # stays exactly `epochs` steps (the head-to-head contract).
    _wp, _we, _ws, _ = model.em_step(
        params, estate, data, jax.random.key(3), cfg,
        do_reconstruction=incomplete)
    float(_ws.F)  # readback barrier: compile + warmup complete
    t0 = time.time()
    for e in range(epochs):
        rec = incomplete or (e == epochs - 1)
        params, estate, stats, yr = model.em_step(
            params, estate, data, jax.random.fold_in(jax.random.key(2), e),
            cfg, do_reconstruction=rec)
        if yr is not None:
            y_rec = yr
    F = float(stats.F)  # value readback = completion barrier
    y_rec = np.asarray(y_rec).reshape(-1, D)[:N].astype(np.float64)
    dt = (time.time() - t0) / epochs
    return F, y_rec, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("task", choices=["denoise", "inpaint"])
    ap.add_argument("--side", choices=["ref", "evo"], required=True)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--out", type=str, default="/tmp/real_parity")
    ap.add_argument("--platform", type=str, default=None,
                    help="force JAX platform for the evo side (e.g. cpu)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    if args.side == "ref" and not args.platform:
        args.platform = "cpu"  # never let the ref run grab the TPU tunnel
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)

    setup_path = make_setup(args.task, args.out)
    setup = dict(np.load(setup_path, allow_pickle=False))

    run = run_ref if args.side == "ref" else run_evo
    F, y_rec, s_per_epoch = run(args.task, setup, args.epochs)
    res = {"task": args.task, "side": args.side, "epochs": args.epochs,
           "F": F, "s_per_epoch": s_per_epoch}
    res.update(merge_and_psnr(args.task, setup, y_rec))
    from evo_tpu.prepost import psnr

    if args.task == "denoise":
        res["psnr_noisy"] = float(psnr(setup["clean"], setup["corrupted"]))
    path = os.path.join(args.out, f"{args.task}_{args.side}.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
