"""Feature learning on image patches (capability parity with reference
examples/feature-learning/main.py: .npz patch file with keys
data/patch_height/patch_width/no_channels, BSC or SSSC, per-epoch GF grids
and lower-bound plot)."""

from __future__ import annotations

import os

import numpy as np

from evo_tpu.apps.common import (apply_platform_env, chunking_kwargs,
                                 params_to_dict,
                                 setup_experiment, warm_d2h_async)
from evo_tpu.apps.training import EMTrainer
from evo_tpu.apps.viz import GFVisualizer
from evo_tpu.models import make_data
from evo_tpu.models.bsc import BSC
from evo_tpu.models.sssc import SSSC
from evo_tpu.variational.state_init import init_states


def load_patches(data_file: str):
    with np.load(data_file) as d:
        for key in ["data", "patch_height", "patch_width", "no_channels"]:
            assert key in d, f"{data_file}: could not find {key} key"
        assert np.ndim(d["data"]) == 2, "expected 2-dim data (N, D)"
        return (np.asarray(d["data"], dtype=np.float32),
                int(d["patch_height"]), int(d["patch_width"]),
                int(d["no_channels"]))


def synthetic_patchfile(path: str, N: int = 2000, ph: int = 8, pw: int = 8,
                        seed: int = 0):
    """Whitened-ish synthetic patches for asset-free demos/tests."""
    from evo_tpu.apps.images import synthetic_image
    from evo_tpu.prepost import extract_random_patches

    rng = np.random.default_rng(seed)
    img = synthetic_image(128) + rng.normal(scale=8.0, size=(128, 128))
    P = extract_random_patches(img[None], ph, pw, N, rng=rng)
    P = P - P.mean(axis=1, keepdims=True)
    np.savez(path, data=P.astype(np.float32), patch_height=ph, patch_width=pw,
             no_channels=1)
    return path


def run(args) -> dict:
    apply_platform_env()
    warm_d2h_async()
    if not os.path.exists(args.data_file):
        print(f"NOTE: {args.data_file} not found; generating synthetic patches")
        os.makedirs(os.path.dirname(args.data_file) or ".", exist_ok=True)
        synthetic_patchfile(args.data_file)
    Y, ph, pw, no_channels = load_patches(args.data_file)
    dlog, outdir = setup_experiment(args, "feature-learning")
    N, D = Y.shape
    assert D == ph * pw * no_channels
    print(f"{N} patches of dimension {D}")

    model = {"bsc": BSC, "sssc": SSSC}[args.model](D=D, H=args.H)
    # on TPU, pad the batch to a lane-tileable multiple so the fused Pallas
    # kernels apply (row_valid masks the padding out of every statistic) —
    # same policy as the image apps; without it the reference-default
    # N=2000 patch set ran the einsum path even where kernels existed
    import jax as _jax

    pad_multiple = 1024 if _jax.default_backend() == "tpu" else 1
    data = make_data(Y, n_blocks=args.n_blocks, pad_multiple=pad_multiple)
    params = model.standard_init(data, seed=args.seed, y_host=Y)
    dlog.append_all({f"{k}_init": v for k, v in params_to_dict(params).items()})

    N_padded = data.y.shape[0] * data.y.shape[1]  # includes padding rows
    cfg, estate = init_states(
        N=N_padded, S=args.Ksize, H=args.H,
        parent_selection=args.parent_selection,
        mutation_algorithm=args.mutation_algorithm,
        no_parents=args.no_parents, no_children=args.no_children,
        no_generations=args.no_generations, bitflip_prob=args.bitflip_prob,
        n_blocks=args.n_blocks, seed=args.seed,
    )

    patch_shape = ((no_channels, ph, pw) if no_channels > 1 else (ph, pw))
    visualizer = GFVisualizer(
        viz_every=getattr(args, "viz_every", 1) or 1,
        output_directory=outdir, patch_shape=patch_shape,
        sort_gfs=args.sort_gfs,
    )

    trainer = EMTrainer(model, cfg, params, estate, data, dlog, outdir,
                        seed=args.seed + 1,
                        checkpoint_every=args.checkpoint_every,
                        resume=args.resume,
                        tracefile=getattr(args, "tracefile", None),
                        device_trace_every=getattr(args, "device_trace_every", 0),
                        **chunking_kwargs(args))
    params, estate, stats = trainer.run(
        args.no_epochs,
        epoch_callback=lambda epoch, F, params, **kw: visualizer.process_epoch(
            epoch=epoch, F=F, params=params
        ),
    )
    dlog.close()
    visualizer.finalize()
    print("Finished")
    return {"F": float(stats.F), "params": params, "outdir": outdir}
