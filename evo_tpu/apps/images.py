"""Image IO + patch-based denoising/inpainting drivers (capability parity
with reference examples/image-denoising/main.py and
examples/image-inpainting/main.py)."""

from __future__ import annotations

import os

import numpy as np

from evo_tpu.apps.common import (apply_platform_env, chunking_kwargs,
                                 params_to_dict,
                                 setup_experiment, warm_d2h_async)
from evo_tpu.apps.training import EMTrainer, gather_reconstruction
from evo_tpu.apps.viz import ReconstructionVisualizer
from evo_tpu.models import make_data
from evo_tpu.models.bsc import BSC
from evo_tpu.models.sssc import SSSC
from evo_tpu.utils import tracing
from evo_tpu.prepost import (
    MultiDimOverlappingPatches,
    OverlappingPatches,
    mean_merger,
    median_merger,
    psnr,
)
from evo_tpu.variational.state_init import init_states


def get_image(image_file: str, rescale: float = 1.0) -> np.ndarray:
    """Read an image (PIL), optionally rescale (reference
    image-denoising/utils.py:46-85).  If the file does not exist, a
    deterministic synthetic 'house-like' test image is generated so the
    examples are runnable without shipping binary assets."""
    if os.path.exists(image_file):
        from PIL import Image

        img = Image.open(image_file)
        if rescale != 1.0:
            img = img.resize(
                (int(img.width * rescale), int(img.height * rescale)),
                Image.BICUBIC,
            )
        arr = np.asarray(img, dtype=float)
        if arr.ndim == 3 and arr.shape[2] == 4:
            arr = arr[:, :, :3]
        return arr
    print(f"NOTE: {image_file} not found; using a synthetic test image")
    return synthetic_image(int(256 * rescale))


def synthetic_image(size: int = 128) -> np.ndarray:
    """Deterministic piecewise-smooth grayscale test image in [0, 255]."""
    i, j = np.mgrid[0:size, 0:size].astype(float) / size
    img = 90 + 100 * np.cos(3.1 * i) * np.sin(2.3 * j)
    img[int(0.2 * size):int(0.55 * size), int(0.25 * size):int(0.6 * size)] = 210
    img[int(0.3 * size):int(0.45 * size), int(0.35 * size):int(0.5 * size)] = 40
    tri = (i + j < 0.5)
    img[tri] = 160 - 120 * (i + j)[tri]
    return np.clip(img, 0, 255)


def _make_model(algo, D, H, S, incomplete_es3c_subset=False):
    if algo == "ebsc":
        return BSC(D=D, H=H)
    to_learn = ("W", "pies", "sigma2") if incomplete_es3c_subset else (
        "W", "pies", "mus", "sigma2", "Psi")
    return SSSC(D=D, H=H, to_learn=to_learn)


def _run_patch_experiment(args, clean, corrupted, x_keep, name):
    """Common core: corrupted image -> overlapping patches -> EM training
    with periodic reconstruction -> patch merge -> PSNR."""
    dlog, outdir = setup_experiment(args, name)
    isrgb = clean.ndim == 3 and clean.shape[2] == 3
    patch_width = args.patch_width or args.patch_height
    OVP = MultiDimOverlappingPatches if isrgb else OverlappingPatches
    ovp = OVP(corrupted, args.patch_height, patch_width, patch_shift=1)
    Y = ovp.get().T  # [N, D]
    N, D = Y.shape
    # per-patch DC centering (on observed pixels): the raw 0..255 DC level
    # dominates the patch energy, which both hurts f32 conditioning and
    # wastes model capacity on the mean; fluctuations are what the sparse
    # code should model (the reference's own feature-learning pipeline
    # mean-subtracts patches the same way).  Reconstructions get the DC
    # added back before merging.  Disable with --no_dc_center.
    dc_center = getattr(args, "dc_center", True)
    if dc_center:
        with np.errstate(invalid="ignore"):
            dc = np.nanmean(Y, axis=1, keepdims=True)
        dc = np.where(np.isfinite(dc), dc, 0.0)
        Y = Y - dc
    else:
        dc = np.zeros((N, 1))
    no_channels = 3 if isrgb else 1
    assert D == args.patch_height * patch_width * no_channels
    print(f"{N} patches of dimension {D}")

    inpainting = np.isnan(corrupted).any()
    model = _make_model(args.algo, D, args.H, args.Ksize,
                        incomplete_es3c_subset=inpainting and args.algo == "es3c")

    # x: pixels NOT to reconstruct. Denoising re-estimates everything
    # (x = zeros; reference image-denoising/main.py:105-109); inpainting
    # keeps observed pixels (x = ~isnan; image-inpainting/main.py:107-111).
    x = np.zeros_like(Y, dtype=bool) if x_keep is None else x_keep
    # on TPU, pad the batch to a lane-tileable multiple so the fused
    # Pallas kernels apply (row_valid masks the padding out of every
    # statistic); on CPU keep the exact row count
    import jax as _jax

    pad_multiple = 1024 if _jax.default_backend() == "tpu" else 1
    data = make_data(Y, x=x, n_blocks=args.n_blocks,
                     pad_multiple=pad_multiple)
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

    viz_every = args.viz_every or args.no_epochs
    merge_every = getattr(args, "merge_every", None) or viz_every
    # inpainting reconstructs EVERY epoch: the M-step consumes the
    # reconstruction under missing data (reference image-inpainting
    # main.py:164-167; bsc.py:185-189)
    def reconstruct_at(e):
        # the final epoch always reconstructs so the returned/last-logged
        # PSNR and image reflect the final parameters even when no_epochs
        # is not a multiple of merge_every
        return (inpainting or e == 0 or (e + 1) % merge_every == 0
                or e + 1 == args.no_epochs)

    corrupted_viz = corrupted.copy()
    if inpainting:
        corrupted_viz = np.where(np.isnan(corrupted), 0.0, corrupted)
    visualizer = ReconstructionVisualizer(
        viz_every=viz_every, output_directory=outdir, clean_image=clean,
        corrupted_image=corrupted_viz,
        patch_shape=((no_channels, args.patch_height, patch_width) if isrgb
                     else (args.patch_height, patch_width)),
        gif_framerate=args.gif_framerate,
    )
    merge_strategies = {"mean": mean_merger, "median": median_merger}
    last = {}

    # Compact reconstruction readback (inpainting, single-process): the
    # model's y_rec equals the OBSERVED data verbatim at observed entries
    # (em_step: jnp.where(x, y, est)), so only the missing values need the
    # device->host transfer — ~10x less d2h traffic at the default 10%
    # missing (45 MB -> 4.5 MB per merge at full-res castle; the tunnel
    # moves ~30 MB/s, so this takes the per-epoch readback off the epoch's
    # critical path).  Bit-exact vs the full gather: the observed entries
    # come from the identical host Y, the missing ones are the identical
    # device floats.  Reference semantics unchanged
    # (image-inpainting/main.py:172-176 gathers the full matrix only
    # because MPI has no cheaper channel).
    # Device-side merge + PSNR (single-process, non-CPU backends): the
    # full-res host nanmean/nanmedian merge costs ~2 s/epoch — 5-10x the
    # device epoch — and inpainting merges EVERY epoch (reference
    # image-inpainting/params.py:145-149 defaults viz_every=1 and
    # merge_every=viz_every).  The device merge reduces the per-epoch
    # readback to two PSNR scalars + the merged images, and is
    # tolerance-tested against the host path (tests/test_device_merge.py).
    # --host_merge restores the NumPy f64 path (the parity oracle).
    device_merge = None
    if (_jax.process_count() == 1 and _jax.default_backend() != "cpu"
            and not getattr(args, "host_merge", False)):
        import jax.numpy as _jnp

        from evo_tpu.prepost.device_merge import DeviceMerger

        device_merge = DeviceMerger(ovp, clean, data_range=255.0)
        dc_dev = _jnp.asarray(dc, _jnp.float32)

    compact_reco = None
    if (inpainting and _jax.process_count() == 1 and device_merge is None
            and getattr(args, "compact_readback", True)):
        import jax.numpy as _jnp

        miss_nd = np.isnan(np.asarray(Y))  # [N, D] host missingness
        flat_idx = np.flatnonzero(miss_nd.ravel()).astype(np.int32)
        # observed entries exactly as the full gather would return them:
        # the device stores f32(Y), so round-trip through f32 before the
        # f64 dc re-add (bit-exact vs gather_reconstruction(y_rec) + dc)
        base = np.where(miss_nd, 0.0,
                        np.asarray(Y, np.float32).astype(np.float64) + dc)
        dc_missing = np.broadcast_to(dc, miss_nd.shape).ravel()[flat_idx]
        idx_dev = _jnp.asarray(flat_idx)

        @_jax.jit
        def _take_missing(y_rec):
            flat = y_rec.reshape(-1)[: N * D]  # drop padding rows
            return _jnp.take(flat, idx_dev)

        def compact_reco(y_rec):
            vals = np.asarray(_take_missing(y_rec), dtype=base.dtype)
            out = base.copy()
            out.ravel()[flat_idx] = vals + dc_missing
            return out

    def epoch_callback(epoch, F, params, y_rec=None, **_):
        do_merge = y_rec is not None and (epoch == 1 or epoch % merge_every == 0
                                          or epoch == args.no_epochs)
        rec_img, psnr_val = None, None
        if do_merge and device_merge is not None:
            tracing.tracepoint("device_merge:begin")
            out = device_merge(y_rec, dc_dev)
            # ONE batched d2h round trip for the two PSNR scalars + two
            # merged images (per-array np.asarray/float pays a ~35 ms
            # tunnel dispatch round-trip EACH; images stay f32, the device
            # dtype — halves the h5 append bytes, and 0..255 image values
            # lose nothing vs the host path's f64)
            out = _jax.device_get(out)
            tracing.tracepoint("device_merge:end")  # blocks on everything
            for mname in merge_strategies:
                p = float(out[f"psnr_{mname}"])
                img = np.asarray(out[mname])
                dlog.append(f"psnr_{mname}", p)
                dlog.append(f"reco_img_{mname}", img)
                print(f"\tpsnr_{mname} = {p:.3f}")
                if mname == "mean":
                    rec_img, psnr_val = img, p
            last.update(rec=rec_img, psnr=psnr_val)
        elif do_merge:
            Y_rec = (compact_reco(y_rec) if compact_reco is not None
                     else gather_reconstruction(y_rec, N) + dc)
            for mname, merger in merge_strategies.items():
                img = ovp.set_and_merge(Y_rec.T, merge_method=merger)
                p = psnr(clean, img, data_range=255.0)
                dlog.append(f"psnr_{mname}", p)
                dlog.append(f"reco_img_{mname}", img)
                print(f"\tpsnr_{mname} = {p:.3f}")
                if mname == "mean":
                    rec_img, psnr_val = img, p
            last.update(rec=rec_img, psnr=psnr_val)
        tracing.tracepoint("viz:begin")
        visualizer.process_epoch(epoch=epoch, F=F, params=params,
                                 rec=last.get("rec"), psnr_val=last.get("psnr"))
        tracing.tracepoint("viz:end")

    trainer = EMTrainer(model, cfg, params, estate, data, dlog, outdir,
                        seed=args.seed + 1,
                        checkpoint_every=args.checkpoint_every,
                        resume=args.resume,
                        tracefile=getattr(args, "tracefile", None),
                        device_trace_every=getattr(args, "device_trace_every", 0),
                        # reference image-denoising/main.py:55-61: Theta is
                        # overwritten (constant-size H5) unless
                        # --save_theta_all_epochs; an EXPLICIT
                        # --save_theta_all_epochs conflicts with chunking
                        # (EMTrainer rejects it loudly)
                        **chunking_kwargs(
                            args,
                            theta_append=getattr(
                                args, "save_theta_all_epochs", False),
                            auto_overwrite=False))
    params, estate, stats = trainer.run(args.no_epochs,
                                        reconstruct_at=reconstruct_at,
                                        epoch_callback=epoch_callback)
    dlog.close()
    visualizer.finalize()
    print("Finished")
    return {"F": float(stats.F), "psnr": last.get("psnr"), "rec": last.get("rec"),
            "params": params, "outdir": outdir}


def run_denoising(args) -> dict:
    """AWGN denoising (reference examples/image-denoising/main.py:78-95)."""
    apply_platform_env()
    warm_d2h_async()
    clean = get_image(args.clean_image, args.rescale)
    rng = np.random.default_rng(args.seed)
    noisy = clean + rng.normal(scale=args.noise_level, size=clean.shape)
    print(f"Added white Gaussian noise with sigma={args.noise_level}")
    return _run_patch_experiment(args, clean, noisy, x_keep=None,
                                 name="image-denoising")


def run_inpainting(args) -> dict:
    """MCAR inpainting: a fraction of VALUES set to NaN (reference
    examples/image-inpainting/main.py:78-111).  The draw runs over the full
    image shape — for RGB that is per channel-entry, so a pixel can be
    missing in one channel and observed in another, exactly like the
    reference's `np.random.random(clean.shape)` (main.py:83)."""
    apply_platform_env()
    warm_d2h_async()
    clean = get_image(args.clean_image, args.rescale)
    rng = np.random.default_rng(args.seed)
    corrupted = clean.astype(float).copy()
    # --percentage_missing is a fraction; the reference CLI's --percentage
    # is an integer percent (params.py:25) — honor both, fraction wins
    frac = getattr(args, "percentage_missing", None)
    if frac is None:
        frac = float(getattr(args, "percentage", 10)) / 100.0
    miss = rng.random(clean.shape) < frac
    corrupted[miss] = np.nan
    print(f"Set {100 * frac:.0f}% of values to missing")
    ph, pw = args.patch_height, args.patch_width or args.patch_height
    isrgb = clean.ndim == 3
    OVP = MultiDimOverlappingPatches if isrgb else OverlappingPatches
    x_keep = ~np.isnan(OVP(corrupted, ph, pw, 1).get().T)
    return _run_patch_experiment(args, clean, corrupted, x_keep=x_keep,
                                 name="image-inpainting")
