"""Integration tests for the example application drivers (the reference's
oracle-style experiments as real tests, SURVEY §4)."""

import argparse
import os

import numpy as np
import pytest


def _ns(**kw):
    return argparse.Namespace(**kw)


def _common(**over):
    base = dict(
        output_directory=None, Ksize=10, parent_selection="fit",
        mutation_algorithm="randflip", no_parents=5, no_children=1,
        no_generations=1, bitflip_prob=None, no_epochs=4, seed=0, n_blocks=1,
        checkpoint_every=0, resume=None, viz_every=100, gif_framerate=None,
    )
    base.update(over)
    return base


def test_bars_app_ebsc(tmp_path):
    from evo_tpu.apps import bars

    args = _ns(algo="ebsc", H=6, bar_amp=8.0, neg_bars=False,
               no_data_points=150, pi_gen=None, sigma_gen=1.0,
               **_common(output_directory=str(tmp_path / "out")))
    out = bars.run(args)
    assert np.isfinite(out["F"])
    assert out["L_gen"] is not None
    assert os.path.exists(os.path.join(out["outdir"], "training.h5"))


@pytest.mark.slow
def test_bars_app_es3c(tmp_path):
    from evo_tpu.apps import bars

    args = _ns(algo="es3c", H=6, bar_amp=8.0, neg_bars=False,
               no_data_points=120, pi_gen=None, sigma_gen=1.0, mu_gen=1.0,
               psi_gen=0.5, **_common(output_directory=str(tmp_path / "out")))
    out = bars.run(args)
    assert np.isfinite(out["F"])


@pytest.mark.slow
def test_denoising_app_improves_psnr(tmp_path):
    from evo_tpu.apps.images import run_denoising, synthetic_image
    from evo_tpu.prepost import psnr

    args = _ns(algo="ebsc", clean_image=str(tmp_path / "nonexistent.png"),
               rescale=0.25, noise_level=25.0, patch_height=5, patch_width=None,
               H=16, merge_every=4, save_theta_all_epochs=False,
               **_common(no_epochs=8, Ksize=12, no_parents=6,
                         output_directory=str(tmp_path / "out")))
    out = run_denoising(args)
    clean = synthetic_image(int(256 * 0.25))
    rng = np.random.default_rng(0)
    noisy = clean + rng.normal(scale=25.0, size=clean.shape)
    psnr_noisy = psnr(clean, noisy, 255.0)
    assert out["psnr"] is not None
    # denoised must beat the noisy input
    assert out["psnr"] > psnr_noisy + 1.0, (out["psnr"], psnr_noisy)


@pytest.mark.slow
def test_inpainting_app_fills_missing(tmp_path):
    from evo_tpu.apps.images import run_inpainting

    args = _ns(algo="es3c", clean_image=str(tmp_path / "nonexistent.png"),
               rescale=0.25, percentage_missing=0.15, patch_height=5,
               patch_width=None, H=16, merge_every=2,
               save_theta_all_epochs=False,
               **_common(no_epochs=4, Ksize=12, no_parents=6,
                         output_directory=str(tmp_path / "out")))
    out = run_inpainting(args)
    assert out["psnr"] is not None and np.isfinite(out["psnr"])
    assert np.isfinite(out["rec"]).all()


@pytest.mark.slow
def test_inpainting_rgb_per_channel_missing(tmp_path):
    """RGB inpainting with per-CHANNEL missingness — the reference draws
    MCAR over the full [H, W, C] shape (image-inpainting/main.py:83), so a
    pixel can be missing in one channel and observed in the others.  Drives
    the MultiDim patch pipeline end-to-end and checks that observed channel
    values survive the reconstruct+merge unchanged while missing ones are
    filled."""
    from PIL import Image

    from evo_tpu.apps.images import run_inpainting, synthetic_image

    g = synthetic_image(36)
    rgb = np.stack([g, np.roll(g, 5, axis=0), np.roll(g, 9, axis=1)],
                   axis=2).astype(np.uint8)
    path = str(tmp_path / "rgb.png")
    Image.fromarray(rgb).save(path)
    args = _ns(algo="es3c", clean_image=path, rescale=1.0,
               percentage_missing=0.15, patch_height=4, patch_width=None,
               H=12, merge_every=2, save_theta_all_epochs=False,
               **_common(no_epochs=4, Ksize=10, no_parents=5,
                         output_directory=str(tmp_path / "out")))
    out = run_inpainting(args)
    assert out["psnr"] is not None and np.isfinite(out["psnr"])
    rec = out["rec"]
    assert rec.shape == rgb.shape and np.isfinite(rec).all()
    # re-derive the seeded corruption (the app's documented contract)
    clean = np.asarray(Image.open(path), dtype=float)
    miss = np.random.default_rng(args.seed).random(clean.shape) < 0.15
    # the mask must actually contain partially-missing pixels
    per_pixel = miss.sum(axis=2)
    assert ((per_pixel > 0) & (per_pixel < 3)).any()
    # observed entries pass through the reconstruct+merge pipeline intact
    # (mean/median of identical kept values), missing ones get filled
    assert np.allclose(rec[~miss], clean[~miss], atol=1e-3)


def test_feature_learning_app(tmp_path):
    from evo_tpu.apps import feature_learning

    args = _ns(data_file=str(tmp_path / "patches.npz"), model="bsc", H=16,
               sort_gfs=True,
               **_common(no_epochs=3, Ksize=10, no_parents=5,
                         output_directory=str(tmp_path / "out")))
    feature_learning.synthetic_patchfile(str(tmp_path / "patches.npz"),
                                         N=300, ph=6, pw=6)
    out = feature_learning.run(args)
    assert np.isfinite(out["F"])


def _bars_args(**over):
    """Canonical bars-app arg set shared by the checkpoint/resume tests."""
    base = dict(algo="ebsc", H=6, bar_amp=8.0, neg_bars=False,
                no_data_points=100, pi_gen=None, sigma_gen=1.0)
    base.update(over)
    return base


@pytest.mark.slow
def test_bars_app_checkpoint_resume(tmp_path):
    from evo_tpu.apps import bars

    common = _bars_args()
    out1 = bars.run(_ns(**common, **_common(
        no_epochs=4, checkpoint_every=2,
        output_directory=str(tmp_path / "a"))))
    ckpt = os.path.join(out1["outdir"], "checkpoint.npz")
    assert os.path.exists(ckpt)
    out2 = bars.run(_ns(**common, **_common(
        no_epochs=6, resume=ckpt, output_directory=str(tmp_path / "b"))))
    # uninterrupted 6-epoch run must match resumed run exactly
    out3 = bars.run(_ns(**common, **_common(
        no_epochs=6, output_directory=str(tmp_path / "c"))))
    np.testing.assert_allclose(out2["F"], out3["F"], rtol=1e-6)


@pytest.mark.slow
def test_theta_assign_vs_append_modes(tmp_path):
    """--save_theta_all_epochs toggles append vs assign (overwrite) for the
    Theta tables (reference image-denoising/main.py:55-61): without it the
    H5 holds exactly ONE W row regardless of epoch count; metrics always
    append."""
    import h5py

    from evo_tpu.apps.images import run_denoising

    def run(save_all, out):
        args = _ns(algo="ebsc", clean_image=str(tmp_path / "none.png"),
                   rescale=0.12, noise_level=25.0, patch_height=4,
                   patch_width=None, H=8, merge_every=100,
                   save_theta_all_epochs=save_all,
                   **_common(no_epochs=3, Ksize=8, no_parents=4,
                             output_directory=str(tmp_path / out)))
        return run_denoising(args)

    out_a = run(False, "assign")
    with h5py.File(os.path.join(out_a["outdir"], "training.h5")) as h5:
        assert h5["F"].shape[0] == 3          # metrics always append
        assert h5["W"].shape[0] == 1          # Theta overwritten
        assert h5["sigma"].shape[0] == 1
        assert h5["W_init"].shape[0] == 1     # init snapshot unaffected

    out_b = run(True, "append")
    with h5py.File(os.path.join(out_b["outdir"], "training.h5")) as h5:
        assert h5["F"].shape[0] == 3
        assert h5["W"].shape[0] == 3          # Theta per epoch


def test_tracefile_flag_produces_trace(tmp_path):
    """--tracefile makes the trainer emit phase tracepoints and archive them
    (reference tracing usage: @traced on model methods, _models.py:101-596)."""
    import tarfile

    from evo_tpu.apps import bars

    args = _ns(algo="ebsc", H=6, bar_amp=8.0, neg_bars=False,
               no_data_points=100, pi_gen=None, sigma_gen=1.0,
               **_common(no_epochs=2,
                         output_directory=str(tmp_path / "out")))
    args.tracefile = "trace-%04d.txt"
    out = bars.run(args)
    archive = os.path.join(out["outdir"], "traces.tgz")
    assert os.path.exists(archive)
    with tarfile.open(archive) as tar:
        content = tar.extractfile(tar.getmembers()[0]).read().decode()
    assert content.count("em_step:begin") == 2
    assert content.count("em_step:end") == 2
    assert "log:begin" in content


def test_device_trace_every_flag(tmp_path):
    """--device_trace_every captures a jax.profiler trace directory."""
    from evo_tpu.apps import bars

    args = _ns(algo="ebsc", H=6, bar_amp=8.0, neg_bars=False,
               no_data_points=100, pi_gen=None, sigma_gen=1.0,
               **_common(no_epochs=2,
                         output_directory=str(tmp_path / "out")))
    args.device_trace_every = 2
    out = bars.run(args)
    trace_dir = os.path.join(out["outdir"], "device_trace")
    assert os.path.isdir(trace_dir)
    assert any(os.scandir(trace_dir))  # something was written


def test_trainer_resume_at_final_epoch_returns_stats(tmp_path):
    """Regression: resuming a checkpoint written at the final epoch made
    EMTrainer.run return stats=None (zero loop iterations), crashing every
    app driver on float(stats.F)."""
    from evo_tpu.apps import bars

    common = _bars_args()
    out1 = bars.run(_ns(**common, **_common(
        no_epochs=4, checkpoint_every=4,
        output_directory=str(tmp_path / "a"))))
    ckpt = os.path.join(out1["outdir"], "checkpoint.npz")
    assert os.path.exists(ckpt)
    out2 = bars.run(_ns(**common, **_common(
        no_epochs=4, resume=ckpt,
        output_directory=str(tmp_path / "b"))))
    # the synthesized F recomputes the truncated free energy from the
    # checkpointed lpj under the FINAL params (the during-training log line
    # used the pre-M-step params, the reference's free_energy(full=False)
    # semantics), so allow a small offset — the contract is: no crash,
    # finite, and consistent with the run it resumed
    assert np.isfinite(out2["F"])
    assert abs(out2["F"] - out1["F"]) < 1.5, (out2["F"], out1["F"])


@pytest.mark.slow
def test_feature_learning_app_sssc(tmp_path):
    """The feature-learning driver's SSSC branch (reference
    feature-learning/main.py supports both models via --model)."""
    from evo_tpu.apps import feature_learning

    args = _ns(data_file=str(tmp_path / "patches.npz"), model="sssc", H=10,
               sort_gfs=False,
               **_common(no_epochs=3, Ksize=8, no_parents=4,
                         output_directory=str(tmp_path / "out")))
    feature_learning.synthetic_patchfile(str(tmp_path / "patches.npz"),
                                         N=200, ph=5, pw=5)
    out = feature_learning.run(args)
    assert np.isfinite(out["F"])


@pytest.mark.slow
def test_chunk_epochs_matches_per_epoch_run(tmp_path):
    """--chunk_epochs fuses host-invisible epochs through em_steps: the
    final F/params must EQUAL the per-epoch run (bit-identical schedule),
    metrics must still be logged once per epoch, and checkpoint boundaries
    must end chunks (so the checkpoint content matches too)."""
    import h5py
    from evo_tpu.apps import bars

    common = _bars_args()
    out_ref = bars.run(_ns(**common, **_common(
        no_epochs=6, checkpoint_every=4,
        output_directory=str(tmp_path / "per_epoch"))))
    out_chk = bars.run(_ns(**common, **_common(
        no_epochs=6, checkpoint_every=4, chunk_epochs=4,
        output_directory=str(tmp_path / "chunked"))))
    np.testing.assert_array_equal(out_chk["F"], out_ref["F"])
    for name in ("W", "sigma", "pi"):
        np.testing.assert_array_equal(
            np.asarray(out_chk["params"].__getattribute__(name)),
            np.asarray(out_ref["params"].__getattribute__(name)))
    with h5py.File(os.path.join(out_chk["outdir"], "training.h5"), "r") as f:
        F_chk = np.asarray(f["F"])
        W_rows = np.asarray(f["W"]).shape[0]
    with h5py.File(os.path.join(out_ref["outdir"], "training.h5"), "r") as f:
        F_ref = np.asarray(f["F"])
    # one F row per epoch either way, identical values
    np.testing.assert_array_equal(F_chk, F_ref)
    # chunked mode keeps Theta in overwrite mode: exactly one W row
    assert W_rows == 1
    # both wrote the epoch-4 checkpoint; contents must agree
    ck_ref = np.load(os.path.join(out_ref["outdir"], "checkpoint.npz"))
    ck_chk = np.load(os.path.join(out_chk["outdir"], "checkpoint.npz"))
    assert int(ck_ref["epoch"]) == int(ck_chk["epoch"]) == 4
    np.testing.assert_array_equal(ck_ref["params/W"], ck_chk["params/W"])


@pytest.mark.slow
def test_chunk_epochs_with_reconstruction_boundaries(tmp_path):
    """Chunking must step reconstruction epochs solo (the host consumes
    y_rec for patch merging) and still produce the identical trajectory and
    PSNR as the per-epoch run."""
    from evo_tpu.apps.images import run_denoising

    common = dict(algo="ebsc", clean_image=str(tmp_path / "nonexistent.png"),
                  rescale=0.25, noise_level=25.0, patch_height=5,
                  patch_width=None, H=16, merge_every=4,
                  save_theta_all_epochs=False)
    out_ref = run_denoising(_ns(**common, **_common(
        no_epochs=8, Ksize=12, no_parents=6,
        output_directory=str(tmp_path / "a"))))
    out_chk = run_denoising(_ns(**common, **_common(
        no_epochs=8, Ksize=12, no_parents=6, chunk_epochs=3,
        output_directory=str(tmp_path / "b"))))
    np.testing.assert_array_equal(out_chk["F"], out_ref["F"])
    np.testing.assert_array_equal(out_chk["psnr"], out_ref["psnr"])


def test_bucket_overflow_warning_streak():
    """At 64 < H <= 128 on the kernel path, >=3 consecutive epochs with
    nonzero n_reset_nan must raise the one-shot RuntimeWarning pointing at
    the exact XLA path (MIGRATION.md item 7 semantic caveat)."""
    import warnings

    from evo_tpu.apps.training import EMTrainer
    from evo_tpu.models.sssc import SSSC

    tr = EMTrainer.__new__(EMTrainer)
    tr._overflow_nan_streak, tr._overflow_warned = 0, False
    tr.model = SSSC(D=16, H=100, lpj_kernel="pallas")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        tr._warn_bucket_overflow(3)
        tr._warn_bucket_overflow(0)   # streak resets
        tr._warn_bucket_overflow(5)
        tr._warn_bucket_overflow(5)
    with pytest.warns(RuntimeWarning, match="bucketed"):
        tr._warn_bucket_overflow(5)   # third consecutive -> warn
    assert tr._overflow_warned
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        tr._warn_bucket_overflow(5)   # one-shot: never again

    # exact-XLA path and H <= 64 never warn
    for model in (SSSC(D=16, H=100, lpj_kernel="xla"),
                  SSSC(D=16, H=32, lpj_kernel="pallas")):
        tr2 = EMTrainer.__new__(EMTrainer)
        tr2._overflow_nan_streak, tr2._overflow_warned = 0, False
        tr2.model = model
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            for _ in range(5):
                tr2._warn_bucket_overflow(7)


def test_inpainting_compact_readback_bit_exact(tmp_path):
    """The compact missing-values-only reconstruction readback must produce
    the identical PSNR trajectory and final image as the full [N, D]
    gather (the observed entries are the host's own data; the missing ones
    are the same device floats either way)."""
    from evo_tpu.apps.images import run_inpainting

    common = dict(algo="es3c", rescale=0.25, percentage_missing=0.15,
                  patch_height=5, patch_width=None, H=16, merge_every=2,
                  save_theta_all_epochs=False)
    out_full = run_inpainting(_ns(
        clean_image=str(tmp_path / "nonexistent.png"), compact_readback=False,
        **common, **_common(no_epochs=4, Ksize=12, no_parents=6,
                            output_directory=str(tmp_path / "full"))))
    out_cmp = run_inpainting(_ns(
        clean_image=str(tmp_path / "nonexistent.png"), compact_readback=True,
        **common, **_common(no_epochs=4, Ksize=12, no_parents=6,
                            output_directory=str(tmp_path / "cmp"))))
    np.testing.assert_array_equal(out_cmp["F"], out_full["F"])
    np.testing.assert_array_equal(np.asarray(out_cmp["psnr"]),
                                  np.asarray(out_full["psnr"]))
    np.testing.assert_array_equal(out_cmp["rec"], out_full["rec"])
