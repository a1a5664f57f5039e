"""DeviceMerger (on-device set_and_merge + PSNR) vs the host NumPy path.

The host OverlappingPatches.set_and_merge + prepost.metrics.psnr pipeline is
the parity oracle (itself reference-parity-tested); the device merger must
reproduce it to f32 tolerance for both mergers, grayscale and RGB, odd and
even per-pixel coverage counts, and with blocked/padded reconstructions."""

import numpy as np
import pytest

import jax.numpy as jnp

from evo_tpu.prepost import (MultiDimOverlappingPatches, OverlappingPatches,
                             mean_merger, median_merger, psnr)
from evo_tpu.prepost.device_merge import DeviceMerger


def _block_pad(flat, nb, pad):
    """[N, D] -> [nb, (N+pad)/nb, D] with garbage padding rows at the tail
    (the device merger must drop them)."""
    N, D = flat.shape
    padded = np.concatenate(
        [flat, np.full((pad, D), 123.456, flat.dtype)], axis=0)
    return jnp.asarray(padded.reshape(nb, -1, D))


def _check(ovp, clean, rng, nb, pad):
    N = ovp.num_patches
    D = ovp.get().shape[0]
    y = rng.standard_normal((N, D)).astype(np.float32) * 40.0
    dc = rng.standard_normal((N, 1)).astype(np.float32) * 100.0

    Y_rec = y.astype(np.float64) + dc
    want_mean = ovp.set_and_merge(Y_rec.T, merge_method=mean_merger)
    want_median = ovp.set_and_merge(Y_rec.T, merge_method=median_merger)
    want_pm = psnr(clean, want_mean, data_range=255.0)
    want_pmed = psnr(clean, want_median, data_range=255.0)

    dm = DeviceMerger(ovp, clean, data_range=255.0)
    out = dm(_block_pad(y, nb, pad), jnp.asarray(dc))

    np.testing.assert_allclose(np.asarray(out["mean"]), want_mean,
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["median"]), want_median,
                               rtol=1e-5, atol=1e-3)
    assert abs(float(out["psnr_mean"]) - want_pm) < 1e-3
    assert abs(float(out["psnr_median"]) - want_pmed) < 1e-3


@pytest.mark.parametrize("ph,pw", [(5, 5), (2, 3)])  # odd + even coverage
def test_grayscale_matches_host(ph, pw):
    rng = np.random.default_rng(0)
    clean = rng.uniform(0, 255, (17, 13))
    ovp = OverlappingPatches(clean, ph, pw, 1)
    _check(ovp, clean, rng, nb=1, pad=0)


def test_rgb_blocked_padded_matches_host():
    rng = np.random.default_rng(1)
    clean = rng.uniform(0, 255, (14, 11, 3))
    ovp = MultiDimOverlappingPatches(clean, 3, 4, 1)
    N = ovp.num_patches
    nb = 2
    pad = (nb - N % nb) % nb + nb  # pad N to a multiple of nb, plus one
    # full extra row-group so padding rows exist even when N % nb == 0
    _check(ovp, clean, rng, nb=nb, pad=pad)


def test_stride_gt_1_rejected():
    clean = np.zeros((16, 16))
    ovp = OverlappingPatches(clean, 4, 4, 2)
    with pytest.raises(AssertionError):
        DeviceMerger(ovp, clean)
