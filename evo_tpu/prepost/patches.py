"""Overlapping image-patch extraction and merging.

Replaces the external `tvutil.prepost` dependency of the reference drivers
(reference: examples/image-denoising/main.py:17-22 imports OverlappingPatches,
MultiDimOverlappingPatches, mean_merger, median_merger;
examples/feature-learning/get-patches.py:8 imports extract_random_patches).

API contract (from the reference call sites):
  ovp = OverlappingPatches(image, patch_height, patch_width, patch_shift=1)
  Y   = ovp.get().T                      # [N, D] patch matrix
  img = ovp.set_and_merge(Y_rec.T, merge_method=mean_merger)

Implementation: extraction via stride tricks; merging by laying each
in-patch offset back onto a NaN-padded canvas and reducing with
nanmean/nanmedian — fully vectorized, no per-patch Python loops.
"""

from __future__ import annotations

import numpy as np


def mean_merger(stack: np.ndarray) -> np.ndarray:
    """Average all patch values covering each pixel (NaN = not covered)."""
    return np.nanmean(stack, axis=0)


def median_merger(stack: np.ndarray) -> np.ndarray:
    """Median of all patch values covering each pixel."""
    return np.nanmedian(stack, axis=0)


class OverlappingPatches:
    """All overlapping patches of a 2D image on a regular stride grid."""

    def __init__(self, image: np.ndarray, patch_height: int, patch_width: int,
                 patch_shift: int = 1):
        assert image.ndim == 2, "use MultiDimOverlappingPatches for channels"
        self.image = np.asarray(image)
        self.ph, self.pw, self.shift = patch_height, patch_width, patch_shift
        Hh, Ww = self.image.shape
        self.ni = (Hh - patch_height) // patch_shift + 1
        self.nj = (Ww - patch_width) // patch_shift + 1

    @property
    def num_patches(self) -> int:
        return self.ni * self.nj

    def get(self) -> np.ndarray:
        """Patch matrix [D, N] with D = ph*pw (column-per-patch layout, as
        consumed by the reference drivers via .get().T)."""
        win = np.lib.stride_tricks.sliding_window_view(self.image, (self.ph, self.pw))
        win = win[:: self.shift, :: self.shift]  # [ni, nj, ph, pw]
        return win.reshape(self.num_patches, self.ph * self.pw).T.copy()

    def set_and_merge(self, patches: np.ndarray, merge_method=mean_merger) -> np.ndarray:
        """Reassemble an image from (modified) patches [D, N]."""
        ph, pw, shift = self.ph, self.pw, self.shift
        Hh, Ww = self.image.shape
        p = patches.T.reshape(self.ni, self.nj, ph, pw)
        stack = np.full((ph * pw, Hh, Ww), np.nan, dtype=float)
        for a in range(ph):
            for b in range(pw):
                canvas = stack[a * pw + b]
                canvas[a : a + self.ni * shift : shift, b : b + self.nj * shift : shift] = p[
                    :, :, a, b
                ]
        return merge_method(stack)


class MultiDimOverlappingPatches:
    """Channel-wise OverlappingPatches for [H, W, C] images; the patch vector
    concatenates the per-channel patches (D = ph*pw*C)."""

    def __init__(self, image: np.ndarray, patch_height: int, patch_width: int,
                 patch_shift: int = 1):
        assert image.ndim == 3
        self.C = image.shape[2]
        self.ovps = [
            OverlappingPatches(image[:, :, c], patch_height, patch_width, patch_shift)
            for c in range(self.C)
        ]

    @property
    def num_patches(self) -> int:
        return self.ovps[0].num_patches

    def get(self) -> np.ndarray:
        return np.concatenate([o.get() for o in self.ovps], axis=0)  # [D*C, N]

    def set_and_merge(self, patches: np.ndarray, merge_method=mean_merger) -> np.ndarray:
        D = patches.shape[0] // self.C
        chans = [
            self.ovps[c].set_and_merge(patches[c * D : (c + 1) * D], merge_method)
            for c in range(self.C)
        ]
        return np.stack(chans, axis=2)


def extract_random_patches(images: np.ndarray, patch_height: int,
                           patch_width: int, num_patches: int,
                           rng=None) -> np.ndarray:
    """num_patches random patches from a stack of images
    [n_img, H, W] or [n_img, H, W, C] -> [num_patches, ph*pw*(C)]
    (replaces tvutil.prepost.extract_random_patches used by the reference's
    feature-learning get-patches.py:8)."""
    rng = rng or np.random.default_rng(0)
    images = np.asarray(images)
    if images.ndim == 3:
        images = images[..., None]
    n_img, Hh, Ww, C = images.shape
    ii = rng.integers(0, n_img, num_patches)
    ys = rng.integers(0, Hh - patch_height + 1, num_patches)
    xs = rng.integers(0, Ww - patch_width + 1, num_patches)
    out = np.empty((num_patches, patch_height * patch_width * C), images.dtype)
    for k in range(num_patches):
        patch = images[ii[k], ys[k] : ys[k] + patch_height, xs[k] : xs[k] + patch_width]
        out[k] = patch.transpose(2, 0, 1).reshape(-1)
    return out
