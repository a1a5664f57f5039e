"""Per-epoch visualizers for the example apps (capability parity with the
reference examples' viz.py modules: generative-field grids, free-energy
trajectory with the exact-likelihood line, parameter trajectories,
reconstruction panels, optional training gif)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from evo_tpu.prepost.viz import make_grid  # noqa: E402


class BaseVisualizer:
    def __init__(self, viz_every: int, output_directory: str,
                 gif_framerate: Optional[str] = None):
        self.viz_every = viz_every
        self.outdir = output_directory
        self.gif_framerate = gif_framerate
        self.frames = []
        self.F_log = []

    def _maybe_save_frame(self, fig, epoch):
        path = os.path.join(self.outdir, f"training_{epoch:04d}.png")
        fig.savefig(path, dpi=110, bbox_inches="tight")
        self.frames.append(path)

    def finalize(self):
        """Assemble collected frames into training.gif (PIL, no ffmpeg)."""
        if not self.gif_framerate or not self.frames:
            return
        from PIL import Image

        num, den = (self.gif_framerate.split("/") + ["1"])[:2]
        fps = max(float(num) / float(den), 0.1)
        imgs = [Image.open(f).convert("P") for f in self.frames]
        imgs[0].save(
            os.path.join(self.outdir, "training.gif"),
            save_all=True, append_images=imgs[1:],
            duration=int(1000 / fps), loop=0,
        )
        print(f"Wrote {self.outdir}/training.gif")


def _gf_grid(ax, W, patch_shape, title):
    H = W.shape[1]
    gfs = W.T.reshape((H,) + patch_shape)
    if gfs.ndim == 4 and gfs.shape[-1] not in (1, 3):  # [H, C, h, w] -> gray ch0
        gfs = gfs[:, 0]
    grid = make_grid(gfs, ncol=int(np.ceil(np.sqrt(H))), pad=1, pad_value=0.0)
    ax.imshow(grid, cmap="gray", interpolation="nearest")
    ax.set_title(title)
    ax.axis("off")


class BarsVisualizer(BaseVisualizer):
    """Learned vs. generative bars + free-energy trajectory
    (reference examples/bars-test/viz.py BSCVisualizer/SSSCVisualizer)."""

    def __init__(self, viz_every, output_directory, theta_gen_W=None,
                 L_gen=None, gif_framerate=None, patch_shape=None):
        super().__init__(viz_every, output_directory, gif_framerate)
        self.W_gen = theta_gen_W
        self.L_gen = L_gen
        self.patch_shape = patch_shape

    def process_epoch(self, epoch, F, params, **_):
        self.F_log.append(F)
        if epoch % self.viz_every:
            return
        W = np.asarray(params.W)
        D = W.shape[0]
        shp = self.patch_shape or (int(np.sqrt(D)), int(np.sqrt(D)))
        ncols = 3 if self.W_gen is not None else 2
        fig, axes = plt.subplots(1, ncols, figsize=(4 * ncols, 4))
        _gf_grid(axes[0], W, shp, f"W (epoch {epoch})")
        if self.W_gen is not None:
            _gf_grid(axes[1], self.W_gen, shp, "W_gen")
        ax = axes[-1]
        ax.plot(np.arange(1, len(self.F_log) + 1), self.F_log, label="F")
        if self.L_gen is not None:
            ax.axhline(self.L_gen, color="r", ls="--", label="L(theta_gen)")
        ax.set_xlabel("epoch")
        ax.legend()
        self._maybe_save_frame(fig, epoch)
        plt.close(fig)


class GFVisualizer(BaseVisualizer):
    """Generative-field grids + lower bound (reference feature-learning
    main.py viz block)."""

    def __init__(self, viz_every, output_directory, patch_shape,
                 sort_gfs=False, gif_framerate=None):
        super().__init__(viz_every, output_directory, gif_framerate)
        self.patch_shape = patch_shape
        self.sort_gfs = sort_gfs

    def process_epoch(self, epoch, F, params, **_):
        self.F_log.append(F)
        if epoch % self.viz_every:
            return
        W = np.asarray(params.W)
        if self.sort_gfs and hasattr(params, "pies"):
            order = np.argsort(np.asarray(params.pies))[::-1]
            W = W[:, order]
        fig, axes = plt.subplots(1, 2, figsize=(9, 4.5))
        _gf_grid(axes[0], W, self.patch_shape,
                 f"generative fields (epoch {epoch})")
        axes[1].plot(np.arange(1, len(self.F_log) + 1), self.F_log)
        axes[1].set_xlabel("epoch")
        axes[1].set_ylabel("F")
        self._maybe_save_frame(fig, epoch)
        plt.close(fig)


class ReconstructionVisualizer(BaseVisualizer):
    """clean / corrupted / reconstruction panel + GF grid + PSNR
    (reference image-denoising/viz.py, image-inpainting/viz.py)."""

    def __init__(self, viz_every, output_directory, clean_image,
                 corrupted_image, patch_shape, gif_framerate=None):
        super().__init__(viz_every, output_directory, gif_framerate)
        self.clean = clean_image
        self.corrupted = corrupted_image
        self.patch_shape = patch_shape

    def process_epoch(self, epoch, F, params, rec=None, psnr_val=None, **_):
        self.F_log.append(F)
        if epoch % self.viz_every:
            return
        fig, axes = plt.subplots(1, 5, figsize=(19, 4))
        for ax, (img, title) in zip(
            axes[:3],
            [(self.clean, "clean"), (self.corrupted, "corrupted"),
             (rec, "reconstruction" + (f" (psnr {psnr_val:.2f})" if psnr_val else ""))],
        ):
            if img is not None:
                ax.imshow(np.squeeze(img), cmap="gray", vmin=0, vmax=255)
            ax.set_title(title)
            ax.axis("off")
        _gf_grid(axes[3], np.asarray(params.W), self.patch_shape,
                 f"W (epoch {epoch})")
        axes[4].plot(np.arange(1, len(self.F_log) + 1), self.F_log)
        axes[4].set_xlabel("epoch")
        axes[4].set_ylabel("F")
        self._maybe_save_frame(fig, epoch)
        plt.close(fig)
