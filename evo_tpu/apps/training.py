"""Epoch-loop driver shared by the example apps.

The reference repeats this loop in every example main.py
(e.g. examples/bars-test/main.py:156-167); here it is one class that also
adds checkpoint/resume (a capability the reference lacks, SURVEY §5)."""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import numpy as np
import jax

from evo_tpu.apps.common import merge_dict, params_to_dict
from evo_tpu.utils.checkpoint import save_checkpoint, load_checkpoint


class EMTrainer:
    def __init__(self, model, cfg, params, estate, data, dlog, outdir: str,
                 seed: int = 0, checkpoint_every: int = 0,
                 resume: Optional[str] = None):
        self.model, self.cfg, self.data = model, cfg, data
        self.params, self.estate = params, estate
        self.dlog, self.outdir = dlog, outdir
        self.checkpoint_every = checkpoint_every
        self.start_epoch = 0
        self.key = jax.random.key(seed)
        if resume:
            self.params, self.estate, self.start_epoch, self.key = load_checkpoint(
                resume, params_like=self.params
            )
            print(f"Resumed from {resume} at epoch {self.start_epoch}")

    def run(self, no_epochs: int,
            reconstruct_at: Optional[Callable[[int], bool]] = None,
            epoch_callback: Optional[Callable] = None):
        stats = None
        for e in range(self.start_epoch, no_epochs):
            self.dlog.progress(f"Epoch {e + 1} of {no_epochs}")
            t0 = time.time()
            rec = bool(reconstruct_at(e)) if reconstruct_at else False
            key = jax.random.fold_in(self.key, e)
            self.params, self.estate, stats, y_rec = self.model.em_step(
                self.params, self.estate, self.data, key, self.cfg,
                do_reconstruction=rec,
            )
            F = float(stats.F)
            log = merge_dict(
                {"F": F, "S_nunique": float(stats.S_nunique),
                 "S_sub": float(stats.S_sub)},
                params_to_dict(self.params),
            )
            self.dlog.append_all(log)
            for name in ("n_reset_nan", "n_reset_small", "n_reset_inf"):
                v = int(getattr(stats, name))
                if v > 0:
                    print(f"\t{name} = {v}")
            if epoch_callback is not None:
                epoch_callback(epoch=e + 1, F=F, params=self.params,
                               stats=stats, y_rec=y_rec)
            if self.checkpoint_every and (e + 1) % self.checkpoint_every == 0:
                path = os.path.join(self.outdir, "checkpoint.npz")
                save_checkpoint(path, self.params, self.estate, e + 1, self.key)
                print(f"\tcheckpoint -> {path}")
            print("\tTotal epoch runtime : %.2f s" % (time.time() - t0))
        return self.params, self.estate, stats


def gather_reconstruction(y_rec, N: int) -> np.ndarray:
    """Blocked device reconstruction [nb, B, D] -> host [N, D] (drops
    padding rows); the jax analog of the reference's Gatherv
    (parallel.py:154-173)."""
    arr = np.asarray(y_rec)
    return arr.reshape(-1, arr.shape[-1])[:N]
