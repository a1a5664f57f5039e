"""Epoch-loop driver shared by the example apps.

The reference repeats this loop in every example main.py
(e.g. examples/bars-test/main.py:156-167); here it is one class that also
adds checkpoint/resume (a capability the reference lacks, SURVEY §5).

Observability hooks (reference parity):
  - theta_append=False switches parameter tables to DataLog.assign
    (overwrite; constant-size training.h5 over any number of epochs) —
    the reference's default unless --save_theta_all_epochs
    (reference examples/image-denoising/main.py:55-61).
  - tracefile enables host tracepoints around every epoch phase
    (the reference decorates model methods with @tracing.traced,
    _models.py:101-596; here the phases of the fused jitted step are marked
    from the host: em_step dispatch+wait, logging, callback, checkpoint).
  - device_trace_every=N captures a jax.profiler device trace (XLA ops,
    HBM, MXU utilization) of one epoch every N epochs into
    <outdir>/device_trace — the TPU-side analog the reference cannot offer.
"""

from __future__ import annotations

import os
import time
import warnings
from typing import Callable, Optional

import numpy as np
import jax

from evo_tpu.apps.common import merge_dict, params_to_dict
from evo_tpu.utils import tracing
from evo_tpu.utils.checkpoint import save_checkpoint, load_checkpoint


class EMTrainer:
    def __init__(self, model, cfg, params, estate, data, dlog, outdir: str,
                 seed: int = 0, checkpoint_every: int = 0,
                 resume: Optional[str] = None, theta_append: bool = True,
                 tracefile: Optional[str] = None, device_trace_every: int = 0,
                 chunk_epochs: int = 1):
        self.model, self.cfg, self.data = model, cfg, data
        self.params, self.estate = params, estate
        self._overflow_nan_streak, self._overflow_warned = 0, False
        self.dlog, self.outdir = dlog, outdir
        self.checkpoint_every = checkpoint_every
        self.theta_append = theta_append
        self.device_trace_every = device_trace_every
        # chunk_epochs > 1: fuse runs of host-invisible epochs into ONE
        # device dispatch (models.base.em_steps; trajectory bit-identical
        # to per-epoch stepping).  Per-epoch F/S_*/guard metrics are still
        # logged from the stacked stats; Theta tables and epoch_callback
        # fire at chunk ends only (intermediate params never reach the
        # host), so chunking requires the Theta-overwrite logging mode
        # (theta_append=False) where only the latest Theta is kept anyway.
        # Reconstruction and device-trace epochs always run solo;
        # checkpoint boundaries end chunks.
        self.chunk_epochs = max(1, int(chunk_epochs))
        if self.chunk_epochs > 1 and theta_append:
            raise ValueError(
                "chunk_epochs > 1 cannot log Theta per epoch "
                "(intermediate params stay on device); use "
                "theta_append=False (the Theta-overwrite logging mode)")
        self.start_epoch = 0
        self.key = jax.random.key(seed)
        self._tracing = bool(tracefile)
        if tracefile:
            if not os.path.isabs(tracefile) and os.path.sep not in tracefile:
                tracefile = os.path.join(outdir, tracefile)
            tracing.set_tracefile(tracefile)
        if resume:
            self.params, self.estate, self.start_epoch, self.key = load_checkpoint(
                resume, params_like=self.params,
                cfg=self.cfg, model=self.model, data=self.data,
            )
            print(f"Resumed from {resume} at epoch {self.start_epoch}")

    def _log_epoch(self, stats, log_theta: bool = True):
        metrics = {"F": float(stats.F), "S_nunique": float(stats.S_nunique),
                   "S_sub": float(stats.S_sub)}
        if not log_theta:
            self.dlog.append_all(metrics)
            return
        theta = params_to_dict(self.params)
        if self.theta_append:
            self.dlog.append_all(merge_dict(metrics, theta))
        else:
            # overwrite mode: training.h5 holds only the latest Theta
            self.dlog.append_all(metrics)
            for name, value in theta.items():
                self.dlog.assign(name, value)

    def _print_guards(self, stats):
        for name in ("n_reset_nan", "n_reset_small", "n_reset_inf",
                     "n_guard_sigma_floor", "n_guard_mus_freeze",
                     "n_guard_psi_freeze"):
            v = int(getattr(stats, name))
            if v > 0:
                print(f"\t{name} = {v}")
        self._warn_bucket_overflow(int(stats.n_reset_nan))
        renorm = float(stats.guard_psi_renorm)
        if renorm > 0.1:  # only surface non-trivial gauge corrections
            print(f"\tguard_psi_renorm = {renorm:.3f}")

    def _warn_bucket_overflow(self, n_reset_nan: int):
        """At 64 < H <= 128 the bucketed SSSC kernels FLOOR (rather than
        evaluate) states with > Hp/8 active units (ops/pallas_sssc.py
        _buckets) — exact under sparse priors, lossy if pies drift dense.
        Persistently nonzero nan-reset counters are the observable symptom;
        warn once and point at the exact XLA path (MIGRATION.md item 7)."""
        if n_reset_nan == 0:
            self._overflow_nan_streak = 0
            return
        kernel = getattr(self.model, "lpj_kernel", "xla")
        if (self._overflow_warned or kernel == "xla"
                or getattr(self.model, "H", 0) <= 64):
            return
        self._overflow_nan_streak += 1
        if self._overflow_nan_streak >= 3:
            self._overflow_warned = True
            warnings.warn(
                f"n_reset_nan nonzero for {self._overflow_nan_streak} "
                f"consecutive epochs at H={self.model.H} on the bucketed "
                "kernel path — states denser than Hp/8 active units are "
                "floored, not evaluated. If pies have drifted dense, use "
                "lpj_kernel='xla' for exact evaluation (MIGRATION.md "
                "item 7).", RuntimeWarning)

    def _maybe_checkpoint(self, epoch: int):
        """Write the resumable checkpoint if `epoch` is a boundary (shared
        by the per-epoch and chunked paths, so their files stay
        format-identical — the chunk/per-epoch equality test compares
        contents)."""
        if not (self.checkpoint_every
                and epoch % self.checkpoint_every == 0):
            return
        tracing.tracepoint("checkpoint:begin")
        path = os.path.join(self.outdir, "checkpoint.npz")
        save_checkpoint(path, self.params, self.estate, epoch, self.key,
                        cfg=self.cfg, model=self.model, data=self.data)
        tracing.tracepoint("checkpoint:end")
        print(f"\tcheckpoint -> {path}")

    def _chunk_len(self, e: int, no_epochs: int, reconstruct_at) -> int:
        """Largest n <= chunk_epochs such that epochs [e, e+n) need no host
        interaction inside: no reconstruction or device-trace epoch, and any
        checkpoint boundary falls exactly at the chunk end."""
        n = 0
        for b in range(e, min(e + self.chunk_epochs, no_epochs)):
            if reconstruct_at is not None and bool(reconstruct_at(b)):
                break  # this epoch must run solo (host consumes y_rec)
            if (self.device_trace_every
                    and (b + 1) % self.device_trace_every == 0):
                break  # solo: the profiler brackets a single em_step
            n += 1
            if self.checkpoint_every and (b + 1) % self.checkpoint_every == 0:
                break  # checkpoint needs host state here: end the chunk
        return max(1, n)

    def _run_chunk(self, e: int, n: int, no_epochs: int, epoch_callback):
        """Epochs [e, e+n) as ONE device dispatch (models.base.em_steps —
        trajectory bit-identical to per-epoch stepping).  Per-epoch
        F/S_*/guard metrics are logged from the stacked stats; Theta
        (overwrite mode) and epoch_callback fire once at the chunk end.
        Returns (next epoch index, host StepStats of the last epoch)."""
        from evo_tpu.models.base import em_steps

        self.dlog.progress(f"Epochs {e + 1}-{e + n} of {no_epochs} "
                           f"(one dispatch)")
        t0 = time.time()
        tracing.tracepoint("em_steps:begin")
        self.params, self.estate, stats_all = em_steps(
            self.model, self.params, self.estate, self.data, self.key,
            self.cfg, n, e0=e)
        stats_all = jax.device_get(stats_all)  # one transfer for the window
        tracing.tracepoint("em_steps:end")

        tracing.tracepoint("log:begin")
        stats = None
        for i in range(n):
            stats = jax.tree_util.tree_map(lambda a, i=i: a[i], stats_all)
            self._log_epoch(stats, log_theta=(i == n - 1))
            self._print_guards(stats)
        tracing.tracepoint("log:end")
        if epoch_callback is not None:
            tracing.tracepoint("epoch_callback:begin")
            epoch_callback(epoch=e + n, F=float(stats.F), params=self.params,
                           stats=stats, y_rec=None)
            tracing.tracepoint("epoch_callback:end")
        self._maybe_checkpoint(e + n)
        print("\tTotal chunk runtime : %.2f s (%d epochs)"
              % (time.time() - t0, n))
        return e + n, stats

    def run(self, no_epochs: int,
            reconstruct_at: Optional[Callable[[int], bool]] = None,
            epoch_callback: Optional[Callable] = None):
        """Train for no_epochs (minus any resumed epochs).

        epoch_callback contract: called as
        ``epoch_callback(epoch=, F=, params=, stats=, y_rec=)`` after a
        logged epoch.  With chunk_epochs == 1 it fires every epoch with
        consecutive ``epoch`` values.  With chunk_epochs > 1 it fires only
        at CHUNK ENDS: ``epoch`` jumps by the chunk length and ``y_rec``
        is None for fused epochs (reconstruction epochs always run solo
        and fire normally).  Callbacks that assume consecutive epoch
        values or need intermediate parameters must run unchunked; the
        per-epoch F/S_* metrics of fused epochs are still logged to the
        DataLog from the stacked stats."""
        stats = None
        if self.start_epoch >= no_epochs:
            # resuming a checkpoint written at (or beyond) the final epoch:
            # no steps to run, but callers read stats.F from the result —
            # synthesize it from the checkpointed state instead of
            # returning None (which crashed every app driver)
            from evo_tpu.models.base import StepStats

            print(f"Training already complete at epoch {self.start_epoch} "
                  f">= {no_epochs}; nothing to run")
            z = np.zeros((), np.int32)
            stats = StepStats(
                F=np.asarray(jax.device_get(self.model.free_energy(
                    self.params, self.estate, self.data))),
                S_nunique=z, S_sub=z,
                n_reset_nan=z, n_reset_small=z, n_reset_inf=z)
        e = self.start_epoch
        while e < no_epochs:
            n_chunk = (self._chunk_len(e, no_epochs, reconstruct_at)
                       if self.chunk_epochs > 1 else 1)
            if n_chunk > 1:
                e, stats = self._run_chunk(e, n_chunk, no_epochs,
                                           epoch_callback)
                continue
            rec = bool(reconstruct_at(e)) if reconstruct_at else False
            self.dlog.progress(f"Epoch {e + 1} of {no_epochs}")
            t0 = time.time()
            key = jax.random.fold_in(self.key, e)

            capture = (self.device_trace_every
                       and (e + 1) % self.device_trace_every == 0)
            if capture:
                profile_dir = os.path.join(self.outdir, "device_trace")
                jax.profiler.start_trace(profile_dir)
            tracing.tracepoint("em_step:begin")
            self.params, self.estate, stats, y_rec = self.model.em_step(
                self.params, self.estate, self.data, key, self.cfg,
                do_reconstruction=rec,
            )
            # ONE device->host transfer for every stats scalar (each
            # per-field float()/int() readback pays a full dispatch
            # round-trip — ~35 ms apiece through a tunneled TPU; see
            # CLAUDE.md).  Also the completion barrier for the step.
            stats = jax.device_get(stats)
            F = float(stats.F)
            tracing.tracepoint("em_step:end")
            if capture:
                jax.profiler.stop_trace()
                print(f"\tdevice trace -> {profile_dir}")

            tracing.tracepoint("log:begin")
            self._log_epoch(stats)
            tracing.tracepoint("log:end")
            self._print_guards(stats)
            if epoch_callback is not None:
                tracing.tracepoint("epoch_callback:begin")
                epoch_callback(epoch=e + 1, F=F, params=self.params,
                               stats=stats, y_rec=y_rec)
                tracing.tracepoint("epoch_callback:end")
            self._maybe_checkpoint(e + 1)
            print("\tTotal epoch runtime : %.2f s" % (time.time() - t0))
            e += 1
        if self._tracing:
            tracing.close(os.path.join(self.outdir, "traces.tgz"))
        return self.params, self.estate, stats


def gather_reconstruction(y_rec, N: int) -> np.ndarray:
    """Blocked device reconstruction [nb, B, D] -> host [N, D] (drops
    padding rows); the jax analog of the reference's Gatherv
    (parallel.py:154-173).

    Multi-process: the global blocked array's B axis holds process 0's
    rows, then process 1's, ... per block (make_global_data assembles
    process-local shards that way), while each process's own flat row order
    is block-major.  De-interleave to the concatenation of the processes'
    flat local orders — [p0 rows..., p1 rows..., ...] — which is the order
    a caller that indexes with global row ids (process offset + local
    index) expects; N is then the GLOBAL row count."""
    import jax

    from evo_tpu.parallel import gather_global

    arr = gather_global(y_rec)
    P = jax.process_count()
    if P > 1:
        arr = deinterleave_processes(arr, P)
        # per-process padding is unsupported here: after de-interleaving,
        # pad rows would sit at the end of EACH process segment, so a flat
        # [:N] slice would drop valid rows of the last process while
        # keeping earlier processes' pad rows.  make_global_data requires
        # callers to pad symmetrically and track validity themselves; this
        # gather only handles the no-padding case
        total = int(np.prod(arr.shape[:-1]))
        assert total == N, (
            f"gather_reconstruction: global rows {total} != N={N}; "
            "per-process padding is unsupported (pad-free data only)"
        )
    return arr.reshape((-1, arr.shape[-1]))[:N]


def deinterleave_processes(arr: np.ndarray, P: int) -> np.ndarray:
    """[nb, B_global, ...] with each block's B axis = [p0 rows | p1 rows |
    ...] -> [P, nb, B_local, ...], so a flat reshape yields the
    concatenation of the processes' own block-major row orders."""
    nb, B_global = arr.shape[:2]
    assert B_global % P == 0, (B_global, P)
    arr = arr.reshape((nb, P, B_global // P) + arr.shape[2:])
    return np.moveaxis(arr, 1, 0)
