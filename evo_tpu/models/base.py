"""Shared model-layer infrastructure: data containers, blocking, stats.

The reference threads three mutable dicts (`model_params`, `my_suff_stat`,
`my_data`, reference: evo/models/_models.py:162-203) through every call.
Here the same state is immutable pytrees:

  - params  (model-specific dataclass, e.g. BSCParams)
  - EState  (K^(n) state sets + log-pseudo-joints; evo_tpu.variational)
  - Data    (observations + masks, below)

Batch layout: every per-datapoint array is *blocked* as [nb, B, ...].  The
jitted em_step lax.scan's over the nb leading axis (bounding device memory for
large N) while the B axis is sharded over the mesh's 'data' axis — the
TPU-native replacement for the reference's MPI Scatterv data parallelism
(reference: evo/utils/parallel.py:117-151).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Data:
    """Observations and masks, blocked [nb, B, ...].

    y:         [nb, B, D] — observations; *missing entries are zeroed* (the
               raw data marks them NaN; see make_data)
    x_infr:    [nb, B, D] bool — entries reliable for inference/learning
               (reference my_data['x_infr'])
    x:         [nb, B, D] bool — entries to KEEP as-is during reconstruction;
               ~x is estimated (reference my_data['x'])
    row_valid: [nb, B] bool — False for padding rows added to make N divisible
               by (n_blocks * n_devices); padding never contributes to sums
    incomplete: static — whether any entry of x_infr is False (selects the
               masked code paths at trace time)
    """

    y: jnp.ndarray
    x_infr: jnp.ndarray
    x: jnp.ndarray
    row_valid: jnp.ndarray
    incomplete: bool = dataclasses.field(metadata=dict(static=True), default=False)

    @property
    def n_blocks(self) -> int:
        return self.y.shape[0]

    @property
    def D(self) -> int:
        return self.y.shape[-1]


def pad_rows(N: int, multiple: int) -> int:
    return (-N) % multiple


def make_data(
    y: np.ndarray,
    x: Optional[np.ndarray] = None,
    n_blocks: int = 1,
    pad_multiple: int = 1,
    dtype=jnp.float32,
) -> Data:
    """Build a blocked Data pytree from raw observations.

    Missing entries of `y` are marked NaN (as in the reference drivers, e.g.
    examples/image-inpainting/main.py:83); they are zeroed here and tracked in
    x_infr.  `x` marks entries to keep during reconstruction; defaults to
    x_infr (reconstruct exactly the missing entries, the inpainting setup); a
    denoising driver passes x = zeros to re-estimate every entry.
    """
    y = np.asarray(y)
    N, D = y.shape
    x_infr = ~np.isnan(y)
    incomplete = bool((~x_infr).any())
    y = np.where(x_infr, y, 0.0)
    if x is None:
        x = x_infr.copy()
    else:
        x = np.asarray(x).astype(bool)

    pad = pad_rows(N, n_blocks * pad_multiple)
    if pad:
        y = np.concatenate([y, np.zeros((pad, D), y.dtype)], axis=0)
        x_infr = np.concatenate([x_infr, np.ones((pad, D), bool)], axis=0)
        x = np.concatenate([x, np.ones((pad, D), bool)], axis=0)
    row_valid = np.arange(N + pad) < N

    def blk(a):
        return jnp.asarray(a.reshape((n_blocks, -1) + a.shape[1:]))

    return Data(
        y=blk(y.astype(np.dtype(dtype))),
        x_infr=blk(x_infr),
        x=blk(x),
        row_valid=blk(row_valid),
        incomplete=incomplete,
    )


def blockify(tree, n_blocks: int):
    """[N, ...] -> [nb, N/nb, ...] on every leaf."""
    return jax.tree.map(
        lambda a: a.reshape((n_blocks, a.shape[0] // n_blocks) + a.shape[1:]), tree
    )


def unblockify(tree):
    """[nb, B, ...] -> [nb*B, ...] on every leaf."""
    return jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), tree)


def block_gram(W, y_b, xinf_b, incomplete: bool):
    """Per-block lpj precomputation shared by all linear-Gaussian models:
    returns (G, Wty, y2) with

        complete:   G = W^T W               shared [H, H]
        incomplete: G_n = W^T diag(m_n) W   per datapoint [B, H, H]
        Wty_n = W^T (m_n .* y_n)  [B, H],   y2_n = ||m_n .* y_n||^2  [B]

    This one-time O(B H^2 D) MXU contraction makes every subsequent state
    evaluation O(H^2), independent of D — the TPU replacement for the
    reference's per-state GEMVs (bsc.py:91-95) and per-state D-dimensional
    solves (sssc.py:276-318)."""
    dt = W.dtype
    # true-f32 matmuls: G and Wty feed cancellation-sensitive quadratic
    # forms; the TPU's default reduced-precision passes are not enough at
    # real image scales (|y| ~ 1e2, G ~ 1e5)
    with jax.default_matmul_precision("highest"):
        if incomplete:
            m = xinf_b.astype(dt)
            G = jnp.einsum("bd,dh,dk->bhk", m, W, W)
            Wty = jnp.einsum("bd,dh->bh", y_b * m, W)
            y2 = jnp.sum(m * y_b * y_b, axis=-1)
        else:
            G = W.T @ W
            Wty = y_b @ W
            y2 = jnp.sum(y_b * y_b, axis=-1)
    return G, Wty, y2


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StepStats:
    """Per-epoch diagnostics, mirroring the reference's logged quantities
    (F, S_nunique, S_sub: _models.py:540-547; reset counters:
    _models.py:567-596 reported at bsc.py:163-171).

    The n_guard_* / guard_* fields surface the f32-only numerical guard
    rails (absent from the f64 reference, which merely degrades silently)
    in the same observability style as the reference's lpj reset counters:

      n_guard_sigma_floor: 1 if BSC's degenerate-fit sigma floor
          (1e-3 * data RMS) clamped the update this epoch
      n_guard_mus_freeze / n_guard_psi_freeze: number of SSSC latent units
          whose mus / Psi rows were frozen at their previous value because
          their activation mass collapsed (dying-unit guard)
      guard_psi_renorm: magnitude of the SSSC gauge renormalization,
          max_h |log d_h| with d = sqrt(diag(Psi)) (exactly 0 when the
          likelihood-invariant rescaling did nothing)
    """

    F: jnp.ndarray
    S_nunique: jnp.ndarray
    S_sub: jnp.ndarray
    n_reset_nan: jnp.ndarray
    n_reset_small: jnp.ndarray
    n_reset_inf: jnp.ndarray
    n_guard_sigma_floor: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))
    n_guard_mus_freeze: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))
    n_guard_psi_freeze: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))
    guard_psi_renorm: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.float32))


@partial(jax.jit, static_argnames=("model", "cfg", "n_epochs"))
def em_steps(model, params, estate, data: Data, key, cfg,
             n_epochs: int, e0=0):
    """`n_epochs` EM epochs as ONE jitted lax.scan — a single device
    dispatch for the whole window.

    The reference's training loop is host-driven per epoch
    (examples/bars-test/main.py:156-168); evo_tpu's em_step is already one
    fused device program per epoch, but each epoch still costs a host
    dispatch (~3 ms through the tunneled TPU even when pipelined).
    Inside a scan that cost is zero — BUT the scan carry constrains the
    state-array buffers across iterations, which costs copies that the
    back-to-back jit path avoids.  Both effects are measured (PARITY.md
    "multi-epoch dispatch"): at bars scale (H=8, N=400) em_steps is
    **3.2x faster** (3.07 -> 0.97 ms/epoch — dispatch dominates); at the
    north-star scale (N=102k, H=256, S=64, 1.7 GB state set) it is ~16%
    SLOWER (37.3 -> 43.3 ms/epoch — the carry copies dominate).  Rule of
    thumb: use em_steps when the per-epoch device time is within ~10x of
    the dispatch latency, or on any high-latency link; use the pipelined
    per-epoch loop for huge state sets.  The apps' EMTrainer steps
    per-epoch by default (reference-matching logging cadence) and routes
    host-invisible epochs through here when --chunk_epochs > 1.

    Complete data only: incomplete data requires per-epoch
    reconstruction on the host side of the M-step — use em_step with
    do_reconstruction=True (raises here with that message).

    Each distinct n_epochs value compiles its own scan program (jit
    cache keyed on the static length); callers with varying window
    lengths pay one compile per distinct length.

    Epoch e uses jax.random.fold_in(key, e0 + e) where e0 counts epochs
    already consumed from `key`, matching the canonical host loop
    `em_step(..., fold_in(key, e), ...)` bit-for-bit — trajectories are
    IDENTICAL to host-stepping the same epochs (tested:
    tests/test_bsc_em.py::test_em_steps_matches_host_loop).

    Returns (params, estate, stats) with every StepStats leaf stacked
    along a leading [n_epochs] axis.  Reconstruction is not produced
    (do_reconstruction epochs need the host anyway).
    """
    if data.incomplete:
        raise ValueError(
            "em_steps supports complete data only: incomplete data "
            "requires per-epoch reconstruction (use em_step with "
            "do_reconstruction=True)")

    def body(carry, e):
        p, s = carry
        p, s, stats, _ = model.em_step(
            p, s, data, jax.random.fold_in(key, e), cfg)
        return (p, s), stats

    (params, estate), stats = jax.lax.scan(
        body, (params, estate), e0 + jnp.arange(n_epochs))
    return params, estate, stats
