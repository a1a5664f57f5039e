"""Initialization of the truncated variational state sets K^(n).

Re-design of reference evo/variational/utils.py:19-228
(`_init_lpj_and_state_arrays` / `init_states`).  Initial states are S unique
Bernoulli(p_init_Kn) draws per datapoint (excluding permanent states); the
reference's per-datapoint Python rejection loop becomes a globally vectorized
redraw loop on host (NumPy), since this runs exactly once per experiment.

The per-epoch state lives in the `EState` pytree; all EA hyperparameters are
static in `EAConfig`.
"""

from __future__ import annotations

import dataclasses
from itertools import combinations
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from evo_tpu.variational.config import EAConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EState:
    """Per-datapoint truncated posterior state.

    ss:  int8 0/1 [N, S, H] — the state sets K^(n) (int8 rather than bool so
         the Pallas kernels read it without pred<->s8 conversions; uint8
         [N, S, ceil(H/8)] bit-packed when EAConfig.packed_states)
    lpj: float [N, S_perm + S] — log-pseudo-joints; permanent states first
         (reference layout, _models.py:483-485)
    """

    ss: jnp.ndarray
    lpj: jnp.ndarray


def full_state_matrix(H: int) -> np.ndarray:
    """All 2^H binary states, ordered by number of ON bits then combination
    order — the reference's `sm` enumeration (utils.py:57-69), used for exact
    E-steps and exact likelihoods.

    Bound: the reference asserts H < 12 for its exact E-step mode
    (utils.py:72) and init_states mirrors that; the enumeration itself is
    practical somewhat beyond (2^16 x 16 bool = 1 MB), so the exact
    free-energy oracle keeps working up to H = 16.  The old H < 22 bound
    allowed a 44 GB array — that is the failure this guard prevents."""
    assert H <= 16, "full enumeration too large for H={}".format(H)
    rows = []
    for g in range(H + 1):
        for comb in combinations(range(H), g):
            row = np.zeros(H, dtype=bool)
            row[list(comb)] = True
            rows.append(row)
    return np.stack(rows, axis=0)


def _pack_rows(ss: np.ndarray) -> np.ndarray:
    """[..., H] bool -> [..., W] uint64 keys (host-side, via packbits)."""
    H = ss.shape[-1]
    W = -(-H // 64)
    pad = W * 64 - H
    if pad:
        ss = np.concatenate([ss, np.zeros(ss.shape[:-1] + (pad,), bool)], axis=-1)
    packed = np.packbits(ss, axis=-1)  # [..., W*8] uint8
    return np.ascontiguousarray(packed).view(np.uint64).reshape(ss.shape[:-1] + (W,))


def _mark_duplicate_rows(keys: np.ndarray) -> np.ndarray:
    """keys [N, S, W] -> dup mask [N, S]: True where an identical state occurs
    elsewhere within the same n (keeping one representative per group)."""
    N, S, W = keys.shape
    n_idx = np.repeat(np.arange(N, dtype=np.uint64), S)
    flat = keys.reshape(N * S, W)
    # lexsort: last key is primary -> sort by (n, word_{W-1}, ..., word_0)
    order = np.lexsort(tuple(flat[:, w] for w in range(W)) + (n_idx,))
    sorted_flat = flat[order]
    sorted_n = n_idx[order]
    same = (sorted_flat[1:] == sorted_flat[:-1]).all(axis=1) & (sorted_n[1:] == sorted_n[:-1])
    dup_sorted = np.concatenate([[False], same])
    dup = np.empty(N * S, dtype=bool)
    dup[order] = dup_sorted
    return dup.reshape(N, S)


def draw_initial_states(
    rng: np.random.Generator,
    N: int,
    S: int,
    H: int,
    p_init_Kn: float,
    exclude_allzero: bool,
    background: bool,
    max_rounds: int = 1000,
    chunk: int = 8192,
) -> np.ndarray:
    """Draw unique-per-datapoint Bernoulli states, vectorized redraw loop
    (replaces the per-n rejection loop of reference utils.py:100-138).
    Processed in row chunks to bound host memory at large N."""
    H_ = H - 1 if background else H
    assert S + (1 if exclude_allzero else 0) <= 2 ** H_, "S too large for 2^H"
    out = np.empty((N, S, H_ + (1 if background else 0)), dtype=bool)
    for lo in range(0, N, chunk):
        hi = min(lo + chunk, N)
        n = hi - lo
        ss = rng.random((n, S, H_), dtype=np.float32) < p_init_Kn
        for _ in range(max_rounds):
            bad = _mark_duplicate_rows(_pack_rows(ss))
            if exclude_allzero:
                bad |= ~ss.any(axis=2)
            n_bad = int(bad.sum())
            if n_bad == 0:
                break
            ss[bad] = rng.random((n_bad, H_), dtype=np.float32) < p_init_Kn
        else:
            raise RuntimeError("could not draw unique initial states")
        out[lo:hi, :, :H_] = ss
    if background:
        out[:, :, -1] = True
    return out


def init_states(
    N: int,
    S: int,
    H: int,
    parent_selection: str = "fit",
    mutation_algorithm: str = "randflip",
    no_parents: int = 10,
    no_children: int = 1,
    no_generations: int = 1,
    bitflip_prob: Optional[float] = None,
    Mprime: Optional[int] = None,
    p_init_Kn: Optional[float] = None,
    allzero: bool = False,
    background: bool = False,
    seed: int = 0,
    n_blocks: int = 1,
    dtype=jnp.float32,
    packed_states: bool = False,
    unification: bool = True,
    reject_worse: bool = True,
):
    """Build (EAConfig, EState) for a fresh experiment.

    Mirrors reference init_states (utils.py:155-228): defaults p_init_Kn=1/H,
    Mprime=S, crossover forces no_children = no_parents - 1 (handled inside
    EAConfig.children_per_gen), permanent states default to *off*
    (utils.py:39-40), and S == 2^H_ switches to exact E-steps with K^(n) =
    the full state enumeration and the EA disabled (utils.py:71-86; in the
    reference the EA still runs but every child is a duplicate, so skipping
    it is exactly equivalent and cheaper).
    """
    H_ = H - 1 if background else H
    exact = S == 2 ** H_ and not background
    cfg = EAConfig(
        S=S,
        H=H,
        n_parents=no_parents,
        n_children=no_children,
        n_generations=no_generations,
        parent_selection=parent_selection,
        mutation_algorithm=mutation_algorithm,
        bitflip_prob=bitflip_prob,
        Mprime=Mprime,
        allzero=allzero and not background,
        background=background,
        exact=exact,
        n_blocks=n_blocks,
        packed_states=packed_states,
        unification=unification,
        reject_worse=reject_worse,
    )

    if exact:
        assert H_ < 12, "Exact E-steps too expensive for H={}".format(H_)
        sm = full_state_matrix(H_)
        if cfg.allzero:
            # all-zero handled as the permanent state; K holds the rest
            sm = sm[1:]
            cfg = dataclasses.replace(cfg, S=sm.shape[0])
        ss = np.broadcast_to(sm[None], (N,) + sm.shape).copy()
    else:
        rng = np.random.default_rng(seed)
        ss = draw_initial_states(
            rng, N, S, H, p_init_Kn if p_init_Kn is not None else 1.0 / H,
            exclude_allzero=cfg.allzero, background=background,
        )

    # return blocked [nb, B, ...] to match the Data layout (models/base.py)
    assert N % n_blocks == 0, "n_blocks must divide N (after padding)"
    B = N // n_blocks
    lpj = jnp.zeros((n_blocks, B, cfg.S_perm + cfg.S), dtype=dtype)
    ss = np.ascontiguousarray(ss.reshape(n_blocks, B, ss.shape[1], ss.shape[2]))
    # ship packed bits (8x less host->device traffic; the device link may be
    # a tunnel); keep them packed on device when packed_states is set
    from evo_tpu.ops.bitpack import unpack_bits_u8

    H_out = ss.shape[-1]
    if packed_states:
        # persistent packed storage uses the LANE-MAJOR layout
        # (ops.bitpack.pack_bits_lane) so the Pallas kernels can unpack it
        # in VMEM without any lane shuffles
        from evo_tpu.ops.bitpack import pack_bits_lane_host

        ss_dev = jnp.asarray(pack_bits_lane_host(ss))
    else:
        # ship packed (8x less traffic over a tunneled device link), unpack
        # on device; int8 is the device representation for unpacked states
        # (see ops.bitpack.take_rows): the Pallas kernels consume it
        # directly, where bool would force pred<->s8 round-trips every epoch
        packed = np.packbits(ss, axis=-1, bitorder="little")
        ss_dev = jax.jit(
            lambda p: unpack_bits_u8(p, H=H_out).astype(jnp.int8)
        )(jnp.asarray(packed))
    estate = EState(ss=ss_dev, lpj=lpj)
    return cfg, estate
