"""Fused Pallas TPU kernels for the SSSC slab marginalization.

The SSSC lpj needs, per candidate state s, two symmetric-PD solves
(reference evo/models/sssc.py:276-318: inv/slogdet of Psi_s and of
M_s = sigma2^-1 G_ss + Psi_s^-1).  The XLA lane-major Schur recursion
(ops/linalg.py) is compute-efficient but materializes each [H, H, batch]
intermediate in HBM — at the N=16k/H=32/S=20 benchmark one epoch solves
~480k states and every materialized matrix array is ~2 GB of HBM traffic,
which dominates the epoch (~87 of 157 device-ms in the solver).

These kernels run the SAME Schur-complement recursion entirely in VMEM,
one tile of states at a time, so the per-state [H, H] matrices never
exist in HBM.  Two entry points:

  sssc_lpj_pallas      — lpj (+ non-finite-solve flags) for candidate
                         evaluation during the evolutionary E-step.
  sssc_suffstat_pallas — posterior sufficient statistics of the MERGED
                         K^(n): per-datapoint <sz>/<s> and the [H, H]
                         accumulators (<ss'>, <szsz'>, the outer-product
                         statistics), contracted against the
                         responsibilities inside the kernel.

Re-solving the merged set replaces the candidate-solve stash of the XLA
path (and the reference's memoization dict, sssc.py:268-318): VMEM-
resident solves are compute-bound and cheap, while the stash forces a
[B*K_all, H, H] lambda array (~2 GB/epoch) through HBM.

Layout: everything is LANE-MAJOR with datapoints riding the 128-wide
lanes.  States arrive k-major as sT [H, K*B] (column t = k*B + b), so a
grid tile (H, Tb) holds Tb consecutive datapoints of ONE candidate slot k
— per-datapoint model vectors (Wty, y2, rs) then index by the datapoint
block alone, with no in-kernel gather/expansion, and per-datapoint
reductions are per-lane sums.  Matrix arrays are [Hp, Hp, Tb] f32 in
VMEM; matrix algebra is the unrolled broadcast-multiply-reduce of
ops/linalg.py (see there for why this beats batch-major on TPU).

Active-set COMPACTION (the reference's |s|^3-vs-H^3 insight,
sssc.py:268-318, recast fixed-shape): under sparse priors |s| ~ 2-4,
so solving the full Hp x Hp padded system wastes ~(Hp/|s|)^3 of the
solver flops.  When every state in a tile has |s| <= K_cap, the kernel
builds per-state one-hot projections P (rank = one MXU prefix-popcount
matmul), compacts the active units into the top-left K_cap x K_cap
block, runs the LU / Schur recursions at K_cap, and scatters back.
Tiles containing ANY denser state take the exact full-Hp path via a
data-dependent branch (pl.when on the tile's max popcount).  Both
branches compute the same exact selections of the same model matrices;
they differ only in summation grouping (compacted K_cap recursions and
f32 VPU reduces vs full-Hp recursions and bf16x6 MXU products), so
results agree to f32 rounding — last-ulp differences across the branch
are possible, NOT bit-identity.  The
compaction algebra itself rides the MXU: the one-hot projections act
as exact per-lane row gathers through dot_general (_row_gather — each
output element sums exactly ONE nonzero product, so the bf16
multi-pass matmul decomposition reconstructs f32 bit-exactly), and
the r-weighted lambda scatter contracts over lanes on the MXU without
materializing any [Hp, Hp, T] scattered array.  Measured on v5e at
the N=16k/H=32/S=20 bench config: suffstat 16.9 -> 3.2 ms, lpj
8.0 -> 2.4 ms per epoch vs the pre-compaction kernels (device trace,
PARITY.md), with the fallback never firing on real sparse-coding
workloads (max |s| ~ 6 over whole trainings).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from evo_tpu.ops.linalg import _next_pow2


def _mml(X, Y):
    """Lane-major matmul [i, j, T] @ [j, k, T] -> [i, k, T]; the j-loop is
    unrolled so no [i, j, k, T] intermediate materializes in VMEM."""
    m = X.shape[1]
    acc = X[:, 0:1, :] * Y[0][None, :, :]
    for j in range(1, m):
        acc = acc + X[:, j:j + 1, :] * Y[j][None, :, :]
    return acc


def _tl(X):
    return jnp.swapaxes(X, 0, 1)


def _pd_inv_logdet(A):
    """[m, m, T] symmetric-PD (m a power of two) -> (inverse, log|det| [T]).
    Schur-complement recursion, same algebra as ops.linalg (reference
    semantics: slogdet()[1], sign ignored — sssc.py:284,293)."""
    m = A.shape[0]
    if m == 1:
        a = A[0, 0]
        return (1.0 / a)[None, None, :], jnp.log(jnp.abs(a))
    if m == 2:
        a, b, c, d = A[0, 0], A[0, 1], A[1, 0], A[1, 1]
        det = a * d - b * c
        inv = jnp.stack([jnp.stack([d, -b]), jnp.stack([-c, a])]) / det
        return inv, jnp.log(jnp.abs(det))
    h = m // 2
    A11, B, A22 = A[:h, :h], A[:h, h:], A[h:, h:]
    inv11, ld1 = _pd_inv_logdet(A11)
    iB = _mml(inv11, B)
    S = A22 - _mml(_tl(B), iB)
    invS, ld2 = _pd_inv_logdet(S)
    C = _mml(iB, invS)
    TL = inv11 + _mml(C, _tl(iB))
    top = jnp.concatenate([TL, -C], axis=1)
    bot = jnp.concatenate([-_tl(C), invS], axis=1)
    return jnp.concatenate([top, bot], axis=0), ld1 + ld2


def _pad_sub(x, Hp):
    """Zero-pad the leading (sublane) dim to Hp."""
    H = x.shape[0]
    if H == Hp:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((Hp - H,) + x.shape[1:], x.dtype)], axis=0)


def _solve_core(sT, G2, Psi, mus, WtyT, s2inv, GaT=None):
    """Solves + slab posterior for one tile.  sT: [Hp, T] f32 0/1 states;
    G2: [Hp, Hp] shared Gram (complete data) OR [Hp, Hp, T] per-datapoint
    masked Gram G_n = W^T diag(m_n) W (incomplete data — every formula
    below is pointwise in the lane/datapoint axis, so the same algebra
    covers both; reference sssc.py:268-318 with the storage-off
    incomplete branch, _models.py:426-431); Psi: [Hp, Hp]; mus: [Hp, 1];
    WtyT: [Hp, T].  Per-lane G REQUIRES the precomputed GaT [Hp, T]
    (= G_n a, an XLA-side batched MXU einsum): computing it in-kernel —
    whether as a broadcast-multiply middle-axis reduce or per-column
    slices — crashes the Mosaic compile helper in the full kernel
    (2026-08-19, v5e; the op compiles standalone, so it is a compiler
    capacity interaction, not a semantics problem).

    Returns (lam [Hp, Hp, T], ldM [T], ldP [T], bad [T], aT, uT, lam_u).
    Identity padding falls out of the formulas: pad sublanes have s = 0,
    so Ppad/M get 1 on the diagonal there and contribute 0 to logdets."""
    Hp = sT.shape[0]
    per_lane_G = G2.ndim == 3
    ssT = sT[:, None, :] * sT[None, :, :]  # [Hp, Hp, T]
    i_ = jax.lax.broadcasted_iota(jnp.int32, (Hp, Hp), 0)
    j_ = jax.lax.broadcasted_iota(jnp.int32, (Hp, Hp), 1)
    eye = (i_ == j_).astype(sT.dtype)
    Ppad = Psi[:, :, None] * ssT + eye[:, :, None] * (1.0 - sT)[:, None, :]
    Pinv, ldP = _pd_inv_logdet(Ppad)
    bad = 1.0 - jnp.isfinite(
        jnp.sum(jnp.abs(Pinv), axis=(0, 1))).astype(jnp.float32)
    Gb = G2 if per_lane_G else G2[:, :, None]
    M = s2inv * (Gb * ssT) + Pinv
    lam, ldM = _pd_inv_logdet(M)

    aT = sT * mus  # [Hp, T]
    if GaT is None:
        assert not per_lane_G, "per-lane G needs the precomputed GaT"
        # GaT[i, t] = sum_j G[i, j] a[j, t] — exact f32 VPU fma chain,
        # unrolled so no [Hp, Hp, T] product materializes in VMEM
        GaT = G2[:, 0:1] * aT[0][None, :]
        for j in range(1, Hp):
            GaT = GaT + G2[:, j:j + 1] * aT[j][None, :]
    uT = sT * (WtyT - GaT)
    lam_u = jnp.sum(lam * uT[None, :, :], axis=1)  # [Hp, T]
    return lam, ldM, ldP, bad, aT, GaT, uT, lam_u


def _lu_logdet_solve(A_scr, v, Hp):
    """Unpivoted in-place LU on the lane-major scratch A_scr [Hp, Hp, T],
    returning (logdet [T], x [Hp, T] solving A x = v, bad [T]).

    A arrives as M' = I + s2inv * Psi_s G_ss (similar to the symmetric PD
    M_s = Psi_s^-1 M' Psi_s, so its spectrum is positive); unpivoted LU is
    empirically stable here and any breakdown (tiny/non-finite pivot) is
    reported through `bad` — the caller gives such states lpj -> floor,
    exactly how the reference treats its np.linalg failures
    (sssc.py:279-283)."""
    ld = jnp.zeros_like(A_scr[0, 0])
    badv = jnp.zeros_like(ld)
    # near-zero pivot => condition number beyond f32 (M' has natural scale
    # >= 1 from its identity part); such solves carry no usable digits, so
    # flag them for the lpj floor instead of emitting a +-huge garbage lpj
    tiny = jnp.float32(1e-6)
    for k in range(Hp):
        piv = A_scr[k, k, :]
        badv = badv + jnp.where(
            jnp.abs(piv) < tiny, 1.0, 0.0) + jnp.where(
            jnp.isfinite(piv), 0.0, 1.0)
        ld = ld + jnp.log(jnp.abs(piv))
        if k + 1 < Hp:
            ipiv = 1.0 / piv
            col = A_scr[k + 1:, k, :] * ipiv[None, :]
            A_scr[k + 1:, k, :] = col  # L multipliers (unit diagonal)
            A_scr[k + 1:, k + 1:, :] = (
                A_scr[k + 1:, k + 1:, :]
                - col[:, None, :] * A_scr[k, k + 1:, :][None, :, :])
    # forward substitution (unit L), then back substitution (U), as
    # fori_loops of masked full-row dots — O(Hp) loop iterations instead
    # of O(Hp^2) unrolled statements (the unrolled form compiled for
    # minutes under Mosaic)
    iot = jax.lax.broadcasted_iota(jnp.int32, (Hp, 1), 0)

    def fwd(k, y):
        row = A_scr[pl.ds(k, 1)][0]  # [Hp, T] — row k via ref indexing
        # y rows >= k are still the raw rhs; mask the dot to j < k, and
        # the update to row k (masked ops replace dynamic value slicing,
        # which Mosaic does not lower)
        acc = jnp.sum(jnp.where(iot < k, row, 0.0) * y, axis=0)
        return y - jnp.where(iot == k, 1.0, 0.0) * acc[None, :]

    y = jax.lax.fori_loop(0, Hp, fwd, v)

    def bwd(i, x):
        k = Hp - 1 - i
        row = A_scr[pl.ds(k, 1)][0]
        acc = jnp.sum(jnp.where(iot > k, row, 0.0) * x, axis=0)
        diag = jnp.sum(jnp.where(iot == k, row, 0.0), axis=0)
        xk = jnp.sum(jnp.where(iot == k, x, 0.0), axis=0)
        xk = (xk - acc) / diag
        return jnp.where(iot == k, xk[None, :], x)

    x = jax.lax.fori_loop(0, Hp, bwd, y)
    return ld, x, jnp.minimum(badv, 1.0)


# --------------------------------------------------- active-set compaction


def _build_P(sT, Lstrict, K_cap):
    """Per-state one-hot compaction projections.

    sT: [Hp, T] f32 0/1; Lstrict: [Hp, Hp] strictly-lower-triangular ones.
    Returns (P [K_cap, Hp, T] f32 with P[c, i, t] = 1 iff unit i is the
    c-th active unit of state t, rowvalid [K_cap, T] = 1 iff state t has
    more than c active units).  rank = Lstrict @ s is the EXCLUSIVE prefix
    popcount — one MXU matmul, exact in f32 (values <= Hp).  Only valid
    when every state in the tile has |s| <= K_cap (the callers branch)."""
    rankx = jax.lax.dot_general(
        Lstrict, sT, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [Hp, T]
    # Mosaic requires integer iota (f32 iota fails op verification)
    c_iota = jax.lax.broadcasted_iota(
        jnp.int32, (K_cap, 1, 1), 0).astype(jnp.float32)
    P = jnp.where(rankx[None, :, :] == c_iota, 1.0, 0.0) * sT[None, :, :]
    rowvalid = jnp.sum(P, axis=1)  # [K_cap, T]
    return P, rowvalid


def _row_gather(A, Pc, dim):
    """sum_i A[i, k] Pc[i, t] (dim=0) or sum_j A[k, j] Pc[j, t] (dim=1)
    -> [k, t], for SHARED A [Hp, Hp] and one projection row Pc [Hp, T].

    This is an MXU matmul that is EXACT despite the multi-pass bf16 f32
    decomposition: Pc is one-hot per lane, so every output element sums
    exactly one nonzero product, and 1 * (x_hi + x_mid + x_lo)
    reconstructs x bit-exactly (the splits occupy disjoint mantissa
    segments).  Effectively a per-lane row gather of A at matmul speed —
    the whole point of the compaction rewrite: the old all-VPU
    _compact_mat paid a K_cap * Hp^2 * T broadcast-reduce for the same
    selection."""
    contract = (((dim,), (0,)), ((), ()))
    return jax.lax.dot_general(
        A, Pc, contract,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _compact_shared(P, A):
    """P A P^T for SHARED A [Hp, Hp] -> [K_cap, K_cap, T].

    Stage 1 (per projection row): PA_c[j, t] = sum_i P[c, i, t] A[i, j]
    rides the MXU as an exact row gather (_row_gather).  Stage 2 is the
    cheap K_cap^2 * Hp * T VPU reduction.  Leading-axis integer indexing
    of 3D values lowers fine under Mosaic (middle-axis indexing does
    not — that is why stage 2 keeps the [None] broadcast form)."""
    K_cap, Hp, T = P.shape
    rows = []
    for c in range(K_cap):
        PA_c = _row_gather(A, P[c], 0)  # [j, T]
        # out[c, d, t] = sum_j P[d, j, t] PA_c[j, t]
        rows.append(jnp.sum(P * PA_c[None, :, :], axis=1))  # [K_cap, T]
    return jnp.stack(rows, axis=0)


def _scatter_vec(P, xc):
    """P^T xc: [K_cap, Hp, T], [K_cap, T] -> [Hp, T]."""
    return jnp.sum(P * xc[:, None, :], axis=0)


def _gather_vec(P, x):
    """P x: [K_cap, Hp, T], [Hp, T] -> [K_cap, T]."""
    return jnp.sum(P * x[None, :, :], axis=1)


def _scatter_weighted(P, Mc, rT):
    """sum_t rT[t] * (P^T Mc P)[:, :, t] -> [Hp, Hp]: the r-weighted
    scatter of the compacted matrices, without ever materializing the
    [Hp, Hp, T] scattered array.  Stage A (VPU, K_cap^2 * Hp * T):
    McP[c, j, t] = sum_d Mc[c, d, t] P[d, j, t], with the
    responsibilities folded in.  Stage B (MXU, contraction over the T
    lanes): out[i, j] = sum_c sum_t P[c, i, t] McP[c, j, t]."""
    K_cap, Hp, _ = P.shape
    McP = None
    for d in range(K_cap):
        term = Mc[:, d:d + 1, :] * P[d][None, :, :]
        McP = term if McP is None else McP + term
    McP = McP * rT[None]
    out = None
    for c in range(K_cap):
        term = jax.lax.dot_general(
            P[c], McP[c], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # [Hp, Hp]
        out = term if out is None else out + term
    return out


def _eye3(K, rowvalid):
    """Identity on the PAD rows only: [K, K, T] with 1 at (c, c, t) iff
    state t has <= c active units (so compacted PD matrices stay PD)."""
    i_ = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    j_ = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    eye = (i_ == j_).astype(jnp.float32)
    return eye[:, :, None] * (1.0 - rowvalid)[:, None, :]


def _tile_all_sparse(sT, K_cap):
    """Scalar predicate: every state in this tile has |s| <= K_cap.
    Popcounts are exact in f32 (<= Hp)."""
    return jnp.max(jnp.sum(sT, axis=0)) <= jnp.float32(K_cap)


def _make_lpj_kernel(Hp: int, H: int, K_cap: int = 0, K_cap2: int = 0):
    """Three modes (see the module docstring):
      K_cap = 0            — full-Hp solves only (small Hp).
      K_cap > 0, K_cap2 = 0 — compaction at K_cap with the exact full-Hp
                              fallback per tile (Hp <= 64; measured path).
      K_cap2 > 0           — POPCOUNT BUCKETS, no full-Hp path (Hp > 64):
                              tiles whose densest state fits K_cap run the
                              small bucket, the rest run K_cap2 with
                              per-state overflow masking (|s| > K_cap2 ->
                              NaN lpj + bad flag -> reset_lpj floor).
                              Dropping the full path is what frees the
                              VMEM for full-width lanes at Hp = 128: no
                              [Hp, Hp, tb] scratch, no [Hp*Hp, Hp] Q."""
    bucketed = K_cap2 > 0
    compact = K_cap > 0

    def _kernel(*refs):
        if bucketed:
            (scal_ref, ss_ref, wty_ref, y2_ref, G_ref, psi_ref,
             mus_ref, pil_ref, L_ref, lpj_ref, bad_ref, Ac_scr,
             Ac2_scr) = refs
            Q_ref = A_scr = None
        elif compact:
            (scal_ref, ss_ref, wty_ref, y2_ref, G_ref, Q_ref, psi_ref,
             mus_ref, pil_ref, L_ref, lpj_ref, bad_ref, A_scr,
             Ac_scr) = refs
        else:
            (scal_ref, ss_ref, wty_ref, y2_ref, G_ref, Q_ref, psi_ref,
             mus_ref, pil_ref, lpj_ref, bad_ref, A_scr) = refs
        s2inv = scal_ref[0, 0]
        T = ss_ref.shape[1]
        sT = _pad_sub(ss_ref[:].astype(jnp.float32), Hp)
        WtyT = _pad_sub(wty_ref[:], Hp)
        mus = mus_ref[:][:, 0:1]

        def _t_mat():
            # the state-dependent product Psi_s G_ss hoisted onto the MXU:
            # T_mat = Q @ s where Q[(i,j), k] = Psi[i, k] G[k, j] is
            # state-independent.  M' = I + s2inv * (s s^T) .* T_mat.
            # Built INSIDE each branch (executes once per tile either way)
            # so the [Hp, Hp, T] intermediate never lives across the
            # branch point — keeping it live next to the branch-local
            # arrays exceeds the 16 MB scoped-VMEM budget at TB=1024
            # (measured on v5e).
            return jax.lax.dot_general(
                Q_ref[:], sT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST).reshape(Hp, Hp, T)

        i_ = jax.lax.broadcasted_iota(jnp.int32, (Hp, Hp), 0)
        j_ = jax.lax.broadcasted_iota(jnp.int32, (Hp, Hp), 1)
        eye = (i_ == j_).astype(jnp.float32)

        # u = s .* (Wty - G a), with G a on the MXU
        aT = sT * mus
        GaT = jax.lax.dot_general(
            G_ref[:], aT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        uT = sT * (WtyT - GaT)
        # lam u = M^-1 u = M'^-1 (Psi_s u); Psi_s u = s .* (Psi u) (MXU)
        Pu = sT * jax.lax.dot_general(
            psi_ref[:], uT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

        ynorm2 = (y2_ref[0] - 2.0 * jnp.sum(aT * WtyT, axis=0)
                  + jnp.sum(aT * GaT, axis=0))  # [T]
        base = (-0.5 * s2inv * ynorm2
                + jnp.sum(sT * pil_ref[:][:, 0:1], axis=0))

        def _emit(ldMP, lam_u, bad):
            # log det M' = log det M_s + log det Psi_s  (M' = Psi_s M_s)
            quad2 = jnp.sum(uT * lam_u, axis=0)
            lpj = base - 0.5 * ldMP + 0.5 * s2inv * s2inv * quad2
            # flagged solves carry no usable digits: emit NaN so the
            # caller's reset_lpj floors them to eps_lpj (and counts them)
            # — identical to the XLA path's failed-solve NaNs and to the
            # spirit of the reference's np.linalg fallback
            # (sssc.py:279-283).  NOT -inf: reset_lpj mirrors the
            # reference's lpj_reset_check, whose +-inf rule maps to
            # B_max = 0.0 — the DOMINANT lpj — because the reference only
            # ever sees +inf overflows there; a -inf sentinel would hand
            # numerically-broken states the best lpj in the set.
            lpj = jnp.where(bad > 0, jnp.float32(jnp.nan), lpj)
            lpj_ref[0, :] = lpj
            bad_ref[0, :] = bad

        def _full_path():
            ssT = sT[:, None, :] * sT[None, :, :]
            A_scr[:] = eye[:, :, None] + s2inv * (ssT * _t_mat())
            ldMP, lam_u, bad = _lu_logdet_solve(A_scr, Pu, Hp)
            _emit(ldMP, lam_u, bad)

        def _compact_path(K, Ac_ref, mask_overflow):
            # compact the active units of M' into the top-left K block —
            # WITHOUT materializing T_mat: since
            # T_mat[i, j] = sum_k Psi[i, k] s_k G[k, j] and P already
            # carries the state mask (P = onehot .* s),
            #   (P T_mat P^T)[c, d] = sum_k s_k PPsi[c][k] PG[d][k]
            # where PPsi[c] = P[c]-row-gather of Psi and PG[d] = of G —
            # both exact MXU gathers (_row_gather).  P (I) P^T =
            # diag(rowvalid), so the identity part is added back
            # explicitly (pad rows -> identity).  With mask_overflow, a
            # state denser than K (whose tail units P cannot represent)
            # gets the bad flag -> NaN lpj -> reset_lpj floor.
            P, _rowvalid = _build_P(sT, L_ref[:], K)
            iK = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
            jK = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
            eyeK = (iK == jK).astype(jnp.float32)
            PG = jnp.stack(
                [_row_gather(G_ref[:], P[d], 1) for d in range(K)],
                axis=0)  # [K, Hp, T]
            # fold the s_k mask into the Psi side once
            rows = [jnp.sum(PG * (sT * _row_gather(psi_ref[:], P[c], 0)
                                  )[None, :, :], axis=1)
                    for c in range(K)]  # each [K, T]
            Ac_ref[:] = (s2inv * jnp.stack(rows, axis=0)
                         + eyeK[:, :, None])
            ldMP, x_c, bad = _lu_logdet_solve(
                Ac_ref, _gather_vec(P, Pu), K)
            if mask_overflow:
                over = (jnp.sum(sT, axis=0) > jnp.float32(K)).astype(
                    jnp.float32)
                bad = jnp.maximum(bad, over)
            _emit(ldMP, _scatter_vec(P, x_c), bad)

        if not compact:
            _full_path()
            return

        tile_ok = _tile_all_sparse(sT, K_cap)

        @pl.when(tile_ok)
        def _():
            _compact_path(K_cap, Ac_scr, False)

        @pl.when(jnp.logical_not(tile_ok))
        def _():
            if bucketed:
                _compact_path(K_cap2, Ac2_scr, True)
            else:
                _full_path()

    return _kernel


def _make_lpj_kernel_masked(Hp: int, H: int):
    """Masked-Gram lpj kernel (incomplete data): G arrives PER DATAPOINT
    as a [Hp, Hp, tb] lane-major block (G_n = W^T diag(m_n) W — the
    reference's storage-off incomplete evaluation, sssc.py:268-318 +
    _models.py:426-431), and Ga = G_n a arrives precomputed per
    (state, datapoint) lane (XLA-side batched MXU einsum — see
    _solve_core on why it cannot be built in-kernel).  Full-Hp solves
    only (no compaction: the per-lane Gram defeats the shared-matrix MXU
    row gathers), via _solve_core — lpj = base - (ldM + ldP)/2 +
    s2inv^2/2 * u' M^-1 u, algebraically identical to the complete
    kernel's M' = Psi_s M_s LU route (ldM' = ldM + ldP,
    lam_u = M'^-1 Psi_s u = M^-1 u)."""

    def _kernel(scal_ref, ss_ref, wty_ref, y2_ref, ga_ref, G3_ref,
                psi_ref, mus_ref, pil_ref, lpj_ref, bad_ref):
        s2inv = scal_ref[0, 0]
        sT = _pad_sub(ss_ref[:].astype(jnp.float32), Hp)
        WtyT = _pad_sub(wty_ref[:], Hp)
        mus = mus_ref[:][:, 0:1]

        lam, ldM, ldP, bad, aT, GaT, uT, lam_u = _solve_core(
            sT, G3_ref[:], psi_ref[:], mus, WtyT, s2inv,
            GaT=_pad_sub(ga_ref[:], Hp))

        ynorm2 = (y2_ref[0] - 2.0 * jnp.sum(aT * WtyT, axis=0)
                  + jnp.sum(aT * GaT, axis=0))  # [T]
        base = (-0.5 * s2inv * ynorm2
                + jnp.sum(sT * pil_ref[:][:, 0:1], axis=0))
        quad2 = jnp.sum(uT * lam_u, axis=0)
        lpj = base - 0.5 * (ldM + ldP) + 0.5 * s2inv * s2inv * quad2
        # flag non-finite M solves too (complete kernel: LU pivot check)
        # via isfinite of the assembled lpj — any non-finite ldM/lam_u
        # propagates into it.  (isfinite of a sublane-reduce of
        # jnp.abs(lam_u) trips a Mosaic relayout bug on v5e, 2026-08-19:
        # "Invalid relayout: Non-singleton logical dimension is
        # replicated in destination but not in source".)
        bad = jnp.maximum(bad, 1.0 - jnp.isfinite(lpj).astype(jnp.float32))
        # NaN (not -inf) for flagged solves — see _make_lpj_kernel._emit
        lpj = jnp.where(bad > 0, jnp.float32(jnp.nan), lpj)
        lpj_ref[0, :] = lpj
        bad_ref[0, :] = bad

    return _kernel


def _prep_model(G, Psi, mus, pil_bar, H, Hp):
    pad = Hp - H
    if pad:
        G = jnp.pad(G, ((0, pad), (0, pad)))
        Psi = jnp.pad(Psi, ((0, pad), (0, pad)))
        mus = jnp.pad(mus, (0, pad))
        pil_bar = jnp.pad(pil_bar, (0, pad))
    return (G.astype(jnp.float32), Psi.astype(jnp.float32),
            mus.astype(jnp.float32).reshape(Hp, 1),
            pil_bar.astype(jnp.float32).reshape(Hp, 1))


TB = 1024  # lpj kernel: datapoints (lanes) per tile at Hp <= 32
TB_SS = 512  # suffstat kernel tile at Hp <= 32 (Schur is VMEM-hungrier)


def _tb_lpj(Hp: int) -> int:
    """Lanes per lpj tile: the [Hp, Hp, tb] f32 working set must fit the
    ~16 MB scoped-VMEM budget, so Hp = 64 quarters the tile (same
    bytes/tile as Hp = 32 at TB = 1024).  Hp > 64 drops the full-Hp path
    entirely (popcount buckets), so its working set is the [K2, Hp, tb]
    projection triple — but BOTH buckets' projection sets live on the
    Mosaic stack at once (the pl.when branches do not share their
    allocations), so the tile drops to the 128-lane VPU width: measured
    at Hp = 128/tb = 256/K2 = 32 the stack wanted 43.6 MB vs the 16 MB
    scoped limit."""
    return TB if Hp <= 32 else (256 if Hp <= 64 else 128)


def _tb_ss(Hp: int) -> int:
    """Suffstat tile: at Hp <= 64 the full-path fallback (_solve_core)
    holds several [Hp, Hp, tb] intermediates live, hence the smaller
    tiles; Hp > 64 is bucket-only (working set [K2, Hp, tb])."""
    return TB_SS if Hp <= 32 else 128


def _tb_masked(Hp: int) -> int:
    """Masked-Gram kernels' lane tile (both entry points): _solve_core
    holds several [Hp, Hp, tb] intermediates live PLUS the streamed
    per-datapoint [Hp, Hp, tb] Gram block."""
    return 256 if Hp <= 32 else 128


def _prep_gram_lanes(Gn, H, Hp):
    """Per-datapoint Gram [B, H, H] -> lane-major padded [Hp, Hp, B] f32
    (datapoints ride the lanes, matching every other kernel input)."""
    pad = Hp - H
    if pad:
        Gn = jnp.pad(Gn, ((0, 0), (0, pad), (0, pad)))
    return jnp.transpose(Gn.astype(jnp.float32), (1, 2, 0))


def _buckets(Hp: int):
    """Popcount buckets for the Hp > 64 kernels: the small bucket handles
    the common all-sparse tiles at K1^3 solve cost, the big bucket the
    rare tiles with a denser state; |s| > K2 active units (vanishingly
    improbable under sparse priors — the prior alone costs |s| * pil_bar,
    and P(|s| > 16) ~ 1e-13 for Binomial(100, 2/100) states) is flagged
    bad -> lpj floor, surfaced through StepStats counters.  Sizes are
    VMEM-bound: each bucket keeps a [K, Hp, tb] projection triple
    (P/PG/row temps) on the Mosaic stack and the branches' stacks
    coexist, so (Hp/16, Hp/8) = (8, 16) at Hp = 128 is what fits the
    16 MB scoped budget at full 128-lane tiles."""
    return Hp // 16, Hp // 8


def _resolve_k_cap(Hp: int, compact) -> int:
    """0 = no compaction.  Auto (compact=None): compact when the padded
    system is big enough for the projection build to pay for itself
    (measured at Hp=32, K_cap=8: suffstat 16.9 -> 3.2 ms, lpj 8.0 -> 2.4
    ms per epoch — see the module docstring); at Hp < 32 the full solve
    is already cheap and the build overhead dominates."""
    if compact is None:
        compact = Hp >= 32
    if not compact:
        return 0
    return max(8, Hp // 4)


@partial(jax.jit, static_argnames=("interpret",))
def _lpj_pallas_masked(ss, Wty, y2, Gn, Psi, mus, pil_bar, s2inv,
                       interpret: bool = False):
    """Masked-Gram lpj (incomplete data): Gn f32 [B, H, H] per-datapoint.
    Dispatched from sssc_lpj_pallas on G.ndim == 3; see
    _make_lpj_kernel_masked."""
    B, K, H = ss.shape
    Hp = max(8, _next_pow2(H))
    assert Hp <= 64, (
        f"masked SSSC kernels cover Hp <= 64 (got H={H}); gate with "
        "pallas_sssc_applicable(..., incomplete=True)")
    tb = _tb_masked(Hp)
    assert B % tb == 0, (B, tb)
    J = B // tb
    G_pad, Psi_, mus_, pil_ = _prep_model(
        jnp.zeros((H, H), jnp.float32), Psi, mus, pil_bar, H, Hp)
    del G_pad
    G3 = _prep_gram_lanes(Gn, H, Hp)  # [Hp, Hp, B]
    sT_all = jnp.transpose(ss if ss.dtype == jnp.int8
                           else ss.astype(jnp.int8),
                           (2, 1, 0)).reshape(H, K * B)
    WtyT = jnp.transpose(Wty.astype(jnp.float32), (1, 0))  # [H, B]
    y2r = y2.astype(jnp.float32).reshape(1, B)
    scal = jnp.asarray(s2inv, jnp.float32).reshape(1, 1)
    # Ga[b, k, i] = sum_j G_n[i, j] a[b, k, j] — one batched MXU einsum
    # on the XLA side (see _solve_core on why it cannot be in-kernel)
    a = ss.astype(jnp.float32) * mus.astype(jnp.float32)[None, None, :]
    gaT = jnp.transpose(
        jnp.einsum("bij,bkj->bki", Gn.astype(jnp.float32), a,
                   precision=jax.lax.Precision.HIGHEST),
        (2, 1, 0)).reshape(H, K * B)

    inputs = [scal, sT_all, WtyT, y2r, gaT, G3, Psi_, mus_, pil_]
    in_specs = [
        pl.BlockSpec((1, 1), lambda j, k: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((H, tb), lambda j, k: (0, k * J + j)),
        pl.BlockSpec((H, tb), lambda j, k: (0, j)),
        pl.BlockSpec((1, tb), lambda j, k: (0, j)),
        pl.BlockSpec((H, tb), lambda j, k: (0, k * J + j)),
        # per-datapoint Gram: depends on j only, so the block stays
        # resident across the whole k sweep (k is the fast grid dim)
        pl.BlockSpec((Hp, Hp, tb), lambda j, k: (0, 0, j)),
        pl.BlockSpec((Hp, Hp), lambda j, k: (0, 0)),
        pl.BlockSpec((Hp, 1), lambda j, k: (0, 0)),
        pl.BlockSpec((Hp, 1), lambda j, k: (0, 0)),
    ]
    lpj_kb, bad_kb = pl.pallas_call(
        _make_lpj_kernel_masked(Hp, H),
        out_shape=(
            jax.ShapeDtypeStruct((1, K * B), jnp.float32),
            jax.ShapeDtypeStruct((1, K * B), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(J, K),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, tb), lambda j, k: (0, k * J + j)),
                pl.BlockSpec((1, tb), lambda j, k: (0, k * J + j)),
            ),
            scratch_shapes=[],
        ),
        interpret=interpret,
    )(*inputs)
    lpj = jnp.transpose(lpj_kb.reshape(K, B), (1, 0))
    bad = jnp.transpose(bad_kb.reshape(K, B), (1, 0))
    return lpj, bad


@partial(jax.jit, static_argnames=("interpret", "compact"))
def sssc_lpj_pallas(ss, Wty, y2, G, Psi, mus, pil_bar, s2inv,
                    interpret: bool = False, compact=None):
    """lpj of candidate states for the SSSC model (complete data).

    ss: int8 0/1 [B, K, H]; Wty: f32 [B, H]; y2: f32 [B]; G: f32 [H, H]
    (shared Gram) OR [B, H, H] (per-datapoint masked Gram — incomplete
    data; the masked kernels, Hp <= 64 only, no compaction); Psi: [H, H];
    mus, pil_bar: [H]; s2inv scalar.
    Returns (lpj f32 [B, K], bad f32 [B, K]); bad flags states whose
    Psi_s solve was non-finite (reference sssc.py:279-283 pinv-fallback
    counter).  Requires B to divide into lane tiles (_tb_lpj: 1024 at
    Hp <= 32, 256 at Hp <= 64, 128 above; the suffstat kernel's _tb_ss
    is 512/128; masked kernels use _tb_masked 256/128 — gate with
    pallas_sssc_applicable, which checks all).
    compact: None = auto (active-set compaction when Hp >= 32, with the
    exact full-Hp fallback per tile); True/False forces it on/off.
    Hp > 64 is bucket-only compaction (see _buckets); compact=False is
    unsupported there (there is no full-Hp path at that width).
    """
    B, K, H = ss.shape
    Hp = max(8, _next_pow2(H))
    if G.ndim == 3:
        return _lpj_pallas_masked(ss, Wty, y2, G, Psi, mus, pil_bar,
                                  s2inv, interpret=interpret)
    bucketed = Hp > 64
    if bucketed and compact is False:
        raise ValueError(
            f"compact=False is unsupported at H={H} (Hp={Hp} > 64): the "
            "bucketed kernels have no full-Hp solve path")
    K_cap, K_cap2 = _buckets(Hp) if bucketed \
        else (_resolve_k_cap(Hp, compact), 0)
    tb = _tb_lpj(Hp)
    assert B % tb == 0, (B, tb)
    J = B // tb
    G_, Psi_, mus_, pil_ = _prep_model(G, Psi, mus, pil_bar, H, Hp)
    # k-major lane layout: column t = k*B + b
    sT_all = jnp.transpose(ss if ss.dtype == jnp.int8
                           else ss.astype(jnp.int8),
                           (2, 1, 0)).reshape(H, K * B)
    WtyT = jnp.transpose(Wty.astype(jnp.float32), (1, 0))  # [H, B]
    y2r = y2.astype(jnp.float32).reshape(1, B)
    scal = jnp.asarray(s2inv, jnp.float32).reshape(1, 1)

    inputs = [scal, sT_all, WtyT, y2r, G_, Psi_, mus_, pil_]
    in_specs = [
        pl.BlockSpec((1, 1), lambda j, k: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((H, tb), lambda j, k: (0, k * J + j)),
        pl.BlockSpec((H, tb), lambda j, k: (0, j)),
        pl.BlockSpec((1, tb), lambda j, k: (0, j)),
        pl.BlockSpec((Hp, Hp), lambda j, k: (0, 0)),
        pl.BlockSpec((Hp, Hp), lambda j, k: (0, 0)),
        pl.BlockSpec((Hp, 1), lambda j, k: (0, 0)),
        pl.BlockSpec((Hp, 1), lambda j, k: (0, 0)),
    ]
    scratch = []
    if not bucketed:
        # Q[(i,j), k] = Psi[i,k] G[k,j]: hoists the per-state Psi_s G_ss
        # product onto one MXU matmul against the state bits (full path)
        Q = (Psi_[:, None, :] * jnp.transpose(G_)[None, :, :]).reshape(
            Hp * Hp, Hp)
        inputs.insert(5, Q)
        in_specs.insert(5, pl.BlockSpec((Hp * Hp, Hp), lambda j, k: (0, 0)))
        scratch.append(pltpu.VMEM((Hp, Hp, tb), jnp.float32))
    if K_cap:
        # strictly-lower-triangular ones for the prefix-popcount matmul
        inputs.append(jnp.tril(jnp.ones((Hp, Hp), jnp.float32), k=-1))
        in_specs.append(pl.BlockSpec((Hp, Hp), lambda j, k: (0, 0)))
        scratch.append(pltpu.VMEM((K_cap, K_cap, tb), jnp.float32))
    if K_cap2:
        scratch.append(pltpu.VMEM((K_cap2, K_cap2, tb), jnp.float32))

    lpj_kb, bad_kb = pl.pallas_call(
        _make_lpj_kernel(Hp, H, K_cap, K_cap2),
        out_shape=(
            jax.ShapeDtypeStruct((1, K * B), jnp.float32),
            jax.ShapeDtypeStruct((1, K * B), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(J, K),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, tb), lambda j, k: (0, k * J + j)),
                pl.BlockSpec((1, tb), lambda j, k: (0, k * J + j)),
            ),
            scratch_shapes=scratch,
        ),
        interpret=interpret,
    )(*inputs)
    lpj = jnp.transpose(lpj_kb.reshape(K, B), (1, 0))
    bad = jnp.transpose(bad_kb.reshape(K, B), (1, 0))
    return lpj, bad


def _make_suffstat_kernel(Hp: int, H: int, S: int, K_cap: int = 0,
                          K_cap2: int = 0, masked: bool = False):
    """Modes as in _make_lpj_kernel: full-only / compact-with-fallback /
    popcount buckets without the full-Hp path (K_cap2 > 0, Hp > 64).  In
    bucket mode, states denser than K_cap2 contribute ZERO kappa and are
    excluded from the lambda scatter — consistent with their lpj having
    been floored at evaluation time (their responsibility is ~0; the lpj
    kernel NaN-flags them).  masked=True (non-compact only): G arrives
    per datapoint as [Hp, Hp, tb] plus a precomputed GaT [H, tb] lane
    (see _make_lpj_kernel_masked on why GaT cannot be built in-kernel)."""
    bucketed = K_cap2 > 0
    compact = K_cap > 0
    assert not (masked and compact)

    def _kernel(*refs):
        ga_ref = None
        if compact:
            (scal_ref, ss_ref, rs_ref, wty_ref, G_ref, psi_ref, mus_ref,
             L_ref, xpt_sz_ref, xpt_s_ref, xpt_ss_ref, xpt_szsz_ref,
             s_sz_ref, sz_sz_ref, kap_scr, lamr_scr) = refs
        elif masked:
            (scal_ref, ss_ref, rs_ref, wty_ref, ga_ref, G_ref, psi_ref,
             mus_ref, xpt_sz_ref, xpt_s_ref, xpt_ss_ref, xpt_szsz_ref,
             s_sz_ref, sz_sz_ref) = refs
        else:
            (scal_ref, ss_ref, rs_ref, wty_ref, G_ref, psi_ref, mus_ref,
             xpt_sz_ref, xpt_s_ref, xpt_ss_ref, xpt_szsz_ref,
             s_sz_ref, sz_sz_ref) = refs
        s2inv = scal_ref[0, 0]
        k = pl.program_id(1)
        sT = _pad_sub(ss_ref[:].astype(jnp.float32), Hp)
        WtyT = _pad_sub(wty_ref[:], Hp)
        mus = mus_ref[:][:, 0:1]
        rT = rs_ref[0:1, :]  # [1, T] — responsibilities of slot k

        if compact:
            # shared prologue; the branches differ only in the solve.
            # Results land in scratch (pl.when regions cannot return
            # values): kappaT [Hp, T] and the r-weighted lam reduction
            # lam_r [Hp, Hp] — the ONLY way lam enters the statistics.
            aT = sT * mus
            GaT = jax.lax.dot_general(
                G_ref[:], aT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            uT = sT * (WtyT - GaT)
            tile_ok = _tile_all_sparse(sT, K_cap)

            def _compact_ss_path(K, mask_overflow):
                P, rowvalid = _build_P(sT, L_ref[:], K)
                Psi_c = (_compact_shared(P, psi_ref[:])
                         + _eye3(K, rowvalid))
                Pinv_c, _ldP = _pd_inv_logdet(Psi_c)
                G_c = _compact_shared(P, G_ref[:])
                M_c = s2inv * G_c + Pinv_c  # pad rows: identity from Pinv_c
                lam_c, _ldM = _pd_inv_logdet(M_c)
                u_c = _gather_vec(P, uT)
                lam_u = _scatter_vec(
                    P, jnp.sum(lam_c * u_c[None, :, :], axis=1))
                kT = s2inv * lam_u + aT
                rT_eff = rT
                if mask_overflow:
                    ok = (jnp.sum(sT, axis=0) <= jnp.float32(K)).astype(
                        jnp.float32)  # [T]
                    kT = kT * ok[None, :]
                    rT_eff = rT * ok[None, :]
                # sanitize non-finite solves (responsibility ~0 after lpj
                # reset, but 0 * nan would poison the sums) — mirrors the
                # XLA path's nan_to_num (models/sssc.py)
                kap_scr[:] = jnp.where(jnp.isfinite(kT), kT, 0.0)
                lam_c = jnp.where(jnp.isfinite(lam_c), lam_c, 0.0)
                # r-weighted scatter off the active blocks, [Hp, Hp, T]
                # never materialized
                lamr_scr[:] = _scatter_weighted(P, lam_c, rT_eff)

            @pl.when(tile_ok)
            def _():
                _compact_ss_path(K_cap, False)

            @pl.when(jnp.logical_not(tile_ok))
            def _():
                if bucketed:
                    _compact_ss_path(K_cap2, True)
                else:
                    lam, _, _, _, aT2, _, _, lam_u = _solve_core(
                        sT, G_ref[:], psi_ref[:], mus, WtyT, s2inv)
                    kT = s2inv * lam_u + aT2
                    kap_scr[:] = jnp.where(jnp.isfinite(kT), kT, 0.0)
                    lam = jnp.where(jnp.isfinite(lam), lam, 0.0)
                    lamm = lam * sT[:, None, :] * sT[None, :, :]
                    lamr_scr[:] = jnp.sum(lamm * rT[None], axis=2)

            kappaT = kap_scr[:]
            lam_r = lamr_scr[:]
        else:
            lam, _, _, _, aT, _, _, lam_u = _solve_core(
                sT, G_ref[:], psi_ref[:], mus, WtyT, s2inv,
                GaT=None if ga_ref is None
                else _pad_sub(ga_ref[:], Hp))
            kappaT = s2inv * lam_u + aT  # [Hp, T]
            # sanitize non-finite solves (see note above)
            kappaT = jnp.where(jnp.isfinite(kappaT), kappaT, 0.0)
            lam = jnp.where(jnp.isfinite(lam), lam, 0.0)
            lamm = lam * sT[:, None, :] * sT[None, :, :]  # active-block mask
            lam_r = jnp.sum(lamm * rT[None], axis=2)

        w_kappa = kappaT * rT
        w_s = sT * rT

        # per-datapoint sums: datapoints ARE lanes; accumulate over the
        # candidate slots k (fast grid dim; the output block for this j
        # stays resident across the k sweep)
        @pl.when(k == 0)
        def _():
            xpt_sz_ref[:] = w_kappa[:H]
            xpt_s_ref[:] = w_s[:H]

        @pl.when(k != 0)
        def _():
            xpt_sz_ref[:] = xpt_sz_ref[:] + w_kappa[:H]
            xpt_s_ref[:] = xpt_s_ref[:] + w_s[:H]

        # [H, H] accumulators over the whole grid (constant index_map)
        xpt_ss_c = jax.lax.dot_general(
            w_s, sT, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        xpt_szsz_c = (lam_r
                      + jax.lax.dot_general(
                          w_kappa, kappaT, (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))
        first = jnp.logical_and(pl.program_id(0) == 0, k == 0)

        @pl.when(first)
        def _():
            xpt_ss_ref[:] = xpt_ss_c[:H, :H]
            xpt_szsz_ref[:] = xpt_szsz_c[:H, :H]
            s_sz_ref[:] = jnp.zeros_like(s_sz_ref)
            sz_sz_ref[:] = jnp.zeros_like(sz_sz_ref)

        @pl.when(jnp.logical_not(first))
        def _():
            xpt_ss_ref[:] = xpt_ss_ref[:] + xpt_ss_c[:H, :H]
            xpt_szsz_ref[:] = xpt_szsz_ref[:] + xpt_szsz_c[:H, :H]

        # the outer-product statistics need the COMPLETED per-datapoint
        # sums — contract them on the last k slot, when xpt_*_ref hold the
        # full sums for this datapoint block
        @pl.when(k == S - 1)
        def _():
            xs = _pad_sub(xpt_s_ref[:], Hp)
            xz = _pad_sub(xpt_sz_ref[:], Hp)
            s_sz_c = jax.lax.dot_general(
                xs, xz, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
            sz_sz_c = jax.lax.dot_general(
                xz, xz, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
            s_sz_ref[:] = s_sz_ref[:] + s_sz_c[:H, :H]
            sz_sz_ref[:] = sz_sz_ref[:] + sz_sz_c[:H, :H]

    return _kernel


@partial(jax.jit, static_argnames=("interpret",))
def _suffstat_pallas_masked(ss, rs, Wty, Gn, Psi, mus, s2inv,
                            interpret: bool = False):
    """Masked-Gram sufficient statistics (incomplete data): Gn f32
    [B, H, H].  The non-compact kernel body is reused unchanged — its
    _solve_core is pointwise in the lane axis, so the per-datapoint Gram
    block simply rides in as [Hp, Hp, tb] (see _solve_core)."""
    B, S, H = ss.shape
    Hp = max(8, _next_pow2(H))
    assert Hp <= 64, (
        f"masked SSSC kernels cover Hp <= 64 (got H={H}); gate with "
        "pallas_sssc_applicable(..., incomplete=True)")
    tb = _tb_masked(Hp)
    assert B % tb == 0, (B, tb)
    J = B // tb
    _G0, Psi_, mus_, _pil = _prep_model(
        jnp.zeros((H, H), jnp.float32), Psi, mus, jnp.zeros_like(mus),
        H, Hp)
    del _G0
    G3 = _prep_gram_lanes(Gn, H, Hp)
    sT_all = jnp.transpose(ss if ss.dtype == jnp.int8
                           else ss.astype(jnp.int8),
                           (2, 1, 0)).reshape(H, S * B)
    rsT = jnp.transpose(rs.astype(jnp.float32), (1, 0)).reshape(1, S * B)
    WtyT = jnp.transpose(Wty.astype(jnp.float32), (1, 0))
    scal = jnp.asarray(s2inv, jnp.float32).reshape(1, 1)
    # precomputed Ga lanes, as in _lpj_pallas_masked
    a = ss.astype(jnp.float32) * mus.astype(jnp.float32)[None, None, :]
    gaT = jnp.transpose(
        jnp.einsum("bij,bkj->bki", Gn.astype(jnp.float32), a,
                   precision=jax.lax.Precision.HIGHEST),
        (2, 1, 0)).reshape(H, S * B)

    inputs = [scal, sT_all, rsT, WtyT, gaT, G3, Psi_, mus_]
    in_specs = [
        pl.BlockSpec((1, 1), lambda j, k: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((H, tb), lambda j, k: (0, k * J + j)),
        pl.BlockSpec((1, tb), lambda j, k: (0, k * J + j)),
        pl.BlockSpec((H, tb), lambda j, k: (0, j)),
        pl.BlockSpec((H, tb), lambda j, k: (0, k * J + j)),
        pl.BlockSpec((Hp, Hp, tb), lambda j, k: (0, 0, j)),
        pl.BlockSpec((Hp, Hp), lambda j, k: (0, 0)),
        pl.BlockSpec((Hp, 1), lambda j, k: (0, 0)),
    ]
    out = pl.pallas_call(
        _make_suffstat_kernel(Hp, H, S, 0, 0, masked=True),
        out_shape=(
            jax.ShapeDtypeStruct((H, B), jnp.float32),
            jax.ShapeDtypeStruct((H, B), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(J, S),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((H, tb), lambda j, k: (0, j)),
                pl.BlockSpec((H, tb), lambda j, k: (0, j)),
                pl.BlockSpec((H, H), lambda j, k: (0, 0)),
                pl.BlockSpec((H, H), lambda j, k: (0, 0)),
                pl.BlockSpec((H, H), lambda j, k: (0, 0)),
                pl.BlockSpec((H, H), lambda j, k: (0, 0)),
            ),
            scratch_shapes=[],
        ),
        interpret=interpret,
    )(*inputs)
    xpt_szT, xpt_sT, xpt_ss, xpt_szsz, s_sz, sz_sz = out
    return (jnp.transpose(xpt_szT, (1, 0)), jnp.transpose(xpt_sT, (1, 0)),
            xpt_ss, xpt_szsz, s_sz, sz_sz)


@partial(jax.jit, static_argnames=("interpret", "compact"))
def sssc_suffstat_pallas(ss, rs, Wty, G, Psi, mus, s2inv,
                         interpret: bool = False, compact=None):
    """Posterior sufficient statistics for the merged K^(n) state sets,
    re-solving the slab quantities in VMEM (the reference reuses a
    memoization dict instead, sssc.py:568-570 — on TPU recompute is
    compute-bound while reuse costs a [B*K_all, H, H] HBM stash).

    ss: int8 [B, S, H] merged states; rs: f32 [B, S] responsibilities
    (already masked by row validity); Wty/G/Psi/mus/s2inv as in
    sssc_lpj_pallas (complete data); compact as there.  Returns
    (xpt_sz [B, H], xpt_s [B, H], xpt_ss [H, H], xpt_szsz [H, H],
    s_sz_outer [H, H], sz_sz_outer [H, H]) — the [H, H] outputs already
    summed over the batch.  G may be [B, H, H] (per-datapoint masked
    Gram, incomplete data): dispatches to the masked kernels (Hp <= 64,
    no compaction)."""
    B, S, H = ss.shape
    Hp = max(8, _next_pow2(H))
    if G.ndim == 3:
        return _suffstat_pallas_masked(ss, rs, Wty, G, Psi, mus, s2inv,
                                       interpret=interpret)
    bucketed = Hp > 64
    if bucketed and compact is False:
        raise ValueError(
            f"compact=False is unsupported at H={H} (Hp={Hp} > 64): the "
            "bucketed kernels have no full-Hp solve path")
    K_cap, K_cap2 = _buckets(Hp) if bucketed \
        else (_resolve_k_cap(Hp, compact), 0)
    tb = _tb_ss(Hp)
    assert B % tb == 0, (B, tb)
    J = B // tb
    G_, Psi_, mus_, _pil = _prep_model(G, Psi, mus, jnp.zeros_like(mus),
                                       H, Hp)
    sT_all = jnp.transpose(ss if ss.dtype == jnp.int8
                           else ss.astype(jnp.int8),
                           (2, 1, 0)).reshape(H, S * B)
    rsT = jnp.transpose(rs.astype(jnp.float32), (1, 0)).reshape(1, S * B)
    WtyT = jnp.transpose(Wty.astype(jnp.float32), (1, 0))
    scal = jnp.asarray(s2inv, jnp.float32).reshape(1, 1)

    inputs = [scal, sT_all, rsT, WtyT, G_, Psi_, mus_]
    in_specs = [
        pl.BlockSpec((1, 1), lambda j, k: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((H, tb), lambda j, k: (0, k * J + j)),
        pl.BlockSpec((1, tb), lambda j, k: (0, k * J + j)),
        pl.BlockSpec((H, tb), lambda j, k: (0, j)),
        pl.BlockSpec((Hp, Hp), lambda j, k: (0, 0)),
        pl.BlockSpec((Hp, Hp), lambda j, k: (0, 0)),
        pl.BlockSpec((Hp, 1), lambda j, k: (0, 0)),
    ]
    scratch = []
    if K_cap:
        inputs.append(jnp.tril(jnp.ones((Hp, Hp), jnp.float32), k=-1))
        in_specs.append(pl.BlockSpec((Hp, Hp), lambda j, k: (0, 0)))
        scratch = [pltpu.VMEM((Hp, tb), jnp.float32),  # kappaT
                   pltpu.VMEM((Hp, Hp), jnp.float32)]  # lam_r

    out = pl.pallas_call(
        _make_suffstat_kernel(Hp, H, S, K_cap, K_cap2),
        out_shape=(
            jax.ShapeDtypeStruct((H, B), jnp.float32),
            jax.ShapeDtypeStruct((H, B), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(J, S),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((H, tb), lambda j, k: (0, j)),
                pl.BlockSpec((H, tb), lambda j, k: (0, j)),
                pl.BlockSpec((H, H), lambda j, k: (0, 0)),
                pl.BlockSpec((H, H), lambda j, k: (0, 0)),
                pl.BlockSpec((H, H), lambda j, k: (0, 0)),
                pl.BlockSpec((H, H), lambda j, k: (0, 0)),
            ),
            scratch_shapes=scratch,
        ),
        interpret=interpret,
    )(*inputs)
    xpt_szT, xpt_sT, xpt_ss, xpt_szsz, s_sz, sz_sz = out
    return (jnp.transpose(xpt_szT, (1, 0)), jnp.transpose(xpt_sT, (1, 0)),
            xpt_ss, xpt_szsz, s_sz, sz_sz)


def pallas_sssc_applicable(B: int, K: int, H: int,
                           incomplete: bool = False) -> bool:
    """Kernel envelope: TPU, lane-tileable batch, pow2-padded H <= 128.
    At Hp <= 64 the per-Hp tile sizes (_tb_lpj/_tb_ss) keep the
    full-path [Hp, Hp, tb] f32 working set constant; at Hp in (64, 128]
    the kernels are popcount-bucketed with NO full-Hp path (see
    _buckets) — dropping the [Hp, Hp, tb] scratch and [Hp*Hp, Hp] Q
    input is what keeps full-width lane tiles, the round-3 VERDICT's
    prescribed design.  Beyond Hp = 128 even the bucket working set
    ([K2, Hp, tb] triple at K2 = Hp/8) outgrows VMEM.

    incomplete=True gates the MASKED-Gram kernels (per-datapoint
    G_n [B, H, H] streamed per tile): Hp <= 64 only, _tb_masked tiles,
    full-Hp solves without compaction."""
    if jax.default_backend() not in ("tpu",):
        return False
    Hp = max(8, _next_pow2(H))
    if incomplete:
        return Hp <= 64 and B % _tb_masked(Hp) == 0 and K >= 1
    return (Hp <= 128 and B % _tb_lpj(Hp) == 0 and B % _tb_ss(Hp) == 0
            and K >= 1)
