"""Spike-and-Slab Sparse Coding with evolutionary E-steps (ES3C), TPU-native.

Generative model (reference: evo/models/sssc.py):
    s_h ~ Bernoulli(pies_h),  z ~ N(mus, Psi),  y = W (s .* z) + N(0, sigma2 I)

The continuous slab is marginalized in closed form per binary state s
(Sheikh et al. 2014 JMLR eqs.; reference sssc.py:276-322):

    M_s     = sigma2^-1 W_s^T W_s + Psi_s^-1          (|s| x |s|)
    lambda_s = M_s^-1
    C_det   = log det M_s + log det Psi_s
    y~      = (y - W_s mus_s)[x_infr]
    lpj(s)  = -1/2 (C_det + sigma2^-1 ||y~||^2
                    - sigma2^-2 u^T lambda_s u) + sum_h s_h log(pies_h/(1-pies_h))
    with u  = W_s^T y~

TPU design — identity padding instead of |s|-sized submatrices and instead of
the reference's per-state-id memoization dict (sssc.py:268-318):

    Psi~ = Psi .* (s s^T) + diag(1 - s)       (PD iff Psi_s is)
    M~   = sigma2^-1 (s s^T) .* G_n + Psi~^-1 (block-diag: [M_s, I])

so every per-state quantity is a fixed-shape H x H inverse / slogdet, batched
with vmap over [N, S] — recompute on the MXU beats hashing on TPU, and the
masked Gram G_n = W^T diag(m_n) W from models.base.block_gram removes all
per-state D-dimensional work (the reference rebuilds C_inv as a D_obs x D_obs
matrix per state, sssc.py:307-309!).

Like the reference (sssc.py:408-813), the epoch is one fused pass: E-step,
sufficient statistics <s>, <ss'>, <sz>, <szsz'>, optional reconstruction and
M-step all stream through a single lax.scan over row-blocks.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from evo_tpu.models.base import Data, StepStats, block_gram
from evo_tpu.ops.bitpack import pack_bits_lane, unpack_bits_lane
from evo_tpu.ops.pallas_sssc import (
    pallas_sssc_applicable,
    sssc_lpj_pallas,
    sssc_suffstat_pallas,
)
from evo_tpu.ops.numerics import posterior_weights, reset_lpj, shifted_logsumexp, free_energy_from_lpj
from evo_tpu.variational.config import EAConfig
from evo_tpu.variational.evolve import evolve_states_block
from evo_tpu.variational.state_init import EState, full_state_matrix
from evo_tpu.variational.varykn import vary_Kn, vary_Kn_swap, vary_Kn_whole_set

PARAM_TOL = 1e-5  # reference noise_policy bounds (sssc.py:40,51-58)
EPS_W = 5e-5
EPS_PIES = 5e-5
EPS_PSI = 1e-5
EPS_SIGMA2 = 1e-5

# XLA-path sufficient-statistics strategy: by default the candidate
# solves are STASHED ([B, K_all, H, H] kappa/lambda through HBM) and the
# merged set's statistics gathered from the stash; the merged set is
# RE-SOLVED instead (a scan over slots that never materializes more than
# one [B, H, H] lambda block) only when the stash would not fit —
# H > STASH_MAX_H or stash bytes > STASH_MAX_BYTES.  MEASURED both ways
# at H=100 N=2048 (tools/measure_h100_envelope.py, 2026-08-19): stash
# 2346.5 ms/epoch vs resolve 2590.6 on the v5e (1.10x), stash 20.1 s vs
# resolve 27.6 on CPU at H=72 (1.37x) — the stash's ~2 GB HBM round trip
# costs less than the S extra solves at every measured size, so resolve
# is reserved for stashes that genuinely cannot fit.  Tests monkeypatch
# STASH_MAX_H to force either path.
STASH_MAX_H = 128
STASH_MAX_BYTES = 4 << 30  # [B, K_all, H, H+1] f32 kappa+lambda stash cap


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SSSCParams:
    W: jnp.ndarray  # [D, H]
    pies: jnp.ndarray  # [H]
    mus: jnp.ndarray  # [H]
    Psi: jnp.ndarray  # [H, H]
    sigma2: jnp.ndarray  # scalar


@dataclasses.dataclass(frozen=True)
class SSSC:
    """Static model configuration; all methods are pure functions."""

    D: int
    H: int
    to_learn: Tuple[str, ...] = ("W", "pies", "mus", "sigma2", "Psi")
    # "auto": use the fused Pallas slab-solve kernels when profitable
    # (TPU, f32, complete data, tileable shapes, H <= 128); "xla" |
    # "pallas".  The kernels compact each state's active units into a
    # K_cap block (the reference's |s|^3 insight, sssc.py:268-318) with
    # an exact full-H fallback per tile at Hp <= 64, and popcount
    # BUCKETS (Hp/16 then Hp/8, no full-Hp path) at Hp in (64, 128];
    # "pallas_full" forces the kernels WITHOUT compaction (A/B
    # measurement, debugging; unavailable at Hp > 64).
    lpj_kernel: str = "auto"

    # ------------------------------------------------------------------ init

    def standard_init(self, data: Data, seed: int = 0, W_init=None,
                      sigma_init=None, y_host=None) -> SSSCParams:
        """Random-uniform pies, standard-normal mus, identity Psi, data-mean
        noisy W, data-variance sigma2 (reference sssc.py:104-197).  Pass
        y_host ([N, D] host copy, pre-padding; in multi-process runs, this
        process's LOCAL rows) to avoid a device->host readback.

        Multi-process: statistics come from GLOBAL sums so every process
        derives the identical Theta^0 (the reference's allmean + bcast
        contract, sssc.py:122-195)."""
        if jax.process_count() > 1:
            from evo_tpu.parallel.distributed import global_init_stats

            N, y_mean, ss_resid, m_sum = global_init_stats(
                data, y_host, self.D)
            if sigma_init is None:
                if data.incomplete:
                    sigma2 = ss_resid / m_sum + 0.001
                else:
                    # reference complete-data form: mean(diag(cov(y.T)))
                    # with np.cov's ddof=1 normalization (sssc.py:150-160)
                    sigma2 = ss_resid / (N - 1.0) / self.D + 0.001
            else:
                sigma2 = sigma_init
            return self._finish_init(data, y_mean, sigma2, W_init, seed)
        if y_host is not None:
            # fully host-side — masks from the NaN markers; no device
            # readback (see the note in BSC.standard_init)
            y_raw = np.asarray(y_host).reshape(-1, self.D)
            m = ~np.isnan(y_raw)
            y = np.where(m, y_raw, 0.0)
        else:
            y = np.asarray(data.y).reshape(-1, self.D)
            m = np.asarray(data.x_infr).reshape(-1, self.D)
            valid = np.asarray(data.row_valid).reshape(-1)
            y, m = y[valid], m[valid]
        N = y.shape[0]

        if data.incomplete:
            y_mean = (y * m).sum(0) / N  # ref normalizes by N (sssc.py:152)
        else:
            y_mean = y.mean(0)

        if sigma_init is None:
            if data.incomplete:
                sigma2 = (((y - y_mean) * m) ** 2).sum() / m.sum() + 0.001
            else:
                # mean per-dimension variance (== np.diag(np.cov(y.T)).mean()
                # without materializing the D x D covariance matrix)
                sigma2 = float(np.var(y, axis=0, ddof=1).mean()) + 0.001
        else:
            sigma2 = sigma_init
        return self._finish_init(data, y_mean, sigma2, W_init, seed)

    def _finish_init(self, data, y_mean, sigma2, W_init, seed):
        """Shared tail of standard_init; the rng consumption order (pies,
        mus, W) matches the reference so seeded draws are identical on
        every process."""
        rng = np.random.default_rng(seed)

        pies = rng.uniform(0.1, 0.5, self.H)
        mus = rng.normal(0, 1, self.H) if "mus" in self.to_learn else np.ones(self.H)
        Psi = np.eye(self.H)

        if isinstance(W_init, str) or W_init is None:
            if W_init == "random_uniform":
                W = rng.random((self.D, self.H))
            elif W_init == "normal":
                W = rng.normal(0, 5, (self.D, self.H))
            else:
                W = y_mean[:, None] + rng.normal(
                    scale=np.sqrt(sigma2) / 4.0, size=(self.D, self.H)
                )
        else:  # explicit weights: accept anything array-like (np or jax)
            W = np.asarray(W_init)

        dt = data.y.dtype
        return SSSCParams(
            W=jnp.asarray(W, dt),
            pies=jnp.asarray(pies, dt),
            mus=jnp.asarray(mus, dt),
            Psi=jnp.asarray(Psi, dt),
            sigma2=jnp.asarray(sigma2, dt),
        )

    # ----------------------------------------------------------- check/clamp

    def check_params(self, p: SSSCParams) -> SSSCParams:
        """Reference noise policy (sssc.py:51-58): pies in [tol, 1-tol],
        sigma2 >= tol, Psi diagonal >= tol, W and mus unbounded.

        Deviation: Psi is symmetrized.  The reference's element-wise Psi
        update (sssc.py:738) produces an asymmetric matrix that it feeds to
        a general LU inverse; Psi is a covariance, and our batched PD solver
        requires (and the model semantics imply) symmetry."""
        Psi_sym = 0.5 * (p.Psi + p.Psi.T)
        diag = jnp.diag(Psi_sym)
        Psi = Psi_sym + jnp.diag(jnp.maximum(diag, PARAM_TOL) - diag)
        return SSSCParams(
            W=p.W,
            pies=jnp.clip(p.pies, PARAM_TOL, 1.0 - PARAM_TOL),
            mus=p.mus,
            Psi=Psi,
            sigma2=jnp.clip(p.sigma2, PARAM_TOL, None),
        )

    # ------------------------------------------------------------ generation

    def generate_from_hidden(self, key, params: SSSCParams, s) -> dict:
        """y = W (s .* z) + sqrt(sigma2) eps with z ~ N(mus, Psi)
        (reference sssc.py:66-102).  The reference samples the active-subset
        marginal N(mus_s, Psi_s); sampling the full z and masking is the same
        distribution (multivariate-normal marginalization)."""
        k1, k2 = jax.random.split(key)
        N = s.shape[0]
        L = jnp.linalg.cholesky(params.Psi)
        z = params.mus + jax.random.normal(k1, (N, self.H), params.W.dtype) @ L.T
        sz = s.astype(params.W.dtype) * z
        y_mean = sz @ params.W.T
        y = y_mean + jnp.sqrt(params.sigma2) * jax.random.normal(
            k2, y_mean.shape, params.W.dtype
        )
        return {"y": y, "s": s, "z": z, "y_mean": y_mean}

    def generate_data(self, key, params: SSSCParams, N: int) -> dict:
        k1, k2 = jax.random.split(key)
        p = jax.random.uniform(k1, (N, self.H))
        s = p <= params.pies
        return self.generate_from_hidden(k2, params, s)

    # ------------------------------------------------------------ precompute

    def _precompute(self, p: SSSCParams, data: Data):
        """State-independent terms (reference sssc.py:329-366)."""
        dt = p.W.dtype
        valid = data.row_valid
        N = jnp.sum(valid.astype(dt))
        sigma2_inv = 1.0 / p.sigma2
        pil_bar = jnp.log(p.pies / (1.0 - p.pies))
        piH = jnp.sum(p.pies)
        log1mp = jnp.sum(jnp.log(1.0 - p.pies))
        if data.incomplete:
            sum_d = jnp.sum(data.x_infr.astype(dt) * valid[..., None].astype(dt))
            ljc = log1mp + (-jnp.log(2 * jnp.pi) - jnp.log(p.sigma2)) * sum_d / N / 2
        else:
            sum_d = N * self.D
            ljc = (
                log1mp
                - self.D / 2 * jnp.log(2 * jnp.pi)
                - 0.5 * self.D * jnp.log(p.sigma2)
            )
        return dict(
            sigma2_inv=sigma2_inv, pil_bar=pil_bar, piH=piH, ljc=ljc, N=N,
            sum_d=sum_d,
        )

    # ------------------------------------------- per-state padded linear algebra

    @staticmethod
    def _state_solve(sf, G_n, Psi, mus, sigma2_inv):
        """All slab-marginalization quantities for ONE state (vmap over
        states and datapoints).  sf: float [H] 0/1 state indicator.

        Returns (logdetM, logdetP, lam, Pinv_bad) where lam is lambda_s
        identity-padded [H, H]."""
        from evo_tpu.ops.linalg import pd_inverse_logdet

        ssT = jnp.outer(sf, sf)
        off = jnp.diag(1.0 - sf)
        Ppad = Psi * ssT + off
        Pinv, logdetP = pd_inverse_logdet(Ppad)
        M = sigma2_inv * (G_n * ssT) + Pinv
        lam, logdetM = pd_inverse_logdet(M)
        bad = jnp.logical_not(jnp.isfinite(Pinv).all())
        return logdetM, logdetP, lam, bad

    @staticmethod
    def _lpj_states(states, G_n, Wty_n, y2_n, Psi, mus, sigma2_inv, pil_bar):
        """lpj of states [K, H] for one datapoint, plus the posterior slab
        quantities that fall out of the same solves: kappa~ (zero-padded
        posterior slab means, reference sssc.py:574-575) and lambda~ masked
        to the active block.  Returning them here lets the EM step reuse the
        candidate-evaluation solves for the sufficient statistics instead of
        re-solving for the merged K^(n) (the reference reuses its storage
        dict the same way, sssc.py:568-570)."""
        dt = Wty_n.dtype
        sf = states.astype(dt)  # [K, H]
        with jax.default_matmul_precision("high"):
            a = sf * mus  # [K, H]
            Ga = a @ G_n.T if G_n.ndim == 2 else jnp.einsum("kh,hj->kj", a, G_n)
            # u = s .* (W^T m y~) = s .* (Wty - G a)
            u = sf * (Wty_n - Ga)  # [K, H]
            ynorm2 = y2_n - 2.0 * jnp.sum(a * Wty_n, -1) + jnp.sum(a * Ga, -1)

            logdetM, logdetP, lam, bad = jax.vmap(
                SSSC._state_solve, in_axes=(0, None, None, None, None)
            )(sf, G_n, Psi, mus, sigma2_inv)

            lam_u = jnp.einsum("khj,kj->kh", lam, u)  # [K, H]
            quad2 = jnp.sum(u * lam_u, axis=-1)
        lpj = -0.5 * (
            logdetM + logdetP + sigma2_inv * ynorm2 - sigma2_inv**2 * quad2
        ) + sf @ pil_bar
        # route flagged solves to NaN so reset_lpj floors them: a singular
        # Ppad can reach this point as lpj = +-inf (logdet -inf), and the
        # +-inf reset rule maps to B_max — the DOMINANT lpj (same hazard
        # the Pallas kernel's sentinel had; see ops/pallas_sssc.py)
        lpj = jnp.where(bad, jnp.asarray(jnp.nan, lpj.dtype), lpj)
        kappa = sigma2_inv * lam_u + a  # [K, H], zero on inactive units
        lam_masked = lam * sf[:, :, None] * sf[:, None, :]
        # a non-PD Psi (possible under the reference's Psi-update heuristic)
        # yields non-finite solves; such states get lpj -> floor via
        # reset_lpj (zero posterior weight), but 0 * nan would still poison
        # the expectation sums — sanitize (the reference's pinv fallback
        # plays the same role, sssc.py:279-283)
        kappa = jnp.nan_to_num(kappa, nan=0.0, posinf=0.0, neginf=0.0)
        lam_masked = jnp.nan_to_num(lam_masked, nan=0.0, posinf=0.0, neginf=0.0)
        return lpj, jnp.sum(bad), kappa, lam_masked

    # ---------------------------------------------------------------- epoch

    @partial(jax.jit, static_argnames=("self", "cfg", "do_reconstruction"))
    def em_step(
        self,
        params: SSSCParams,
        estate: EState,
        data: Data,
        key,
        cfg: EAConfig,
        do_reconstruction: bool = False,
    ):
        """One fused EM epoch (reference SSSC.EM_step, sssc.py:420-813):
        E-step + expectations + optional reconstruction + M-step in a single
        jitted scan.  Returns (new_params, new_estate, stats, y_rec|None).

        The sigma2 update's y2sum runs over x_infr entries of the ORIGINAL
        y — which is exactly what the reference does too (its my_y_inner at
        sssc.py:752 reads my_data["y"], assigned at sssc.py:456; only the
        Wp accumulator consumes y_reconstructed, sssc.py:630-634).
        """
        if data.incomplete and not do_reconstruction:
            # mirror of the reference's precondition (sssc.py:630-634 uses
            # the reconstruction in the M-step; bsc.py:185-189 asserts it)
            raise ValueError(
                "incomplete data requires do_reconstruction=True: the M-step "
                "consumes the reconstructed data for its W update"
            )
        params = self.check_params(params)
        pre = self._precompute(params, data)
        nb, B = data.y.shape[:2]
        S_perm = cfg.S_perm
        dt = params.W.dtype
        W, Psi, mus = params.W, params.Psi, params.mus
        s2inv = pre["sigma2_inv"]

        keys = jax.random.split(key, nb * B).reshape(nb, B)

        # fused Pallas slab-solve path: candidate lpj from the VMEM-resident
        # LU kernel; sufficient statistics re-solved for the merged K^(n)
        # by the suffstat kernel (no kappa/lambda stash through HBM).
        # Incomplete data dispatches to the MASKED-Gram kernels (per-
        # datapoint G_n streamed per tile; Hp <= 64, no compaction) —
        # the inpainting production path runs kernel-speed too.
        use_kernel = (
            self.lpj_kernel in ("auto", "pallas", "pallas_full")
            and dt == jnp.float32
            and not cfg.packed_states
            and pallas_sssc_applicable(B, cfg.S, self.H,
                                       incomplete=data.incomplete)
        )
        # None = the kernels' auto compaction policy; False forces the
        # full-Hp solve path (lpj_kernel="pallas_full")
        kernel_compact = False if self.lpj_kernel == "pallas_full" else None
        if self.lpj_kernel in ("pallas", "pallas_full") and not use_kernel:
            # forcing the kernel must not silently fall back to XLA (the
            # BSC path raises in the same situation) — a user forcing it
            # to measure/debug would attribute XLA numbers to the kernel
            from evo_tpu.ops.linalg import _next_pow2
            from evo_tpu.ops.pallas_sssc import _tb_lpj, _tb_ss

            Hp = max(8, _next_pow2(self.H))
            raise ValueError(
                f"lpj_kernel='{self.lpj_kernel}' is not applicable here "
                f"(incomplete={data.incomplete}, dtype={dt}, "
                f"packed_states={cfg.packed_states}, B={B}, H={self.H}; "
                "the kernel needs a TPU backend, f32 unpacked data, "
                f"pow2-padded H <= 128 (<= 64 for incomplete data) and, "
                f"at H={self.H} (Hp={Hp}), B % {_tb_lpj(Hp)} == 0 and "
                f"B % {_tb_ss(Hp)} == 0 — see pallas_sssc_applicable); "
                "use lpj_kernel='auto'"
            )

        # re-solve (scan over slots) vs stash for the XLA path — see
        # STASH_MAX_H/STASH_MAX_BYTES; the kernel path always re-solves
        # (in VMEM).  K_all = candidates stashed per block: the S initial
        # states plus every generation's children (vary_Kn call order).
        K_all = cfg.S + cfg.n_generations * cfg.children_per_gen
        stash_bytes = 4 * B * K_all * self.H * (self.H + 1)
        resolve_merged = (not use_kernel) and (
            self.H > STASH_MAX_H or stash_bytes > STASH_MAX_BYTES)

        def estep_block(keys_b, ss_b, G_b, Wty_b, y2_b, valid_b, g_axis):
            """Block-level evolutionary E-step (mirrors BSC._estep_block):
            the K-state and per-generation children evaluations run as one
            batched call each.  On the XLA path (stash affordable — the
            measured-faster default, see STASH_MAX_H), the slab quantities
            (kappa, lambda) that fall out of the candidate solves are
            stashed in call order — exactly the candidate order of
            vary_Kn's concat(old, children) — so the EM step reuses the
            solves for the sufficient statistics.  When the [B, K_all, H,
            H] stash cannot fit (and always on the Pallas path, whose
            suffstat kernel re-solves in VMEM) the stash is skipped and
            the merged set re-solved one slot at a time."""
            B = ss_b.shape[0]
            kappa_stash, lam_stash = [], []

            def lpj_block(states_b):
                if use_kernel:
                    lpj, badf = sssc_lpj_pallas(
                        states_b, Wty_b, y2_b, G_b, Psi, mus,
                        pre["pil_bar"], s2inv, compact=kernel_compact)
                    lpj, counts = reset_lpj(lpj, valid=valid_b)
                    return lpj, None, (
                        counts, jnp.sum(badf).astype(jnp.int32))
                lpj, bad, kappa, lam_m = jax.vmap(
                    self._lpj_states,
                    in_axes=(0, g_axis, 0, 0, None, None, None, None),
                )(states_b, G_b, Wty_b, y2_b, Psi, mus, s2inv, pre["pil_bar"])
                lpj, counts = reset_lpj(lpj, valid=valid_b)
                if not resolve_merged:
                    kappa_stash.append(kappa)
                    lam_stash.append(lam_m)
                return lpj, None, (counts, jnp.sum(bad, dtype=jnp.int32))

            lpj_K, _, aux0 = lpj_block(ss_b)
            all_aux = [aux0]
            if cfg.exact:
                ss2, lpj2 = ss_b, lpj_K
                n_uni = jnp.zeros((B,), jnp.int32)
                n_sub = jnp.zeros((B,), jnp.int32)
                idx = jnp.broadcast_to(jnp.arange(cfg.S), (B, cfg.S))
            else:
                children, child_lpj, new_unique, child_lpj_raw, aux = (
                    evolve_states_block(keys_b, ss_b, lpj_K, lpj_block, cfg,
                                        pre["piH"])
                )
                all_aux.extend(aux)
                if cfg.unification:
                    merge = vary_Kn_swap if cfg.swap_merge else vary_Kn
                    ss2, lpj2, n_sub, idx = jax.vmap(
                        merge, in_axes=(0, 0, 0, 0, None)
                    )(ss_b, lpj_K, children, child_lpj, cfg.mprime)
                    n_uni = new_unique.sum(axis=1).astype(jnp.int32)
                else:
                    ss2, lpj2, n_uni, n_sub, idx = jax.vmap(
                        vary_Kn_whole_set, in_axes=(0, 0, 0, 0, 0, None)
                    )(ss_b, lpj_K, children, child_lpj_raw, new_unique,
                      cfg.reject_worse)

            if cfg.allzero:
                lpj0 = -0.5 * s2inv * y2_b
                lpj_full = jnp.concatenate([lpj0[:, None], lpj2], axis=1)
            else:
                lpj_full = lpj2

            counts = jax.tree.map(lambda *xs: sum(xs),
                                  *[a[0] for a in all_aux])
            n_bad = sum(a[1] for a in all_aux)
            if use_kernel or resolve_merged:
                kappa_all = lam_all = None
            else:
                kappa_all = jnp.concatenate(kappa_stash, axis=1)  # [B,K_all,H]
                lam_all = jnp.concatenate(lam_stash, axis=1)
            return (ss2, lpj_full, n_uni, n_sub, counts, n_bad,
                    kappa_all, lam_all, idx)

        def block_fn(acc, xs):
            y_b, xinf_b, x_b, valid_b, ss_b, keys_b = xs
            if cfg.packed_states:
                ss_b = unpack_bits_lane(ss_b, self.H).astype(jnp.int8)
            G_b, Wty_b, y2_b = block_gram(W, y_b, xinf_b, data.incomplete)
            g_axis = 0 if data.incomplete else None

            (ss2, lpj_full, n_uni, n_sub, counts, n_bad,
             kappa_all, lam_all, idx) = estep_block(
                keys_b, ss_b, G_b, Wty_b, y2_b, valid_b, g_axis)

            vf = valid_b.astype(dt)
            Fsum = jnp.sum(shifted_logsumexp(lpj_full) * vf)

            r = posterior_weights(lpj_full) * vf[:, None]  # [B, S_perm+S]
            rs = r[:, S_perm:]  # [B, S]

            if use_kernel:
                # ---- expectations re-solved for the merged K^(n) in VMEM
                # (the reference's storage-dict reuse, sssc.py:568-570,
                # replaced by recompute — see ops/pallas_sssc.py)
                (xpt_sz, xpt_s, xpt_ss_hh, xpt_szsz_hh,
                 s_sz_hh, sz_sz_hh) = sssc_suffstat_pallas(
                    ss2, rs, Wty_b, G_b, Psi, mus, s2inv,
                    compact=kernel_compact)
            elif kappa_all is None:
                # ---- expectations re-solved for the merged K^(n), one slot
                # at a time (H > STASH_MAX_H): the scan keeps at most one
                # [B, H, H] lambda block alive instead of the [B, K_all, H,
                # H] stash the small-H path gathers from
                sf = ss2.astype(dt)
                xpt_s = jnp.einsum("bs,bsh->bh", rs, sf)  # [B,H]
                xpt_ss_hh = jnp.einsum("bs,bsh,bsk->hk", rs, sf, sf)

                def slot_fn(carry, xs_s):
                    ss_s, rs_s = xs_s  # [B, H] int8, [B]
                    _l, _b, kap, lam_m = jax.vmap(
                        self._lpj_states,
                        in_axes=(0, g_axis, 0, 0, None, None, None, None),
                    )(ss_s[:, None, :], G_b, Wty_b, y2_b, Psi, mus, s2inv,
                      pre["pil_bar"])
                    kap, lam_m = kap[:, 0], lam_m[:, 0]  # [B,H], [B,H,H]
                    xpt_sz_c = carry[0] + rs_s[:, None] * kap
                    szsz_c = (carry[1]
                              + jnp.einsum("b,bhj->hj", rs_s, lam_m)
                              + jnp.einsum("b,bh,bj->hj", rs_s, kap, kap))
                    return (xpt_sz_c, szsz_c), None

                (xpt_sz, xpt_szsz_hh), _ = jax.lax.scan(
                    slot_fn,
                    (jnp.zeros((ss2.shape[0], self.H), dt),
                     jnp.zeros((self.H, self.H), dt)),
                    (jnp.swapaxes(ss2, 0, 1), rs.T),
                )
                s_sz_hh = jnp.einsum("bh,bk->hk", xpt_s, xpt_sz)
                sz_sz_hh = jnp.einsum("bh,bk->hk", xpt_sz, xpt_sz)
            else:
                sf = ss2.astype(dt)
                # ---- expectations from the candidate-evaluation solves:
                # scatter the merged responsibilities back onto the
                # candidate axis (r~[k] = r of the K^(n) member that
                # candidate k became, 0 if dropped) and take weighted sums
                K_all = kappa_all.shape[1]
                onehot = jax.nn.one_hot(idx, K_all, dtype=dt)  # [B,S,K_all]
                rtil = jnp.einsum("bs,bsk->bk", rs, onehot)  # [B, K_all]

                xpt_s = jnp.einsum("bs,bsh->bh", rs, sf)  # [B,H]
                xpt_ss = jnp.einsum("bs,bsh,bsk->bhk", rs, sf, sf)
                xpt_sz = jnp.einsum("bk,bkh->bh", rtil, kappa_all)  # [B,H]
                xpt_szsz = jnp.einsum(
                    "bk,bkhj->bhj", rtil, lam_all
                ) + jnp.einsum(
                    "bk,bkh,bkj->bhj", rtil, kappa_all, kappa_all
                )  # [B,H,H]
                xpt_ss_hh = xpt_ss.sum(0)
                xpt_szsz_hh = xpt_szsz.sum(0)
                s_sz_hh = jnp.einsum("bh,bk->hk", xpt_s, xpt_sz)
                sz_sz_hh = jnp.einsum("bh,bk->hk", xpt_sz, xpt_sz)

            # ---- reconstruction: est = W @ <sz>_n (reference sssc.py:614-627
            #      via modelmean, sssc.py:369-405)
            if do_reconstruction:
                est = xpt_sz @ W.T  # [B,D]
                y_rec = jnp.where(x_b, y_b, est)
            else:
                y_rec = None

            y_m = y_rec if (data.incomplete and do_reconstruction) else y_b
            Wp = jnp.einsum("bh,bd->dh", xpt_sz, y_m)  # [D,H]

            new = dict(
                xpt_s=acc["xpt_s"] + xpt_s.sum(0),
                xpt_ss=acc["xpt_ss"] + xpt_ss_hh,
                xpt_sz=acc["xpt_sz"] + xpt_sz.sum(0),
                xpt_szsz=acc["xpt_szsz"] + xpt_szsz_hh,
                Wp=acc["Wp"] + Wp,
                s_sz_outer=acc["s_sz_outer"] + s_sz_hh,
                sz_sz_outer=acc["sz_sz_outer"] + sz_sz_hh,
                # incomplete-data sigma2 term: only the trace of the
                # reference's [D,D] accumulator is ever used (sssc.py:752) —
                # accumulate the scalar directly
                trWszszW=acc["trWszszW"]
                + jnp.sum(xinf_b.astype(dt) * (xpt_sz @ W.T) ** 2),
                y2sum=acc["y2sum"] + jnp.sum(y2_b * vf),
                Fsum=acc["Fsum"] + Fsum,
                nuni=acc["nuni"] + jnp.sum(n_uni * valid_b, dtype=jnp.int32),
                nsub=acc["nsub"] + jnp.sum(n_sub * valid_b, dtype=jnp.int32),
                resets=tuple(
                    a + jnp.sum(b, dtype=jnp.int32)
                    for a, b in zip(acc["resets"], tuple(counts))
                ),
                psi_bad=acc["psi_bad"] + jnp.sum(n_bad, dtype=jnp.int32),
            )
            ss_out = pack_bits_lane(ss2) if cfg.packed_states else ss2
            return new, (ss_out, lpj_full, y_rec)

        H = self.H
        acc0 = dict(
            xpt_s=jnp.zeros((H,), dt),
            xpt_ss=jnp.zeros((H, H), dt),
            xpt_sz=jnp.zeros((H,), dt),
            xpt_szsz=jnp.zeros((H, H), dt),
            Wp=jnp.zeros((self.D, H), dt),
            s_sz_outer=jnp.zeros((H, H), dt),
            sz_sz_outer=jnp.zeros((H, H), dt),
            trWszszW=jnp.zeros((), dt),
            y2sum=jnp.zeros((), dt),
            Fsum=jnp.zeros((), dt),
            nuni=jnp.zeros((), jnp.int32),
            nsub=jnp.zeros((), jnp.int32),
            resets=(jnp.zeros((), jnp.int32),) * 3,
            psi_bad=jnp.zeros((), jnp.int32),
        )
        xs = (data.y, data.x_infr, data.x, data.row_valid, estate.ss, keys)
        acc, (ss_all, lpj_all, yrec_all) = jax.lax.scan(block_fn, acc0, xs)

        new_params, guards = self._m_step_finalize(params, acc, pre, data, cfg)
        N = pre["N"]
        stats = StepStats(
            F=pre["ljc"] + acc["Fsum"] / N,
            S_nunique=acc["nuni"] / N,
            S_sub=acc["nsub"] / N,
            n_reset_nan=acc["resets"][0],
            n_reset_small=acc["resets"][1],
            n_reset_inf=acc["resets"][2],
            n_guard_mus_freeze=guards["mus_freeze"],
            n_guard_psi_freeze=guards["psi_freeze"],
            guard_psi_renorm=guards["psi_renorm"],
        )
        return new_params, EState(ss=ss_all, lpj=lpj_all), stats, yrec_all

    # ---------------------------------------------------------------- M-step

    def _m_step_finalize(self, params: SSSCParams, acc, pre, data: Data, cfg: EAConfig):
        """Closed-form updates (reference sssc.py:687-770).  Notes on exact
        reference semantics preserved here:
          - W:     Wp @ inv(sum<szsz'>)  (pinv/noise fallbacks replaced by an
                   SVD lstsq, deterministic)
          - pies:  clipped mean activations
          - mus:   sum<sz> / (sum<s> + eps)
          - Psi:   the reference computes an ELEMENTWISE product of the
                   moment-matched numerator with inv(sum<ss'> + eps I)
                   (sssc.py:738; NB `* ` on ndarrays) and its `+ eps I` term
                   is a dead expression statement (sssc.py:739) — replicated
                   faithfully for behavioral parity
          - sigma2 uses outer(<sz>,<sz>) (not <szsz'>) per sssc.py:646."""
        N, D, H = pre["N"], self.D, self.H
        new = dict(W=params.W, pies=params.pies, mus=params.mus, Psi=params.Psi,
                   sigma2=params.sigma2)
        guards = dict(
            mus_freeze=jnp.zeros((), jnp.int32),
            psi_freeze=jnp.zeros((), jnp.int32),
            psi_renorm=jnp.zeros((), jnp.float32),
        )

        if "W" in self.to_learn:
            from evo_tpu.ops.linalg import equilibrated_pd_inverse

            # W_new = Wp @ inv(sum<szsz'>); the PSD statistic can be
            # near-singular (never-active units), so use the equilibrated
            # PD inverse with a dtype-scaled ridge (pinv-like behavior;
            # exact on well-posed f64 systems)
            ridge = 0.0 if params.W.dtype == jnp.float64 else 1e-6
            new["W"] = acc["Wp"] @ equilibrated_pd_inverse(
                acc["xpt_szsz"], rel_ridge=ridge)

        if "pies" in self.to_learn:
            pies_new = jnp.clip(acc["xpt_s"] / N, EPS_PIES, 1.0 - EPS_PIES)
            if cfg.background:
                pies_new = pies_new.at[-1].set(1.0 - 1.1e-5)
            new["pies"] = pies_new

        if "mus" in self.to_learn:
            eps_mus = jnp.finfo(params.W.dtype).eps
            mus_upd = acc["xpt_sz"] / (acc["xpt_s"] + eps_mus)
            # dying-unit guard: a unit whose total activation mass collapses
            # makes mus (and through mumu^T the Psi update) explode — the
            # classic EM pathology the reference is also exposed to (its
            # eps_mus is only 2e-16).  Freeze such units at their previous
            # value; they can revive in later epochs.
            alive = acc["xpt_s"] > 1e-4 * pre["N"]
            new["mus"] = jnp.where(alive, mus_upd, params.mus)
            guards["mus_freeze"] = jnp.sum(~alive, dtype=jnp.int32)

        if "Psi" in self.to_learn:
            mus_new = new["mus"]
            num = (
                jnp.outer(mus_new, mus_new) * acc["xpt_ss"]
                + acc["xpt_szsz"]
                - 2.0 * mus_new[:, None] * acc["s_sz_outer"]
            )
            from evo_tpu.ops.linalg import equilibrated_pd_inverse

            # reference-form update (sssc.py:738): element-wise product with
            # the inverse of the co-activation matrix; f32 gets a small
            # relative ridge (the reference's absolute eps is sized for f64)
            ridge = 0.0 if params.W.dtype == jnp.float64 else 1e-4
            Psi_upd = num * equilibrated_pd_inverse(
                acc["xpt_ss"] + EPS_PSI * jnp.eye(H, dtype=params.W.dtype),
                rel_ridge=ridge,
            )
            if params.W.dtype != jnp.float64:
                # starved units get noise/noise entries — freeze their
                # rows/columns at the previous Psi (see mus guard above)
                alive = acc["xpt_s"] > 1e-4 * pre["N"]
                keep = jnp.outer(alive, alive)
                Psi_upd = jnp.where(keep, Psi_upd, params.Psi)
                guards["psi_freeze"] = jnp.sum(~alive, dtype=jnp.int32)
            new["Psi"] = Psi_upd

        if "sigma2" in self.to_learn:
            if data.incomplete:
                s2 = acc["y2sum"] - acc["trWszszW"]
                s2 = s2 + pre["sum_d"] * params.sigma2
                new["sigma2"] = jnp.maximum(s2 / N / D + EPS_SIGMA2, EPS_SIGMA2)
            else:
                # reference shortcut (sssc.py:759-768): subtract the energy
                # of the posterior-mean reconstructions (empirically reaches
                # better optima than the full-posterior residual identity),
                # floored at eps (the raw difference can go negative under
                # f32 noise; the reference relies on f64 there)
                WT_outer = new["W"].T @ new["W"]
                s2 = acc["y2sum"] - jnp.trace(acc["sz_sz_outer"] @ WT_outer)
                new["sigma2"] = jnp.maximum(s2 / N / D + EPS_SIGMA2, EPS_SIGMA2)

        # Gauge fixing (f32 only; the f64 path stays reference-exact): the
        # model is invariant under W -> W D, mus -> D^-1 mus, Psi -> D^-1
        # Psi D^-1 per latent unit, so nothing anchors |Psi| — parameters
        # random-walk along this degeneracy (slowly in the f64 reference,
        # violently in f32) until Psi overflows.  Renormalizing to
        # diag(Psi) = 1 each epoch is exactly likelihood-invariant and
        # removes the runaway.
        learns_gauge = {"W", "mus", "Psi"} <= set(self.to_learn)
        if learns_gauge and params.W.dtype != jnp.float64:
            d = jnp.sqrt(jnp.clip(jnp.diag(new["Psi"]), PARAM_TOL, None))
            new["Psi"] = new["Psi"] / jnp.outer(d, d)
            new["mus"] = new["mus"] / d
            new["W"] = new["W"] * d[None, :]
            guards["psi_renorm"] = jnp.max(jnp.abs(jnp.log(d))).astype(
                jnp.float32)

        return (
            SSSCParams(W=new["W"], pies=new["pies"], mus=new["mus"],
                       Psi=new["Psi"], sigma2=new["sigma2"]),
            guards,
        )

    # ----------------------------------------------------------- free energy

    @partial(jax.jit, static_argnames=("self",))
    def exact_free_energy(self, params: SSSCParams, data: Data):
        """Exact log-likelihood via full 2^H enumeration (H <= 10), mirroring
        reference free_energy(full=True) (_models.py:334-451).  The all-zero
        state falls out of the generic formula (M~ = Psi~ = I, u = 0)."""
        params = self.check_params(params)
        pre = self._precompute(params, data)
        sm = jnp.asarray(full_state_matrix(self.H))
        W, Psi, mus = params.W, params.Psi, params.mus
        s2inv = pre["sigma2_inv"]

        def block_fn(Fsum, xs):
            y_b, xinf_b, valid_b = xs
            G_b, Wty_b, y2_b = block_gram(W, y_b, xinf_b, data.incomplete)
            g_axis = 0 if data.incomplete else None

            def one(G_n, Wty_n, y2_n):
                lpj = self._lpj_states(
                    sm, G_n, Wty_n, y2_n, Psi, mus, s2inv, pre["pil_bar"]
                )[0]
                return reset_lpj(lpj)[0]

            lpj = jax.vmap(one, in_axes=(g_axis, 0, 0))(G_b, Wty_b, y2_b)
            return Fsum + jnp.sum(shifted_logsumexp(lpj) * valid_b.astype(lpj.dtype)), None

        Fsum, _ = jax.lax.scan(
            block_fn, jnp.zeros((), params.W.dtype), (data.y, data.x_infr, data.row_valid)
        )
        return pre["ljc"] + Fsum / pre["N"]

    @partial(jax.jit, static_argnames=("self",))
    def free_energy(self, params: SSSCParams, estate: EState, data: Data):
        """Truncated free energy from the stored lpj."""
        params = self.check_params(params)
        pre = self._precompute(params, data)
        lpj = estate.lpj.reshape(-1, estate.lpj.shape[-1])
        valid = data.row_valid.reshape(-1)
        return free_energy_from_lpj(lpj, pre["ljc"], valid)
