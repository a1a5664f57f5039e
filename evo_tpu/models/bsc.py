"""Binary Sparse Coding with evolutionary E-steps (EBSC), TPU-native.

Generative model (reference: evo/models/bsc.py):
    s_h ~ Bernoulli(pi),  y = W s + N(0, sigma^2 I),  W in R^{D x H}

log-pseudo-joint (reference bsc.py:79-97):
    lpj(s, y) = pre1 * || m .* (W s - y) ||^2 + pil_bar * |s|
    pre1 = -1/(2 sigma^2), pil_bar = log(pi/(1-pi)), m = x_infr mask

TPU design: instead of the reference's per-datapoint GEMV
``states @ W[:, x_infr]`` (bsc.py:91-95), the squared residual is expanded as

    ||m.*(Ws - y)||^2 = ||m.*y||^2 - 2 s.(W^T m y) + s^T (W^T diag(m) W) s

so that after a per-datapoint precomputation of Wty = W^T (m.*y) and the Gram
matrix G = W^T diag(m) W (shared across the batch when data are complete),
every state evaluation is O(H^2) on the MXU, independent of D, and batches
over [N, S+children, H] as plain einsums.  This replaces the reference's
state-id memoization idea with something strictly stronger: the *entire*
dependence on y and D is precomputed once per datapoint per epoch.

The full EM epoch runs as ONE jitted function: a lax.scan over nb row-blocks,
each block vmapping the evolutionary E-step over datapoints and accumulating
the M-step sufficient statistics.  All cross-device reductions are plain
jnp.sum's over the sharded batch axis — GSPMD lowers them to psums over ICI,
replacing the reference's MPI Allreduce calls (bsc.py:230-274).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from evo_tpu.models.base import Data, StepStats, block_gram
from evo_tpu.ops.bitpack import (
    pack_bits_lane,
    unpack_bits_lane,
)
from evo_tpu.ops.numerics import (
    eps_lpj,
    free_energy_from_lpj,
    posterior_weights,
    reset_lpj,
    shifted_logsumexp,
)
from evo_tpu.variational.config import EAConfig
from evo_tpu.variational.evolve import evolve_states_block
from evo_tpu.variational.state_init import EState, full_state_matrix
from evo_tpu.variational.varykn import vary_Kn, vary_Kn_swap, vary_Kn_whole_set
from evo_tpu.ops.pallas_lpj import bsc_lpj_pallas, pallas_lpj_applicable
from evo_tpu.ops.pallas_suffstat import (
    bsc_suffstat_pallas,
    pallas_suffstat_applicable,
)

PARAM_TOL = 1e-5  # reference noise_policy bounds (_models.py:47-52)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BSCParams:
    W: jnp.ndarray  # [D, H]
    pi: jnp.ndarray  # scalar
    sigma: jnp.ndarray  # scalar
    pies: jnp.ndarray  # [H] — per-unit pi_h, diagnostic only (ref bsc.py:262)


@dataclasses.dataclass(frozen=True)
class BSC:
    """Static model configuration; all methods are pure functions."""

    D: int
    H: int
    to_learn: Tuple[str, ...] = ("W", "pi", "sigma")
    # "auto": use the fused Pallas lpj kernel for the K-state evaluation when
    # profitable (TPU, complete data, MXU-friendly shapes); "xla" | "pallas"
    lpj_kernel: str = "auto"

    # ------------------------------------------------------------------ init

    def standard_init(self, data: Data, seed: int = 0, W_init=None, pi_init=None,
                      sigma_init=None, y_host=None) -> BSCParams:
        """Noisy-data-mean init (reference _models.py:206-283).  The
        reference broadcasts rank-0 random draws; here determinism across
        hosts comes from the shared seed.  Pass y_host (the flat [N, D] host
        copy of the data, pre-padding; in multi-process runs, this process's
        LOCAL rows) to avoid a device->host readback.

        Multi-process: statistics are computed from GLOBAL sums
        (process_allgather of per-process partials) so every process derives
        the identical Theta^0 — the reference's allmean + rank-0-bcast
        contract (_models.py:242-276)."""
        if jax.process_count() > 1:
            from evo_tpu.parallel.distributed import global_init_stats

            N, y_mean, ss_resid, m_sum = global_init_stats(
                data, y_host, self.D)
            if sigma_init is None:
                # complete data: m_sum == N*D, so this is the usual RMS
                # residual; incomplete: the reference's masked form
                sigma_init = float(np.sqrt(ss_resid / m_sum))
                assert sigma_init > 0.0
            return self._finish_init(data, y_mean, sigma_init, W_init,
                                     pi_init, seed)
        if y_host is not None:
            # fully host-side: the observation mask is derivable from the
            # NaN markers, so no device readback happens at all (the first
            # device->host transfer stalls for minutes through a tunneled
            # TPU, and racing it with apps.common.warm_d2h_async can wedge)
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
            y_mean = (y * m).sum(0) / N  # ref divides by my_N (_models.py:249)
        else:
            y_mean = y.mean(0)

        if sigma_init is None:
            if data.incomplete:
                tmp = (((y - y_mean) * m) ** 2).sum()
                sigma_init = np.sqrt(tmp / m.sum())
            else:
                sigma_init = np.sqrt(((y - y_mean) ** 2).mean(0).sum() / self.D)
            assert sigma_init > 0.0
        return self._finish_init(data, y_mean, sigma_init, W_init, pi_init,
                                 seed)

    def _finish_init(self, data, y_mean, sigma_init, W_init, pi_init, seed):
        """Shared tail of standard_init: the random draws use the shared
        seed, so all processes produce identical parameters."""
        rng = np.random.default_rng(seed)
        if isinstance(W_init, str) or W_init is None:
            if W_init == "random_uniform":
                W = rng.random((self.D, self.H))
            elif W_init == "normal":
                W = rng.normal(0, 5, (self.D, self.H))
            elif W_init == "data_mean":
                W = np.tile(y_mean[:, None], (1, self.H))
            else:
                W = y_mean[:, None] + rng.normal(scale=sigma_init / 4.0,
                                                 size=(self.D, self.H))
        else:  # explicit weights: accept anything array-like (np or jax)
            W = np.asarray(W_init)

        pi = 1.0 / self.H if pi_init is None else pi_init
        dt = data.y.dtype
        return BSCParams(
            W=jnp.asarray(W, dt),
            pi=jnp.asarray(pi, dt),
            sigma=jnp.asarray(sigma_init, dt),
            pies=jnp.full((self.H,), pi, dt),
        )

    # ----------------------------------------------------------- check/clamp

    def check_params(self, p: BSCParams) -> BSCParams:
        """Clamp parameters to the reference noise policy (_models.py:47-52,
        102-159): pi in [tol, 1-tol], sigma >= tol, W unbounded."""
        return BSCParams(
            W=p.W,
            pi=jnp.clip(p.pi, PARAM_TOL, 1.0 - PARAM_TOL),
            sigma=jnp.clip(p.sigma, PARAM_TOL, None),
            pies=jnp.clip(p.pies, PARAM_TOL, 1.0 - PARAM_TOL),
        )

    # ------------------------------------------------------------ generation

    def generate_from_hidden(self, key, params: BSCParams, s) -> dict:
        """y = W s + sigma*eps (reference bsc.py:27-57)."""
        sf = s.astype(params.W.dtype)
        y_mean = sf @ params.W.T
        y = y_mean + params.sigma * jax.random.normal(key, y_mean.shape, params.W.dtype)
        return {"y": y, "s": s, "y_mean": y_mean}

    def generate_data(self, key, params: BSCParams, N: int) -> dict:
        """s_h ~ Bernoulli(pi) (reference _models.py:73-99 uses p <= pi)."""
        k1, k2 = jax.random.split(key)
        p = jax.random.uniform(k1, (N, self.H))
        s = p <= params.pi
        return self.generate_from_hidden(k2, params, s)

    # ------------------------------------------------------------ precompute

    def _precompute(self, p: BSCParams, data: Data):
        """State-independent terms (reference bsc.py:100-125)."""
        dt = p.W.dtype
        valid = data.row_valid
        N = jnp.sum(valid.astype(dt))
        pre1 = -0.5 / (p.sigma * p.sigma)
        pil_bar = jnp.log(p.pi / (1.0 - p.pi))
        piH = p.pi * self.H
        log2pis = jnp.log(2 * jnp.pi * p.sigma * p.sigma)
        if data.incomplete:
            sum_d = jnp.sum(
                data.x_infr.astype(dt) * valid[..., None].astype(dt)
            )
            ljc = self.H * jnp.log(1.0 - p.pi) - log2pis * sum_d / N / 2
        else:
            sum_d = N * self.D
            ljc = self.H * jnp.log(1.0 - p.pi) - self.D / 2 * log2pis
        vmask = valid[..., None].astype(dt)
        if data.incomplete:
            sum_d_y2 = jnp.sum(data.x_infr.astype(dt) * data.y**2 * vmask)
        else:
            sum_d_y2 = jnp.sum(data.y**2 * vmask)
        return dict(pre1=pre1, pil_bar=pil_bar, piH=piH, ljc=ljc, N=N,
                    sum_d=sum_d, sum_d_y2=sum_d_y2)

    @staticmethod
    def _lpj_one(states, G_n, Wty_n, y2_n, pre1, pil_bar):
        """lpj of states [K, H] for one datapoint; O(K H^2) on MXU."""
        sf = states.astype(Wty_n.dtype)
        sGs = jnp.sum((sf @ G_n) * sf, axis=-1)
        sWty = sf @ Wty_n
        quad = y2_n - 2.0 * sWty + sGs
        return pre1 * quad + pil_bar * jnp.sum(sf, axis=-1)

    # ---------------------------------------------------------------- E-step

    def _estep_block(self, keys_b, ss_b, G_b, Wty_b, y2_b, valid_b, pre,
                     cfg: EAConfig, incomplete: bool, packed: bool = False):
        """Full evolutionary E-step for one row-block [B, ...].

        Mirrors the reference E_step body (_models.py:497-535): evaluate lpj
        of the current K^(n), evolve new candidates, merge via vary_Kn — but
        structured block-level so both the K-state and per-generation
        children evaluations run through the fused Pallas kernel (or one
        batched einsum) instead of per-datapoint GEMVs.

        With ``packed=True``, ss_b is lane-major bit-packed uint8
        [B, S, H/8] and stays packed end-to-end (kernels unpack in VMEM;
        the merged ss2 comes back packed).
        """
        B = ss_b.shape[0]
        g_axis = 0 if incomplete else None

        def lpj_block(states_b):
            """[B, K, H or H/8] -> ([B, K] reset-clamped lpj,
            dedup keys | None, reset counts).  When the Pallas kernel runs
            on unpacked int8 states it also emits the dedup key words from
            VMEM, saving the separate HBM pass that would recompute them."""
            K = states_b.shape[1]
            use_pallas = packed or self.lpj_kernel == "pallas" or (
                self.lpj_kernel == "auto"
                and pallas_lpj_applicable(B, K, self.H, incomplete)
                and Wty_b.dtype == jnp.float32
            )
            dkeys = None
            if use_pallas:
                emit = not packed and not cfg.exact
                if emit:
                    # the kernel emits FINAL dedup keys from VMEM (exact or
                    # hashed per ops.bitpack.dedup_keys' policy)
                    lpj, dkeys = bsc_lpj_pallas(states_b, Wty_b, y2_b, G_b,
                                                pre["pre1"], pre["pil_bar"],
                                                emit_keys=True)
                else:
                    lpj = bsc_lpj_pallas(states_b, Wty_b, y2_b, G_b,
                                         pre["pre1"], pre["pil_bar"])
            else:
                lpj = jax.vmap(
                    self._lpj_one, in_axes=(0, g_axis, 0, 0, None, None)
                )(states_b, G_b, Wty_b, y2_b, pre["pre1"], pre["pil_bar"])
            lpj, counts = reset_lpj(lpj, valid=valid_b)
            return lpj, dkeys, counts

        lpj_K, ss_dkeys, counts0 = lpj_block(ss_b)
        all_counts = [counts0]

        if cfg.exact:
            ss2, lpj2 = ss_b, lpj_K
            n_uni = jnp.zeros((B,), jnp.int32)
            n_sub = jnp.zeros((B,), jnp.int32)
        else:
            children, child_lpj, new_unique, child_lpj_raw, aux = (
                evolve_states_block(keys_b, ss_b, lpj_K, lpj_block, cfg,
                                    pre["piH"], packed=packed,
                                    ss_dkeys=ss_dkeys)
            )
            all_counts.extend(aux)
            if cfg.unification:
                merge = vary_Kn_swap if cfg.swap_merge else vary_Kn
                ss2, lpj2, n_sub, _ = jax.vmap(
                    merge, in_axes=(0, 0, 0, 0, None)
                )(ss_b, lpj_K, children, child_lpj, cfg.mprime)
                n_uni = new_unique.sum(axis=1).astype(jnp.int32)
            else:
                ss2, lpj2, n_uni, n_sub, _ = jax.vmap(
                    vary_Kn_whole_set, in_axes=(0, 0, 0, 0, 0, None)
                )(ss_b, lpj_K, children, child_lpj_raw, new_unique,
                  cfg.reject_worse)

        if cfg.allzero:
            lpj0 = pre["pre1"] * y2_b
            lpj_full = jnp.concatenate([lpj0[:, None], lpj2], axis=1)
        else:
            lpj_full = lpj2

        counts = jax.tree.map(lambda *xs: sum(xs), *all_counts)
        return ss2, lpj_full, n_uni, n_sub, counts

    # ---------------------------------------------------------------- epoch

    @partial(jax.jit, static_argnames=("self", "cfg", "do_reconstruction"))
    def em_step(
        self,
        params: BSCParams,
        estate: EState,
        data: Data,
        key,
        cfg: EAConfig,
        do_reconstruction: bool = False,
    ):
        """One full EM epoch (E-step + optional reconstruction + M-step) as a
        single jitted scan over row-blocks.

        Returns (new_params, new_estate, stats, y_reconstructed | None).

        Semantics follow reference Model.step (_models.py:162-203): F is the
        free energy of the *updated* K^(n) under the *old* parameters; the
        M-step consumes the merged lpj/ss; with incomplete data the M-step's
        Wp accumulator uses the reconstructed data (bsc.py:185-189).

        With incomplete data the sigma residual is computed from
        y_RECONSTRUCTED over x_infr, exactly as the reference does
        (bsc.py:184-218) — including when x != x_infr (re-estimating
        observed entries).
        """
        if data.incomplete and not do_reconstruction:
            # the reference asserts the same precondition (bsc.py:185-189):
            # without the reconstruction, missing entries would enter the Wp
            # accumulator as zeros and silently bias the W update
            raise ValueError(
                "incomplete data requires do_reconstruction=True: the M-step "
                "consumes the reconstructed data for its W update"
            )
        if self.lpj_kernel == "pallas":
            # forcing the kernel bypasses the applicability gating — fail
            # with a clear message instead of an opaque trace-time error
            if data.incomplete:
                raise ValueError(
                    "lpj_kernel='pallas' does not support incomplete data "
                    "(the per-datapoint Gram does not fit VMEM); use 'auto'"
                )
        params = self.check_params(params)
        pre = self._precompute(params, data)
        nb, B = data.y.shape[:2]
        S_perm = cfg.S_perm
        dt = params.W.dtype
        W = params.W

        keys = jax.random.split(key, nb * B).reshape(nb, B)

        use_suffstat = (
            self.lpj_kernel in ("auto", "pallas")
            and pallas_suffstat_applicable(B, cfg.S, self.H)
            and dt == jnp.float32
        )
        # fully packed epoch: states never materialize unpacked in HBM —
        # every consumer (lpj kernels, suffstat kernel, dedup keys, merge
        # gather) reads the lane-major bit-packed uint8 form directly
        C = cfg.children_per_gen
        use_packed = (
            cfg.packed_states
            and use_suffstat
            and pallas_lpj_applicable(B, cfg.S, self.H, data.incomplete)
            and (cfg.exact
                 or pallas_lpj_applicable(B, C, self.H, data.incomplete))
            # the packed kernels unpack exactly 8*ceil(H/8) lanes in VMEM
            # and skip the wrapper's lane padding, so packed needs aligned H
            and self.H % 32 == 0
        )
        def block_fn(acc, xs):
            y_b, xinf_b, x_b, valid_b, ss_b, keys_b = xs
            if cfg.packed_states and not use_packed:
                ss_b = unpack_bits_lane(ss_b, self.H).astype(jnp.int8)
            G_b, Wty_b, y2_b = block_gram(W, y_b, xinf_b, data.incomplete)

            ss2, lpj_full, n_uni, n_sub, counts = self._estep_block(
                keys_b, ss_b, G_b, Wty_b, y2_b, valid_b, pre, cfg,
                data.incomplete, packed=use_packed,
            )

            vf = valid_b.astype(dt)
            # ---- free energy contribution (post-merge, old params)
            Fsum = jnp.sum(shifted_logsumexp(lpj_full) * vf)

            # ---- responsibilities
            r = posterior_weights(lpj_full) * vf[:, None]  # [B, S_perm+S]
            rs = r[:, S_perm:]  # [B, S]

            # ---- M-step state statistics: rho, Wq, |s| — one fused pass
            # over the bool states where profitable (reference bsc.py:173-223)
            if use_suffstat:
                rho, s_abs, Wq = bsc_suffstat_pallas(ss2, rs, H=self.H)
            else:
                sf = ss2.astype(dt)  # [B, S, H]
                rho = jnp.einsum("bs,bsh->bh", rs, sf)  # [B, H]
                Wq = jnp.einsum("bs,bsh,bsk->hk", rs, sf, sf)
                s_abs = jnp.sum(sf, axis=-1)  # [B, S]

            # ---- reconstruction (posterior-predictive mean,
            #      reference _models.py:614-665)
            if do_reconstruction:
                sf = (unpack_bits_lane(ss2, self.H) if use_packed
                      else ss2).astype(dt)
                means = jnp.einsum("bsh,dh->bsd", sf, W)  # [B, S, D]
                est = jnp.einsum("bs,bsd->bd", rs, means)
                y_rec = jnp.where(x_b, y_b, est)
            else:
                y_rec = None

            # ---- M-step accumulators (reference bsc.py:173-223)
            y_m = y_rec if (data.incomplete and do_reconstruction) else y_b
            Wp = jnp.einsum("bh,bd->hd", rho, y_m)
            if data.incomplete and do_reconstruction:
                # reference semantics exactly (bsc.py:184-218): with
                # incomplete data the sigma residual is computed from
                # y_RECONSTRUCTED over the x_infr dims (identical to the
                # lpj shortcut below iff x == x_infr, exact in general) —
                # `means` is already on hand from the reconstruction
                m_f = xinf_b.astype(dt)
                dy = (y_rec[:, None, :] - means) * m_f[:, None, :]
                sig = jnp.sum(rs * jnp.sum(dy * dy, axis=-1))
                if cfg.allzero:
                    sig = sig + jnp.sum(
                        r[:, 0] * jnp.sum((y_rec * y_rec) * m_f, axis=-1))
            else:
                # sigma: sum_s r * ||m.*(y - Ws)||^2 recovered from the lpj
                # (residual^2 = (lpj - pil_bar*|s|)/pre1) + allzero term.
                # Reset-clamped lpj values (floor = finfo.min) would poison
                # this reconstruction — mask them (their posterior weight
                # is ~0) and clip to the physical range
                lpj_s = lpj_full[:, S_perm:]
                ok = lpj_s > 0.5 * jnp.asarray(eps_lpj(dt), dt)
                resid2 = jnp.clip(
                    (lpj_s - pre["pil_bar"] * s_abs) / pre["pre1"], 0.0, None)
                sig = jnp.sum(jnp.where(ok, rs * resid2, 0.0))
                if cfg.allzero:
                    sig = sig + jnp.sum(r[:, 0] * y2_b)

            acc = dict(
                Wp=acc["Wp"] + Wp,
                Wq=acc["Wq"] + Wq,
                pies=acc["pies"] + jnp.sum(rho, axis=0),
                sigma=acc["sigma"] + sig,
                Fsum=acc["Fsum"] + Fsum,
                nuni=acc["nuni"] + jnp.sum(n_uni * valid_b, dtype=jnp.int32),
                nsub=acc["nsub"] + jnp.sum(n_sub * valid_b, dtype=jnp.int32),
                resets=tuple(
                    a + jnp.asarray(b, jnp.int32)
                    for a, b in zip(acc["resets"], tuple(counts))
                ),
            )
            if cfg.packed_states:
                ss_out = ss2 if use_packed else pack_bits_lane(ss2)
            else:
                ss_out = ss2
            return acc, (ss_out, lpj_full, y_rec)

        acc0 = dict(
            Wp=jnp.zeros((self.H, self.D), dt),
            Wq=jnp.zeros((self.H, self.H), dt),
            pies=jnp.zeros((self.H,), dt),
            sigma=jnp.zeros((), dt),
            Fsum=jnp.zeros((), dt),
            nuni=jnp.zeros((), jnp.int32),
            nsub=jnp.zeros((), jnp.int32),
            resets=(jnp.zeros((), jnp.int32),) * 3,
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
            n_guard_sigma_floor=guards["sigma_floor"],
        )
        return new_params, EState(ss=ss_all, lpj=lpj_all), stats, yrec_all

    # ---------------------------------------------------------------- M-step

    def _m_step_finalize(self, params: BSCParams, acc, pre, data: Data, cfg: EAConfig):
        """Closed-form parameter updates from global accumulators
        (reference bsc.py:225-277).  The reference's lstsq/pinv/noise fallback
        chain (bsc.py:236-250) becomes an unconditional SVD least-squares
        solve, which returns the same solution on well-posed systems and the
        pinv solution on singular ones — deterministic and branch-free."""
        N, D, H = pre["N"], self.D, self.H
        new = dict(W=params.W, pi=params.pi, sigma=params.sigma, pies=params.pies)

        if "W" in self.to_learn:
            from evo_tpu.ops.linalg import equilibrated_pd_inverse

            # Wq is PSD; equilibrated PD solve with a dtype-scaled ridge
            # replaces the reference's lstsq/pinv/noise fallback chain
            # (bsc.py:236-250) — same solution on well-posed systems,
            # pinv-like behavior on singular ones, and f32-safe on TPU
            ridge = 0.0 if params.W.dtype == jnp.float64 else 1e-6
            new["W"] = (equilibrated_pd_inverse(acc["Wq"], rel_ridge=ridge)
                        @ acc["Wp"]).T

        if "pi" in self.to_learn:
            pies_new = acc["pies"] / N
            if cfg.background:
                pies_new = pies_new.at[-1].set(1.0 - 1.1e-5)
            new["pi"] = jnp.sum(pies_new) / H
            new["pies"] = pies_new

        guards = dict(sigma_floor=jnp.zeros((), jnp.int32))
        if "sigma" in self.to_learn:
            if data.incomplete:
                corr = pre["sum_d"] * params.sigma**2
                sigma_new = jnp.sqrt((acc["sigma"] + corr) / N / D)
            else:
                sigma_new = jnp.sqrt(acc["sigma"] / N / D)
            # degenerate-fit guard: overcomplete models (H >= D) can drive
            # sigma -> 0 (exact interpolation), which f32 lpj cannot
            # represent (the f64 reference merely limps longer); floor at a
            # fraction of the data RMS, surfaced via StepStats (like the
            # reference surfaces its lpj resets, _models.py:567-596)
            rms = jnp.sqrt(pre["sum_d_y2"] / jnp.maximum(pre["sum_d"], 1.0))
            new["sigma"] = jnp.maximum(sigma_new, 1e-3 * rms)
            guards["sigma_floor"] = (sigma_new < 1e-3 * rms).astype(jnp.int32)

        return (
            BSCParams(W=new["W"], pi=new["pi"], sigma=new["sigma"],
                      pies=new["pies"]),
            guards,
        )

    # ----------------------------------------------------------- free energy

    @partial(jax.jit, static_argnames=("self",))
    def exact_free_energy(self, params: BSCParams, data: Data):
        """Exact log-likelihood via full 2^H enumeration (H <= 10), the
        correctness oracle (reference _models.py:334-451 with full=True;
        driver guard at examples/bars-test/main.py:124-135)."""
        params = self.check_params(params)
        pre = self._precompute(params, data)
        sm = jnp.asarray(full_state_matrix(self.H))  # [2^H, H]
        W = params.W

        def block_fn(Fsum, xs):
            y_b, xinf_b, valid_b = xs
            G_b, Wty_b, y2_b = block_gram(W, y_b, xinf_b, data.incomplete)
            g_axis = 0 if data.incomplete else None
            lpj = jax.vmap(
                lambda G_n, Wty_n, y2_n: self._lpj_one(
                    sm, G_n, Wty_n, y2_n, pre["pre1"], pre["pil_bar"]
                ),
                in_axes=(g_axis, 0, 0),
            )(G_b, Wty_b, y2_b)
            lpj, _ = reset_lpj(lpj)
            return Fsum + jnp.sum(shifted_logsumexp(lpj) * valid_b.astype(lpj.dtype)), None

        Fsum, _ = jax.lax.scan(
            block_fn, jnp.zeros((), params.W.dtype), (data.y, data.x_infr, data.row_valid)
        )
        return pre["ljc"] + Fsum / pre["N"]

    @partial(jax.jit, static_argnames=("self",))
    def free_energy(self, params: BSCParams, estate: EState, data: Data):
        """Truncated free energy from the stored lpj (reference full=False
        path, _models.py:397,424-436)."""
        params = self.check_params(params)
        pre = self._precompute(params, data)
        lpj = estate.lpj.reshape(-1, estate.lpj.shape[-1])
        valid = data.row_valid.reshape(-1)
        return free_energy_from_lpj(lpj, pre["ljc"], valid)
