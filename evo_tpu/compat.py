"""Drop-in compatibility layer mirroring the reference's dict-based API.

The reference drives training as (examples/bars-test/main.py:66-167):

    model = BSC(D, H, S)                       # or SSSC
    my_suff_stat = init_states(my_N, S, H, "fit", "randflip", 10, 1, 1)
    theta = model.check_params(model.standard_init(my_data))
    F, S_nunique, S_sub, theta = model.step(theta, my_suff_stat, my_data)

This module reproduces that surface on top of evo_tpu's functional core, so
reference users can switch by changing one import.  `theta` is a plain dict
of numpy-convertible arrays with the reference's key names; `my_data` is the
reference dict ({"y", optionally "x_infr", "x"}); `my_suff_stat` is a
dict-like handle that carries the EAConfig and the device-resident EState
(exposing "ss" and "lpj" for inspection).

Notes:
  - N is the *global* number of datapoints (there are no per-rank chunks;
    data parallelism happens inside the compiled step).
  - randomness comes from a seed (my_suff_stat["seed"]), advanced per step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from evo_tpu.models import base as _base
from evo_tpu.models.bsc import BSC as _BSC, BSCParams
from evo_tpu.models.sssc import SSSC as _SSSC, SSSCParams
from evo_tpu.variational import state_init as _si


def init_states(
    N, S, H, parent_selection="fit", mutation_algorithm="randflip",
    no_parents=10, no_children=1, no_generations=1, bitflip_prob=None,
    Mprime=None, p_init_Kn=None, permanent=None, seed=0, n_blocks=1,
):
    """Reference signature (evo/variational/utils.py:155-228); `permanent`
    is the reference dict {"allzero": bool, "background": bool}."""
    permanent = permanent or {}
    cfg, estate = _si.init_states(
        N=N, S=S, H=H, parent_selection=parent_selection,
        mutation_algorithm=mutation_algorithm, no_parents=no_parents,
        no_children=no_children, no_generations=no_generations,
        bitflip_prob=bitflip_prob, Mprime=Mprime, p_init_Kn=p_init_Kn,
        allzero=bool(permanent.get("allzero", False)),
        background=bool(permanent.get("background", False)),
        seed=seed, n_blocks=n_blocks,
    )
    return {"cfg": cfg, "estate": estate, "seed": seed, "step": 0,
            "S_perm": cfg.S_perm,
            "permanent": {"allzero": cfg.allzero, "background": cfg.background}}


class _CompatModel:
    _param_keys = ()

    def __init__(self, D, H, S, to_learn=None):
        self.D, self.H, self.S = D, H, S
        self._data: Optional[_base.Data] = None
        self._y_sig = None
        if to_learn is not None:
            self._core = dataclasses.replace(self._core, to_learn=tuple(to_learn))

    # -- dict <-> params ----------------------------------------------------
    def _to_params(self, theta: dict):
        raise NotImplementedError

    def _to_dict(self, params) -> dict:
        return {f.name: np.asarray(getattr(params, f.name))
                for f in dataclasses.fields(params)}

    # -- data ---------------------------------------------------------------
    def _get_data(self, my_data: dict, n_blocks: int = 1) -> _base.Data:
        """Build (or reuse) the device-resident Data for the reference dict.

        The reference reads y/x_infr/x fresh every step, so a drop-in user
        may mutate them between steps; the cache is therefore keyed on the
        CONTENT of the assembled inputs (a blake2b fingerprint — the masked
        y already encodes x_infr via its NaNs), never on object identity.
        Hashing is O(N*D) like the mask application itself; what the cache
        saves is the host->device transfer and re-blocking."""
        import hashlib

        y = np.asarray(my_data["y"], dtype=float)
        if "x_infr" in my_data:
            y = np.where(np.asarray(my_data["x_infr"], bool), y, np.nan)
        x = my_data.get("x")
        x_arr = np.asarray(x, bool) if x is not None else None
        fp = hashlib.blake2b(digest_size=16)
        fp.update(np.ascontiguousarray(y))
        if x_arr is not None:
            fp.update(np.ascontiguousarray(x_arr))
        sig = (y.shape, None if x_arr is None else x_arr.shape,
               fp.hexdigest(), n_blocks)
        if self._data is None or sig != self._y_sig:
            # n_blocks must match the estate's block structure (the epoch
            # scans over blocks), so it is part of the cache signature
            self._data = _base.make_data(y, x=x_arr, n_blocks=n_blocks)
            self._y_sig = sig
            self._y_host = y
        return self._data

    # -- reference API ------------------------------------------------------
    def standard_init(self, my_data: dict, **kwargs) -> dict:
        data = self._get_data(my_data)
        params = self._core.standard_init(data, y_host=self._y_host, **kwargs)
        return self._to_dict(params)

    def check_params(self, theta: dict) -> dict:
        return self._to_dict(self._core.check_params(self._to_params(theta)))

    def generate_data(self, theta: dict, N: int, seed: int = 0) -> dict:
        out = self._core.generate_data(jax.random.key(seed),
                                       self._to_params(theta), N)
        return {k: np.asarray(v) for k, v in out.items()}

    def generate_from_hidden(self, theta: dict, my_hdata: dict, seed: int = 0) -> dict:
        out = self._core.generate_from_hidden(
            jax.random.key(seed), self._to_params(theta),
            jnp.asarray(my_hdata["s"], bool))
        return {k: np.asarray(v) for k, v in out.items()}

    def step(self, theta: dict, my_suff_stat: dict, my_data: dict,
             do_reconstruction: bool = False):
        """Reference Model.step (evo/models/_models.py:162-203): returns
        (F, S_nunique, S_sub, theta_new); reconstructions are written to
        my_data["y_reconstructed"]."""
        estate = my_suff_stat["estate"]
        data = self._get_data(my_data, n_blocks=int(estate.ss.shape[0]))
        cfg = my_suff_stat["cfg"]
        key = jax.random.fold_in(jax.random.key(my_suff_stat["seed"]),
                                 my_suff_stat["step"])
        params, estate, stats, y_rec = self._core.em_step(
            self._to_params(theta), estate, data, key, cfg,
            do_reconstruction=do_reconstruction,
        )
        my_suff_stat["estate"] = estate
        my_suff_stat["step"] += 1
        if do_reconstruction and y_rec is not None:
            N = np.asarray(my_data["y"]).shape[0]
            my_data["y_reconstructed"] = np.asarray(y_rec).reshape(
                -1, self.D)[:N]
        # one device->host transfer for all scalars (per-field float()
        # readbacks each pay a full dispatch round-trip; see CLAUDE.md)
        stats = jax.device_get(stats)
        return (float(stats.F), float(stats.S_nunique), float(stats.S_sub),
                self._to_dict(params))

    def free_energy(self, my_data: dict, theta: dict, my_suff_stat: dict = None,
                    full: bool = True):
        """Reference free_energy (evo/models/_models.py:334-451)."""
        n_blocks = (1 if my_suff_stat is None
                    else int(my_suff_stat["estate"].ss.shape[0]))
        data = self._get_data(my_data, n_blocks=n_blocks)
        params = self._to_params(theta)
        if full:
            return float(self._core.exact_free_energy(params, data))
        return float(self._core.free_energy(params, my_suff_stat["estate"], data))


class BSC(_CompatModel):
    def __init__(self, D, H, S, to_learn=("W", "pi", "sigma")):
        self._core = _BSC(D=int(D), H=int(H), to_learn=tuple(to_learn))
        super().__init__(int(D), int(H), int(S))

    def _to_params(self, theta: dict) -> BSCParams:
        pi = theta["pi"]
        pies = theta.get("pies")
        if pies is None:
            pies = np.full(self.H, float(np.asarray(pi)))
        return BSCParams(
            W=jnp.asarray(theta["W"], jnp.float32),
            pi=jnp.asarray(pi, jnp.float32),
            sigma=jnp.asarray(theta["sigma"], jnp.float32),
            pies=jnp.asarray(pies, jnp.float32),
        )


class SSSC(_CompatModel):
    def __init__(self, D, H, S, to_learn=("W", "pies", "mus", "sigma2", "Psi"),
                 **_ignored):
        self._core = _SSSC(D=int(D), H=int(H), to_learn=tuple(to_learn))
        super().__init__(int(D), int(H), int(S))

    def _to_params(self, theta: dict) -> SSSCParams:
        return SSSCParams(
            W=jnp.asarray(theta["W"], jnp.float32),
            pies=jnp.asarray(theta["pies"], jnp.float32),
            mus=jnp.asarray(theta["mus"], jnp.float32),
            Psi=jnp.asarray(theta["Psi"], jnp.float32),
            sigma2=jnp.asarray(theta["sigma2"], jnp.float32),
        )
