"""ES3C app-level quality parity head-to-head against the actual reference
on identical DC-centered data and identical inits (the production setup of
the image apps).  Slow (~2 min of reference NumPy time); gated on the
reference tree."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "evo")),
                       reason="reference not available"),
]


def test_sssc_denoising_head_to_head_dc_centered():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from measure_reference_baseline import install_mpi_stub

    install_mpi_stub()
    sys.path.insert(0, REF)

    from evo_tpu.apps.images import synthetic_image
    from evo_tpu.prepost import OverlappingPatches, mean_merger, psnr

    clean = synthetic_image(48)
    rng = np.random.default_rng(0)
    noisy = clean + rng.normal(scale=25.0, size=clean.shape)
    ovp = OverlappingPatches(noisy, 5, 5, 1)
    Yr = ovp.get().T
    dc = Yr.mean(axis=1, keepdims=True)
    Y = (Yr - dc).astype(np.float64)
    N, D = Y.shape
    H, S, EPOCHS = 24, 16, 20
    psnr_noisy = psnr(clean, noisy)

    r1 = np.random.default_rng(1)
    pies0 = r1.uniform(0.1, 0.5, H)
    mus0 = r1.normal(0, 1, H)
    sig20 = float(Y.var() + 0.001)
    W0 = Y.mean(0)[:, None] + r1.normal(scale=np.sqrt(sig20) / 4, size=(D, H))

    # ---- reference (f64)
    from evo.models import SSSC as RefSSSC
    from evo.variational.utils import init_states as ref_init

    model_r = RefSSSC(D, H, S)
    theta_r = {"W": W0.copy(), "pies": pies0.copy(), "mus": mus0.copy(),
               "Psi": np.eye(H), "sigma2": np.float64(sig20)}
    suff_r = ref_init(N, S, H, "fit", "randflip", 8, 1, 1)
    data_r = {"y": Y.copy(), "x_infr": np.ones((N, D), bool),
              "x": np.zeros((N, D), bool)}
    for e in range(EPOCHS):
        F_r, _, _, theta_r = model_r.step(theta_r, suff_r, data_r,
                                          do_reconstruction=(e == EPOCHS - 1))
    psnr_r = psnr(clean, ovp.set_and_merge(
        (data_r["y_reconstructed"] + dc).T, mean_merger))

    # ---- evo_tpu (f32)
    import jax
    import jax.numpy as jnp

    from evo_tpu.models.sssc import SSSC, SSSCParams
    from evo_tpu.models.base import make_data
    from evo_tpu.variational.state_init import init_states

    model = SSSC(D=D, H=H)
    params = SSSCParams(W=jnp.asarray(W0, jnp.float32),
                        pies=jnp.asarray(pies0, jnp.float32),
                        mus=jnp.asarray(mus0, jnp.float32),
                        Psi=jnp.eye(H, dtype=jnp.float32),
                        sigma2=jnp.asarray(sig20, jnp.float32))
    data = make_data(Y, x=np.zeros((N, D), bool))
    cfg, estate = init_states(N=N, S=S, H=H, no_parents=8, no_children=1,
                              no_generations=1, seed=0)
    y_rec = None
    for e in range(EPOCHS):
        params, estate, stats, yr = model.em_step(
            params, estate, data, jax.random.fold_in(jax.random.key(2), e),
            cfg, do_reconstruction=(e == EPOCHS - 1))
        if yr is not None:
            y_rec = np.asarray(yr).reshape(-1, D)[:N]
    F_e = float(stats.F)
    psnr_e = psnr(clean, ovp.set_and_merge((y_rec + dc).T, mean_merger))

    assert psnr_r > psnr_noisy + 5
    assert psnr_e > psnr_noisy + 5
    assert abs(F_e - F_r) < 1.0, (F_e, F_r)
    assert psnr_e > psnr_r - 1.0, (psnr_e, psnr_r)
