"""Direct numerical parity against the reference implementation.

These tests import the actual reference code from /root/reference (via a
single-rank mpi4py stub) and compare one full EM step in *exact* E-step mode
(S = 2^H, where both implementations are deterministic given Theta — the
strongest equivalence oracle, SURVEY §4.3).  Skipped when the reference tree
is not present.
"""

import os
import sys

import numpy as np
import pytest

import jax

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "evo")), reason="reference not available"
)


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from measure_reference_baseline import install_mpi_stub

    install_mpi_stub()
    sys.path.insert(0, REF)
    import evo.models as ref_models
    import evo.variational.utils as ref_vutils

    return ref_models, ref_vutils


def _problem(rng, D, H, N):
    W = rng.standard_normal((D, H))
    Y = rng.standard_normal((N, D)) * 2.0 + 1.0
    return W, Y


def test_bsc_exact_em_step_matches_reference(ref_modules, rng):
    ref_models, ref_vutils = ref_modules
    D, H, N = 7, 5, 24
    S = 2**H
    W0, Y = _problem(rng, D, H, N)
    pi0, sigma0 = 0.2, 1.3

    # ---- reference step
    model_r = ref_models.BSC(D, H, S)
    theta_r = {"W": W0.copy(), "pi": pi0, "sigma": sigma0}
    suff_r = ref_vutils.init_states(N, S, H, "fit", "randflip", 4, 1, 1)
    data_r = {"y": Y.copy(), "x_infr": np.ones((N, D), bool)}
    F_r, _, _, theta_r = model_r.step(theta_r, suff_r, data_r)

    # ---- evo_tpu step (x64 so the only differences are algorithmic)
    from evo_tpu.models.bsc import BSC, BSCParams
    from evo_tpu.models.base import make_data
    from evo_tpu.variational.state_init import init_states

    with jax.enable_x64(True):
        import jax.numpy as jnp

        model = BSC(D=D, H=H)
        params = BSCParams(W=jnp.asarray(W0), pi=jnp.asarray(pi0),
                           sigma=jnp.asarray(sigma0),
                           pies=jnp.full((H,), pi0))
        data = make_data(Y, dtype=jnp.float64)
        cfg, estate = init_states(N=N, S=S, H=H, dtype=jnp.float64)
        assert cfg.exact
        new_params, estate, stats, _ = model.em_step(
            params, estate, data, jax.random.key(0), cfg
        )

    np.testing.assert_allclose(float(stats.F), F_r, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(new_params.W), theta_r["W"], rtol=1e-8)
    np.testing.assert_allclose(float(new_params.pi), theta_r["pi"], rtol=1e-10)
    np.testing.assert_allclose(float(new_params.sigma), theta_r["sigma"], rtol=1e-10)


def test_bsc_exact_free_energy_matches_reference(ref_modules, rng):
    ref_models, ref_vutils = ref_modules
    D, H, N = 6, 6, 15
    S = 2**H
    W0, Y = _problem(rng, D, H, N)

    model_r = ref_models.BSC(D, H, S)
    theta_r = {"W": W0.copy(), "pi": 0.15, "sigma": 0.9}
    suff_r = ref_vutils.init_states(N, S, H, "fit", "randflip", 4, 1, 1)
    data_r = {"y": Y.copy(), "x_infr": np.ones((N, D), bool)}
    F_full_r = model_r.free_energy(data_r, dict(theta_r), suff_r, full=True)

    from evo_tpu.models.bsc import BSC, BSCParams
    from evo_tpu.models.base import make_data

    with jax.enable_x64(True):
        import jax.numpy as jnp

        model = BSC(D=D, H=H)
        params = BSCParams(W=jnp.asarray(W0), pi=jnp.asarray(0.15),
                           sigma=jnp.asarray(0.9), pies=jnp.full((H,), 0.15))
        F_full = float(model.exact_free_energy(params, make_data(Y, dtype=jnp.float64)))

    np.testing.assert_allclose(F_full, F_full_r, rtol=1e-10)


def test_bsc_exact_incomplete_em_step_matches_reference(ref_modules, rng):
    """Missing-data path: masked lpj, posterior-predictive reconstruction,
    and the reconstruction-fed M-step (reference bsc.py:185-189,
    _models.py:614-665)."""
    ref_models, ref_vutils = ref_modules
    D, H, N = 7, 5, 20
    S = 2**H
    W0, Y = _problem(rng, D, H, N)
    mask = rng.random((N, D)) < 0.8
    mask[:, 0] = True  # keep at least one observed dim per row
    Y_nan = np.where(mask, Y, np.nan)
    pi0, sigma0 = 0.2, 1.1

    model_r = ref_models.BSC(D, H, S)
    theta_r = {"W": W0.copy(), "pi": pi0, "sigma": sigma0}
    suff_r = ref_vutils.init_states(N, S, H, "fit", "randflip", 4, 1, 1)
    data_r = {"y": np.where(mask, Y, 0.0), "x_infr": mask.copy(),
              "x": mask.copy()}
    F_r, _, _, theta_r = model_r.step(theta_r, suff_r, data_r,
                                      do_reconstruction=True)
    yrec_r = data_r["y_reconstructed"]

    from evo_tpu.models.bsc import BSC, BSCParams
    from evo_tpu.models.base import make_data
    from evo_tpu.variational.state_init import init_states

    with jax.enable_x64(True):
        import jax.numpy as jnp

        model = BSC(D=D, H=H)
        params = BSCParams(W=jnp.asarray(W0), pi=jnp.asarray(pi0),
                           sigma=jnp.asarray(sigma0), pies=jnp.full((H,), pi0))
        data = make_data(Y_nan, dtype=jnp.float64)
        assert data.incomplete
        cfg, estate = init_states(N=N, S=S, H=H, dtype=jnp.float64)
        new_params, estate, stats, y_rec = model.em_step(
            params, estate, data, jax.random.key(0), cfg, do_reconstruction=True
        )

    np.testing.assert_allclose(float(stats.F), F_r, rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(y_rec).reshape(N, D), yrec_r, rtol=1e-8
    )
    np.testing.assert_allclose(np.asarray(new_params.W), theta_r["W"], rtol=1e-7)
    np.testing.assert_allclose(float(new_params.sigma), theta_r["sigma"], rtol=1e-9)


def test_sssc_exact_em_step_matches_reference(ref_modules, rng):
    ref_models, ref_vutils = ref_modules
    D, H, N = 6, 4, 18
    S = 2**H
    W0, Y = _problem(rng, D, H, N)
    pies0 = rng.uniform(0.15, 0.35, H)
    mus0 = rng.standard_normal(H)
    A = rng.standard_normal((H, H)) * 0.2
    Psi0 = A @ A.T + np.eye(H)
    sigma20 = 1.1

    model_r = ref_models.SSSC(D, H, S)
    theta_r = {"W": W0.copy(), "pies": pies0.copy(), "mus": mus0.copy(),
               "Psi": Psi0.copy(), "sigma2": np.float64(sigma20)}
    suff_r = ref_vutils.init_states(N, S, H, "fit", "randflip", 4, 1, 1)
    data_r = {"y": Y.copy(), "x_infr": np.ones((N, D), bool)}
    F_r, _, _, theta_r = model_r.step(theta_r, suff_r, data_r)

    from evo_tpu.models.sssc import SSSC, SSSCParams
    from evo_tpu.models.base import make_data
    from evo_tpu.variational.state_init import init_states

    with jax.enable_x64(True):
        import jax.numpy as jnp

        model = SSSC(D=D, H=H)
        params = SSSCParams(W=jnp.asarray(W0), pies=jnp.asarray(pies0),
                            mus=jnp.asarray(mus0), Psi=jnp.asarray(Psi0),
                            sigma2=jnp.asarray(sigma20))
        data = make_data(Y, dtype=jnp.float64)
        cfg, estate = init_states(N=N, S=S, H=H, dtype=jnp.float64)
        assert cfg.exact
        new_params, estate, stats, _ = model.em_step(
            params, estate, data, jax.random.key(0), cfg
        )

    np.testing.assert_allclose(float(stats.F), F_r, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(new_params.W), theta_r["W"], rtol=1e-7)
    np.testing.assert_allclose(np.asarray(new_params.pies), theta_r["pies"], rtol=1e-8)
    np.testing.assert_allclose(np.asarray(new_params.mus), theta_r["mus"], rtol=1e-7)
    np.testing.assert_allclose(np.asarray(new_params.Psi), theta_r["Psi"],
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(float(new_params.sigma2), theta_r["sigma2"], rtol=1e-8)


def test_bsc_incomplete_x_subset_xinfr_matches_reference(ref_modules, rng):
    """x strictly smaller than x_infr (re-estimating some observed
    entries): the sigma update must follow the reference in computing the
    residual from y_RECONSTRUCTED over x_infr (bsc.py:184-218) — the two
    masks agreeing was previously the only tested configuration."""
    ref_models, ref_vutils = ref_modules
    D, H, N = 7, 5, 16
    S = 2**H
    W0, Y = _problem(rng, D, H, N)
    x_infr = rng.random((N, D)) < 0.85
    x_infr[:, 0] = True
    x = x_infr & (rng.random((N, D)) < 0.7)  # re-estimate ~30% of observed
    Y_nan = np.where(x_infr, Y, np.nan)
    pi0, sigma0 = 0.25, 1.2

    model_r = ref_models.BSC(D, H, S)
    theta_r = {"W": W0.copy(), "pi": pi0, "sigma": sigma0}
    suff_r = ref_vutils.init_states(N, S, H, "fit", "randflip", 4, 1, 1)
    data_r = {"y": np.where(x_infr, Y, 0.0), "x_infr": x_infr.copy(),
              "x": x.copy()}
    F_r, _, _, theta_r = model_r.step(theta_r, suff_r, data_r,
                                      do_reconstruction=True)

    from evo_tpu.models.bsc import BSC, BSCParams
    from evo_tpu.models.base import make_data
    from evo_tpu.variational.state_init import init_states

    with jax.enable_x64(True):
        import jax.numpy as jnp

        model = BSC(D=D, H=H)
        params = BSCParams(W=jnp.asarray(W0), pi=jnp.asarray(pi0),
                           sigma=jnp.asarray(sigma0), pies=jnp.full((H,), pi0))
        data = make_data(Y_nan, x=x, dtype=jnp.float64)
        assert data.incomplete
        cfg, estate = init_states(N=N, S=S, H=H, dtype=jnp.float64)
        new_params, estate, stats, y_rec = model.em_step(
            params, estate, data, jax.random.key(0), cfg,
            do_reconstruction=True)

    np.testing.assert_allclose(float(stats.F), F_r, rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(y_rec).reshape(N, D), data_r["y_reconstructed"], rtol=1e-8)
    np.testing.assert_allclose(np.asarray(new_params.W), theta_r["W"],
                               rtol=1e-7)
    np.testing.assert_allclose(float(new_params.sigma), theta_r["sigma"],
                               rtol=1e-9)
