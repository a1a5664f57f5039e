"""The compat layer must run the reference's driver pattern verbatim
(modulo the import) and converge on the bars test."""

import numpy as np
import pytest

from evo_tpu.compat import BSC, SSSC, init_states
from evo_tpu.utils.bars import generate_bars_dict


def test_compat_bsc_reference_driver_pattern():
    H, S, N = 6, 12, 200
    D = (H // 2) ** 2
    model = BSC(D, H, S)

    theta_gen = {"W": 8.0 * generate_bars_dict(H), "pi": 2.0 / H, "sigma": 1.0}
    data_gen = model.generate_data(theta_gen, N, seed=0)
    my_data = {"y": data_gen["y"],
               "x_infr": np.logical_not(np.isnan(data_gen["y"]))}

    theta = model.check_params(model.standard_init(my_data, seed=0))
    my_suff_stat = init_states(N, S, H, "fit", "randflip", 6, 1, 1, seed=0)

    L_gen = model.free_energy(my_data, dict(theta_gen), my_suff_stat, full=True)

    Fs = []
    for e in range(15):
        F, S_nunique, S_sub, theta = model.step(theta, my_suff_stat, my_data)
        Fs.append(F)
    assert np.isfinite(Fs).all()
    assert Fs[-1] > Fs[0]
    assert Fs[-1] <= L_gen + 1.0  # free energy bounded by data likelihood-ish
    assert sorted(theta) >= ["W", "pi", "pies", "sigma"]


@pytest.mark.slow
def test_compat_sssc_with_reconstruction():
    H, S, N, D = 4, 8, 60, 9
    rng = np.random.default_rng(0)
    Y = rng.normal(size=(N, D)) + 2.0
    Y[::5, :3] = np.nan
    my_data = {"y": Y, "x_infr": ~np.isnan(Y), "x": ~np.isnan(Y)}

    model = SSSC(D, H, S, to_learn=["W", "pies", "sigma2"])
    theta = model.check_params(model.standard_init(my_data, seed=0))
    my_suff_stat = init_states(N, S, H, "fit", "randflip", 4, 1, 1, seed=0)

    for e in range(3):
        F, _, _, theta = model.step(theta, my_suff_stat, my_data,
                                    do_reconstruction=True)
    assert "y_reconstructed" in my_data
    yr = my_data["y_reconstructed"]
    assert yr.shape == Y.shape and np.isfinite(yr).all()
    obs = ~np.isnan(Y)
    np.testing.assert_allclose(yr[obs], Y[obs], rtol=1e-5)


def test_compat_exact_free_energy_matches_core():
    from evo_tpu.models.bsc import BSC as CoreBSC, BSCParams
    from evo_tpu.models.base import make_data
    import jax.numpy as jnp

    H, D, N = 5, 8, 30
    rng = np.random.default_rng(1)
    W = rng.normal(size=(D, H))
    Y = rng.normal(size=(N, D))
    theta = {"W": W, "pi": 0.2, "sigma": 1.0}
    compat = BSC(D, H, 2**H)
    F1 = compat.free_energy({"y": Y}, theta, full=True)
    core = CoreBSC(D=D, H=H)
    params = BSCParams(W=jnp.asarray(W, jnp.float32), pi=jnp.asarray(0.2),
                       sigma=jnp.asarray(1.0), pies=jnp.full((H,), 0.2))
    F2 = float(core.exact_free_energy(params, make_data(Y)))
    np.testing.assert_allclose(F1, F2, rtol=1e-6)


def test_compat_data_cache_sees_inplace_mutation():
    """In-place mutation of my_data['y'] (or swapping the mask) between
    steps must be picked up — the reference dict API reads y/x fresh every
    step (ADVICE r1: the cache was keyed on id(y) and went stale)."""
    H, S, N, D = 4, 8, 40, 6
    rng = np.random.default_rng(1)
    Y = rng.normal(size=(N, D)) + 1.0
    my_data = {"y": Y}

    model = BSC(D, H, S)
    theta = model.check_params(model.standard_init(my_data, seed=0))
    my_suff_stat = init_states(N, S, H, "fit", "randflip", 4, 1, 1, seed=0)
    F1, _, _, _ = model.step(dict(theta), dict(my_suff_stat, estate=my_suff_stat["estate"]), my_data)

    # same object id, different content -> must change the result
    Y *= 3.0
    my_suff_stat2 = init_states(N, S, H, "fit", "randflip", 4, 1, 1, seed=0)
    F2, _, _, _ = model.step(dict(theta), my_suff_stat2, my_data)
    assert F1 != F2

    # and back to the original content -> original result (same estate/seed)
    Y /= 3.0
    my_suff_stat3 = init_states(N, S, H, "fit", "randflip", 4, 1, 1, seed=0)
    F3, _, _, _ = model.step(dict(theta), my_suff_stat3, my_data)
    assert F1 == F3


def test_incomplete_without_reconstruction_raises():
    """Mirror of the reference's assert (bsc.py:185-189): training on
    incomplete data without do_reconstruction would silently bias W."""
    import jax as _jax
    import pytest

    from evo_tpu.models.bsc import BSC as CoreBSC
    from evo_tpu.models.sssc import SSSC as CoreSSSC
    from evo_tpu.models.base import make_data
    from evo_tpu.variational.state_init import init_states as core_init

    N, H, D, S = 16, 4, 5, 6
    Y = np.random.default_rng(0).normal(size=(N, D))
    Y[0, 0] = np.nan
    data = make_data(Y)
    cfg, estate = core_init(N=N, S=S, H=H, no_parents=3)
    for model in (CoreBSC(D=D, H=H), CoreSSSC(D=D, H=H)):
        params = model.standard_init(data, seed=0)
        with pytest.raises(ValueError, match="do_reconstruction"):
            model.em_step(params, estate, data, _jax.random.key(0), cfg)


@pytest.mark.slow
def test_compat_n_blocks_threads_into_data():
    """Regression: compat.init_states accepted n_blocks but _get_data always
    built single-block Data, so any n_blocks > 1 estate could never match
    the data's block structure (shape mismatch at trace time)."""
    from evo_tpu import compat

    rng = np.random.default_rng(0)
    N, D, H, S = 64, 9, 6, 10
    Y = rng.normal(size=(N, D))
    model = compat.BSC(D, H, S)
    ss = compat.init_states(N, S, H, "fit", "randflip", 5, 1, 1, n_blocks=4)
    theta = model.check_params(model.standard_init({"y": Y}))
    Fprev = None
    for _ in range(3):
        F, n_uni, n_sub, theta = model.step(theta, ss, {"y": Y})
        assert np.isfinite(F)
        if Fprev is not None:  # monotone up to f32 reduction noise
            assert F >= Fprev - 1e-2 * abs(Fprev), (F, Fprev)
        Fprev = F
    # truncated free energy reuses the blocked estate
    Ftrunc = model.free_energy({"y": Y}, theta, ss, full=False)
    assert np.isfinite(Ftrunc)
