"""Permanent-state handling (allzero / background) and the full
mutation x selection operator matrix, end-to-end through em_step."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from evo_tpu.models.bsc import BSC
from evo_tpu.models.base import make_data
from evo_tpu.utils.bars import generate_bars_dict
from evo_tpu.variational.state_init import init_states


def _data(N=64, H=6, seed=0):
    D = (H // 2) ** 2
    model = BSC(D=D, H=H)
    rng = np.random.default_rng(seed)
    W = 5.0 * generate_bars_dict(H)
    s = rng.random((N, H)) < 2.0 / H
    Y = s @ W.T + rng.normal(size=(N, D))
    return model, Y


def test_allzero_exact_mode_matches_plain_exact():
    """With allzero=True the zero state moves from K into the permanent slot;
    the free energy over (permanent + K) must equal the plain full-
    enumeration free energy."""
    model, Y = _data(H=5)
    data = make_data(Y)
    N = Y.shape[0]

    cfg0, est0 = init_states(N=N, S=2**5, H=5, allzero=False)
    cfg1, est1 = init_states(N=N, S=2**5, H=5, allzero=True)
    assert cfg0.exact and cfg1.exact
    assert cfg1.S_perm == 1 and cfg1.S == 2**5 - 1

    params = model.standard_init(data, seed=0)
    _, _, s0, _ = model.em_step(params, est0, data, jax.random.key(0), cfg0)
    _, _, s1, _ = model.em_step(params, est1, data, jax.random.key(0), cfg1)
    np.testing.assert_allclose(float(s0.F), float(s1.F), rtol=1e-5)


@pytest.mark.slow
def test_allzero_ea_mode_runs_and_never_inserts_zero_state():
    model, Y = _data(H=6)
    data = make_data(Y)
    N = Y.shape[0]
    cfg, estate = init_states(N=N, S=8, H=6, no_parents=4, no_children=2,
                              no_generations=2, allzero=True)
    params = model.standard_init(data, seed=0)
    for e in range(5):
        params, estate, stats, _ = model.em_step(
            params, estate, data, jax.random.fold_in(jax.random.key(1), e), cfg)
    assert np.isfinite(float(stats.F))
    # the all-zero state must never enter K (it is permanent)
    ss = np.asarray(estate.ss).reshape(-1, 6)
    assert ss.any(axis=1).all()


@pytest.mark.slow
def test_background_unit_always_on():
    """background=True forces the last latent unit ON in every state
    (reference eas.py:215-219, utils.py:97-98) and pins pies[-1]
    (bsc.py:259-260)."""
    model, Y = _data(H=6)
    data = make_data(Y)
    N = Y.shape[0]
    cfg, estate = init_states(N=N, S=8, H=6, no_parents=4, no_children=1,
                              no_generations=2, background=True)
    assert cfg.background and cfg.S_perm == 0
    params = model.standard_init(data, seed=0)
    for e in range(4):
        params, estate, stats, _ = model.em_step(
            params, estate, data, jax.random.fold_in(jax.random.key(2), e), cfg)
    ss = np.asarray(estate.ss).reshape(-1, 8, 6)
    assert ss[:, :, -1].all(), "background unit must stay ON in all states"
    assert np.isfinite(float(stats.F))
    np.testing.assert_allclose(float(params.pies[-1]), 1.0 - 1.1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("mutation", ["randflip", "sparseflip", "cross",
                                      "cross_randflip", "cross_sparseflip"])
@pytest.mark.parametrize("selection", ["fit", "rand"])
def test_all_operator_combinations_improve_f(mutation, selection):
    model, Y = _data(N=96, H=6)
    data = make_data(Y)
    N = Y.shape[0]
    cfg, estate = init_states(
        N=N, S=10, H=6, parent_selection=selection, mutation_algorithm=mutation,
        no_parents=4, no_children=2, no_generations=2,
        bitflip_prob=0.1 if "sparseflip" in mutation else None,
    )
    if "cross" in mutation:
        assert cfg.children_per_gen == 4 * 3  # n_parents*(n_parents-1)
    params = model.standard_init(data, seed=0)
    Fs = []
    for e in range(6):
        params, estate, stats, _ = model.em_step(
            params, estate, data, jax.random.fold_in(jax.random.key(3), e), cfg)
        Fs.append(float(stats.F))
    assert np.isfinite(Fs).all()
    assert Fs[-1] > Fs[0], Fs


def test_mprime_caps_substitutions_end_to_end():
    model, Y = _data(N=48, H=6)
    data = make_data(Y)
    N = Y.shape[0]
    cfg, estate = init_states(N=N, S=10, H=6, no_parents=6, no_children=2,
                              no_generations=1, Mprime=2)
    params = model.standard_init(data, seed=0)
    _, _, stats, _ = model.em_step(params, estate, data, jax.random.key(0), cfg)
    assert float(stats.S_sub) <= 2.0 + 1e-6
