import numpy as np
import jax
import jax.numpy as jnp

from evo_tpu.variational.selection import fitparents_idx, randparents_idx


def test_fitparents_no_replacement():
    lpj = jnp.asarray(np.random.default_rng(0).normal(size=12).astype(np.float32))
    for i in range(20):
        idx = np.asarray(fitparents_idx(jax.random.key(i), lpj, 5))
        assert len(set(idx.tolist())) == 5


def test_fitparents_proportional_to_fitness():
    # two candidates dominate: fitness = lpj - 2*min(min,0)
    lpj = jnp.asarray(np.array([-1.0, -1.0, -100.0, -100.0], np.float32))
    # fitness = lpj + 200 -> [199, 199, 100, 100]; P(first pick in {0,1}) ~ 0.665
    wins = 0
    trials = 300
    for i in range(trials):
        idx = np.asarray(fitparents_idx(jax.random.key(i), lpj, 1))
        wins += int(idx[0] in (0, 1))
    frac = wins / trials
    assert 0.55 < frac < 0.78


def test_randparents_uniform_no_replacement():
    counts = np.zeros(6)
    for i in range(300):
        idx = np.asarray(randparents_idx(jax.random.key(i), 6, 3))
        assert len(set(idx.tolist())) == 3
        counts[idx] += 1
    assert counts.min() > 100  # each expected 150


def test_fitparents_robust_to_reset_floored_lpj():
    """Regression: a reset-floored lpj (eps_lpj = finfo.min, e.g. a failed
    SSSC solve clamped by reset_lpj) in the pool used to overflow the
    2*min fitness shift to -inf, making EVERY candidate's fitness +inf —
    selection silently degenerated to deterministic first-k index order.
    Floored entries must get ~zero selection probability while the rest
    keep fitness-proportional randomized selection."""
    floor = float(np.finfo(np.float32).min)
    lpj = jnp.asarray(np.array([-1.0, -1.0, -100.0, floor], np.float32))
    picks = []
    for i in range(200):
        idx = np.asarray(fitparents_idx(jax.random.key(i), lpj, 2))
        assert 3 not in idx.tolist(), "floored candidate was selected"
        picks.append(tuple(sorted(idx.tolist())))
    # randomness and fitness-proportionality survive: the weaker healthy
    # candidate (index 2) still gets picked sometimes, and not always
    assert any(2 in p for p in picks)
    assert not all(p == picks[0] for p in picks)
