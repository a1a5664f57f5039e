"""Oracle tests: the Gram-form BSC lpj must match an independent NumPy
transcription of the defining formula (reference bsc.py:79-97):

    lpj(s) = -1/(2 sigma^2) * || (W s - y)[x_infr] ||^2 + log(pi/(1-pi)) |s|
"""

import numpy as np
import jax
import jax.numpy as jnp

from evo_tpu.models.bsc import BSC
from evo_tpu.models.base import make_data
from evo_tpu.variational.state_init import full_state_matrix


def numpy_lpj(W, sigma, pi, y_n, mask_n, states):
    pre1 = -0.5 / sigma**2
    pil_bar = np.log(pi / (1 - pi))
    out = []
    for s in states:
        resid = (W @ s.astype(float) - y_n)[mask_n]
        out.append(pre1 * (resid**2).sum() + pil_bar * s.sum())
    return np.array(out)


def test_lpj_matches_numpy_complete(rng):
    D, H, K = 9, 6, 11
    W = rng.normal(size=(D, H))
    sigma, pi = 0.7, 0.2
    y = rng.normal(size=(D,))
    states = rng.random((K, H)) < 0.4

    G = W.T @ W
    Wty = W.T @ y
    y2 = (y**2).sum()
    got = np.asarray(
        BSC._lpj_one(
            jnp.asarray(states),
            jnp.asarray(G),
            jnp.asarray(Wty),
            jnp.asarray(y2),
            jnp.asarray(-0.5 / sigma**2),
            jnp.asarray(np.log(pi / (1 - pi))),
        )
    )
    want = numpy_lpj(W, sigma, pi, y, np.ones(D, bool), states)
    # Gram-form cancellation costs a few ulps at f32
    np.testing.assert_allclose(got, want, rtol=5e-3)


def test_lpj_matches_numpy_complete_x64_exact(rng):
    """Under x64 the Gram form must agree with the direct residual form to
    near machine precision, validating the algebraic re-arrangement."""
    D, H, K = 9, 6, 11
    W = rng.normal(size=(D, H))
    sigma, pi = 0.7, 0.2
    y = rng.normal(size=(D,))
    states = rng.random((K, H)) < 0.4
    with jax.enable_x64(True):
        got = np.asarray(
            BSC._lpj_one(
                jnp.asarray(states),
                jnp.asarray(W.T @ W),
                jnp.asarray(W.T @ y),
                jnp.asarray((y**2).sum()),
                jnp.asarray(-0.5 / sigma**2),
                jnp.asarray(np.log(pi / (1 - pi))),
            )
        )
    want = numpy_lpj(W, sigma, pi, y, np.ones(D, bool), states)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_lpj_matches_numpy_incomplete(rng):
    D, H, K = 10, 5, 7
    W = rng.normal(size=(D, H))
    sigma, pi = 1.3, 0.15
    y = rng.normal(size=(D,))
    mask = rng.random(D) < 0.7
    mask[0] = True
    states = rng.random((K, H)) < 0.4

    m = mask.astype(float)
    G = W.T @ (m[:, None] * W)
    Wty = W.T @ (m * y)
    y2 = (m * y**2).sum()
    got = np.asarray(
        BSC._lpj_one(
            jnp.asarray(states),
            jnp.asarray(G),
            jnp.asarray(Wty),
            jnp.asarray(y2),
            jnp.asarray(-0.5 / sigma**2),
            jnp.asarray(np.log(pi / (1 - pi))),
        )
    )
    want = numpy_lpj(W, sigma, pi, y, mask, states)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-4)


def numpy_exact_free_energy(W, sigma, pi, Y):
    """Independent full-enumeration likelihood for tiny H."""
    N, D = Y.shape
    H = W.shape[1]
    sm = full_state_matrix(H)
    ljc = H * np.log(1 - pi) - D / 2 * np.log(2 * np.pi * sigma**2)
    total = 0.0
    for n in range(N):
        lpj = numpy_lpj(W, sigma, pi, Y[n], np.ones(D, bool), sm)
        mx = lpj.max()
        total += np.log(np.exp(lpj - mx).sum()) + mx
    return ljc + total / N


def test_exact_free_energy_matches_numpy(rng):
    D, H, N = 6, 4, 13
    W = rng.normal(size=(D, H))
    sigma, pi = 0.9, 0.25
    Y = rng.normal(size=(N, D))
    model = BSC(D=D, H=H)
    data = make_data(Y, n_blocks=1)
    from evo_tpu.models.bsc import BSCParams

    params = BSCParams(
        W=jnp.asarray(W, jnp.float32),
        pi=jnp.asarray(pi, jnp.float32),
        sigma=jnp.asarray(sigma, jnp.float32),
        pies=jnp.full((H,), pi, jnp.float32),
    )
    got = float(model.exact_free_energy(params, data))
    want = numpy_exact_free_energy(W, sigma, pi, Y)
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_exact_free_energy_padding_invariant(rng):
    D, H, N = 6, 4, 13
    W = rng.normal(size=(D, H))
    Y = rng.normal(size=(N, D))
    model = BSC(D=D, H=H)
    from evo_tpu.models.bsc import BSCParams

    params = BSCParams(
        W=jnp.asarray(W, jnp.float32),
        pi=jnp.asarray(0.2, jnp.float32),
        sigma=jnp.asarray(1.0, jnp.float32),
        pies=jnp.full((H,), 0.2, jnp.float32),
    )
    f1 = float(model.exact_free_energy(params, make_data(Y, n_blocks=1)))
    f2 = float(model.exact_free_energy(params, make_data(Y, n_blocks=2, pad_multiple=4)))
    np.testing.assert_allclose(f1, f2, rtol=1e-5)
