import numpy as np
import jax
import jax.numpy as jnp

from evo_tpu.ops.linalg import pd_inverse_logdet


def test_pd_inverse_logdet_random(rng):
    for H in [1, 2, 3, 5, 8, 17, 32]:
        A = rng.standard_normal((6, H, H))
        A = A @ np.swapaxes(A, -1, -2) + 2.0 * np.eye(H)
        with jax.enable_x64(True):
            inv, ld = pd_inverse_logdet(jnp.asarray(A))
        np.testing.assert_allclose(np.asarray(inv), np.linalg.inv(A), rtol=1e-8)
        np.testing.assert_allclose(np.asarray(ld), np.linalg.slogdet(A)[1],
                                   rtol=1e-10)


def test_pd_inverse_logdet_identity_padded_structure(rng):
    """The SSSC use case: Psi~ = Psi .* ss^T + diag(1-s)."""
    H = 10
    A0 = rng.standard_normal((H, H)) * 0.3
    Psi = A0 @ A0.T + np.eye(H)
    s = rng.random(H) < 0.5
    sf = s.astype(float)
    Ppad = Psi * np.outer(sf, sf) + np.diag(1 - sf)
    with jax.enable_x64(True):
        inv, ld = pd_inverse_logdet(jnp.asarray(Ppad))
    idx = np.where(s)[0]
    np.testing.assert_allclose(np.asarray(ld),
                               np.linalg.slogdet(Psi[np.ix_(idx, idx)])[1],
                               rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(inv)[np.ix_(idx, idx)],
        np.linalg.inv(Psi[np.ix_(idx, idx)]), rtol=1e-8,
    )


def test_pd_inverse_f32_accuracy(rng):
    H = 32
    A = rng.standard_normal((4, H, H)).astype(np.float32)
    A = A @ np.swapaxes(A, -1, -2) + H * np.eye(H, dtype=np.float32)
    inv, ld = pd_inverse_logdet(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(inv), np.linalg.inv(A.astype(float)),
                               rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld),
                               np.linalg.slogdet(A.astype(float))[1], rtol=1e-4)
