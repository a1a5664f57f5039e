import numpy as np
import jax.numpy as jnp

from evo_tpu.ops.bitpack import pack_states, dup_within, dup_against, n_words


def test_pack_roundtrip_uniqueness(rng):
    for H in [3, 8, 32, 33, 100]:
        ss = rng.random((50, H)) < 0.3
        keys = np.asarray(pack_states(jnp.asarray(ss)))
        assert keys.shape == (50, n_words(H))
        # identical rows <-> identical keys
        for i in range(50):
            for j in range(i):
                same_state = (ss[i] == ss[j]).all()
                same_key = (keys[i] == keys[j]).all()
                assert same_state == same_key


def test_dup_within_first_occurrence(rng):
    H = 10
    ss = rng.random((6, H)) < 0.3
    ss[3] = ss[1]
    ss[5] = ss[1]
    dup = np.asarray(dup_within(pack_states(jnp.asarray(ss))))
    assert not dup[1]
    assert dup[3] and dup[5]
    assert not dup[0]


def test_dup_against_respects_validity(rng):
    H = 16
    seen = rng.random((4, H)) < 0.5
    probe = np.stack([seen[0], seen[2], ~seen[0]])
    keys = pack_states(jnp.asarray(probe))
    seen_keys = pack_states(jnp.asarray(seen))
    valid = jnp.array([True, True, False, True])
    dup = np.asarray(dup_against(keys, seen_keys, valid))
    assert dup[0]  # seen[0] valid
    assert not dup[1]  # seen[2] invalid
    assert not dup[2]
