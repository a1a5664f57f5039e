"""Multi-device data parallelism tests on the 8-virtual-CPU mesh.

World-size invariance is the reference's guarantee too (rank-0 bcasts make
results world-size-invariant by construction; SURVEY §4.6): the same em_step
on sharded vs unsharded inputs must produce identical results.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from evo_tpu import BSC, init_states
from evo_tpu.models import make_data
from evo_tpu.parallel import make_mesh, shard_blocked


def _setup(N=64, H=6, S=8, n_blocks=2):
    D = (H // 2) ** 2
    model = BSC(D=D, H=H)
    Y = np.random.default_rng(0).normal(size=(N, D))
    data = make_data(Y, n_blocks=n_blocks)
    cfg, estate = init_states(N=N, S=S, H=H, no_parents=4, no_children=1,
                              no_generations=2, n_blocks=n_blocks)
    params = model.standard_init(data, seed=0)
    return model, cfg, params, estate, data


def test_sharded_matches_unsharded():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    model, cfg, params, estate, data = _setup()
    key = jax.random.key(5)

    p1, e1, s1, _ = model.em_step(params, estate, data, key, cfg)

    mesh = make_mesh(8)
    data_s = shard_blocked(data, mesh)
    estate_s = shard_blocked(estate, mesh)
    params_s = jax.tree.map(
        lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, P())), params
    )
    p2, e2, s2, _ = model.em_step(params_s, estate_s, data_s, key, cfg)

    np.testing.assert_allclose(float(s1.F), float(s2.F), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p1.W), np.asarray(p2.W), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(e1.ss), np.asarray(e2.ss))


def test_dryrun_multichip_entrypoint():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out[2]))
