"""Bars-test experiment: ground-truth recovery with exact-likelihood oracle
(capability parity with reference examples/bars-test/main.py)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from evo_tpu.apps.common import (apply_platform_env, chunking_kwargs,
                                 params_to_dict,
                                 setup_experiment, warm_d2h_async)
from evo_tpu.apps.training import EMTrainer
from evo_tpu.apps.viz import BarsVisualizer
from evo_tpu.models import make_data
from evo_tpu.models.bsc import BSC, BSCParams
from evo_tpu.models.sssc import SSSC, SSSCParams
from evo_tpu.utils.bars import generate_bars_dict
from evo_tpu.variational.state_init import init_states


def build_theta_gen(algo: str, H: int, args):
    pi_gen = args.pi_gen if args.pi_gen is not None else 2.0 / H
    W = jnp.asarray(args.bar_amp * generate_bars_dict(H, args.neg_bars), jnp.float32)
    if algo == "ebsc":
        return BSCParams(W=W, pi=jnp.asarray(pi_gen, jnp.float32),
                         sigma=jnp.asarray(args.sigma_gen, jnp.float32),
                         pies=jnp.full((H,), pi_gen, jnp.float32))
    return SSSCParams(W=W, pies=jnp.full((H,), pi_gen, jnp.float32),
                      mus=jnp.full((H,), args.mu_gen, jnp.float32),
                      Psi=jnp.eye(H, dtype=jnp.float32) * args.psi_gen**2,
                      sigma2=jnp.asarray(args.sigma_gen**2, jnp.float32))


def run(args) -> dict:
    apply_platform_env()
    warm_d2h_async()
    dlog, outdir = setup_experiment(args, "bars-test")
    H = args.H
    D = (H // 2) ** 2
    N = args.no_data_points

    model = {"ebsc": BSC, "es3c": SSSC}[args.algo](D=D, H=H)
    theta_gen = build_theta_gen(args.algo, H, args)
    dlog.append("model", args.algo.upper())
    dlog.append_all({f"{k}_gen": v for k, v in params_to_dict(theta_gen).items()})

    print("Generating data")
    gen = model.generate_data(jax.random.key(args.seed), theta_gen, N)
    Y = np.asarray(gen["y"])
    dlog.append("Y", Y)

    data = make_data(Y, n_blocks=args.n_blocks)
    print("Initializing model parameters")
    params = model.standard_init(data, seed=args.seed, y_host=Y)
    dlog.append_all({f"{k}_init": v for k, v in params_to_dict(params).items()})

    print("Initializing variational parameters")
    N_padded = data.y.shape[0] * data.y.shape[1]  # includes padding rows
    cfg, estate = init_states(
        N=N_padded, S=args.Ksize, H=H,
        parent_selection=args.parent_selection,
        mutation_algorithm=args.mutation_algorithm,
        no_parents=args.no_parents, no_children=args.no_children,
        no_generations=args.no_generations, bitflip_prob=args.bitflip_prob,
        n_blocks=args.n_blocks, seed=args.seed,
    )

    if H <= 10:
        print("Computing exact likelihood")
        L_gen = float(model.exact_free_energy(theta_gen, data))
        dlog.append("L_gen", L_gen)
        print(f"\tL_gen = {L_gen:.4f}")
    else:
        L_gen = None
        print(f"Did not compute exact likelihood (too expensive for H={H})")

    visualizer = BarsVisualizer(
        viz_every=args.viz_every or args.no_epochs,
        output_directory=outdir,
        theta_gen_W=np.asarray(theta_gen.W),
        L_gen=L_gen,
        gif_framerate=args.gif_framerate,
    )

    trainer = EMTrainer(model, cfg, params, estate, data, dlog, outdir,
                        seed=args.seed + 1,
                        checkpoint_every=args.checkpoint_every,
                        resume=args.resume,
                        tracefile=getattr(args, "tracefile", None),
                        device_trace_every=getattr(args, "device_trace_every", 0),
                        **chunking_kwargs(args))
    params, estate, stats = trainer.run(
        args.no_epochs,
        epoch_callback=lambda epoch, F, params, **kw: visualizer.process_epoch(
            epoch=epoch, F=F, params=params
        ),
    )
    dlog.close()
    visualizer.finalize()
    print("Finished")
    return {"F": float(stats.F), "L_gen": L_gen, "params": params,
            "outdir": outdir}
