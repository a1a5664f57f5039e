"""Shared experiment scaffolding for the example drivers.

Mirrors the conventions of the reference example apps (SURVEY §2.1 #13-16):
timestamped output directory, training.h5 via DataLog/StoreToH5, stdout tee
to terminal.txt, argparse parent-parser groups with the same flag names and
defaults (reference examples/*/params.py)."""

from __future__ import annotations

import argparse
import datetime
import os
import sys
import time

import numpy as np

from evo_tpu.utils.datalog import DataLog, StoreToH5


def apply_platform_env():
    """Honor EVO_PLATFORM=cpu|tpu|axon: the axon TPU plugin ignores the
    JAX_PLATFORMS env var, so jax.config.update is the only reliable switch
    (useful to run examples on CPU while a TPU is attached).

    Also brings up the multi-process runtime when one is configured
    (JAX_COORDINATOR_ADDRESS in the environment — see
    evo_tpu/parallel/distributed.py); the platform choice must land before
    jax.distributed.initialize touches the backend, hence both live here."""
    plat = os.environ.get("EVO_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    from evo_tpu.parallel import init_distributed

    init_distributed()


def merge_dict(*dicts):
    merged = {}
    for d in dicts:
        merged.update(d)
    return merged


class stdout_logger:
    """Tee stdout to terminal.txt (reference bars-test/utils.py:56-78)."""

    def __init__(self, txt_file):
        self.terminal = sys.stdout
        self.log = open(txt_file, "w")

    def write(self, message):
        self.terminal.write(message)
        self.terminal.flush()
        self.log.write(message)
        self.log.flush()

    def flush(self):
        pass


def output_parser():
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument(
        "--output_directory", type=str, default=None,
        help="Directory to write training output and visualizations to "
             "(output/<TIMESTAMP> if not specified)",
    )
    return p


def variational_parser(Ksize=20, no_parents=10, no_children=1, no_generations=1):
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--Ksize", type=int, default=Ksize,
                   help="Size of the K sets (i.e., S=|K|)")
    p.add_argument("--parent_selection", type=str, choices=["fit", "rand"],
                   default="fit", help="Selection operator")
    p.add_argument("--mutation_algorithm", type=str,
                   choices=["randflip", "sparseflip", "cross", "cross_randflip",
                            "cross_sparseflip"],
                   default="randflip", help="Mutation strategy")
    p.add_argument("--no_parents", type=int, default=no_parents,
                   help="Number of parental states to select per generation")
    p.add_argument("--no_children", type=int, default=no_children,
                   help="Number of children to evolve per parent")
    p.add_argument("--no_generations", type=int, default=no_generations,
                   help="Number of generations to evolve")
    p.add_argument("--bitflip_prob", type=float, default=None,
                   help="Bitflip probability (sparseflip-based mutations)")
    return p


def experiment_parser(no_epochs=40):
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--no_epochs", type=int, default=no_epochs,
                   help="Number of epochs to train")
    p.add_argument("--seed", type=int, default=0,
                   help="Seed for data generation / parameter init / EA")
    p.add_argument("--n_blocks", type=int, default=1,
                   help="Number of scan blocks inside the jitted epoch "
                        "(bounds device memory at large N)")
    p.add_argument("--checkpoint_every", type=int, default=0,
                   help="Save a resumable checkpoint every X epochs (0=off)")
    p.add_argument("--resume", type=str, default=None,
                   help="Path to a checkpoint.npz to resume from")
    p.add_argument("--tracefile", type=str, default=None,
                   help="Enable host tracepoints; bare filenames land in the "
                        "output directory, archived to traces.tgz at the end")
    p.add_argument("--device_trace_every", type=int, default=0,
                   help="Capture a jax.profiler device trace of one epoch "
                        "every X epochs into <outdir>/device_trace (0=off)")
    p.add_argument("--chunk_epochs", type=int, default=1,
                   help="Fuse X epochs into one device dispatch "
                        "(models.base.em_steps; bit-identical trajectory). "
                        "Viz/Theta logging then happens at chunk ends, and "
                        "Theta tables switch to overwrite mode (only the "
                        "latest parameters are kept in training.h5); big "
                        "win when per-epoch device time is small vs the "
                        "dispatch latency")
    return p


def patch_parser():
    """Shared by the image-denoising / image-inpainting examples (reference
    image-denoising/params.py patch group; identical in both)."""
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--patch_height", type=int, default=5, help="Patch height")
    p.add_argument("--patch_width", type=int, default=None,
                   help="Patch width (defaults to patch_height)")
    p.add_argument("--no_dc_center", dest="dc_center", action="store_false",
                   default=True,
                   help="Disable per-patch DC centering (reference-style raw "
                        "patches; requires f64-grade numerics for es3c)")
    return p


def image_experiment_parser():
    """Shared by the image-denoising / image-inpainting examples (reference
    image-denoising/params.py experiment group; identical in both)."""
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("-H", type=int, default=32, help="Dictionary size")
    p.add_argument("--no_epochs", type=int, default=50)
    p.add_argument("--merge_every", type=int, default=None,
                   help="Merge reconstructed patches every Xth epoch "
                        "(defaults to viz_every)")
    p.add_argument("--save_theta_all_epochs", action="store_true", default=False)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n_blocks", type=int, default=1)
    p.add_argument("--checkpoint_every", type=int, default=0)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--tracefile", type=str, default=None)
    p.add_argument("--device_trace_every", type=int, default=0)
    p.add_argument("--chunk_epochs", type=int, default=1,
                   help="Fuse X epochs into one device dispatch "
                        "(incompatible with --save_theta_all_epochs; "
                        "reconstruction epochs still run solo)")
    return p


def viz_parser():
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--viz_every", type=int, default=1,
                   help="Create visualizations every X'th epoch")
    p.add_argument("--gif_framerate", type=str, default=None,
                   help="Frames per second for gif animation (e.g. 2/1); "
                        "no gif if unspecified")
    p.add_argument("--host_merge", action="store_true", default=False,
                   help="Merge reconstructed patches on the host (NumPy "
                        "f64) instead of on the device; the device merge "
                        "is bit-tolerance-identical and keeps the ~2 s "
                        "full-res nanmedian off the epoch critical path")
    return p


def chunking_kwargs(args, theta_append: bool = True,
                    auto_overwrite: bool = True) -> dict:
    """Shared --chunk_epochs handling for EMTrainer construction.

    Chunked dispatch cannot log Theta per epoch (intermediate params stay
    on device), so apps whose Theta mode is implicit (bars,
    feature-learning: theta_append defaults True) auto-switch to the
    overwrite mode with a printed note.  Apps where the user set the mode
    explicitly (images: --save_theta_all_epochs) pass
    auto_overwrite=False and let EMTrainer reject the conflict loudly."""
    chunk = max(1, int(getattr(args, "chunk_epochs", 1)))
    if chunk > 1 and theta_append and auto_overwrite:
        import warnings

        # a real warning, not just a stdout note: users who rely on the
        # default per-epoch Theta history in training.h5 lose it here, and
        # post-hoc analysis needs to be able to tell it was intentional
        warnings.warn(
            f"chunk_epochs={chunk} switches Theta logging to overwrite "
            "mode: training.h5 will hold only the LATEST parameters, not "
            "the per-epoch history the default (chunk_epochs=1) records",
            stacklevel=2)
        print(f"chunk_epochs={chunk}: Theta tables in overwrite mode")
        theta_append = False
    return dict(chunk_epochs=chunk, theta_append=theta_append)


def setup_experiment(args, name: str):
    """Create the output dir, the DataLog with H5 + console handlers, and the
    stdout tee; returns (dlog, output_directory)."""
    timestamp = datetime.datetime.fromtimestamp(time.time()).strftime(
        "%y-%m-%d_%H-%M-%S"
    )
    outdir = args.output_directory or f"./output/{timestamp}"
    os.makedirs(outdir, exist_ok=True)
    training_file = os.path.join(outdir, "training.h5")
    dlog = DataLog()
    # async: the gzip of large appends (reco_img_* is ~0.4 s each at full
    # resolution) runs on the AutoTable writer thread, off the epoch loop
    dlog.set_handler(["*"], StoreToH5, training_file, async_writes=True)
    txt_file = os.path.join(outdir, "terminal.txt")
    # unwind any tee left by a previous experiment in this process: chained
    # tees would write this run's output into the earlier run's
    # terminal.txt and leak its file handle
    while isinstance(sys.stdout, stdout_logger):
        sys.stdout.log.close()
        sys.stdout = sys.stdout.terminal
    sys.stdout = stdout_logger(txt_file)
    print(f"Will write training output to {training_file}")
    print(f"Will write terminal output to {txt_file}")
    print("Hyperparameters used:")
    for k in sorted(vars(args), key=lambda s: s.lower()):
        print("{: <25} : {}".format(k, vars(args)[k]))
    return dlog, outdir


def params_to_dict(params) -> dict:
    """Model params dataclass -> {name: np.ndarray} for logging.

    ONE batched device->host transfer: per-field np.asarray would pay one
    dispatch round-trip each (~35 ms apiece through a tunneled TPU — it made
    per-epoch Theta logging cost ~0.12 s at 4 fields; see CLAUDE.md)."""
    import dataclasses

    import jax

    host = jax.device_get(
        {f.name: getattr(params, f.name) for f in dataclasses.fields(params)})
    return {k: np.asarray(v) for k, v in host.items()}


def warm_d2h_async(verbose: bool = False):
    """Start warming the device->host channel in the background (the first
    readback through a tunneled TPU can stall for minutes).  With verbose,
    prints the warm time to stderr when done — benchmark supervisors use
    that line as a liveness heartbeat."""
    import threading

    def _warm():
        import time as _time

        import jax.numpy as jnp

        t0 = _time.time()
        float(jnp.zeros(())[()])
        if verbose:
            print(f"d2h channel warm: {_time.time() - t0:.1f}s",
                  file=sys.stderr)

    t = threading.Thread(target=_warm, daemon=True)
    t.start()
    return t
