"""MCAR image inpainting: `python main.py {ebsc|es3c} [--flags]`
(same CLI surface as the reference examples/image-inpainting)."""

import argparse

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


from evo_tpu.apps.common import output_parser, variational_parser, viz_parser
from evo_tpu.apps.images import run_inpainting


def mcar_parser():
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--clean_image", type=str, default="./img/castle.jpg",
                   help="Full path to clean image (synthetic fallback if missing)")
    p.add_argument("--percentage_missing", type=float, default=None,
                   help="Fraction of pixels set to missing (MCAR)")
    p.add_argument("--percentage", type=int, default=10,
                   help="Percentage of missing pixels (reference CLI, "
                        "examples/image-inpainting/params.py:25)")
    p.add_argument("--rescale", type=float, default=0.1,
                   help="Rescale factor for the clean image")
    return p


def patch_parser():
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--patch_height", type=int, default=5, help="Patch height")
    p.add_argument("--patch_width", type=int, default=None,
                   help="Patch width (defaults to patch_height)")
    p.add_argument("--no_dc_center", dest="dc_center", action="store_false",
                   default=True,
                   help="Disable per-patch DC centering (reference-style raw "
                        "patches; requires f64-grade numerics for es3c)")
    return p


def experiment_parser():
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("-H", type=int, default=32, help="Dictionary size")
    p.add_argument("--no_epochs", type=int, default=50)
    p.add_argument("--merge_every", type=int, default=None)
    p.add_argument("--save_theta_all_epochs", action="store_true", default=False)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n_blocks", type=int, default=1)
    p.add_argument("--checkpoint_every", type=int, default=0)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--tracefile", type=str, default=None)
    p.add_argument("--device_trace_every", type=int, default=0)
    return p


def get_args():
    parser = argparse.ArgumentParser(prog="Image Inpainting")
    algos = parser.add_subparsers(help="Select algorithm to run", dest="algo")
    common = [mcar_parser(), patch_parser(), variational_parser(Ksize=20),
              experiment_parser(), output_parser(), viz_parser()]
    for algo in ("ebsc", "es3c"):
        algos.add_parser(algo, parents=common,
                         formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    args = parser.parse_args()
    if args.algo is None:
        parser.error("choose an algorithm: ebsc or es3c")
    return args


if __name__ == "__main__":
    run_inpainting(get_args())
