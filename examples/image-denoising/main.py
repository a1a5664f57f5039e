"""AWGN image denoising: `python main.py {ebsc|es3c} [--flags]`
(same CLI surface as the reference examples/image-denoising)."""

import argparse

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


from evo_tpu.apps.common import (
    image_experiment_parser as experiment_parser,
    output_parser,
    patch_parser,
    variational_parser,
    viz_parser,
)
from evo_tpu.apps.images import run_denoising


def awgn_parser():
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--clean_image", type=str, default="./img/house.png",
                   help="Full path to clean image (synthetic fallback if missing)")
    p.add_argument("--rescale", type=float, default=0.4,
                   help="Rescale factor for the clean image")
    p.add_argument("--noise_level", type=float, default=25,
                   help="Std of the additive white Gaussian noise")
    return p


def get_args():
    parser = argparse.ArgumentParser(prog="Image Denoising")
    algos = parser.add_subparsers(help="Select algorithm to run", dest="algo")
    common = [awgn_parser(), patch_parser(), variational_parser(Ksize=20),
              experiment_parser(), output_parser(), viz_parser()]
    for algo in ("ebsc", "es3c"):
        algos.add_parser(algo, parents=common,
                         formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    args = parser.parse_args()
    if args.algo is None:
        parser.error("choose an algorithm: ebsc or es3c")
    return args


if __name__ == "__main__":
    run_denoising(get_args())
