"""MCAR image inpainting: `python main.py {ebsc|es3c} [--flags]`
(same CLI surface as the reference examples/image-inpainting)."""

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
    p.add_argument("--no_compact_readback", dest="compact_readback",
                   action="store_false", default=True,
                   help="Read back the full [N, D] reconstruction at merges "
                        "instead of only the missing values (same result "
                        "bit-exactly; ~10x more device->host traffic)")
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
