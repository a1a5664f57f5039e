"""Feature learning on image patches: `python main.py [--flags]`
(same CLI surface as the reference examples/feature-learning)."""

import argparse

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


from evo_tpu.apps import feature_learning
from evo_tpu.apps.common import variational_parser


def get_args():
    io = argparse.ArgumentParser(add_help=False)
    io.add_argument("--data_file", type=str,
                    default="./data/barbara-2k-patches.npz",
                    help=".npz file with training data (keys: data, "
                         "patch_height, patch_width, no_channels); a "
                         "synthetic patch set is generated if missing")
    io.add_argument("--output_directory", type=str, default=None)

    model = argparse.ArgumentParser(add_help=False)
    model.add_argument("--model", type=str, choices=["bsc", "sssc"],
                       default="bsc", help="Generative model")
    model.add_argument("-H", type=int, default=100,
                       help="Number of generative fields to learn")

    exp = argparse.ArgumentParser(add_help=False)
    exp.add_argument("--no_epochs", type=int, default=200)
    exp.add_argument("--seed", type=int, default=0)
    exp.add_argument("--n_blocks", type=int, default=1)
    exp.add_argument("--checkpoint_every", type=int, default=0)
    exp.add_argument("--resume", type=str, default=None)

    viz = argparse.ArgumentParser(add_help=False)
    viz.add_argument("--sort_gfs", action="store_true", default=False,
                     help="Sort generative fields by prior activation")
    viz.add_argument("--viz_every", type=int, default=1)
    viz.add_argument("--gif_framerate", type=str, default=None)

    parser = argparse.ArgumentParser(
        description="Feature Learning",
        parents=[io, model,
                 variational_parser(Ksize=15, no_parents=5, no_children=2),
                 exp, viz],
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    return parser.parse_args()


if __name__ == "__main__":
    feature_learning.run(get_args())
