"""Standard bars test: `python main.py {ebsc|es3c} [--flags]`
(same CLI surface as the reference examples/bars-test)."""

import argparse

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


from evo_tpu.apps import bars
from evo_tpu.apps.common import (
    experiment_parser,
    output_parser,
    variational_parser,
    viz_parser,
)


def bars_parser():
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("-H", type=int, default=8, help="Number of bars")
    p.add_argument("--bar_amp", type=float, default=10.0, help="Bar amplitude")
    p.add_argument("--neg_bars", action="store_true", default=False,
                   help="Randomly make bar amplitudes negative")
    p.add_argument("--no_data_points", type=int, default=500,
                   help="Number of datapoints")
    return p


def gen_parser(sssc: bool):
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--pi_gen", type=float, default=None,
                   help="Sparsity for data generation (defaults to 2/H)")
    p.add_argument("--sigma_gen", type=float, default=1.0,
                   help="Noise level for data generation")
    if sssc:
        p.add_argument("--mu_gen", type=float, default=0.0,
                       help="Generative latent mean")
        p.add_argument("--psi_gen", type=float, default=1.0,
                       help="Generative latent standard deviation")
    return p


def get_args():
    parser = argparse.ArgumentParser(prog="Standard Bars Test")
    algos = parser.add_subparsers(help="Select algorithm to run", dest="algo")
    common = [output_parser(), bars_parser(), variational_parser(),
              experiment_parser(no_epochs=40), viz_parser()]
    algos.add_parser("ebsc", help="Run experiment with EBSC",
                     parents=common + [gen_parser(False)],
                     formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    algos.add_parser("es3c", help="Run experiment with ES3C",
                     parents=common + [gen_parser(True)],
                     formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    args = parser.parse_args()
    if args.algo is None:
        parser.error("choose an algorithm: ebsc or es3c")
    return args


if __name__ == "__main__":
    bars.run(get_args())
