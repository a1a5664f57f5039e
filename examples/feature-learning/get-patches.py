"""Extract random patches from an image into the .npz format consumed by
main.py (same role as the reference's get-patches.py, built on
evo_tpu.prepost.extract_random_patches instead of tvutil)."""

import argparse

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import os

import numpy as np

from evo_tpu.apps.images import get_image
from evo_tpu.prepost import extract_random_patches


def get_args():
    p = argparse.ArgumentParser(
        description="Extract random image patches",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("--image_file", type=str, required=False, default=None,
                   help="Image to extract patches from (synthetic if omitted)")
    p.add_argument("--patch_height", type=int, default=8)
    p.add_argument("--patch_width", type=int, default=None)
    p.add_argument("--no_patches", type=int, default=2000)
    p.add_argument("--output_file", type=str, default="./data/patches.npz")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


if __name__ == "__main__":
    args = get_args()
    pw = args.patch_width or args.patch_height
    if args.image_file:
        img = get_image(args.image_file)
    else:
        from evo_tpu.apps.images import synthetic_image

        img = synthetic_image(256)
    C = 1 if img.ndim == 2 else img.shape[2]
    rng = np.random.default_rng(args.seed)
    P = extract_random_patches(img[None], args.patch_height, pw,
                               args.no_patches, rng=rng)
    P = P - P.mean(axis=1, keepdims=True)  # per-patch DC removal
    os.makedirs(os.path.dirname(args.output_file) or ".", exist_ok=True)
    np.savez(args.output_file, data=P.astype(np.float32),
             patch_height=args.patch_height, patch_width=pw, no_channels=C)
    print(f"Wrote {P.shape[0]} patches of dim {P.shape[1]} to {args.output_file}")
