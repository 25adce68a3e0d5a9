#!/usr/bin/env python
"""Strip a full training checkpoint to bare model weights (~5 MB).

Parity: reference utils/save_weights_only.py (the "portable scene" export,
README.md:181-184).

    python scripts/save_weights_only.py --ckpt_path ckpts/exp/last.ckpt \
        [--out scene.ckpt]
"""
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerf_pl_tpu.training.checkpoints import save_weights_only  # noqa: E402


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--ckpt_path", type=str, required=True,
                        help="full checkpoint path")
    parser.add_argument("--out", type=str, default=None,
                        help="output path (default: <ckpt>_weights.ckpt)")
    args = parser.parse_args(argv)
    out = args.out or (os.path.splitext(args.ckpt_path)[0] + "_weights.ckpt")
    save_weights_only(args.ckpt_path, out)
    print(f"{out}: {os.path.getsize(out) / 1e6:.2f} MB")


if __name__ == "__main__":
    main()
