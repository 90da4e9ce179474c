"""Demo 7: NeRF training (TPU port of demo7-nerf.py).

Usage mirrors the reference:
    python demos/demo7-nerf.py --config configs/lego.txt
Configs use the reference's `key = value` text format.
"""
import sys

from jrender_tpu.nerf.config import parse_args
from jrender_tpu.nerf.trainer import train


def main():
    args = parse_args()
    train(args)


if __name__ == '__main__':
    main()
