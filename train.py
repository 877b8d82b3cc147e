#!/usr/bin/env python3
"""Reference-parity launcher: ``python train.py ...`` exactly like the
reference repo (reference: pointstowood/train.py:56). The implementation
lives in the installable package; ``pip install .`` also provides the
``pointstowood-train`` console script."""

from pointstowood_tpu.cli.train import main, parse_args  # noqa: F401

if __name__ == '__main__':
    main()
