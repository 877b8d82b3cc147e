#!/usr/bin/env python3
"""Reference-parity launcher: ``python predict.py ...`` exactly like the
reference repo (reference: pointstowood/predict.py:59). The implementation
lives in the installable package; ``pip install .`` also provides the
``pointstowood-predict`` console script."""

from pointstowood_tpu.cli.predict import (  # noqa: F401 (re-exported API)
    main, parse_args, resolve_model_path,
)

if __name__ == '__main__':
    main()
