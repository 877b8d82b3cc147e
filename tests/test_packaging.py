"""Packaging surface: pyproject console scripts resolve, root shims work.

The framework must be installable standalone (`pip install .`) while the
repo-root ``python predict.py`` / ``python train.py`` invocations keep the
reference's CLI ergonomics (reference predict.py:59, train.py:56).
"""

import importlib
import os

try:
    import tomllib  # Python 3.11+
except ImportError:  # pragma: no cover - 3.10 fallback
    import tomli as tomllib  # type: ignore[no-redef]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_console_scripts_resolve():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        proj = tomllib.load(f)
    scripts = proj["project"]["scripts"]
    assert "pointstowood-predict" in scripts
    assert "pointstowood-train" in scripts
    for name, target in scripts.items():
        mod_name, attr = target.split(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, attr)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_version_metadata():
    import pointstowood_tpu

    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        proj = tomllib.load(f)
    assert proj["tool"]["setuptools"]["dynamic"]["version"]["attr"] == (
        "pointstowood_tpu.__version__"
    )
    assert pointstowood_tpu.__version__


def test_root_shims_reexport():
    import predict as predict_cli
    import train as train_cli

    from pointstowood_tpu.cli.predict import main as pmain
    from pointstowood_tpu.cli.train import main as tmain

    assert predict_cli.main is pmain
    assert train_cli.main is tmain
    # parity flag surface still present on the shims
    assert callable(predict_cli.parse_args)
    assert callable(train_cli.parse_args)


def test_native_source_shipped_as_package_data():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        proj = tomllib.load(f)
    pkg_data = proj["tool"]["setuptools"]["package-data"]
    assert "*.cpp" in pkg_data["pointstowood_tpu.native"]
    assert os.path.exists(
        os.path.join(REPO, "pointstowood_tpu", "native", "grid_knn.cpp")
    )
