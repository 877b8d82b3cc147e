"""Host-capability regime autodetect (utils/host_regime).

The padding/bucket levers (half-step eval caps, third fusion cap) are
chosen by a measured link-capability regime: coarse through a tunneled
relay (~30 ms/executable switch), fine on local PJRT. These tests pin
the override/validation logic and the derived defaults; the CPU test
backend always reads as 'relay' so the suite's shapes stay
deterministic.
"""

import pytest

from pointstowood_tpu.utils import host_regime as hr


@pytest.fixture(autouse=True)
def _fresh_memo(monkeypatch):
    monkeypatch.setattr(hr, "_REGIME", None)


def test_cpu_backend_defaults_to_relay(monkeypatch):
    monkeypatch.delenv("TSP_HOST_REGIME", raising=False)
    # conftest forces the simulated CPU backend -> deterministic coarse
    assert hr.host_regime() == "relay"


def test_env_override_and_validation(monkeypatch):
    monkeypatch.setenv("TSP_HOST_REGIME", "local")
    assert hr.host_regime() == "local"
    monkeypatch.setattr(hr, "_REGIME", None)
    monkeypatch.setenv("TSP_HOST_REGIME", " RELAY ")
    assert hr.host_regime() == "relay"
    monkeypatch.setattr(hr, "_REGIME", None)
    monkeypatch.setenv("TSP_HOST_REGIME", "fast")
    with pytest.raises(ValueError, match="TSP_HOST_REGIME"):
        hr.host_regime()


def test_regime_drives_bucket_and_cap_defaults(monkeypatch):
    from pointstowood_tpu.data.dataset import eval_half_caps_default
    from pointstowood_tpu.predict import tpu_fusion as tf

    monkeypatch.delenv("TSP_EVAL_CAPS", raising=False)
    monkeypatch.delenv("TSP_FUSION_CAPS", raising=False)

    monkeypatch.setenv("TSP_HOST_REGIME", "local")
    monkeypatch.setattr(tf, "_FUSION_CAPS", None)
    assert eval_half_caps_default() is True
    assert tf.fusion_caps() == (2048, 8192, 16384)

    monkeypatch.setenv("TSP_HOST_REGIME", "relay")
    monkeypatch.setattr(hr, "_REGIME", None)
    monkeypatch.setattr(tf, "_FUSION_CAPS", None)
    assert eval_half_caps_default() is False
    assert tf.fusion_caps() == (2048, 16384)

    # explicit env knobs beat the regime
    monkeypatch.setenv("TSP_EVAL_CAPS", "fine")
    assert eval_half_caps_default() is True
    monkeypatch.setenv("TSP_FUSION_CAPS", "1024,4096")
    monkeypatch.setattr(tf, "_FUSION_CAPS", None)
    assert tf.fusion_caps() == (1024, 4096)
