import json

import pytest

from collaborative_gan_sampling_tpu.config import (
    Config,
    TrainConfig,
    apply_overrides,
    get_preset,
    list_presets,
)


def test_all_presets_build():
    for name in list_presets():
        cfg = get_preset(name)
        assert cfg.name == name
        json.loads(cfg.to_json())  # serializable


def test_presets_cover_baseline_configs():
    # BASELINE.json's five configs, by preset name.
    for required in ["toy2d", "mnist", "fmnist", "cifar10", "celeba",
                     "imagenet64"]:
        assert required in list_presets()


def test_imagenet64_is_class_conditional():
    assert get_preset("imagenet64").model.num_classes == 1000


def test_overrides_nested_and_types():
    cfg = get_preset("toy2d")
    cfg = apply_overrides(cfg, ["train.batch_size=64", "refine.steps=50",
                                "refine.rate=0.05", "refine.use_pallas=false",
                                "--model.kind=dcgan"])
    assert cfg.train.batch_size == 64
    assert cfg.refine.steps == 50
    assert cfg.refine.rate == pytest.approx(0.05)
    assert cfg.refine.use_pallas is False
    assert cfg.model.kind == "dcgan"


def test_override_unknown_field_raises():
    with pytest.raises(KeyError):
        apply_overrides(get_preset("toy2d"), ["train.nope=1"])


def test_cli_safe_flag_overlays_guards():
    """--safe applies the measured self-guarding recipe (stop_score=0.5,
    shaping_target=0.5) BEFORE user overrides, so explicit keys win."""
    import argparse

    from collaborative_gan_sampling_tpu.cli import _build_cfg

    args = argparse.Namespace(config="mnist", workdir="", safe=True)
    cfg = _build_cfg(args, ["refine.stop_score=0.7"])
    assert cfg.refine.stop_score == pytest.approx(0.7)  # explicit wins
    assert cfg.refine.shaping_target == pytest.approx(0.5)

    plain = _build_cfg(argparse.Namespace(config="mnist", workdir="",
                                          safe=False), [])
    assert plain.refine.stop_score == 0.0  # reference-parity default
    assert plain.refine.shaping_target == 0.0


def test_validate_catches_common_mistakes():
    import pytest

    from collaborative_gan_sampling_tpu.config import get_preset

    cfg = get_preset("toy2d")
    cfg.validate()  # presets are valid

    import dataclasses
    bad = cfg.replace(refine=dataclasses.replace(cfg.refine, rate=1.0,
                                                 proximal=3.0))
    with pytest.raises(ValueError, match="proximal"):
        bad.validate()
    bad = cfg.replace(refine=dataclasses.replace(cfg.refine,
                                                 stop_score=1.0))
    with pytest.raises(ValueError, match="stop_score"):
        bad.validate()
    bad = cfg.replace(train=dataclasses.replace(cfg.train, batch_size=0))
    with pytest.raises(ValueError, match="train.batch_size"):
        bad.validate()
    bad = cfg.replace(refine=dataclasses.replace(cfg.refine,
                                                 gamma_percentile=150.0))
    with pytest.raises(ValueError, match="gamma_percentile"):
        bad.validate()


def test_mesh_divisibility_validated():
    import dataclasses

    import jax
    import pytest

    from collaborative_gan_sampling_tpu.config import get_preset
    from collaborative_gan_sampling_tpu.pipeline import Experiment

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-fake-device CI backend")
    cfg = get_preset("toy2d").replace(
        workdir="/tmp/mesh_div",
        train=dataclasses.replace(get_preset("toy2d").train, batch_size=12))
    with pytest.raises(ValueError, match="not divisible"):
        Experiment(cfg, use_mesh=True)


def test_from_dict_roundtrip():
    """Config.from_dict inverts to_dict exactly — the checkpoint sidecar
    (utils/checkpoint config.json) rebuilds the producing experiment."""
    for name in list_presets():
        cfg = get_preset(name)
        assert Config.from_dict(cfg.to_dict()) == cfg


def test_from_dict_schema_tolerance():
    """Unknown leaf/top-level fields are dropped (newer sidecar, older
    code); missing fields take defaults (older sidecar, newer code)."""
    cfg = get_preset("mnist")
    d = cfg.to_dict()
    d["refine"]["some_future_knob"] = 7
    d["future_section"] = {"x": 1}
    assert Config.from_dict(d) == cfg
    del d["refine"]["some_future_knob"], d["future_section"]
    d["train"].pop("r1_gamma")
    back = Config.from_dict(d)
    assert back.train.r1_gamma == TrainConfig().r1_gamma
