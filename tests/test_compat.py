"""Reference-flag compat entry points (compat/main_*.py)."""

import json

import numpy as np
import pytest

from collaborative_gan_sampling_tpu.compat import main_synthetic
from collaborative_gan_sampling_tpu.compat._shared import (
    MODE_TO_METHOD,
    build_parser,
    to_config,
)


def test_flag_mapping():
    p = build_parser({"niters": 100})
    args = p.parse_args(["--mode", "collab", "--rollout_steps", "25",
                         "--rollout_rate", "0.07", "--rejection_gamma",
                         "0.5", "--batch_size", "64",
                         "--checkpoint_dir", "/tmp/x"])
    cfg = to_config("toy2d", args)
    assert cfg.refine.steps == 25
    assert cfg.refine.rate == pytest.approx(0.07)
    assert cfg.refine.gamma == pytest.approx(0.5)
    assert cfg.train.batch_size == 64
    assert cfg.refine.batch_size == 64
    assert cfg.workdir == "/tmp/x"
    assert cfg.train.niters == 100  # per-script default flows through


def test_all_reference_modes_map():
    for mode in ["standard", "rejection", "hastings", "refinement",
                 "collab"]:
        assert MODE_TO_METHOD[mode] in ("standard", "reject", "mhgan",
                                        "refinement", "collab")


def test_main_synthetic_end_to_end(tmp_path, capsys):
    rc = main_synthetic.main([
        "--mode", "train", "--niters", "40", "--batch_size", "64",
        "--checkpoint_dir", str(tmp_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["trained_steps"] == 40

    rc = main_synthetic.main([
        "--mode", "refinement", "--niters", "40", "--batch_size", "64",
        "--rollout_steps", "3", "--checkpoint_dir", str(tmp_path)])
    assert rc == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(row["pct_hq"])
