"""The paper's image-space claim as an executable assertion (VERDICT r1
item 2): at a fixed, imperfect DCGAN generator, collaborative sampling
(refine + reject + shape) lowers FID versus standard sampling.

Mirrors tests/test_sampling_e2e.py::test_collab_beats_standard for the image
stack: tiny DCGAN on the procedural image distribution, trained-classifier
FID features. Calibrated on this exact configuration against the FIXED
procedural stream (crc32-keyed since the round-2 determinism fix): at the
150-iter checkpoint, standard FID ~22.0 vs collab ~17.4 (−21%) — a margin
far above run-to-run noise.

This is one of the slowest tests in the suite (~3 min on 1 CPU core — GAN
training + feature training + 2 FID evaluations); it is the executable form
of the framework's central scientific claim, so it earns the time.

NOTE: at this miniature scale the margin is sensitive to the exact config
(checkpoint depth matters most: by 400 iters G already fits this stream
well enough that D-guided rejection prunes the wrong tail and collab loses
its edge — the paper's own "gains concentrate on imperfect generators").
The settings below are calibrated and the whole run is deterministic —
treat them like a golden file and recalibrate deliberately if you change
them (the calibration grid lives in the round-2 history; see ROADMAP.md).
The robust, realistic-scale evidence is the TPU campaign matrix in
BASELINE.md (CelebA 3/3 seeds, CIFAR-10, MNIST on the fixed stream).
"""

import dataclasses

import jax
import numpy as np
import pytest

from collaborative_gan_sampling_tpu.config import (
    Config,
    DataConfig,
    EvalConfig,
    ModelConfig,
    RefineConfig,
    TrainConfig,
)
from collaborative_gan_sampling_tpu.pipeline import Experiment


@pytest.fixture(scope="module")
def imperfect_image_exp(tmp_path_factory):
    cfg = Config(
        name="mnist", seed=0,
        workdir=str(tmp_path_factory.mktemp("imgq")),
        model=ModelConfig(kind="dcgan", z_dim=16, image_size=16, channels=1,
                          g_base_filters=16, d_base_filters=16,
                          compute_dtype="float32"),
        data=DataConfig(dataset="mnist"),
        train=TrainConfig(batch_size=64, niters=150, steps_per_call=50,
                          d_lr=2e-4, g_lr=2e-4, g_steps=2, ckpt_every=150),
        refine=RefineConfig(steps=10, rate=0.03, num_batches=8,
                            batch_size=64, burn_in=128, shape_every=1,
                            shaping_lr=2e-4, gamma_percentile=50.0,
                            use_pallas=False),
        eval=EvalConfig(fid_num_samples=1024, fid_batch_size=128,
                        feature_train_steps=400),
    )
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()  # 150 iters: deliberately imperfect generator
    return exp, state


def test_collab_beats_standard_image_fid(imperfect_image_exp):
    exp, state = imperfect_image_exp
    fid_std = exp.evaluate(exp.sample(state, method="standard"))["fid"]
    res_col = exp.sample(state, method="collab")
    fid_col = exp.evaluate(res_col)["fid"]
    assert np.isfinite(fid_std) and np.isfinite(fid_col)
    # DRS inside collab must stay selective, not degenerate.
    assert 0.05 < res_col.accept_rate < 0.95
    # Calibrated margin is ~21%; require a real (>3%) improvement so the
    # assertion cannot pass on noise alone.
    assert fid_col < 0.97 * fid_std, (
        f"collab FID {fid_col:.4f} must beat standard {fid_std:.4f} by >3% "
        "at an imperfect checkpoint (arXiv:1902.00813's image-space claim)")
