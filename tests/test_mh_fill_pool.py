"""mh_fill_pool (benchmarks/_campaign.py): the equal-pool protocol's
MH-GAN arm. A single real-initialized MH pass drops never-accepting
chains (the real-data leak guard in sampling/collab.py::_sample_mhgan),
so one pass does NOT fill its candidate count — the round-4 converged
study truncated at 4,874/10,000 because of exactly this. The helper must
accumulate independent passes until the requested pool fills."""

import dataclasses

from benchmarks._campaign import mh_fill_pool
from collaborative_gan_sampling_tpu.config import get_preset
from collaborative_gan_sampling_tpu.pipeline import Experiment


def test_mh_fill_pool_accumulates_passes(tmp_path):
    cfg = get_preset("toy2d")
    cfg = cfg.replace(
        workdir=str(tmp_path),
        train=dataclasses.replace(cfg.train, niters=60, ckpt_every=0,
                                  viz_every=0),
        refine=dataclasses.replace(cfg.refine, batch_size=64,
                                   num_batches=2, mh_chain_len=5))
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()

    # 2 batches x 64 = 128 candidates/pass, so a 300-sample pool needs
    # >= 3 passes even at 100% chain acceptance.
    samples, passes, total = mh_fill_pool(exp, state, cfg.refine, 300)
    assert samples.shape == (300, 2)
    assert passes >= 3
    assert total >= 300

    # An `initial` SampleResult counts as the first pass.
    res = exp.sample(state, method="mhgan")
    samples2, passes2, total2 = mh_fill_pool(exp, state, cfg.refine, 100,
                                             initial=res)
    assert samples2.shape[0] == 100
    assert passes2 >= 1
