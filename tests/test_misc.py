"""Coverage for the remaining utility surfaces: profiling harness, the
profile pipeline phase, the bench measurement function, and CLI subcommands
not exercised elsewhere."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collaborative_gan_sampling_tpu.cli import main as cli_main
from collaborative_gan_sampling_tpu.utils.profiling import block, timeit


def test_timeit_returns_sane_stats():
    x = jnp.ones((256, 256))
    f = jax.jit(lambda: x @ x)
    stats = timeit(f, warmup=1, iters=3)
    assert stats["iters"] == 3
    assert 0 < stats["min_s"] <= stats["mean_s"] < 10


def test_block_passthrough():
    tree = {"a": jnp.ones(3), "b": [jnp.zeros(2)]}
    out = block(tree)
    np.testing.assert_array_equal(np.asarray(out["a"]), np.ones(3))


def test_experiment_profile_writes_trace(tmp_path):
    from tests.test_pipeline import _tiny_toy_cfg

    from collaborative_gan_sampling_tpu.pipeline import Experiment

    cfg = _tiny_toy_cfg(tmp_path / "run")
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    logdir = exp.profile(state, chunks=1)
    assert os.path.isdir(logdir)
    # jax.profiler writes a plugins/profile subtree with at least one file.
    found = [f for _, _, fs in os.walk(logdir) for f in fs]
    assert found, "trace produced no files"


def test_bench_measurement_function_small():
    import bench

    out = bench.measure_refine_throughput(batch_size=32, steps_k=2,
                                          rounds=2, repeats=1)
    assert out["samples_per_sec"] > 0
    assert out["batch_size"] == 32


def test_cli_teaser_and_sweep(tmp_path, capsys):
    workdir = str(tmp_path / "cli")
    common = ["--workdir", workdir, "train.niters=40",
              "train.steps_per_call=20", "train.batch_size=64",
              "model.g_hidden=32", "model.d_hidden=32",
              "model.compute_dtype=float32", "refine.use_pallas=false",
              "refine.num_batches=2", "refine.batch_size=64",
              "refine.steps=2", "refine.burn_in=64"]
    assert cli_main(["train", "--config", "toy2d"] + common) == 0
    capsys.readouterr()

    assert cli_main(["teaser", "--config", "toy2d"] + common) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(out["gif"])

    assert cli_main(["sweep", "--config", "toy2d", "sweep_steps=1,2"]
                    + common) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["best_k"] in (1, 2)
    assert set(map(int, out["sweep"])) == {1, 2}


def test_bench_conditional_preset_path(monkeypatch):
    """bench.py folds the class-conditional flagship into the driver line;
    the measurement fn must run the conditional z->G->refine unit (labels
    sampled inside draw_refine). Tiny stand-in config, same code path."""
    import dataclasses

    import bench
    from collaborative_gan_sampling_tpu import config as cfg_mod

    real = cfg_mod.get_preset

    def tiny_conditional(name):
        cfg = real("imagenet64" if name == "tiny_cond" else name)
        if name == "tiny_cond":
            cfg = cfg.replace(model=dataclasses.replace(
                cfg.model, image_size=8, g_base_filters=8, d_base_filters=8,
                num_classes=5, compute_dtype="float32"))
        return cfg

    monkeypatch.setattr(cfg_mod, "get_preset", tiny_conditional)
    out = bench.measure_refine_throughput(batch_size=8, steps_k=2,
                                          rounds=1, repeats=1,
                                          preset="tiny_cond")
    assert out["samples_per_sec"] > 0
    assert out["mfu_pct"] is not None  # dcgan kind keeps the analytic MFU


def test_bench_mfu_only_for_dcgan():
    import bench

    out = bench.measure_refine_throughput(batch_size=16, steps_k=1,
                                          rounds=1, repeats=1,
                                          preset="toy2d")
    assert out["samples_per_sec"] > 0
    assert out["mfu_pct"] is None  # analytic conv FLOPs model is DCGAN-only


def test_cli_generate_only_keys_rejected_elsewhere():
    import pytest

    with pytest.raises(KeyError, match="no field 'n'"):
        cli_main(["eval", "--config", "toy2d", "n=500"])


def test_backend_watchdogs_happy_path():
    """The dead-relay watchdogs must be no-ops when the backend is alive
    (CPU fake-device CI backend here)."""
    import bench
    import __graft_entry__ as ge

    assert bench._backend_ready(seconds=60.0) is True
    n = ge._device_count_with_timeout(seconds=60.0)
    assert n == len(jax.devices())


def test_metrics_writer_tensorboard_mirror(tmp_path):
    """train.tensorboard: scalar events land in a TB event file alongside
    the JSONL (the reference image trainer's convention, SURVEY.md C10)."""
    pytest.importorskip("tensorflow")
    import os

    from collaborative_gan_sampling_tpu.utils.logging import MetricsWriter

    tb_dir = str(tmp_path / "tb")
    with MetricsWriter(str(tmp_path / "m.jsonl"), echo=False,
                       tensorboard_dir=tb_dir) as w:
        w.write(1, d_loss=1.5, g_loss=0.7, note="skipped-non-numeric")
        w.write(2, d_loss=1.2, g_loss=0.9)
    events = [f for f in os.listdir(tb_dir) if "tfevents" in f]
    assert len(events) == 1

    import tensorflow as tf

    tags = set()
    for rec in tf.compat.v1.train.summary_iterator(
            os.path.join(tb_dir, events[0])):
        for v in rec.summary.value:
            tags.add(v.tag)
    assert {"d_loss", "g_loss", "t"} <= tags
    assert "note" not in tags
