"""Experiment pipeline + CLI integration on tiny configs (CPU-runnable)."""

import json
import os

import jax
import numpy as np
import pytest

from collaborative_gan_sampling_tpu.cli import main as cli_main
from collaborative_gan_sampling_tpu.config import (
    Config,
    DataConfig,
    EvalConfig,
    ModelConfig,
    RefineConfig,
    TrainConfig,
    get_preset,
)
from collaborative_gan_sampling_tpu.pipeline import Experiment


def _tiny_toy_cfg(workdir, niters=60):
    return Config(
        name="toy2d", seed=0, workdir=str(workdir),
        model=ModelConfig(kind="mlp", z_dim=4, g_hidden=32, d_hidden=32,
                          compute_dtype="float32"),
        data=DataConfig(dataset="ring8", mixture_std=0.1),
        train=TrainConfig(batch_size=64, niters=niters, steps_per_call=20,
                          d_lr=1e-3, g_lr=1e-3, ckpt_every=20, log_every=20),
        refine=RefineConfig(steps=3, rate=0.1, num_batches=2, batch_size=64,
                            burn_in=64, mh_chain_len=5, use_pallas=False),
        eval=EvalConfig(fid_num_samples=128, fid_batch_size=64),
    )


def _tiny_image_cfg(workdir, niters=4):
    return Config(
        name="mnist", seed=0, workdir=str(workdir),
        model=ModelConfig(kind="dcgan", z_dim=8, image_size=16, channels=1,
                          g_base_filters=8, d_base_filters=8,
                          compute_dtype="float32"),
        data=DataConfig(dataset="mnist"),
        train=TrainConfig(batch_size=16, niters=niters, steps_per_call=2,
                          ckpt_every=2, log_every=2),
        refine=RefineConfig(steps=2, rate=0.05, num_batches=2, batch_size=16,
                            burn_in=16, use_pallas=False),
        eval=EvalConfig(fid_num_samples=64, fid_batch_size=16,
                        feature_net="random_conv"),
    )


def test_experiment_train_writes_metrics_and_ckpts(tmp_path):
    cfg = _tiny_toy_cfg(tmp_path / "run")
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    assert int(state.step) == 60
    assert os.path.exists(cfg.workdir + "/train.jsonl")
    lines = [json.loads(l) for l in open(cfg.workdir + "/train.jsonl")]
    assert all("d_loss" in l for l in lines)
    # checkpoints pruned + restorable
    st2 = exp.load_state()
    for a, b in zip(jax.tree_util.tree_leaves(state.g_vars),
                    jax.tree_util.tree_leaves(st2.g_vars)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_training_viz_artifacts(tmp_path):
    import dataclasses

    cfg = _tiny_toy_cfg(tmp_path / "run", niters=40)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, viz_every=20))
    exp = Experiment(cfg, echo_metrics=False)
    exp.train()
    pngs = [f for f in os.listdir(cfg.workdir) if f.startswith("viz_")]
    assert len(pngs) >= 1


def test_experiment_resume_after_interrupt(tmp_path):
    """Failure-recovery smoke (SURVEY.md section 5.3): restart from ckpt."""
    cfg = _tiny_toy_cfg(tmp_path / "run", niters=40)
    exp = Experiment(cfg, echo_metrics=False)
    exp.train(niters=20)  # "crash" after 20
    exp2 = Experiment(cfg, echo_metrics=False)
    state = exp2.train()  # resumes from 20, finishes to 40
    assert int(state.step) == 40


def test_retrain_from_scratch_truncates_train_log(tmp_path):
    """A from-scratch (re)train must not append a second step sequence to
    train.jsonl — by-step consumers assume monotonic steps. Resumed runs
    keep appending to the same log."""
    cfg = _tiny_toy_cfg(tmp_path / "run", niters=40)
    exp = Experiment(cfg, echo_metrics=False)
    exp.train()
    # Retrain from scratch (resume=False ignores the existing checkpoint).
    exp2 = Experiment(cfg, echo_metrics=False)
    exp2.train(resume=False)
    steps = [json.loads(l)["step"]
             for l in open(cfg.workdir + "/train.jsonl")]
    assert steps == sorted(set(steps)), steps  # one monotonic run only
    # A genuine resume appends (log keeps the earlier lines).
    exp3 = Experiment(cfg, echo_metrics=False)
    exp3.train(niters=60)  # resumes at 40 from the ckpt, adds 40..60
    steps2 = [json.loads(l)["step"]
              for l in open(cfg.workdir + "/train.jsonl")]
    assert steps2[:len(steps)] == steps and steps2[-1] == 60


def test_experiment_benchmark_toy(tmp_path):
    cfg = _tiny_toy_cfg(tmp_path / "run")
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    table = exp.benchmark(state, methods=("standard", "refinement"))
    assert set(table) == {"standard", "refinement"}
    for row in table.values():
        assert np.isfinite(row["pct_hq"]) and np.isfinite(row["kl"])


def test_experiment_image_stack(tmp_path):
    """Tiny DCGAN end-to-end: train 4 iters, sample, FID finite."""
    cfg = _tiny_image_cfg(tmp_path / "imgrun")
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    res = exp.sample(state, method="refinement")
    assert res.samples.shape == (32, 16, 16, 1)
    m = exp.evaluate(res)
    assert np.isfinite(m["fid"])
    res_c = exp.sample(state, method="collab")
    m_c = exp.evaluate(res_c)
    assert np.isfinite(m_c["fid"])


def test_cli_train_and_benchmark(tmp_path, capsys):
    workdir = str(tmp_path / "cli")
    rc = cli_main(["train", "--config", "toy2d", "--workdir", workdir,
                   "train.niters=40", "train.steps_per_call=20",
                   "train.batch_size=64", "model.g_hidden=32",
                   "model.d_hidden=32", "model.compute_dtype=float32",
                   "refine.use_pallas=false"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["trained_steps"] == 40

    rc = cli_main(["refine", "--config", "toy2d", "--workdir", workdir,
                   "--method", "refinement",
                   "train.niters=40", "train.steps_per_call=20",
                   "train.batch_size=64", "model.g_hidden=32",
                   "model.d_hidden=32", "model.compute_dtype=float32",
                   "refine.use_pallas=false", "refine.num_batches=2",
                   "refine.batch_size=64", "refine.steps=3"])
    assert rc == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["method"] == "refinement"
    assert np.isfinite(row["pct_hq"])


def test_shaped_d_roundtrip(tmp_path):
    """Collab shapes D -> persist -> later refinement uses the shaped D."""
    cfg = _tiny_toy_cfg(tmp_path / "run")
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    res = exp.sample(state, method="collab")
    path = exp.save_shaped_d(res)
    assert os.path.exists(path)
    loaded = exp.load_shaped_d(template=state.d_vars)
    for a, b in zip(jax.tree_util.tree_leaves(res.aux["shaped_d_vars"]),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # Refinement under the shaped D runs and differs from the unshaped run.
    r_shaped = exp.sample(state, method="refinement", use_shaped_d=True)
    r_plain = exp.sample(state, method="refinement")
    assert not np.allclose(np.asarray(r_shaped.samples),
                           np.asarray(r_plain.samples))


def test_save_shaped_d_rejects_unshaped_result(tmp_path):
    cfg = _tiny_toy_cfg(tmp_path / "run")
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    res = exp.sample(state, method="standard")
    with pytest.raises(ValueError):
        exp.save_shaped_d(res)


def test_image_refinement_raises_d_scores(tmp_path):
    """SURVEY section 4 'MNIST smoke': refinement should increase the mean
    D logit of samples (monotone-ish in K)."""
    cfg = _tiny_image_cfg(tmp_path / "imgrun", niters=10)
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    import dataclasses

    means = []
    for k in (0, 2, 8):
        rcfg = dataclasses.replace(cfg.refine, steps=max(k, 1))
        method = "standard" if k == 0 else "refinement"
        res = exp.sample(state, method=method, refine_cfg=rcfg)
        means.append(float(np.asarray(res.logits).mean()))
    assert means[1] > means[0]
    assert means[2] > means[1]


def test_sweep(tmp_path):
    cfg = _tiny_toy_cfg(tmp_path / "run")
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    out = exp.sweep(state, [1, 3])
    assert set(out) == {1, 3}
    for row in out.values():
        assert np.isfinite(row["pct_hq"])


def test_select_k(tmp_path):
    cfg = _tiny_toy_cfg(tmp_path / "run")
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    best_k, table = exp.select_k(state, ks=[1, 4])
    assert best_k in (1, 4)
    assert table[best_k]["kl"] == min(r["kl"] for r in table.values())


def test_cli_presets(capsys):
    assert cli_main(["presets"]) == 0
    names = json.loads(capsys.readouterr().out.strip())
    assert "toy2d" in names and "imagenet64" in names


def test_fid_newton_schulz_config_is_wired(tmp_path, monkeypatch):
    """eval.newton_schulz_iters > 0 must dispatch fid_of_samples to the
    on-device all-matmul Frechet path (round-1 advisor: the field was
    silently ignored). Numerical agreement of Newton-Schulz itself is
    covered in test_fid.py; rank-deficient tiny-test covariances are outside
    its domain, so here we assert the dispatch, not the value."""
    import dataclasses

    from collaborative_gan_sampling_tpu.evals import fid as fid_mod

    cfg = _tiny_image_cfg(tmp_path / "nsrun")
    cfg = dataclasses.replace(cfg, eval=dataclasses.replace(
        cfg.eval, newton_schulz_iters=7))
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    res = exp.sample(state, method="standard")

    seen_iters = []
    orig = fid_mod.frechet_distance

    def spy(a, b, newton_schulz_iters=0):
        seen_iters.append(newton_schulz_iters)
        return orig(a, b, newton_schulz_iters)

    monkeypatch.setattr(fid_mod, "frechet_distance", spy)
    out = exp.fid_of_samples(res.samples)
    assert isinstance(out, float)
    assert seen_iters == [7]


def test_select_hparams_joint_grid(tmp_path):
    cfg = _tiny_toy_cfg(tmp_path / "run")
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    (best_k, best_rate), table = exp.select_hparams(
        state, ks=[1, 3], rates=[0.05, 0.1])
    assert (best_k, best_rate) in table
    assert len(table) == 4
    assert all(np.isfinite(m["kl"]) for m in table.values())


def test_select_hparams_objective_axis(tmp_path):
    """Optional third tuning axis (refine.objective): 3-tuple cells and a
    3-tuple best; the 2-axis return shape is unchanged (test above)."""
    cfg = _tiny_toy_cfg(tmp_path / "run")
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    best, table = exp.select_hparams(
        state, ks=[1], rates=[0.05], objectives=["ns", "kl"])
    assert best in table and len(best) == 3
    assert len(table) == 2
    assert {cell[2] for cell in table} == {"ns", "kl"}


def test_select_hparams_space_axis(tmp_path):
    """Optional space axis (refine.space x vs z): cells gain a trailing
    space element; with objectives too the order is (k, rate, obj, space)."""
    cfg = _tiny_toy_cfg(tmp_path / "run")
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    best, table = exp.select_hparams(
        state, ks=[2], rates=[0.05], spaces=["x", "z"])
    assert best in table and len(best) == 3
    assert {cell[2] for cell in table} == {"x", "z"}

    best4, table4 = exp.select_hparams(
        state, ks=[2], rates=[0.05], objectives=["ns"], spaces=["z"])
    assert best4 in table4 and len(best4) == 4
    assert best4[2] == "ns" and best4[3] == "z"


def test_select_hparams_stop_axis(tmp_path):
    """Optional early-stop axis (refine.stop_score): cells gain a trailing
    stop element; full order is (k, rate, obj, space, stop)."""
    cfg = _tiny_toy_cfg(tmp_path / "run")
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    best, table = exp.select_hparams(
        state, ks=[2], rates=[0.05], stops=[0.0, 0.5])
    assert best in table and len(best) == 3
    assert {cell[2] for cell in table} == {0.0, 0.5}

    best5, table5 = exp.select_hparams(
        state, ks=[2], rates=[0.05], objectives=["ns"], spaces=["x"],
        stops=[0.5])
    assert best5 in table5 and len(best5) == 5
    assert best5[2:] == ("ns", "x", 0.5)


def test_cli_collab_auto_tune(tmp_path, capsys):
    workdir = str(tmp_path / "at")
    rc = cli_main(["train", "--config", "toy2d", "--workdir", workdir,
                   "train.niters=40", "train.steps_per_call=20",
                   "model.g_hidden=32", "model.d_hidden=32",
                   "model.compute_dtype=float32", "train.ckpt_every=40",
                   "refine.use_pallas=false"])
    assert rc == 0
    capsys.readouterr()
    rc = cli_main(["collab", "--config", "toy2d", "--workdir", workdir,
                   "--auto-tune", "sweep_steps=1,2", "tune_rates=0.05,0.1",
                   "model.g_hidden=32", "model.d_hidden=32",
                   "model.compute_dtype=float32",
                   "refine.num_batches=2", "refine.batch_size=32",
                   "refine.burn_in=32", "refine.use_pallas=false"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["tuned_k"] in (1, 2)
    assert out["tuned_rate"] in (0.05, 0.1)
    assert "kl" in out


def test_conditional_class_count_mismatch_raises(tmp_path):
    """model.num_classes smaller than the dataset's class count would index
    embedding tables out of bounds (silent garbage -> NaN training); the
    Experiment must refuse up front with a clear error."""
    import dataclasses

    import pytest

    from collaborative_gan_sampling_tpu.config import get_preset
    from collaborative_gan_sampling_tpu.pipeline import Experiment

    cfg = get_preset("imagenet64")  # procedural dataset has 1000 classes
    cfg = cfg.replace(
        workdir=str(tmp_path),
        model=dataclasses.replace(cfg.model, num_classes=20))
    with pytest.raises(ValueError, match="out of bounds"):
        Experiment(cfg, echo_metrics=False)


def test_cli_inspect(tmp_path, capsys):
    workdir = str(tmp_path / "insp")
    common = ["--config", "toy2d", "--workdir", workdir,
              "train.niters=20", "train.steps_per_call=10",
              "train.batch_size=64", "model.g_hidden=32",
              "model.d_hidden=32", "model.compute_dtype=float32",
              "train.g_ema_decay=0.9"]
    # No checkpoint yet: inspect reports that, never trains.
    assert cli_main(["inspect"] + common) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["checkpoint"] is None

    assert cli_main(["train"] + common) == 0
    capsys.readouterr()
    assert cli_main(["inspect"] + common) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["step"] == 20
    assert out["g_params"] > 0 and out["d_params"] > 0
    assert out["g_ema_tracked"] is True
    assert out["model_config"]["kind"] == "mlp"


def test_load_or_train_resumes_behind_checkpoint(tmp_path):
    """A checkpoint behind train.niters is topped up, not silently
    returned (evaluating an it-N dir as it-M mislabels every metric)."""
    import dataclasses

    cfg = _tiny_toy_cfg(tmp_path / "topup")
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.load_or_train()          # trains to cfg.train.niters (60)
    assert int(state.step) == 60

    cfg2 = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, niters=80))
    exp2 = Experiment(cfg2, echo_metrics=False)
    state2 = exp2.load_or_train()        # resumes 60 -> 80
    assert int(state2.step) == 80

    # At-or-ahead checkpoints load without training (niters override).
    state3 = exp2.load_or_train(niters=40)
    assert int(state3.step) == 80


def test_real_stats_npz_persistence(tmp_path):
    """eval.real_stats_path: computed-and-saved on first use, loaded by
    later processes (proven by perturbing the file), guarded against
    feature-net and dimension mismatches."""
    import dataclasses

    from collaborative_gan_sampling_tpu.evals.fid import (
        FIDStats,
        load_stats,
        save_stats,
    )

    path = str(tmp_path / "real_stats.npz")
    base = _tiny_image_cfg(tmp_path / "run")
    cfg = base.replace(eval=dataclasses.replace(base.eval,
                                                real_stats_path=path))

    exp1 = Experiment(cfg, echo_metrics=False)
    s1 = exp1.real_stats()
    assert os.path.exists(path)

    # Perturb the file; a fresh Experiment must return the perturbed stats
    # (i.e. it loaded the npz instead of recomputing).
    stats, label = load_stats(path)
    assert label == "random_conv"
    save_stats(path, FIDStats(mu=stats.mu + 1.0, sigma=stats.sigma,
                              n=stats.n), feature_net=label)
    exp2 = Experiment(cfg, echo_metrics=False)
    s2 = exp2.real_stats()
    np.testing.assert_allclose(np.asarray(s2.mu), np.asarray(s1.mu) + 1.0,
                               rtol=1e-6)

    # Feature-net label mismatch -> clear error, not a silently wrong FID.
    save_stats(path, stats, feature_net="rotnet")
    exp3 = Experiment(cfg, echo_metrics=False)
    with pytest.raises(ValueError, match="feature net"):
        exp3.real_stats()

    # Dimension mismatch (foreign unlabeled file) -> clear error.
    import numpy as _np
    _np.savez(path.replace(".npz", "_bad.npz"), mu=_np.zeros(7, _np.float32),
              sigma=_np.eye(7, dtype=_np.float32))
    cfg_bad = base.replace(eval=dataclasses.replace(
        base.eval, real_stats_path=path.replace(".npz", "_bad.npz")))
    exp4 = Experiment(cfg_bad, echo_metrics=False)
    with pytest.raises(ValueError, match="-dim"):
        exp4.real_stats()
