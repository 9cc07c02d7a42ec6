"""Campaign-runner smoke: benchmarks/ scripts are the measured-results
provenance (BASELINE.md quotes their JSON) and must stay runnable. Full
runs need the chip; the toy2d preset exercises the same train -> tune ->
table pipeline in seconds on CPU. Subprocess like tests/test_examples.py:
fresh import state, forced CPU, cwd in a tmp dir."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_quality_converged_smoke(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["MPLBACKEND"] = "Agg"
    out = tmp_path / "conv"
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "benchmarks", "quality_converged.py"),
         "--preset", "toy2d", "--iters", "60", "--ks", "2",
         "--rates", "0.1", "--out", str(out)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads((out / "converged_it60.json").read_text())
    methods = {"standard", "reject", "refinement", "mhgan",
               "refine_reject", "collab", "collab:anchor", "collab:safe",
               "collab:gentle"}
    assert set(result["table"]) == {f"{arm}:{m}" for arm in ("plain", "ema")
                                    for m in methods}
    for row in result["table"].values():
        assert "kl" in row and "kl_full_pool" in row
    assert set(result["tuned"]) == {"plain", "ema"}
    for arm in ("plain", "ema"):
        assert result["tuned"][arm] == {"k": 2, "rate": 0.1}


def test_quality_ksweep_smoke(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["MPLBACKEND"] = "Agg"
    out = tmp_path / "sweep"
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "benchmarks", "quality_ksweep.py"),
         "--preset", "toy2d", "--iters", "60", "--ks", "1", "2",
         "--rate", "0.1", "--workdir", str(tmp_path / "arm"),
         "--out", str(out)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads((out / "ksweep_it60.json").read_text())
    assert set(result["table"]) == {"refinement:k=1", "refinement:k=2",
                                    "collab:k=1", "collab:k=2"}
    for cell in result["table"].values():
        assert "kl" in cell and "sample_wall_s" in cell


def test_quality_crossover_smoke(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["MPLBACKEND"] = "Agg"
    out = tmp_path / "cross"
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "benchmarks", "quality_crossover.py"),
         "--preset", "toy2d", "--depths", "20", "40", "--ks", "2",
         "--rates", "0.1", "--out", str(out)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads((out / "crossover.json").read_text())
    assert result["depths"] == [20, 40]
    arms = ("standard", "reject", "refinement", "mhgan", "collab",
            "collab_safe")
    assert result["arms"] == list(arms)
    for d in ("20", "40"):
        row = result["curve"][d]
        assert row["tuned"] == {"k": 2, "rate": 0.1}
        for arm in arms:
            assert "kl" in row[arm]
    assert (out / "crossover.png").exists()
    # Snapshots restored (not retrained) and rows cached (not re-measured)
    # on an identical second invocation.
    proc2 = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "benchmarks", "quality_crossover.py"),
         "--preset", "toy2d", "--depths", "20", "40", "--ks", "2",
         "--rates", "0.1", "--out", str(out)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=420)
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    assert proc2.stdout.count("snapshot restored") == 2
    assert proc2.stdout.count("(cached)") == 2
    # A protocol change (different --rates) invalidates the cached rows
    # instead of silently reusing them under the new metadata (ADVICE r4).
    proc3 = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "benchmarks", "quality_crossover.py"),
         "--preset", "toy2d", "--depths", "20", "--ks", "2",
         "--rates", "0.2", "--out", str(out)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=420)
    assert proc3.returncode == 0, proc3.stderr[-2000:]
    assert "cached under different rates — skipping" in proc3.stdout
    row = json.loads((out / "crossover.json").read_text())["curve"]["20"]
    assert row["tuned"] == {"k": 2, "rate": 0.2}


def test_probe_pool_noise_smoke(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["MPLBACKEND"] = "Agg"
    out = tmp_path / "noise"
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "benchmarks", "probe_pool_noise.py"),
         "--preset", "toy2d", "--iters", "60",
         "--workdir", str(tmp_path / "arm"), "--pool", "512",
         "--pools", "3", "--methods", "standard", "mhgan",
         "--out", str(out)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads((out / "pool_noise_it60.json").read_text())
    assert result["metric"] == "kl"
    for method in ("standard", "mhgan"):
        stats = result["methods"][method]
        assert len(stats["kl"]) == 3
        assert stats["max_gap"] >= stats["mean_gap"] >= 0.0
    # Independent pools must actually differ (distinct fold_in keys).
    assert result["methods"]["standard"]["max_gap"] > 0.0
