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
    assert set(result["table"]) == {"plain:standard", "plain:collab",
                                    "ema:standard", "ema:collab"}
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
