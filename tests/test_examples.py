"""The examples/ scripts must stay runnable — they are the documented
entry points users copy from. Each runs in a subprocess (fresh import
state, forced-CPU like conftest) with NITERS shrunk and cwd in a tmp dir
so their relative `runs/` output lands in the sandbox."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXAMPLES = [
    "quickstart_2d.py",
    "shaped_d_reuse.py",
    "custom_data.py",
    "inception_fid.py",
    "export_serving.py",
    "migrate_tf1.py",
]


@pytest.mark.parametrize("script", EXAMPLES)
def test_example_runs(script, tmp_path):
    env = dict(os.environ)
    env["NITERS"] = "50"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["MPLBACKEND"] = "Agg"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        f"exec(open({os.path.join(REPO, 'examples', script)!r}).read())"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=tmp_path,
                          env=env, capture_output=True, text=True,
                          timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
