"""Quickstart: the reference's 2D experiment end-to-end in one script.

Trains the toy GAN on the imbalanced 8-Gaussian ring, compares all five
sampling strategies (%HQ / mode-KL), and renders the teaser figures.

    python examples/quickstart_2d.py

NITERS=50 in the environment shrinks the run (used by the CI smoke test).
"""

import json
import os

from collaborative_gan_sampling_tpu.config import get_preset
from collaborative_gan_sampling_tpu.pipeline import Experiment
from collaborative_gan_sampling_tpu.utils.compile_cache import (
    enable_compile_cache,
)

enable_compile_cache()

cfg = get_preset("toy2d").replace(workdir="runs/quickstart_2d")
exp = Experiment(cfg)

state = exp.train(niters=int(os.environ.get("NITERS", 1000)))
table = exp.benchmark(state)  # standard | reject | mhgan | refinement | collab
print(json.dumps(table, indent=2))
print(json.dumps(exp.teaser(state)))  # trajectory + quiver figures
