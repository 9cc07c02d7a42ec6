"""Train once, shape once, refine many times.

Collab sampling fine-tunes (shapes) the discriminator while it samples; the
shaped D is itself a product — later refinement runs reuse it without paying
for shaping again, and with different (K, lambda) settings.

    python examples/shaped_d_reuse.py

NITERS=50 in the environment shrinks the run (used by the CI smoke test).
"""

import dataclasses
import json
import os

from collaborative_gan_sampling_tpu.config import get_preset
from collaborative_gan_sampling_tpu.pipeline import Experiment
from collaborative_gan_sampling_tpu.utils.compile_cache import (
    enable_compile_cache,
)

enable_compile_cache()

cfg = get_preset("toy2d").replace(workdir="runs/shaped_reuse")
exp = Experiment(cfg)
state = exp.load_or_train(niters=int(os.environ.get("NITERS", 1000)))

# One collab pass: refine -> reject -> shape, inside a single compiled scan.
res = exp.sample(state, method="collab")
print("collab:", json.dumps(exp.evaluate(res)))
exp.save_shaped_d(res)

# Later (any process): refinement under the shaped D, at a different depth.
for k in (5, 20):
    rcfg = dataclasses.replace(cfg.refine, steps=k)
    r = exp.sample(state, method="refinement", use_shaped_d=True,
                   refine_cfg=rcfg)
    print(f"refine K={k} under shaped D:", json.dumps(exp.evaluate(r)))
