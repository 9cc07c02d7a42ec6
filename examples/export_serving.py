"""Fleet deployment: export the sampler, serve it with no model code.

Train (or restore) a tiny image GAN, export one serving round — trained
weights, DRS calibration and the shaped discriminator baked into a
self-contained StableHLO artifact — then reload it as a plain callable
and generate accepted samples. The load side needs neither the config,
the checkpoint nor any model class: this is what ships to serving hosts.

    python examples/export_serving.py

NITERS=50 in the environment shrinks the run (used by the CI smoke test).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from collaborative_gan_sampling_tpu.config import apply_overrides, get_preset
from collaborative_gan_sampling_tpu.pipeline import Experiment
from collaborative_gan_sampling_tpu.sampling.export import load_sampler
from collaborative_gan_sampling_tpu.utils.compile_cache import (
    enable_compile_cache,
)

enable_compile_cache()

niters = int(os.environ.get("NITERS", 1000))
cfg = get_preset("mnist").replace(workdir="runs/export_demo")
# Tiny model so the example runs in seconds on CPU; drop the overrides for
# the real preset on a TPU.
cfg = apply_overrides(cfg, [
    f"train.niters={niters}", "train.steps_per_call=25",
    "model.image_size=16", "model.g_base_filters=8",
    "model.d_base_filters=8", "model.z_dim=16",
    "refine.steps=5", "refine.num_batches=2", "refine.batch_size=64",
    "refine.burn_in=64", "refine.use_pallas=false",
])

exp = Experiment(cfg)
state = exp.load_or_train()

# -- producer side: one call writes the artifact + JSON meta sidecar -------
meta = exp.export(state, "runs/export_demo/sampler.stablehlo",
                  method="collab", platforms=("cpu",))
print("exported:", json.dumps(meta))

# -- serving side: no Experiment, no config, no checkpoint ------------------
fn, meta = load_sampler("runs/export_demo/sampler.stablehlo")
key = jnp.asarray(jax.random.PRNGKey(123), jnp.uint32)
samples, labels, accept, logits = fn(key)
acc = np.asarray(accept)
print(f"served round: {samples.shape[0]} candidates, "
      f"{int(acc.sum())} accepted "
      f"(accept_rate={float(acc.mean()):.3f})")
assert np.isfinite(np.asarray(samples)).all()
