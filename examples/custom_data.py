"""Plugging in your own data.

Image presets read real files from ``data.path`` (MNIST idx, CIFAR-10 pickle
batches, or a folder of JPEG/PNG for CelebA-style data); with no path they
fall back to the procedural distribution. For anything else, drive the
training layer directly with a pure ``data_fn(key, n) -> (x, labels)`` —
any jittable function works, including a device-resident table like below.

    python examples/custom_data.py
"""

import jax
import jax.numpy as jnp

from collaborative_gan_sampling_tpu.config import ModelConfig, TrainConfig
from collaborative_gan_sampling_tpu.models import make_bundle
from collaborative_gan_sampling_tpu.training import (
    create_train_state,
    make_train_chunk,
)

# A made-up 2D dataset: points on a spiral, resident on device.
t = jnp.linspace(0, 4 * jnp.pi, 50_000)
table = jnp.stack([t / 6 * jnp.cos(t), t / 6 * jnp.sin(t)], axis=1)


def data_fn(key, n):
    idx = jax.random.randint(key, (n,), 0, table.shape[0])
    jitter = 0.05 * jax.random.normal(jax.random.fold_in(key, 1), (n, 2))
    return table[idx] + jitter, None


import os

bundle = make_bundle(ModelConfig(kind="mlp", z_dim=4,
                                 compute_dtype="float32"))
tcfg = TrainConfig(batch_size=256,
                   niters=int(os.environ.get("NITERS", 500)),
                   steps_per_call=50, d_lr=1e-3, g_lr=1e-3)
base = jax.random.PRNGKey(0)
state = create_train_state(bundle, tcfg, base)
chunk = make_train_chunk(bundle, tcfg, data_fn, base)
for _ in range(tcfg.niters // tcfg.steps_per_call):
    state, metrics = chunk(state)
print("final:", {k: float(v) for k, v in metrics.items()})
