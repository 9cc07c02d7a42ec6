"""Feature networks for FID (C13).

The reference uses the TTUR frozen Inception-v3 pb graph, *downloaded at
runtime* (``fid.py``, approximate path — SURVEY.md C13). This environment has
no network, so (per SURVEY.md section 7, hard part 1) the framework ships a
documented substitute with the same interface, and can load real Inception-v3
weights from a local file when one exists:

* ``random_conv`` — a frozen randomly-initialised conv net. Random-projection
  features are a known-serviceable FID substitute for *relative* comparisons
  (the ordering standard < refined that the benchmark needs); absolute values
  are NOT comparable to Inception-FID numbers, and outputs are labelled
  ``fid/random_conv`` to make that explicit.
* ``inception:<path>`` — the REAL Inception-v3 pool3 architecture in Flax
  (evals/inception.py) loading msgpack'd variables from <path>; pretrained
  torchvision/pytorch-fid weights convert via params_from_torch_state_dict,
  making reference-comparable FID a config switch once weights exist.

The FID *pipeline* (moments + Frechet distance) is feature-net agnostic and
is validated against closed-form Gaussians in tests, so swapping the feature
net in no way changes the math being tested.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

FeatureFn = Callable[[jax.Array], jax.Array]  # (B,H,W,C)[-1,1] -> (B,F)


class RandomConvFeatures(nn.Module):
    """Frozen random conv tower: 4 stride-2 conv+relu stages -> GAP -> dense.

    Width doubles per stage; final feature dim 2048 mirrors Inception pool3
    so downstream covariance code paths run at representative sizes.
    """

    # feature_dim 512 (not Inception's 2048): random features carry less
    # information per dimension, and 512 keeps finite-sample covariances
    # well-conditioned at the 5-10k sample counts the offline configs use.
    base: int = 32
    feature_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x.astype(self.dtype)
        for i in range(4):
            if min(h.shape[1], h.shape[2]) >= 2:
                stride = 2
            else:
                stride = 1
            h = nn.Conv(self.base * (2 ** i), (3, 3), strides=(stride, stride),
                        padding="SAME", dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.relu(h)
        h = jnp.mean(h, axis=(1, 2))  # global average pool
        h = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj")(h)
        return h.astype(jnp.float32)


class SmallClassifier(nn.Module):
    """Compact conv classifier whose penultimate layer is the FID feature.

    The SURVEY.md section 7 stage-4 'documented substitute' for Inception
    when weights are unobtainable offline: a classifier *trained on the
    target dataset's labels* yields features far more discriminative than
    random projections (the FID noise floor shrinks accordingly). 256-d
    features keep finite-sample covariances well-conditioned.
    """

    num_classes: int = 10
    feature_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, return_features: bool = False):
        h = x.astype(self.dtype)
        for i, ch in enumerate((32, 64, 128)):
            stride = 2 if min(h.shape[1], h.shape[2]) >= 2 else 1
            h = nn.Conv(ch, (3, 3), strides=(stride, stride), padding="SAME",
                        dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.relu(h)
        h = jnp.mean(h, axis=(1, 2))
        feats = nn.relu(nn.Dense(self.feature_dim, dtype=self.dtype,
                                 name="feat")(h))
        if return_features:
            return feats.astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="logits")(feats).astype(jnp.float32)


def train_classifier_features(data_fn, num_classes: int,
                              image_shape: tuple[int, int, int],
                              steps: int = 1500, batch: int = 256,
                              lr: float = 1e-3,
                              seed: int = 0) -> tuple[FeatureFn, dict]:
    """Train SmallClassifier on `data_fn(key, n) -> (x, labels)`; return the
    penultimate-feature fn + params. One jitted lax.scan — seconds on TPU."""
    import optax

    module = SmallClassifier(num_classes=num_classes)
    key = jax.random.PRNGKey(seed)
    params = module.init(jax.random.fold_in(key, 0),
                         jnp.zeros((1, *image_shape), jnp.float32))
    tx = optax.adam(lr)

    @jax.jit
    def fit(params):
        opt = tx.init(params)

        def step(carry, i):
            params, opt = carry
            x, y = data_fn(jax.random.fold_in(key, 1 + i), batch)

            def loss_fn(p):
                logits = module.apply(p, x)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt, params)
            return (optax.apply_updates(params, updates), opt), loss

        (params, _), losses = jax.lax.scan(step, (params, opt),
                                           jnp.arange(steps))
        return params, losses[-1]

    params, final_loss = fit(params)

    def feature_fn(x: jax.Array) -> jax.Array:
        return module.apply(params, x, return_features=True)

    return feature_fn, {"params": params, "final_loss": final_loss}


def train_rotation_features(data_fn, image_shape: tuple[int, int, int],
                            steps: int = 1500, batch: int = 256,
                            lr: float = 1e-3,
                            seed: int = 0) -> tuple[FeatureFn, dict]:
    """Self-supervised features for UNLABELED data: RotNet (Gidaris et al.
    2018) — train SmallClassifier to predict which of 4 right-angle
    rotations was applied. Needs only `data_fn(key, n) -> x`; gives features
    far more discriminative than random projections (usable FID on CelebA-
    style unlabeled datasets)."""
    import optax

    module = SmallClassifier(num_classes=4)
    key = jax.random.PRNGKey(seed)
    params = module.init(jax.random.fold_in(key, 0),
                         jnp.zeros((1, *image_shape), jnp.float32))
    tx = optax.adam(lr)

    def rotate_batch(x, k):
        """Rotate each sample i by k[i] * 90 degrees."""
        rots = jnp.stack([x, jnp.rot90(x, 1, axes=(1, 2)),
                          jnp.rot90(x, 2, axes=(1, 2)),
                          jnp.rot90(x, 3, axes=(1, 2))])  # (4, B, H, W, C)
        return jnp.take_along_axis(
            rots, k[None, :, None, None, None], axis=0)[0]

    @jax.jit
    def fit(params):
        opt = tx.init(params)

        def step(carry, i):
            params, opt = carry
            k_i = jax.random.fold_in(key, 1 + i)
            x = data_fn(jax.random.fold_in(k_i, 0), batch)
            rot = jax.random.randint(jax.random.fold_in(k_i, 1), (batch,),
                                     0, 4)
            x_rot = rotate_batch(x, rot)

            def loss_fn(p):
                logits = module.apply(p, x_rot)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, rot).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt, params)
            return (optax.apply_updates(params, updates), opt), loss

        (params, _), losses = jax.lax.scan(step, (params, opt),
                                           jnp.arange(steps))
        return params, losses[-1]

    params, final_loss = fit(params)

    def feature_fn(x: jax.Array) -> jax.Array:
        return module.apply(params, x, return_features=True)

    return feature_fn, {"params": params, "final_loss": final_loss}


def make_feature_fn(spec: str, image_shape: tuple[int, int, int],
                    seed: int = 0) -> tuple[FeatureFn, str]:
    """Build (feature_fn, label). `spec`: 'auto' | 'random_conv' |
    'inception:<path>'. ('auto' with labelled data is upgraded to a trained
    classifier by the pipeline — see pipeline.Experiment._feature_fn.)"""
    if spec in ("auto", "random_conv"):
        module = RandomConvFeatures()
        params = module.init(jax.random.PRNGKey(seed),
                             jnp.zeros((1, *image_shape), jnp.float32))

        def feature_fn(x: jax.Array) -> jax.Array:
            return module.apply(params, x)

        return feature_fn, "random_conv"
    if spec.startswith("inception:"):
        # Real Flax Inception-v3 pool3 (evals/inception.py): msgpack'd
        # variables at <path>, e.g. converted from a pytorch-fid state dict
        # via params_from_torch_state_dict. Reference-comparable FID.
        import os

        from collaborative_gan_sampling_tpu.evals.inception import (
            make_inception_feature_fn,
        )

        path = spec.split(":", 1)[1]
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"Inception weight file {path!r} not found; produce one with "
                "evals.inception.save_inception_params (from "
                "params_from_torch_state_dict for pretrained torchvision/"
                "pytorch-fid weights, or init_inception_variables for "
                "random-init smoke runs)")
        return make_inception_feature_fn(path), "inception_v3"
    raise ValueError(f"unknown feature spec {spec!r}")
