"""FusedProp trainer (arXiv:2004.03335): gradient equivalence + learning.

The fused update must produce EXACTLY the gradients of the standard losses —
it is a computation-sharing transform, not an approximation. Verified by
comparing one fused step against hand-computed jax.grad updates on the same
(x_real, z) draw.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from collaborative_gan_sampling_tpu.config import ModelConfig, TrainConfig
from collaborative_gan_sampling_tpu.data import make_mixture, sample_mixture
from collaborative_gan_sampling_tpu.models import make_bundle
from collaborative_gan_sampling_tpu.training import (
    create_train_state,
    make_train_chunk,
    nonsaturating_d_loss,
    nonsaturating_g_loss,
)
from collaborative_gan_sampling_tpu.utils.prng import step_key


def _setup(fused):
    mcfg = ModelConfig(kind="mlp", z_dim=4, g_hidden=32, d_hidden=32,
                       compute_dtype="float32")
    tcfg = TrainConfig(batch_size=64, steps_per_call=1, d_lr=1e-3, g_lr=1e-3,
                       fused_prop=fused)
    bundle = make_bundle(mcfg)
    spec = make_mixture("ring8", std=0.1)
    data_fn = lambda key, n: (sample_mixture(key, spec, n), None)
    return bundle, tcfg, data_fn


def test_fused_gradients_match_direct():
    bundle, tcfg, data_fn = _setup(fused=True)
    base = jax.random.PRNGKey(0)
    state0 = create_train_state(bundle, tcfg, base)
    chunk = make_train_chunk(bundle, tcfg, data_fn, base)
    state1, metrics = chunk(state0)

    # Recompute the same draw by hand (fused_update uses role 'data' at
    # step 0 and splits into (data, z, labels)).
    key = step_key(base, jnp.int32(0), "data")
    k_data, k_z, _ = jax.random.split(key, 3)
    x_real, _ = data_fn(k_data, 64)
    z = bundle.sample_z(k_z, 64)

    state_ref = create_train_state(bundle, tcfg, base)

    def d_loss(d_params):
        x_fake = bundle.generate(state_ref.g_vars, z, train=False)
        d_vars = dict(state_ref.d_vars, params=d_params)
        lr = bundle.discriminate(d_vars, x_real, train=False)
        lf = bundle.discriminate(d_vars, x_fake, train=False)
        return nonsaturating_d_loss(lr, lf)

    def g_loss(g_params):
        g_vars = dict(state_ref.g_vars, params=g_params)
        x_fake = bundle.generate(g_vars, z, train=False)
        lf = bundle.discriminate(state_ref.d_vars, x_fake, train=False)
        return nonsaturating_g_loss(lf)

    d_grads = jax.grad(d_loss)(state_ref.d_vars["params"])
    g_grads = jax.grad(g_loss)(state_ref.g_vars["params"])

    # Apply one optimizer step by hand and compare parameters.
    import optax

    tx = optax.adam(1e-3, b1=0.5)

    def one_step(params, grads):
        upd, _ = tx.update(grads, tx.init(params), params)
        return optax.apply_updates(params, upd)

    d_want = one_step(state_ref.d_vars["params"], d_grads)
    g_want = one_step(state_ref.g_vars["params"], g_grads)
    for a, b in zip(jax.tree_util.tree_leaves(state1.d_vars["params"]),
                    jax.tree_util.tree_leaves(d_want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state1.g_vars["params"]),
                    jax.tree_util.tree_leaves(g_want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6)
    assert np.isfinite(float(metrics["d_loss"]))


def test_fused_trainer_learns():
    bundle, tcfg, data_fn = _setup(fused=True)
    tcfg = dataclasses.replace(tcfg, steps_per_call=100, batch_size=128)
    base = jax.random.PRNGKey(0)
    state = create_train_state(bundle, tcfg, base)
    chunk = make_train_chunk(bundle, tcfg, data_fn, base)
    for _ in range(4):
        state, m = chunk(state)
    z = bundle.sample_z(jax.random.PRNGKey(1), 512)
    x = bundle.generate(state.g_vars, z)
    assert float(jnp.mean(jnp.linalg.norm(x, axis=1))) > 1.0


def test_fused_works_with_batchnorm_models():
    mcfg = ModelConfig(kind="dcgan", z_dim=8, image_size=16, channels=1,
                       g_base_filters=8, d_base_filters=8,
                       compute_dtype="float32")
    bundle = make_bundle(mcfg)
    from collaborative_gan_sampling_tpu.config import DataConfig
    from collaborative_gan_sampling_tpu.data import load_image_dataset

    ds = load_image_dataset(DataConfig(dataset="mnist"), image_size=16,
                            procedural_n=64)

    def data_fn(key, n):
        imgs, _ = ds.batch(key, n)
        return imgs, None

    tcfg = TrainConfig(batch_size=16, steps_per_call=2, fused_prop=True)
    base = jax.random.PRNGKey(0)
    state = create_train_state(bundle, tcfg, base)
    chunk = make_train_chunk(bundle, tcfg, data_fn, base)
    state, m = chunk(state)
    assert int(state.step) == 2
    for v in m.values():
        assert np.isfinite(float(v))


def test_fused_bn_stats_thread_real_then_fake():
    """D's running BN stats after one fused step must match the alternating
    trainer's semantics: real-pass stats applied first, fake-pass stats on
    top (ADVICE r1: an early fused version discarded the real-pass stats,
    so eval-mode D logits drifted from the d_update trainer's)."""
    from collaborative_gan_sampling_tpu.config import DataConfig
    from collaborative_gan_sampling_tpu.data import load_image_dataset
    from collaborative_gan_sampling_tpu.training.gan import _merge_stats

    mcfg = ModelConfig(kind="dcgan", z_dim=8, image_size=16, channels=1,
                       g_base_filters=8, d_base_filters=8,
                       compute_dtype="float32")
    bundle = make_bundle(mcfg)
    ds = load_image_dataset(DataConfig(dataset="mnist"), image_size=16,
                            procedural_n=64)
    data_fn = lambda key, n: (ds.batch(key, n)[0], None)
    tcfg = TrainConfig(batch_size=16, steps_per_call=1, fused_prop=True)
    base = jax.random.PRNGKey(0)
    chunk = make_train_chunk(bundle, tcfg, data_fn, base)
    state1, _ = chunk(create_train_state(bundle, tcfg, base))
    # The chunk donates its input state; rebuild the (deterministic) initial
    # state for the oracle below.
    state0 = create_train_state(bundle, tcfg, base)

    # Oracle: same draw (fused_update splits step_key(base, 0, 'data') into
    # (data, z, labels)), real pass then fake pass from the initial stats.
    key = step_key(base, jnp.int32(0), "data")
    k_data, k_z, _ = jax.random.split(key, 3)
    x_real, _ = data_fn(k_data, 16)
    z = bundle.sample_z(k_z, 16)
    x_fake, _ = bundle.generate(state0.g_vars, z, train=True)
    _, upd_r = bundle.discriminate(state0.d_vars, x_real, train=True)
    d_vars_r = _merge_stats(state0.d_vars, upd_r)
    _, upd_f = bundle.discriminate(d_vars_r, x_fake, train=True)
    expected = _merge_stats(d_vars_r, upd_f)["batch_stats"]

    got = state1.d_vars["batch_stats"]
    for e, g in zip(jax.tree_util.tree_leaves(expected),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e),
                                   rtol=1e-5, atol=1e-6)
