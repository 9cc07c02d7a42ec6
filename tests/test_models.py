import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collaborative_gan_sampling_tpu.config import ModelConfig
from collaborative_gan_sampling_tpu.models import make_bundle
from collaborative_gan_sampling_tpu.models.dcgan import num_stages


def test_num_stages():
    assert num_stages(28) == 2  # 28 -> 14 -> 7
    assert num_stages(32) == 3  # 32 -> 16 -> 8 -> 4
    assert num_stages(64) == 4  # 64 -> ... -> 4


def test_mlp_bundle_shapes():
    cfg = ModelConfig(kind="mlp", z_dim=4, data_dim=2,
                      compute_dtype="float32")
    b = make_bundle(cfg)
    g_vars, d_vars = b.init(jax.random.PRNGKey(0))
    z = b.sample_z(jax.random.PRNGKey(1), 16)
    x = b.generate(g_vars, z)
    assert x.shape == (16, 2) and x.dtype == jnp.float32
    logits = b.discriminate(d_vars, x)
    assert logits.shape == (16,) and logits.dtype == jnp.float32


@pytest.mark.parametrize("size,channels", [(28, 1), (32, 3), (64, 3)])
def test_dcgan_bundle_shapes(size, channels):
    cfg = ModelConfig(kind="dcgan", z_dim=16, image_size=size,
                      channels=channels, g_base_filters=8, d_base_filters=8)
    b = make_bundle(cfg)
    g_vars, d_vars = b.init(jax.random.PRNGKey(0))
    z = b.sample_z(jax.random.PRNGKey(1), 4)
    x = b.generate(g_vars, z)
    assert x.shape == (4, size, size, channels)
    assert x.dtype == jnp.float32
    assert float(jnp.abs(x).max()) <= 1.0  # tanh output
    logits = b.discriminate(d_vars, x)
    assert logits.shape == (4,)


def test_dcgan_batch_stats_update_in_train_mode():
    cfg = ModelConfig(kind="dcgan", z_dim=8, image_size=32, channels=1,
                      g_base_filters=8, d_base_filters=8)
    b = make_bundle(cfg)
    g_vars, _ = b.init(jax.random.PRNGKey(0))
    z = b.sample_z(jax.random.PRNGKey(1), 4)
    _, upd = b.generate(g_vars, z, train=True)
    assert "batch_stats" in upd
    old = jax.tree_util.tree_leaves(g_vars["batch_stats"])
    new = jax.tree_util.tree_leaves(upd["batch_stats"])
    assert any(not np.allclose(a, b_) for a, b_ in zip(old, new))


def test_dcgan_eval_mode_is_per_sample_decoupled():
    """Refinement needs D(x_i) independent of x_j (j != i) in eval mode."""
    cfg = ModelConfig(kind="dcgan", z_dim=8, image_size=32, channels=1,
                      g_base_filters=8, d_base_filters=8,
                      compute_dtype="float32")
    b = make_bundle(cfg)
    _, d_vars = b.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 1))
    logits_full = b.discriminate(d_vars, x, train=False)
    logits_single = b.discriminate(d_vars, x[:1], train=False)
    np.testing.assert_allclose(np.asarray(logits_full[:1]),
                               np.asarray(logits_single), rtol=1e-5)


def test_conditional_dcgan():
    cfg = ModelConfig(kind="dcgan", z_dim=8, image_size=32, channels=3,
                      g_base_filters=8, d_base_filters=8, num_classes=10)
    b = make_bundle(cfg)
    assert b.conditional
    g_vars, d_vars = b.init(jax.random.PRNGKey(0))
    z = b.sample_z(jax.random.PRNGKey(1), 4)
    labels = jnp.array([0, 3, 7, 9])
    x = b.generate(g_vars, z, labels)
    assert x.shape == (4, 32, 32, 3)
    logits = b.discriminate(d_vars, x, labels)
    # Projection term: logits must depend on the label.
    logits_other = b.discriminate(d_vars, x, (labels + 1) % 10)
    assert not np.allclose(np.asarray(logits), np.asarray(logits_other))


def test_mlp_generator_params_finite_and_small_init():
    cfg = ModelConfig(kind="mlp", compute_dtype="float32")
    b = make_bundle(cfg)
    g_vars, d_vars = b.init(jax.random.PRNGKey(0))
    for leaf in jax.tree_util.tree_leaves(g_vars) + jax.tree_util.tree_leaves(d_vars):
        arr = np.asarray(leaf)
        assert np.isfinite(arr).all()
        # 'small init': flax-default lecun kernels have std 1/sqrt(fan_in)
        # <= 1 and zero biases — an init-scale regression (e.g. stddev 5)
        # must fail here, not just NaN later.
        if arr.ndim >= 2:
            assert arr.std() <= 1.0, arr.std()
        assert np.abs(arr).max() < 4.0


def test_dcgan_rejects_unsupported_image_size():
    import pytest

    from collaborative_gan_sampling_tpu.config import ModelConfig

    with pytest.raises(ValueError, match="image_size=27"):
        make_bundle(ModelConfig(kind="dcgan", image_size=27))
