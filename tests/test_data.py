import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collaborative_gan_sampling_tpu.config import DataConfig
from collaborative_gan_sampling_tpu.data import (
    load_image_dataset,
    make_mixture,
    sample_mixture,
)
from collaborative_gan_sampling_tpu.data.images import (
    denormalize_images,
    normalize_images,
)
from collaborative_gan_sampling_tpu.data.synthetic2d import log_density


def test_ring8_geometry():
    spec = make_mixture("ring8", radius=2.0, std=0.05)
    assert spec.means.shape == (8, 2)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(spec.means), axis=1), 2.0, rtol=1e-6)
    np.testing.assert_allclose(float(spec.weights.sum()), 1.0, rtol=1e-6)


def test_imbalanced_weights_sorted_and_normalized():
    spec = make_mixture("ring8_imbalanced")
    w = np.asarray(spec.weights)
    assert (np.diff(w) < 0).all()  # strictly decreasing
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    assert w[0] / w[-1] > 10  # genuinely imbalanced


def test_grid25():
    spec = make_mixture("grid25", radius=2.0)
    assert spec.means.shape == (25, 2)


def test_sample_mixture_statistics():
    spec = make_mixture("ring8", radius=2.0, std=0.05)
    x = sample_mixture(jax.random.PRNGKey(0), spec, 20000)
    assert x.shape == (20000, 2)
    # Every sample should be near radius 2 (std is small).
    r = np.linalg.norm(np.asarray(x), axis=1)
    assert abs(r.mean() - 2.0) < 0.02
    # Mode proportions roughly uniform.
    ang = np.round(np.arctan2(x[:, 1], x[:, 0]) / (np.pi / 4)) % 8
    counts = np.bincount(ang.astype(int), minlength=8) / 20000
    np.testing.assert_allclose(counts, 1 / 8, atol=0.02)


def test_log_density_matches_manual_single_gaussian():
    spec = make_mixture("ring8", radius=2.0, std=0.1)
    # At a mode center, density is dominated by that component.
    x = spec.means[:1]
    ld = float(log_density(spec, x)[0])
    manual = np.log(1 / 8) - np.log(2 * np.pi * 0.01)  # weight * N(0 dist)
    assert abs(ld - manual) < 1e-3


def test_normalize_roundtrip():
    u8 = jnp.arange(256, dtype=jnp.uint8).reshape(1, 16, 16, 1)
    x = normalize_images(u8)
    assert float(x.min()) == -1.0 and float(x.max()) == pytest.approx(1.0)
    back = denormalize_images(x)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(u8))


def test_procedural_image_dataset():
    ds = load_image_dataset(DataConfig(dataset="mnist"), procedural_n=512)
    assert ds.procedural
    assert ds.images.shape == (512, 28, 28, 1)
    assert ds.images.dtype == jnp.uint8
    imgs, labels = ds.batch(jax.random.PRNGKey(0), 32)
    assert imgs.shape == (32, 28, 28, 1)
    assert imgs.dtype == jnp.float32
    assert float(imgs.min()) >= -1.001 and float(imgs.max()) <= 1.001
    assert labels.shape == (32,)
    # Deterministic given the key.
    imgs2, _ = ds.batch(jax.random.PRNGKey(0), 32)
    np.testing.assert_array_equal(np.asarray(imgs), np.asarray(imgs2))


def test_procedural_conditional_structure():
    # Class-conditional blobs: same class -> highly correlated images.
    ds = load_image_dataset(DataConfig(dataset="cifar10"), procedural_n=256)
    labels = np.asarray(ds.labels)
    imgs = np.asarray(ds.images, dtype=np.float32)
    c0 = imgs[labels == 0]
    c5 = imgs[labels == 5]
    if len(c0) > 2 and len(c5) > 2:
        within = np.corrcoef(c0[0].ravel(), c0[1].ravel())[0, 1]
        across = np.corrcoef(c0[0].ravel(), c5[0].ravel())[0, 1]
        assert within > across


def test_batch_by_labels_returns_requested_classes():
    """Conditional draw for class-balanced shaping: each returned image
    belongs to the requested class (pixel value encodes the class here)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from collaborative_gan_sampling_tpu.data.images import ImageDataset

    n, size = 40, 4
    labels = jnp.asarray(np.arange(n) % 5, jnp.int32)
    images = jnp.broadcast_to(
        (np.arange(n) % 5).astype(np.uint8)[:, None, None, None] * 40,
        (n, size, size, 1))
    ds = ImageDataset(images=images, labels=labels, name="test")

    want = jnp.asarray([3, 1, 4, 4, 0, 2], jnp.int32)
    imgs, got = ds.batch_by_labels(jax.random.PRNGKey(0), want)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # normalize_images maps class c's uint8 value 40c -> 40c/127.5 - 1
    expect = np.asarray(want, np.float32) * 40 / 127.5 - 1.0
    np.testing.assert_allclose(np.asarray(imgs[:, 0, 0, 0]), expect,
                               atol=1e-6)

    import pytest

    ds_unlab = ImageDataset(images=images, labels=None, name="unlab")
    with pytest.raises(ValueError, match="no labels"):
        ds_unlab.batch_by_labels(jax.random.PRNGKey(0), want)
