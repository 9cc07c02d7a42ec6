"""File-format loaders (C9) against synthetic fixture files: MNIST idx,
CIFAR-10 pickle batches, and image-folder crop/resize."""

import gzip
import pickle
import struct

import jax
import numpy as np
import pytest

from collaborative_gan_sampling_tpu.config import DataConfig
from collaborative_gan_sampling_tpu.data import load_image_dataset
from collaborative_gan_sampling_tpu.data.images import (
    _center_crop_resize,
    _load_idx,
)


def _write_idx_images(path, arr):
    """idx3-ubyte: magic 0x00000803, dims, raw bytes."""
    with open(path, "wb") as fh:
        fh.write(struct.pack(">I", 0x00000803))
        fh.write(struct.pack(">III", *arr.shape))
        fh.write(arr.tobytes())


def _write_idx_labels(path, arr):
    with open(path, "wb") as fh:
        fh.write(struct.pack(">I", 0x00000801))
        fh.write(struct.pack(">I", arr.shape[0]))
        fh.write(arr.tobytes())


def test_idx_loader_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (50, 28, 28), dtype=np.uint8)
    labels = rng.integers(0, 10, (50,), dtype=np.uint8)
    _write_idx_images(tmp_path / "train-images-idx3-ubyte", imgs)
    _write_idx_labels(tmp_path / "train-labels-idx1-ubyte", labels)

    ds = load_image_dataset(DataConfig(dataset="mnist", path=str(tmp_path)))
    assert not ds.procedural
    assert ds.images.shape == (50, 28, 28, 1)
    np.testing.assert_array_equal(np.asarray(ds.images)[..., 0], imgs)
    np.testing.assert_array_equal(np.asarray(ds.labels), labels)


def test_idx_loader_without_labels_is_unlabeled(tmp_path):
    """A missing labels file must yield labels=None (unlabeled dataset),
    NOT fabricated all-zero labels — zeros silently produced a 1-class
    'trained_classifier' feature net and all-class-0 conditional batches."""
    imgs = np.random.default_rng(0).integers(0, 256, (20, 28, 28),
                                             dtype=np.uint8)
    _write_idx_images(tmp_path / "train-images-idx3-ubyte", imgs)
    ds = load_image_dataset(DataConfig(dataset="mnist", path=str(tmp_path)))
    assert not ds.procedural
    assert ds.labels is None
    _, labels = ds.batch(jax.random.PRNGKey(0), 4)
    assert labels is None


def test_idx_loader_gzipped(tmp_path):
    imgs = np.arange(2 * 28 * 28, dtype=np.uint8).reshape(2, 28, 28)
    raw = (struct.pack(">I", 0x00000803) + struct.pack(">III", *imgs.shape)
           + imgs.tobytes())
    with gzip.open(tmp_path / "train-images-idx3-ubyte.gz", "wb") as fh:
        fh.write(raw)
    loaded = _load_idx(str(tmp_path / "train-images-idx3-ubyte.gz"))
    np.testing.assert_array_equal(loaded, imgs)


def test_cifar10_pickle_loader(tmp_path):
    rng = np.random.default_rng(1)
    for i in range(1, 6):
        data = rng.integers(0, 256, (20, 3072), dtype=np.uint8)
        with open(tmp_path / f"data_batch_{i}", "wb") as fh:
            pickle.dump({b"data": data,
                         b"labels": list(rng.integers(0, 10, 20))}, fh)
    ds = load_image_dataset(DataConfig(dataset="cifar10", path=str(tmp_path)))
    assert not ds.procedural
    assert ds.images.shape == (100, 32, 32, 3)
    assert ds.labels.shape == (100,)


def test_center_crop_resize():
    # 100x100 with a bright center pixel; crop 50 -> resize 32.
    img = np.zeros((1, 100, 100, 3), np.uint8)
    img[0, 50, 50] = 255
    out = np.asarray(_center_crop_resize(img, crop=50, size=32))
    assert out.shape == (1, 32, 32, 3)
    # Bright spot survives near the center after crop+resize.
    cy, cx = np.unravel_index(out[0, :, :, 0].argmax(), (32, 32))
    assert abs(cy - 16) <= 2 and abs(cx - 16) <= 2


def test_image_folder_loader(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.default_rng(2)
    for i in range(6):
        arr = rng.integers(0, 256, (80, 70, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img{i}.jpg")
    ds = load_image_dataset(
        DataConfig(dataset="celeba", path=str(tmp_path), crop_size=64),
        image_size=64)
    assert not ds.procedural
    assert ds.images.shape == (6, 64, 64, 3)
    imgs, labels = ds.batch(jax.random.PRNGKey(0), 4)
    assert imgs.shape == (4, 64, 64, 3)
    assert labels is None


def test_idx_loader_image_size_override(tmp_path):
    """model.image_size smaller than the file's native resolution resizes
    on load (ADVICE r1: the idx/CIFAR paths used to ignore the override and
    hand the trainer mismatched real/fake shapes)."""
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (10, 28, 28), dtype=np.uint8)
    labels = rng.integers(0, 10, (10,), dtype=np.uint8)
    _write_idx_images(tmp_path / "train-images-idx3-ubyte", imgs)
    _write_idx_labels(tmp_path / "train-labels-idx1-ubyte", labels)
    ds = load_image_dataset(DataConfig(dataset="mnist", path=str(tmp_path)),
                            image_size=16)
    assert not ds.procedural
    assert ds.images.shape == (10, 16, 16, 1)
    assert ds.labels.shape == (10,)


def test_cifar_loader_image_size_override(tmp_path):
    rng = np.random.default_rng(4)
    for i in range(1, 6):
        data = rng.integers(0, 256, (4, 3072), dtype=np.uint8)
        with open(tmp_path / f"data_batch_{i}", "wb") as fh:
            pickle.dump({b"data": data,
                         b"labels": list(rng.integers(0, 10, 4))}, fh)
    ds = load_image_dataset(DataConfig(dataset="cifar10", path=str(tmp_path)),
                            image_size=16)
    assert ds.images.shape == (20, 16, 16, 3)
