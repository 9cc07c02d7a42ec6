"""Image data pipeline (C9) — device-resident, batch-gather design.

The reference's pipeline (``celebA/utils.py`` / ``mnist/utils.py``,
approximate paths — SURVEY.md C9) decodes JPEGs one file at a time with
PIL/scipy on the host inside the train loop — the second-biggest bottleneck in
its call stacks (SURVEY.md section 3.3). This environment additionally has a
single host CPU core, so *any* per-batch host preprocessing would starve the
chip.

TPU-native design: the whole dataset lives in HBM as uint8 (MNIST 47 MB,
CIFAR-10 150 MB, CelebA-64 2.4 GB — all fit in 16 GB HBM v5e); a jitted
``gather + normalize`` produces each batch entirely on device. Decode/crop/
resize happen ONCE at load time (vectorised, on device for resize), not per
batch. For datasets larger than HBM (ImageNet-64 full), a ``max_items`` cap
keeps the resident-shard design; multi-host sharded residency is the natural
extension.

When no dataset files exist (offline environments), ``load_image_dataset``
falls back to a deterministic procedural class-conditional image distribution
so every code path (train, refine, shape, FID) stays runnable end-to-end.
"""

from __future__ import annotations

import gzip
import os
import pickle
import struct
import zlib
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from collaborative_gan_sampling_tpu.config import DataConfig


@dataclass
class ImageDataset:
    """Device-resident uint8 image store with jitted batch sampling."""

    images: jax.Array  # (N, H, W, C) uint8, on device
    labels: jax.Array | None  # (N,) int32, or None for unconditional
    name: str = "unknown"
    procedural: bool = False
    _sample: object = field(default=None, repr=False)

    @property
    def n(self) -> int:
        return self.images.shape[0]

    @property
    def image_shape(self) -> tuple[int, int, int]:
        return tuple(self.images.shape[1:])

    def __post_init__(self):
        images, labels = self.images, self.labels

        @jax.jit
        def _sample(key, idx_batch_size_dummy):
            # idx_batch_size_dummy is a zeros((B,)) int32 array whose shape
            # carries the (static) batch size through jit.
            b = idx_batch_size_dummy.shape[0]
            idx = jax.random.randint(key, (b,), 0, images.shape[0])
            imgs = normalize_images(images[idx])
            labs = labels[idx] if labels is not None else None
            return imgs, labs

        self._sample = _sample
        self._sample_by_labels = None
        self.num_classes = 0
        if labels is not None:
            # Per-class index table for conditional draws (class-balanced
            # shaping): row c lists the dataset indices of class c, tiled
            # cyclically to the max class count so the gather is rectangular.
            labs_np = np.asarray(jax.device_get(labels))
            n_classes = int(labs_np.max()) + 1 if labs_np.size else 1
            self.num_classes = n_classes
            per_class = [np.flatnonzero(labs_np == c) for c in range(n_classes)]
            cap = max(1, max((len(p) for p in per_class), default=1))
            table = np.zeros((n_classes, cap), np.int32)
            counts = np.zeros((n_classes,), np.int32)
            for c, p in enumerate(per_class):
                if len(p) == 0:
                    p = np.asarray([0])  # degenerate class: any sample
                table[c] = np.resize(p, cap)
                counts[c] = len(p)
            table_j = jnp.asarray(table)
            counts_j = jnp.asarray(np.maximum(counts, 1))

            @jax.jit
            def _by_labels(key, want):
                r = jax.random.randint(key, want.shape, 0, 1 << 30)
                idx = table_j[want, r % counts_j[want]]
                return normalize_images(images[idx]), want

            self._sample_by_labels = _by_labels

    def batch(self, key: jax.Array, batch_size: int):
        """(images in [-1,1] float32 (B,H,W,C), labels or None) — on device."""
        return self._sample(key, jnp.zeros((batch_size,), jnp.int32))

    def batch_by_labels(self, key: jax.Array, labels: jax.Array):
        """Conditional draw: one real sample of the requested class per row
        (images, labels) — jittable; requires a labelled dataset."""
        if self._sample_by_labels is None:
            raise ValueError(f"dataset {self.name!r} has no labels")
        return self._sample_by_labels(key, labels)


def normalize_images(u8: jax.Array) -> jax.Array:
    """uint8 [0,255] -> float32 [-1,1] (matches the reference's transform())."""
    return u8.astype(jnp.float32) / 127.5 - 1.0


def denormalize_images(x: jax.Array) -> jax.Array:
    """float [-1,1] -> uint8 [0,255] (reference inverse_transform())."""
    return jnp.clip(jnp.round((x + 1.0) * 127.5), 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# File-format loaders (used when cfg.data.path exists)
# ---------------------------------------------------------------------------


def _load_idx(path: str) -> np.ndarray:
    """MNIST idx format (idx3-ubyte / idx1-ubyte), optionally gzipped."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as fh:
        magic = struct.unpack(">I", fh.read(4))[0]
        ndim = magic & 0xFF
        dims = struct.unpack(">" + "I" * ndim, fh.read(4 * ndim))
        return np.frombuffer(fh.read(), np.uint8).reshape(dims)


def _find(root: str, names: list[str]) -> str | None:
    for name in names:
        for cand in (os.path.join(root, name), os.path.join(root, name + ".gz")):
            if os.path.exists(cand):
                return cand
    return None


def _load_mnist_like(root: str) -> tuple[np.ndarray, np.ndarray | None] | None:
    imgs_p = _find(root, ["train-images-idx3-ubyte", "train-images.idx3-ubyte"])
    labs_p = _find(root, ["train-labels-idx1-ubyte", "train-labels.idx1-ubyte"])
    if imgs_p is None:
        return None
    images = _load_idx(imgs_p)[..., None]  # (N, 28, 28, 1)
    # No labels file -> genuinely unlabeled (labels=None routes downstream
    # to RotNet features / unconditional handling). Fabricating zeros here
    # would silently train a 1-class 'trained_classifier' feature net (zero
    # gradient signal) and feed conditional models all-class-0 real batches.
    labels = _load_idx(labs_p).astype(np.int32) if labs_p else None
    return images, labels


def _load_cifar10(root: str) -> tuple[np.ndarray, np.ndarray] | None:
    batches = [os.path.join(root, f"data_batch_{i}") for i in range(1, 6)]
    sub = os.path.join(root, "cifar-10-batches-py")
    if not os.path.exists(batches[0]) and os.path.isdir(sub):
        batches = [os.path.join(sub, f"data_batch_{i}") for i in range(1, 6)]
    if not os.path.exists(batches[0]):
        return None
    xs, ys = [], []
    for b in batches:
        with open(b, "rb") as fh:
            d = pickle.load(fh, encoding="bytes")
        xs.append(np.asarray(d[b"data"], np.uint8).reshape(-1, 3, 32, 32)
                  .transpose(0, 2, 3, 1))
        ys.append(np.asarray(d[b"labels"], np.int32))
    return np.concatenate(xs), np.concatenate(ys)


def _center_crop_resize(u8: np.ndarray, crop: int, size: int) -> jax.Array:
    """Batched on-device crop + bilinear resize (replaces per-file PIL)."""
    x = jnp.asarray(u8)
    h, w = x.shape[1:3]
    if crop and crop < min(h, w):
        top, left = (h - crop) // 2, (w - crop) // 2
        x = x[:, top:top + crop, left:left + crop]
    if x.shape[1] != size:
        x = jax.image.resize(
            x.astype(jnp.float32),
            (x.shape[0], size, size, x.shape[-1]), "bilinear")
        x = jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)
    return x


def _load_image_folder(root: str, crop: int, size: int,
                       max_items: int) -> tuple[np.ndarray, None] | None:
    """CelebA-style: directory of jpg/png files -> cropped/resized uint8."""
    try:
        from PIL import Image
    except ImportError:
        return None
    files = sorted(
        os.path.join(root, f) for f in os.listdir(root)
        if f.lower().endswith((".jpg", ".jpeg", ".png")))[:max_items]
    if not files:
        return None
    out = []
    for f in files:
        with Image.open(f) as im:
            out.append(np.asarray(im.convert("RGB"), np.uint8))
    raw = np.stack(out)
    arr = np.asarray(jax.device_get(_center_crop_resize(raw, crop, size)))
    return arr, None


# ---------------------------------------------------------------------------
# Procedural fallback — deterministic structured image distribution
# ---------------------------------------------------------------------------


def procedural_images(name: str, n: int, size: int, channels: int,
                      num_classes: int, seed: int = 0,
                      chunk: int = 4096) -> tuple[jax.Array, jax.Array]:
    """Deterministic class-conditional structured images, built on device.

    A genuinely non-trivial distribution (a near-perfect GAN fit would make
    refinement/rejection vacuously flat): each image composes
      * a smooth background gradient with random direction/amplitude,
      * a rotated anisotropic Gaussian 'body' anchored at a class-dependent
        ring position (angle jitter, per-sample scale/orientation/aspect),
      * a ring (annulus) 'satellite' whose radius and position vary,
      * per-channel hue mixing keyed to the class, and pixel noise.
    The long-tailed pose/scale variation is what DCGANs of this size
    struggle to cover — leaving visible headroom for discriminator-guided
    refinement. Deterministic per (name, seed); built in chunks on device.
    """
    classes = max(num_classes, 1)
    # Stable across processes — Python's str hash is randomized per run.
    name_tag = zlib.crc32(name.encode()) & 0x7FFFFFFF
    base = jax.random.fold_in(jax.random.PRNGKey(seed), name_tag)

    yy = jnp.arange(size, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(size, dtype=jnp.float32)[None, None, :]

    @jax.jit
    def build(key, labels):
        m = labels.shape[0]
        ks = jax.random.split(key, 12)
        f = jnp.float32

        # Background: low-amplitude linear gradient, random direction.
        bg_theta = jax.random.uniform(ks[0], (m, 1, 1)) * (2 * jnp.pi)
        bg_amp = 0.15 * jax.random.uniform(ks[1], (m, 1, 1))
        bg = bg_amp * ((xx - size / 2) * jnp.cos(bg_theta)
                       + (yy - size / 2) * jnp.sin(bg_theta)) / size + 0.2

        # Body: rotated anisotropic Gaussian at a class-anchored position.
        angle0 = labels.astype(f) / classes * (2 * jnp.pi)
        ang = (angle0 + 0.35 * jax.random.normal(ks[2], (m,)))[:, None, None]
        r0 = size * (0.22 + 0.08 * jax.random.uniform(ks[3], (m,)))[:, None, None]
        cx = size / 2 + r0 * jnp.cos(ang)
        cy = size / 2 + r0 * jnp.sin(ang)
        # log-uniform scale (long tail) + aspect + orientation
        sc = size / 8 * jnp.exp(0.5 * jax.random.normal(ks[4], (m, 1, 1)))
        aspect = jnp.exp(0.6 * jax.random.normal(ks[5], (m, 1, 1)))
        rot = jax.random.uniform(ks[6], (m, 1, 1)) * jnp.pi
        dx, dy = xx - cx, yy - cy
        u = dx * jnp.cos(rot) + dy * jnp.sin(rot)
        v = -dx * jnp.sin(rot) + dy * jnp.cos(rot)
        body = 0.9 * jnp.exp(-(u ** 2 * aspect + v ** 2 / aspect)
                             / (2 * sc ** 2))

        # Satellite ring on the opposite side; radius/thickness vary.
        cx2 = size / 2 - (r0 * 0.8) * jnp.cos(ang)
        cy2 = size / 2 - (r0 * 0.8) * jnp.sin(ang)
        rad = size * (0.06 + 0.06 * jax.random.uniform(ks[7], (m, 1, 1)))
        thick = size * 0.02 * (1 + jax.random.uniform(ks[8], (m, 1, 1)))
        d2 = jnp.sqrt((xx - cx2) ** 2 + (yy - cy2) ** 2)
        ring = 0.8 * jnp.exp(-((d2 - rad) ** 2) / (2 * thick ** 2))

        lum = jnp.clip(bg + body + ring, 0.0, 1.5)
        if channels == 1:
            img = lum[..., None]
        else:
            hue = ((labels.astype(f) + 1.0) / classes
                   + 0.1 * jax.random.normal(ks[9], (m,)))[:, None, None]
            mix = jnp.stack(
                [0.55 + 0.45 * jnp.cos(2 * jnp.pi * (hue + c / 3.0))
                 for c in range(channels)], axis=-1)
            img = lum[..., None] * mix
        img = img + 0.04 * jax.random.normal(ks[10], img.shape)
        return jnp.clip(jnp.round(img * 170), 0, 255).astype(jnp.uint8)

    labels_all = jax.random.randint(jax.random.fold_in(base, 0), (n,), 0,
                                    classes)
    parts = []
    for start in range(0, n, chunk):
        m = min(chunk, n - start)
        parts.append(build(jax.random.fold_in(base, 1 + start // chunk),
                           labels_all[start:start + m]))
    return jnp.concatenate(parts), labels_all.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

_DATASET_SHAPES = {
    # name: (size, channels, num_classes_for_procedural)
    "mnist": (28, 1, 10),
    "fmnist": (28, 1, 10),
    "cifar10": (32, 3, 10),
    "celeba": (64, 3, 0),
    "imagenet64": (64, 3, 1000),
}


def load_image_dataset(cfg: DataConfig, image_size: int | None = None,
                       max_items: int = 200_000,
                       procedural_n: int = 20_000) -> ImageDataset:
    """Load `cfg.dataset` from `cfg.path` if present, else procedural."""
    name = cfg.dataset
    if name not in _DATASET_SHAPES:
        raise ValueError(f"unknown image dataset {name!r}")
    size, channels, classes = _DATASET_SHAPES[name]
    if image_size:
        size = image_size

    loaded = None
    if cfg.path and os.path.isdir(cfg.path):
        if name in ("mnist", "fmnist"):
            loaded = _load_mnist_like(cfg.path)
        elif name == "cifar10":
            loaded = _load_cifar10(cfg.path)
        elif name in ("celeba", "imagenet64"):
            loaded = _load_image_folder(cfg.path, cfg.crop_size, size,
                                        max_items)
    if loaded is not None:
        images, labels = loaded
        images = images[:max_items]
        if labels is not None:
            labels = labels[:max_items]
        # idx/CIFAR files come at their native resolution; honor a
        # model.image_size override by resizing on device (the folder path
        # already resizes inside _load_image_folder).
        if images.shape[1] != size or images.shape[2] != size:
            images = np.asarray(jax.device_get(
                _center_crop_resize(np.asarray(images), 0, size)))
        return ImageDataset(images=jnp.asarray(images),
                            labels=None if labels is None else jnp.asarray(labels),
                            name=name, procedural=False)

    images, labels = procedural_images(name, procedural_n, size, channels,
                                       classes, seed=0)
    return ImageDataset(images=images,
                        labels=labels if classes > 0 else None,
                        name=name + "(procedural)", procedural=True)
