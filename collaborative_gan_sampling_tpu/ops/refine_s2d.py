"""Space-to-depth fast path for conv-D refinement (XLA, not Pallas).

Why: per-op profiling on the chip (benchmarks/probe_convops.py) shows the
DCGAN discriminator's FIRST conv — 5x5 stride-2 'SAME' on a 1..3-channel
image — runs at 2-4% MFU on TPU: with in_c ~ 1 the MXU contraction dimension
is 25-75 taps and the strided spatial access defeats efficient tiling. Its
input-VJP (a stride-2 transposed conv back to 1-3 channels) is equally bad.
Together they burn ~40% of every refinement step for ~3% of its FLOPs
(MNIST shape: conv0 fwd+vjp 4.2 ms vs conv1 6.1 ms at batch 16k).

Fix: refine in space-to-depth coordinates. s2d(2) maps (B, H, W, C) ->
(B, H/2, W/2, 4C); the 5x5 stride-2 'SAME' conv becomes an EXACT 3x3
stride-1 'SAME' conv with 4C input channels (tap/parity mapping from
ops/conv_refine_ref.TAPS — the same derivation the Pallas V1/V2 kernels
used, here driving plain XLA convs). The whole K-step scan runs in s2d
layout — x converts once in, once out — so both the forward conv0 and its
VJP become dense, stride-1, wider-channel convs that XLA tiles well on the
MXU. Gradient descent in a permuted coordinate system is the same descent:
s2d is a permutation, and per-sample L2 clipping is permutation-invariant.

Every layer except conv0 reuses the *flax module* with the original param
subtree, so numerics match bundle.discriminate exactly up to conv0's
contraction reassociation; the scan path (sampling/refine.py) remains the
parity oracle (tests/test_refine_s2d.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from collaborative_gan_sampling_tpu.ops.conv_refine_ref import (
    TAPS,
    depth_to_space,
    space_to_depth,
)
from collaborative_gan_sampling_tpu.ops.nn import dcgan_kernel_init, lrelu


def conv0_kernel_to_s2d(w: jax.Array) -> jax.Array:
    """(5, 5, C, F) stride-2 kernel -> (3, 3, 4C, F) stride-1 kernel.

    s2d channel layout: X[..., (py*2+px)*C + c] = x[..., 2j+py, 2i+px, c];
    tap (dy, dx) of the stride-2 conv reads parity (py, px) at cell shift
    (sy, sx) per TAPS, i.e. kernel position (sy+1, sx+1) of a 3x3 SAME conv.
    """
    k, _, c, f = w.shape
    assert k == 5, f"s2d mapping is derived for 5x5 kernels, got {k}"
    out = jnp.zeros((3, 3, 4, c, f), w.dtype)
    for dy, py, sy in TAPS:
        for dx, px, sx in TAPS:
            out = out.at[sy + 1, sx + 1, py * 2 + px].set(w[dy, dx])
    return out.reshape(3, 3, 4 * c, f)


def make_d_fwd_s2d(d: nn.Module):
    """Build `fwd(d_vars, x_s2d, labels) -> logits` mirroring
    DCGANDiscriminator.__call__ (eval mode) with conv0 in s2d space.

    All layers after conv0 apply the original flax submodules on their
    param subtrees — identical numerics, zero duplication of semantics.
    """
    from collaborative_gan_sampling_tpu.models.dcgan import (
        DCGANDiscriminator,
        num_stages,
    )

    assert isinstance(d, DCGANDiscriminator)
    n = num_stages(d.image_size)
    dtype = d.dtype

    conv_i = [nn.Conv(d.base_filters * (2 ** i), (5, 5), strides=(2, 2),
                      padding="SAME", kernel_init=dcgan_kernel_init,
                      dtype=dtype) for i in range(1, n)]
    bn_i = [nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, dtype=dtype) for _ in range(1, n)]
    dense = nn.Dense(1, kernel_init=dcgan_kernel_init, dtype=dtype)

    def fwd(d_vars: Any, x_s2d: jax.Array,
            labels: jax.Array | None = None) -> jax.Array:
        p = d_vars["params"]
        stats = d_vars.get("batch_stats", {})
        k2 = conv0_kernel_to_s2d(p["conv0"]["kernel"]).astype(dtype)
        b0 = p["conv0"]["bias"].astype(dtype)
        h = jax.lax.conv_general_dilated(
            x_s2d.astype(dtype), k2, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b0
        h = lrelu(h)
        for i in range(1, n):
            h = conv_i[i - 1].apply({"params": p[f"conv{i}"]}, h)
            h = lrelu(bn_i[i - 1].apply(
                {"params": p[f"bn{i}"], "batch_stats": stats[f"bn{i}"]}, h))
        feat = h.reshape(h.shape[0], -1)
        logit = dense.apply({"params": p["out"]}, feat)[..., 0]
        if d.num_classes > 0:
            emb = nn.Embed(d.num_classes, feat.shape[-1],
                           embedding_init=dcgan_kernel_init,
                           dtype=dtype).apply(
                {"params": p["proj_embed"]}, labels)
            logit = logit + jnp.sum(emb * feat, axis=-1)
        return logit.astype(jnp.float32)

    return fwd


# flax ConvTranspose (5x5, stride 2, 'SAME', even sizes) tap map, derived
# numerically from impulse responses (separable per axis): kernel tap d
# writes output parity p at input-cell shift s, i.e. s2d output cell oy
# reads input jy = oy - s through 3x3 kernel row (1 - s).
DECONV_TAPS = [(0, 1, 1), (1, 0, 1), (2, 1, 0), (3, 0, 0), (4, 1, -1)]


def deconv_kernel_to_s2d(w: jax.Array) -> jax.Array:
    """(5, 5, F, C) stride-2 ConvTranspose kernel -> (3, 3, F, 4C) stride-1
    conv kernel producing the output directly in s2d layout."""
    k, _, f, c = w.shape
    assert k == 5, f"s2d mapping is derived for 5x5 kernels, got {k}"
    out = jnp.zeros((3, 3, f, 4, c), w.dtype)
    for dy, py, sy in DECONV_TAPS:
        for dx, px, sx in DECONV_TAPS:
            out = out.at[1 - sy, 1 - sx, :, py * 2 + px].set(w[dy, dx])
    return out.reshape(3, 3, f, 4 * c)


def make_g_fwd_s2d(g: nn.Module):
    """Build `fwd(g_vars, z, labels) -> x_s2d` mirroring DCGANGenerator
    (eval mode) with the LAST deconv computed directly in s2d output layout
    — the (H, W, 1..3) transposed conv is the generator's 2-4%-MFU layer,
    exactly mirroring the discriminator's conv0 pathology."""
    from collaborative_gan_sampling_tpu.models.dcgan import (
        DCGANGenerator,
        num_stages,
    )

    assert isinstance(g, DCGANGenerator)
    n = num_stages(g.image_size)
    s0 = g.image_size // (2 ** n)
    ch0 = g.base_filters * (2 ** (n - 1))
    dtype = g.dtype

    dense = nn.Dense(s0 * s0 * ch0, kernel_init=dcgan_kernel_init,
                     dtype=dtype)
    deconvs = [nn.ConvTranspose(g.base_filters * (2 ** (n - 2 - i)), (5, 5),
                                strides=(2, 2), padding="SAME",
                                kernel_init=dcgan_kernel_init, dtype=dtype)
               for i in range(n - 1)]

    def bn_apply(p, stats, name, h):
        return nn.BatchNorm(use_running_average=True, momentum=0.9,
                            epsilon=1e-5, dtype=dtype).apply(
            {"params": p[name], "batch_stats": stats[name]}, h)

    def fwd(g_vars: Any, z: jax.Array,
            labels: jax.Array | None = None) -> jax.Array:
        p = g_vars["params"]
        stats = g_vars.get("batch_stats", {})
        h = z.astype(dtype)
        if g.num_classes > 0:
            emb = nn.Embed(g.num_classes, g.label_embed_dim,
                           embedding_init=dcgan_kernel_init,
                           dtype=dtype).apply(
                {"params": p["label_embed"]}, labels)
            h = jnp.concatenate([h, emb], axis=-1)
        h = dense.apply({"params": p["project"]}, h)
        h = h.reshape(h.shape[0], s0, s0, ch0)
        h = nn.relu(bn_apply(p, stats, "bn_project", h))
        for i in range(n - 1):
            h = deconvs[i].apply({"params": p[f"deconv{i}"]}, h)
            h = nn.relu(bn_apply(p, stats, f"bn{i}", h))
        k2 = deconv_kernel_to_s2d(p["deconv_out"]["kernel"]).astype(dtype)
        b = jnp.tile(p["deconv_out"]["bias"].astype(dtype), 4)
        h = jax.lax.conv_general_dilated(
            h, k2, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        return jnp.tanh(h).astype(jnp.float32)

    return fwd


def supports_s2d_refine(bundle, cfg, return_trajectory: bool,
                        noise: float) -> bool:
    """Gate: DCGAN D, even image size, 5x5 conv0, no Langevin noise (noise
    draws would differ in layout from the oracle path), no trajectory
    (which is pixel-space by contract). Labels and clipping are supported."""
    from collaborative_gan_sampling_tpu.models.dcgan import (
        DCGANDiscriminator,
    )

    if not getattr(cfg, "use_s2d", True) or return_trajectory or noise != 0.0:
        return False
    d = getattr(bundle, "d", None)
    if not isinstance(d, DCGANDiscriminator):
        return False
    h, w, _ = bundle.data_shape
    return h % 2 == 0 and w % 2 == 0


def _make_s2d_scan(d_fwd, cfg):
    """`scan(d_vars, x_s2d, labels, rate=None) -> (x_s2d_K, logits)` — the
    K-step refinement loop entirely in s2d coordinates. ``rate`` may be a
    traced scalar (the tuner's compile-once-per-K path); None bakes
    cfg.rate as a constant."""
    from collaborative_gan_sampling_tpu.sampling.refine import (
        _clip_per_sample,
        _freeze_stopped,
        refine_loss_per_sample,
    )

    steps, clip_norm = cfg.steps, cfg.clip_norm
    objective = getattr(cfg, "objective", "ns")
    stop_score = getattr(cfg, "stop_score", 0.0)
    proximal = getattr(cfg, "proximal", 0.0)

    def scan(d_vars: Any, x_s2d: jax.Array,
             labels: jax.Array | None = None, rate=None):
        # Sample-dtype cast: a traced f32 scalar must not promote bf16
        # math (the scan carry dtype would change mid-loop).
        rate = jnp.asarray(cfg.rate if rate is None else rate, x_s2d.dtype)
        x0_s2d = x_s2d  # proximal anchor; s2d is a permutation, so the
        # L2 transport cost is EXACTLY the pixel-space one.
        def loss_sum(x):
            logits = d_fwd(d_vars, x, labels)
            return jnp.sum(refine_loss_per_sample(logits, objective)), logits

        # Recompute D's forward in the VJP instead of stashing conv
        # activations: the pipeline is HBM-bound at this shape, and dropping
        # the activation writes+reads measures ~2% faster end-to-end
        # (benchmarks/probe_refine_remat.py) at identical numerics.
        loss_sum = jax.checkpoint(
            loss_sum, policy=jax.checkpoint_policies.nothing_saveable)
        grad_fn = jax.grad(loss_sum, has_aux=True)

        def step(x, _):
            g, logits = grad_fn(x)
            if proximal > 0:
                g = g + proximal * (x - x0_s2d)
            if clip_norm > 0:
                g = _clip_per_sample(g, clip_norm)
            x_new = x - rate * g
            if stop_score > 0:
                x_new = _freeze_stopped(x_new, x, logits, stop_score)
            return x_new, None

        x_k, _ = jax.lax.scan(step, x_s2d, None, length=steps)
        return x_k, d_fwd(d_vars, x_k, labels)

    return scan


def make_refine_s2d(bundle, cfg):
    """`refine(d_vars, x0, labels) -> (x_K, {'logits'})` — the K-step scan
    in s2d coordinates. Same math as sampling/refine.py's scan (its parity
    oracle); conv0 and its VJP run as dense stride-1 convs on 4C channels."""
    scan = _make_s2d_scan(make_d_fwd_s2d(bundle.d), cfg)

    def refine(d_vars: Any, x0: jax.Array,
               labels: jax.Array | None = None, rate=None):
        x_k, logits = scan(d_vars, space_to_depth(x0), labels, rate=rate)
        return depth_to_space(x_k, x0.shape[-1]), {"logits": logits}

    return refine


def make_draw_refine_s2d(bundle, cfg, mesh=None):
    """Fully-fused sampling unit: z -> G (last deconv emits s2d directly)
    -> K-step s2d refinement -> pixel samples + final logits. No pixel-space
    round trip anywhere: the generator's worst layer (the 1-3 channel
    output transposed conv, 41% of G's time at 2-4% MFU) and the
    discriminator's worst (conv0) both run as dense stride-1 s2d convs."""
    from collaborative_gan_sampling_tpu.parallel.mesh import constrain_batch

    g_fwd = make_g_fwd_s2d(bundle.g)
    scan = _make_s2d_scan(make_d_fwd_s2d(bundle.d), cfg)
    channels = bundle.data_shape[-1]

    def draw_refine(g_vars: Any, d_vars: Any, key: jax.Array, n: int,
                    labels: jax.Array | None = None, rate=None):
        k_z, k_lab = jax.random.split(key)
        z = constrain_batch(mesh, bundle.sample_z(k_z, n))
        if bundle.conditional and labels is None:
            labels = bundle.sample_labels(k_lab, n)
        x0 = g_fwd(g_vars, z, labels)
        x_k, logits = scan(d_vars, x0, labels, rate=rate)
        return depth_to_space(x_k, channels), labels, logits

    return draw_refine
