"""Fused conv-D K-step refinement kernel (Pallas, MNIST-shape DCGAN D).

Completes the Pallas story for the image stack: the ENTIRE K-step
discriminator-guided refinement loop for the 28x28 DCGAN discriminator runs
in one kernel per batch tile — x, both conv feature maps and all weights stay
VMEM-resident across all K steps, eliminating the HBM round-trips of
activations between XLA's per-step forward/backward passes (the measured
bandwidth ceiling of the scan path).

Design (spec + parity oracle: ops/conv_refine_ref.py):
* BatchNorm is folded into conv1's weights on the host (eval mode).
* All tensors live on a 7x7 grid, zero-padded to 9x9 VMEM scratch buffers,
  in space-to-depth (parity) layouts: x as s2d-by-4 (16 parity planes,
  channel = (iy%4)*4 + ix%4), h1 as four s2d-by-2 parity blocks of 64
  channels, h2 natively 7x7x128. Stride-2 5x5 SAME convolutions (XLA pads
  low=1 / high=2) decompose into 25 taps, each a {-1,0,+1}-shifted
  *contiguous static slice* feeding a matmul (conv1) or a broadcast FMA
  (conv0's single input channel).
* Mutation discipline: Mosaic lowers neither scatter nor value-level
  dynamic_update_slice — every accumulation is a read-modify-write on a
  VMEM scratch ref with static slice indices. The backward dh1 accumulator
  is ONE reused buffer processed parity-by-parity (25 taps each) to fit
  VMEM; out-of-range taps land in the zero borders, which are re-zeroed on
  reuse.
* lrelu masks need no stored pre-activations: leaky-relu preserves sign, so
  the masks are recovered from the stored activations themselves.
* float32 throughout (parity against the oracle to ~1e-7).

Covers: image_size 28, channels 1, d_base_filters 64 (the `mnist`/`fmnist`
presets), unconditional, eval mode — gated by `supports_conv_pallas_refine`.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from collaborative_gan_sampling_tpu.ops.conv_refine_ref import (
    TAPS,
    FoldedConvD,
    fold_dcgan_d,
)

# Static geometry for the 28x28 / 64-filter discriminator.
J = 7  # working grid (everything lives on 7x7)
JP = 9  # padded grid
C1 = 64
C2 = 128
NX = 16  # x parity planes (s2d by 4)
PARITIES = ((0, 0), (0, 1), (1, 0), (1, 1))


def s2d4(x: jax.Array) -> jax.Array:
    """(B, 28, 28, 1) -> (B, 7, 7, 16) with channel = (iy%4)*4 + (ix%4)."""
    b = x.shape[0]
    x = x[..., 0].reshape(b, J, 4, J, 4)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, J, J, NX)


def d2s4(x: jax.Array) -> jax.Array:
    """Inverse of s2d4: (B, 7, 7, 16) -> (B, 28, 28, 1)."""
    b = x.shape[0]
    x = x.reshape(b, J, J, 4, 4).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, 28, 28, 1)


def _x_taps():
    """conv0 tap table on the s4d x grid.

    Output row oy14 = 2*j + qy (qy = h1 parity), input row
    iy28 = 2*oy14 + dy - 1 = 4*(j + sy) + ry. Returns
    {qy: [(dy, ry, sy)]} with sy in {-1, 0} and ry in [0, 4)."""
    table = {}
    for qy in (0, 1):
        rows = []
        for dy in range(5):
            sy, ry = divmod(2 * qy + dy - 1, 4)
            rows.append((dy, ry, sy))
        table[qy] = rows
    return table


X_TAPS = _x_taps()


def _prep_weights(params: FoldedConvD):
    """Host-side packing of folded weights into kernel-friendly arrays."""
    w0_taps = params.w0[:, :, 0, :].astype(jnp.float32).reshape(25, 1, C1)
    w1_taps = params.w1.astype(jnp.float32).reshape(25, C1, C2)
    # dense (6272, 1) is h2.reshape(B, 7*7*128) row-major -> lay out on the
    # (1, 7, 7, 128) grid so dense fwd/bwd are broadcast ops.
    wd_grid = params.wd.astype(jnp.float32).reshape(1, J, J, C2)
    b0 = params.b0.astype(jnp.float32).reshape(1, C1)
    b1 = params.b1.astype(jnp.float32).reshape(1, C2)
    bd = params.bd.astype(jnp.float32).reshape(1, 1)
    return w0_taps, w1_taps, wd_grid, b0, b1, bd


def _interior(ref):
    """Read the 7x7 interior of a padded scratch ref -> value."""
    return ref[:, 1:1 + J, 1:1 + J, :]


def _lrelu(v):
    return jnp.where(v > 0, v, 0.2 * v)


def _refine_kernel(steps: int, rate: float, tile: int,
                   x_in_ref, w0_ref, w1_ref, wd_ref, b0_ref, b1_ref, bd_ref,
                   x_out_ref, logit_ref,
                   xw, h1w00, h1w01, h1w10, h1w11, dacc, dx16):
    h1w = {(0, 0): h1w00, (0, 1): h1w01, (1, 0): h1w10, (1, 1): h1w11}
    w0 = w0_ref[:]  # (25, 1, 64)
    wd = wd_ref[:]  # (1, 7, 7, 128)
    b0 = b0_ref[:]  # (1, 64)
    b1 = b1_ref[:]  # (1, 128)
    bd = bd_ref[:]  # (1, 1)

    # Initialise padded scratch: zero borders once; interiors overwritten.
    xw[...] = jnp.zeros_like(xw)
    xw[:, 1:1 + J, 1:1 + J, :] = x_in_ref[:]
    for p in PARITIES:
        h1w[p][...] = jnp.zeros_like(h1w[p])

    def forward():
        """xw -> h1w blocks (stored) -> (h2 value, logit value)."""
        for qy, qx in PARITIES:
            acc = jnp.broadcast_to(b0[None, None], (tile, J, J, C1))
            for dy, ry, sy in X_TAPS[qy]:
                for dx, rx, sx in X_TAPS[qx]:
                    block = xw[:, 1 + sy:1 + sy + J, 1 + sx:1 + sx + J, :]
                    plane = block[..., ry * 4 + rx]  # (T, 7, 7)
                    acc = acc + plane[..., None] * w0[dy * 5 + dx][None, None]
            h1w[(qy, qx)][:, 1:1 + J, 1:1 + J, :] = _lrelu(acc)

        z2 = jnp.broadcast_to(b1[None, None], (tile, J, J, C2))
        for dy, py, sy in TAPS:
            for dx, px, sx in TAPS:
                block = h1w[(py, px)][:, 1 + sy:1 + sy + J,
                                      1 + sx:1 + sx + J, :]
                w = w1_ref[dy * 5 + dx]  # (64, 128)
                z2 = z2 + jnp.dot(block.reshape(tile * J * J, C1), w,
                                  preferred_element_type=jnp.float32
                                  ).reshape(tile, J, J, C2)
        h2 = _lrelu(z2)
        # Single-axis staged reductions: Mosaic supports neither rank-1
        # intermediates nor multi-axis reductions over both trailing dims.
        a = jnp.sum(h2 * wd, axis=3, keepdims=True)  # (T, 7, 7, 1)
        c = jnp.sum(jnp.sum(a, axis=2, keepdims=True), axis=1,
                    keepdims=True)  # (T, 1, 1, 1)
        logit = c[:, :, 0, 0] + bd  # (T, 1)
        return h2, logit

    def body(_, carry):
        h2, logit = forward()
        dlogit = -jax.nn.sigmoid(-logit)  # d softplus(-l) / dl

        # dense + lrelu backward (sign of h2 == sign of z2). Broadcast in
        # two stages: lanes first, then sublanes (Mosaic cannot broadcast a
        # single operand across both at once).
        dlog_l = jnp.broadcast_to(dlogit, (tile, C2))  # (T, 128)
        dh2 = dlog_l[:, None, None, :] * wd
        dz2 = jnp.where(h2 > 0, dh2, 0.2 * dh2)
        dz2_flat = dz2.reshape(tile * J * J, C2)

        dx16[...] = jnp.zeros_like(dx16)
        # conv1 + conv0 backward, one h1-parity block at a time (dacc is the
        # single reused dh1 accumulator).
        for qy, qx in PARITIES:
            dacc[...] = jnp.zeros_like(dacc)
            for dy, py, sy in TAPS:
                if py != qy:
                    continue
                for dx, px, sx in TAPS:
                    if px != qx:
                        continue
                    w = w1_ref[dy * 5 + dx]  # (64, 128)
                    contrib = jnp.dot(dz2_flat, w.T,
                                      preferred_element_type=jnp.float32
                                      ).reshape(tile, J, J, C1)
                    sl = (slice(None), slice(1 + sy, 1 + sy + J),
                          slice(1 + sx, 1 + sx + J), slice(None))
                    dacc[sl] = dacc[sl] + contrib
            # lrelu backward via the stored activation's sign.
            h1_blk = h1w[(qy, qx)][:, 1:1 + J, 1:1 + J, :]
            dz1 = jnp.where(h1_blk > 0, _interior(dacc),
                            0.2 * _interior(dacc))
            for dy, ry, sy in X_TAPS[qy]:
                for dx, rx, sx in X_TAPS[qx]:
                    plane = jnp.sum(dz1 * w0[dy * 5 + dx][None, None],
                                    axis=-1)  # (T, 7, 7)
                    onehot = (jax.lax.broadcasted_iota(
                        jnp.int32, (1, 1, 1, NX), 3) == (ry * 4 + rx)
                    ).astype(jnp.float32)
                    sl = (slice(None), slice(1 + sy, 1 + sy + J),
                          slice(1 + sx, 1 + sx + J), slice(None))
                    dx16[sl] = dx16[sl] + plane[..., None] * onehot

        xw[:, 1:1 + J, 1:1 + J, :] = (
            _interior(xw) - rate * _interior(dx16))
        return carry

    jax.lax.fori_loop(0, steps, body, 0)
    _, logit = forward()
    x_out_ref[:] = _interior(xw)
    logit_ref[:] = logit


@functools.partial(jax.jit,
                   static_argnames=("steps", "rate", "tile", "interpret"))
def fused_refine_conv28(d_vars: Any, x0: jax.Array, steps: int, rate: float,
                        tile: int = 64, interpret: bool = False):
    """K-step fused refinement under the 28x28 DCGAN D. x0: (B, 28, 28, 1).

    Returns (x_K (B, 28, 28, 1), logits (B,)). Parity oracle:
    ops/conv_refine_ref.refine_s2d_reference (== the scan path)."""
    params = fold_dcgan_d(d_vars)
    weights = _prep_weights(params)
    b = x0.shape[0]
    b_pad = ((b + tile - 1) // tile) * tile
    x16 = s2d4(x0.astype(jnp.float32))
    x16 = jnp.zeros((b_pad, J, J, NX), jnp.float32).at[:b].set(x16)

    grid = (b_pad // tile,)
    x_spec = pl.BlockSpec((tile, J, J, NX), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(w.shape, lambda i, n=w.ndim: (0,) * n,
                            memory_space=pltpu.VMEM) for w in weights]
    out_specs = (
        pl.BlockSpec((tile, J, J, NX), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )
    scratch = [
        pltpu.VMEM((tile, JP, JP, NX), jnp.float32),  # xw
        pltpu.VMEM((tile, JP, JP, C1), jnp.float32),  # h1w00
        pltpu.VMEM((tile, JP, JP, C1), jnp.float32),  # h1w01
        pltpu.VMEM((tile, JP, JP, C1), jnp.float32),  # h1w10
        pltpu.VMEM((tile, JP, JP, C1), jnp.float32),  # h1w11
        pltpu.VMEM((tile, JP, JP, C1), jnp.float32),  # dacc (reused dh1)
        pltpu.VMEM((tile, JP, JP, NX), jnp.float32),  # dx16
    ]
    kernel = functools.partial(_refine_kernel, steps, rate, tile)
    x_out, logits = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[x_spec] + w_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, J, J, NX), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x16, *weights)
    return d2s4(x_out[:b]), logits[:b, 0]


def supports_conv_pallas_refine(bundle, cfg, labels) -> bool:
    """Gate: 28x28x1 DCGAN D with 64 base filters, unconditional, TPU."""
    from collaborative_gan_sampling_tpu.models.dcgan import DCGANDiscriminator

    d = getattr(bundle, "d", None)
    return (isinstance(d, DCGANDiscriminator) and d.image_size == 28
            and d.channels == 1 and d.base_filters == 64
            and labels is None and cfg.clip_norm == 0 and cfg.use_pallas
            and getattr(cfg, "noise", 0.0) == 0.0
            and jax.default_backend() == "tpu")
