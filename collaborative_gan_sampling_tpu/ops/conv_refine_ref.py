"""Space-to-depth reference implementation of the conv-D refinement math.

Stage-A groundwork for the fused conv-D Pallas refinement kernel: expresses
the MNIST-shape DCGAN discriminator (eval mode, BN folded into conv weights)
entirely as *unit-shift* operations on space-to-depth (parity) layouts —
stride-2 5x5 convolutions become sums of {-1, 0, +1}-shifted contiguous
slices (even/odd tap decomposition), and the input-VJP becomes shifted
accumulations. No strided slicing, no scatter: exactly the op set Mosaic
lowers well.

This module is pure jnp and serves as (a) the executable spec the Pallas
kernel (ops/conv_refine_pallas.py) is tested against tile-by-tile and (b)
the weight-preparation layer (BN folding, tap tables) both share.

Conventions:
* s2d layout: X[b, jy, jx, (py*2+px)*C + c] = x[b, 2*jy+py, 2*jx+px, c]
* stride-2 SAME 5x5 conv on an even-sized input: XLA pads asymmetrically
  (pad_low = 1, pad_high = 2), so the input index is iy = 2*oy + dy - 1,
  dy in [0,5):
  dy odd  -> iy even -> parity py=0, shift sy=(dy-1)//2 in {0, +1}
  dy even -> iy odd  -> parity py=1, shift sy=(dy-2)//2 in {-1, 0, +1}
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel-major parity blocks."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, jy, jx, py, px, c
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array, channels: int) -> jax.Array:
    """Inverse of space_to_depth."""
    b, jh, jw, c4 = x.shape
    x = x.reshape(b, jh, jw, 2, 2, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, jh * 2, jw * 2, channels)


def _taps() -> list[tuple[int, int, int]]:
    """dy -> (parity, shift) table for the 5-tap stride-2 SAME conv
    (asymmetric XLA padding: iy = 2*oy + dy - 1)."""
    out = []
    for d in range(5):
        if d % 2 == 1:  # iy even -> parity 0
            out.append((d, 0, (d - 1) // 2))
        else:  # iy odd -> parity 1
            out.append((d, 1, (d - 2) // 2))
    return out


TAPS = _taps()  # [(dy, parity, shift)]


class FoldedConvD(NamedTuple):
    """MNIST-shape D with BN folded (eval mode): pure conv/dense params.

    w0: (5, 5, 1, 64)   conv0 (no BN on first layer)
    b0: (64,)
    w1: (5, 5, 64, 128) conv1 with BN1 scale folded in
    b1: (128,)          conv1 bias + BN1 shift
    wd: (6272, 1), bd: (1,)
    """

    w0: jax.Array
    b0: jax.Array
    w1: jax.Array
    b1: jax.Array
    wd: jax.Array
    bd: jax.Array


def fold_dcgan_d(d_vars: Any, eps: float = 1e-5) -> FoldedConvD:
    """Extract + BN-fold the 28x28 DCGAN discriminator's eval-mode params."""
    p = d_vars["params"]
    stats = d_vars.get("batch_stats", {})
    w0 = jnp.asarray(p["conv0"]["kernel"], jnp.float32)
    b0 = jnp.asarray(p["conv0"]["bias"], jnp.float32)
    w1 = jnp.asarray(p["conv1"]["kernel"], jnp.float32)
    b1 = jnp.asarray(p["conv1"]["bias"], jnp.float32)
    bn = p["bn1"]
    mean = jnp.asarray(stats["bn1"]["mean"], jnp.float32)
    var = jnp.asarray(stats["bn1"]["var"], jnp.float32)
    scale = jnp.asarray(bn["scale"], jnp.float32) / jnp.sqrt(var + eps)
    shift = jnp.asarray(bn["bias"], jnp.float32) - mean * scale
    w1f = w1 * scale[None, None, None, :]
    b1f = b1 * scale + shift
    wd = jnp.asarray(p["out"]["kernel"], jnp.float32)
    bd = jnp.asarray(p["out"]["bias"], jnp.float32)
    return FoldedConvD(w0, b0, w1f, b1f, wd, bd)


def _shift2d(x: jax.Array, sy: int, sx: int) -> jax.Array:
    """Shift a (B, H, W, C) array by (sy, sx) with zero fill (unit shifts)."""
    if sy or sx:
        x = jnp.roll(x, (sy, sx), axis=(1, 2))
        if sy == 1:
            x = x.at[:, 0].set(0.0)
        elif sy == -1:
            x = x.at[:, -1].set(0.0)
        if sx == 1:
            x = x.at[:, :, 0].set(0.0)
        elif sx == -1:
            x = x.at[:, :, -1].set(0.0)
    return x


def conv_s2d_fwd(h_s2d: jax.Array, w: jax.Array, b: jax.Array,
                 cin: int) -> jax.Array:
    """Stride-2 SAME 5x5 conv in s2d space.

    h_s2d: (B, J, J, 4*cin) with parity blocks [(py, px) -> py*2+px].
    w: (5, 5, cin, cout). Output (B, J/?, ...) — output grid is the s2d grid
    itself for a 2x downsample: (B, J, J, cout) when input spatial = 2J...
    BUT conv1 downsamples 14 -> 7, so its input s2d grid is 7x7 after a
    second space_to_depth. The caller passes the already-s2d-matched array:
    output spatial == input s2d spatial.
    """
    bsz, j, _, _ = h_s2d.shape
    cout = w.shape[-1]
    out = jnp.zeros((bsz, j, j, cout), jnp.float32)
    for dy, py, sy in TAPS:
        for dx, px, sx in TAPS:
            block = h_s2d[..., (py * 2 + px) * cin:(py * 2 + px + 1) * cin]
            # out[oy] sums input jy = oy + sy -> shift the block by -sy.
            shifted = _shift2d(block, -sy, -sx)
            out = out + (shifted.reshape(bsz * j * j, cin)
                         @ w[dy, dx].astype(jnp.float32)
                         ).reshape(bsz, j, j, cout)
    return out + b


def conv_s2d_bwd_input(dout: jax.Array, w: jax.Array, cin: int) -> jax.Array:
    """Input-VJP of conv_s2d_fwd: (B, J, J, cout) -> (B, J, J, 4*cin)."""
    bsz, j, _, cout = dout.shape
    parts = []
    for py in (0, 1):
        for px in (0, 1):
            acc = jnp.zeros((bsz, j, j, cin), jnp.float32)
            for dy, py2, sy in TAPS:
                if py2 != py:
                    continue
                for dx, px2, sx in TAPS:
                    if px2 != px:
                        continue
                    # forward read block shifted by -s => backward adds
                    # dout shifted by +s through w^T.
                    contrib = (dout.reshape(bsz * j * j, cout)
                               @ w[dy, dx].astype(jnp.float32).T
                               ).reshape(bsz, j, j, cin)
                    acc = acc + _shift2d(contrib, sy, sx)
            parts.append(acc)
    return jnp.concatenate(parts, axis=-1)


def lrelu(x, slope=0.2):
    return jnp.where(x > 0, x, slope * x)


def dlrelu(z, g, slope=0.2):
    return jnp.where(z > 0, g, slope * g)


def d_forward_s2d(params: FoldedConvD, x_s2d: jax.Array):
    """Forward through the folded D given x in s2d(28->14) layout.

    Returns (logits (B,), residuals for the backward pass)."""
    b = x_s2d.shape[0]
    z1 = conv_s2d_fwd(x_s2d, params.w0, params.b0, cin=1)  # (B,14,14,64)
    h1 = lrelu(z1)
    h1_s2d = space_to_depth(h1)  # (B, 7, 7, 256)
    z2 = conv_s2d_fwd(h1_s2d, params.w1, params.b1, cin=64)  # (B,7,7,128)
    h2 = lrelu(z2)
    flat = h2.reshape(b, -1)
    logits = flat @ params.wd.astype(jnp.float32) + params.bd
    return logits[:, 0], (z1, z2)


def d_input_grad_s2d(params: FoldedConvD, x_s2d: jax.Array):
    """(logits, d softplus(-logit)/d x_s2d) — the refinement gradient."""
    b = x_s2d.shape[0]
    logits, (z1, z2) = d_forward_s2d(params, x_s2d)
    dlogit = -jax.nn.sigmoid(-logits)[:, None]  # (B, 1)
    dflat = dlogit @ params.wd.astype(jnp.float32).T  # (B, 6272)
    dh2 = dflat.reshape(b, 7, 7, 128)
    dz2 = dlrelu(z2, dh2)
    dh1_s2d = conv_s2d_bwd_input(dz2, params.w1, cin=64)  # (B,7,7,256)
    dh1 = depth_to_space(dh1_s2d, 64)  # (B,14,14,64)
    dz1 = dlrelu(z1, dh1)
    dx_s2d = conv_s2d_bwd_input(dz1, params.w0, cin=1)  # (B,14,14,4)
    return logits, dx_s2d


def refine_s2d_reference(params: FoldedConvD, x: jax.Array, steps: int,
                         rate: float):
    """Full K-step refinement in s2d space (the Pallas kernel's spec)."""
    x_s2d = space_to_depth(x)

    def step(x_s2d, _):
        _, g = d_input_grad_s2d(params, x_s2d)
        return x_s2d - rate * g, None

    x_s2d, _ = jax.lax.scan(step, x_s2d, None, length=steps)
    logits, _ = d_forward_s2d(params, x_s2d)
    return depth_to_space(x_s2d, 1), logits
