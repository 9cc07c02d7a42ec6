"""Probe: train-step per-op costs (forward + input-grad + PARAM-grad) for
the DCGAN's pixel-level layers vs their s2d forms, at training batch sizes.

The refine pipeline already computes conv0 / deconv_out in s2d coordinates
(ops/refine_s2d.py); this probe measures whether the TRAIN step — which
additionally needs parameter gradients — would benefit from the same layout.

Usage: python benchmarks/probe_train_ops.py [--batch 256] [--size 28]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BF16_PEAK = 197e12


def timeit(fn, *args, repeats: int = 5, inner: int = 100) -> float:
    @jax.jit
    def chained(first, *rest):
        def body(acc, _):
            bumped = jax.tree_util.tree_map(
                lambda v: v + (acc * 1e-20).astype(v.dtype), first)
            out = fn(bumped, *rest)
            leaves = [x.astype(jnp.float32).sum()
                      for x in jax.tree_util.tree_leaves(out)]
            return acc + sum(leaves), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=inner)
        return acc

    float(chained(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / inner


def conv(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def deconv(x, w, stride):
    return jax.lax.conv_transpose(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def full_grad_time(x, w, op, stride):
    """fwd + d/dx + d/dw — the training cost of this layer."""
    def f(x_, w_):
        return op(x_, w_, stride)

    def run(x_):
        y, pull = jax.vjp(f, x_, w)
        dx, dw = pull(y)
        return y, dx, dw

    return timeit(run, x)


def report(name, t, flops):
    print(f"{name:22s}: {t*1e6:8.1f} us  {flops/t/1e12:6.2f} TF/s"
          f"  ({100*flops/t/BF16_PEAK:5.1f}% MFU)")
    return t


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--size", type=int, default=28)
    p.add_argument("--channels", type=int, default=1)
    p.add_argument("--filters", type=int, default=64)
    args = p.parse_args()
    from collaborative_gan_sampling_tpu.ops.conv_refine_ref import (
        space_to_depth,
    )
    from collaborative_gan_sampling_tpu.ops.refine_s2d import (
        conv0_kernel_to_s2d,
        deconv_kernel_to_s2d,
    )
    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )
    enable_compile_cache()

    b, s, c, f = args.batch, args.size, args.channels, args.filters
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    h = s // 2

    # conv0: 5x5 stride-2 SxSxC -> (S/2)x(S/2)xF, full grads.
    x = jax.random.normal(key, (b, s, s, c), dt)
    w = jax.random.normal(key, (5, 5, c, f), dt) * 0.02
    fl = 3 * 2 * (h * h * f * 25 * c) * b  # fwd + dx + dw
    t_px = report("conv0 pixel 5x5/s2", full_grad_time(x, w, conv, 2), fl)

    xs = space_to_depth(x)
    ws = conv0_kernel_to_s2d(w)
    fls = 3 * 2 * (h * h * f * 9 * 4 * c) * b
    t_s2d = report("conv0 s2d 3x3/s1", full_grad_time(xs, ws, conv, 1), fls)
    print(f"  -> s2d wall vs pixel: {t_s2d/t_px:.2f}x")

    # deconv_out: ConvTranspose 5x5 stride-2 (S/2)x(S/2)xF -> SxSxC.
    xg = jax.random.normal(key, (b, h, h, f), dt)
    wg = jax.random.normal(key, (5, 5, f, c), dt) * 0.02
    fl = 3 * 2 * (s * s * c * 25 * f) * b
    t_px = report("deconv_out px 5x5/s2",
                  full_grad_time(xg, wg, deconv, 2), fl)

    wgs = deconv_kernel_to_s2d(wg)
    fls = 3 * 2 * (h * h * 4 * c * 9 * f) * b
    t_s2d = report("deconv_out s2d 3x3", full_grad_time(xg, wgs, conv, 1),
                   fls)
    print(f"  -> s2d wall vs pixel: {t_s2d/t_px:.2f}x")

    # conv1 for scale (the well-behaved op).
    x1 = jax.random.normal(key, (b, h, h, f), dt)
    w1 = jax.random.normal(key, (5, 5, f, 2 * f), dt) * 0.02
    fl = 3 * 2 * ((h // 2) ** 2 * 2 * f * 25 * f) * b
    report("conv1 pixel 5x5/s2", full_grad_time(x1, w1, conv, 2), fl)


if __name__ == "__main__":
    main()
