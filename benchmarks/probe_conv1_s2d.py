"""Probe: can the MNIST refine step's dominant op — conv1 (5x5 stride-2,
14x14x64 -> 7x7x128) forward + input-VJP — run faster in s2d coordinates
(3x3 stride-1, 7x7x256 -> 7x7x128)?

The s2d form has 1.44x the FLOPs (9*256 vs 25*64 taps; the extra taps are
structural zeros) but dense stride-1 access. Wall-time is the decider.

Usage: python benchmarks/probe_conv1_s2d.py [--batch 2048]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BF16_PEAK = 197e12


def timeit(fn, *args, repeats: int = 5, inner: int = 50) -> float:
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


def fwd_vjp_time(x, w, stride):
    """One refine-step's worth of this conv: forward + input-cotangent VJP."""
    def f(x_):
        return conv(x_, w, stride)

    def run(x_):
        y, pull = jax.vjp(f, x_)
        (dx,) = pull(y)  # cotangent with y's own value: shape is what matters
        return y, dx

    return timeit(run, x)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2048)
    args = p.parse_args()
    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )
    enable_compile_cache()

    b = args.batch
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    # Original: 5x5 stride-2 on 14x14x64 -> 7x7x128.
    x1 = jax.random.normal(key, (b, 14, 14, 64), dt)
    w1 = jax.random.normal(key, (5, 5, 64, 128), dt) * 0.02
    t1 = fwd_vjp_time(x1, w1, 2)
    fl1 = 2 * (7 * 7 * 128 * 25 * 64) * b * 2  # fwd + vjp
    print(f"conv1 5x5/s2  : {t1*1e6:8.1f} us  "
          f"{fl1/t1/1e12:6.1f} TF/s  ({100*fl1/t1/BF16_PEAK:4.1f}% MFU)")

    # s2d form: 3x3 stride-1 on 7x7x256 -> 7x7x128 (same math, zero-padded
    # taps counted as real FLOPs here — the honest wall-time comparison).
    x2 = jax.random.normal(key, (b, 7, 7, 256), dt)
    w2 = jax.random.normal(key, (3, 3, 256, 128), dt) * 0.02
    t2 = fwd_vjp_time(x2, w2, 1)
    fl2 = 2 * (7 * 7 * 128 * 9 * 256) * b * 2
    print(f"conv1 s2d 3x3 : {t2*1e6:8.1f} us  "
          f"{fl2/t2/1e12:6.1f} TF/s  ({100*fl2/t2/BF16_PEAK:4.1f}% MFU)  "
          f"wall vs orig: {t2/t1:5.2f}x")

    # Pure-matmul ceiling for the same contraction work as the original
    # (im2col matmul: [b*49, 1600] @ [1600, 128]).
    a = jax.random.normal(key, (b * 49, 1600), dt)
    wm = jax.random.normal(key, (1600, 128), dt) * 0.02

    def mm(a_):
        y = a_ @ wm
        return y, y @ wm.T

    t3 = timeit(mm, a)
    fl3 = 2 * (b * 49 * 1600 * 128) * 2
    print(f"matmul ceiling: {t3*1e6:8.1f} us  "
          f"{fl3/t3/1e12:6.1f} TF/s  ({100*fl3/t3/BF16_PEAK:4.1f}% MFU)")

    # And conv0's s2d form at this batch for context (current production op).
    x0 = jax.random.normal(key, (b, 14, 14, 4), dt)
    w0 = jax.random.normal(key, (3, 3, 4, 64), dt) * 0.02
    t0 = fwd_vjp_time(x0, w0, 1)
    fl0 = 2 * (14 * 14 * 64 * 9 * 4) * b * 2
    print(f"conv0 s2d 3x3 : {t0*1e6:8.1f} us  "
          f"{fl0/t0/1e12:6.1f} TF/s  ({100*fl0/t0/BF16_PEAK:4.1f}% MFU)")


if __name__ == "__main__":
    main()
