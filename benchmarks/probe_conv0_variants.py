"""Probe: layout/algorithm variants for the refine step's worst op —
conv0 in s2d form (3x3 stride-1 on [B,14,14,4] -> [B,14,14,64]), fwd +
input-VJP. Measured 2.7% MFU at batch 2048 (probe_conv1_s2d.py): the
4-channel input pads 32x on the NHWC lane dim. Candidates:

  a) current: XLA conv NHWC, C_in=4
  b) NCHW dimension numbers (W=14 in lanes instead of C=4)
  c) im2col via 9 padded shifts + one [B*196, 36] @ [36, 64] matmul
  d) "s4d": same linear map expressed one s2d level deeper — 3x3 conv on
     [B,7,7,16] -> [B,7,7,256] (timing-shape probe; kernel mapping exact
     via a second tap transform if adopted)
  e) input channels zero-padded 4 -> 8

Usage: python benchmarks/probe_conv0_variants.py [--batch 2048]
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
# Exact useful FLOPs of conv0 fwd+VJP per sample (pixel form, both probes
# count the same useful work so variants are comparable): fwd + dx.
USEFUL_FLOPS = 2 * (14 * 14 * 64 * 25 * 1) * 2


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


def fwd_vjp(f):
    def run(x):
        y, pull = jax.vjp(f, x)
        (dx,) = pull(y)
        return y, dx

    return run


def report(name, t, b):
    fl = USEFUL_FLOPS * b
    print(f"{name:24s}: {t*1e6:8.1f} us  ({100*fl/t/BF16_PEAK:5.1f}% "
          f"useful-MFU)")
    return t


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

    x = jax.random.normal(key, (b, 14, 14, 4), dt)
    w = jax.random.normal(key, (3, 3, 4, 64), dt) * 0.02

    def conv_nhwc(x_):
        return jax.lax.conv_general_dilated(
            x_, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    t_a = report("a) conv NHWC C=4", timeit(fwd_vjp(conv_nhwc), x), b)

    x_nchw = jnp.transpose(x, (0, 3, 1, 2))
    w_oihw = jnp.transpose(w, (3, 2, 0, 1))

    def conv_nchw(x_):
        return jax.lax.conv_general_dilated(
            x_, w_oihw, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    report("b) conv NCHW", timeit(fwd_vjp(conv_nchw), x_nchw), b)

    w_mat = w.reshape(9 * 4, 64)

    def conv_im2col(x_):
        xp = jnp.pad(x_, ((0, 0), (1, 1), (1, 1), (0, 0)))
        parts = [xp[:, dy:dy + 14, dx:dx + 14, :]
                 for dy in range(3) for dx in range(3)]
        patches = jnp.concatenate(parts, -1)
        y = patches.reshape(b * 196, 36) @ w_mat
        return y.reshape(b, 14, 14, 64)

    report("c) im2col 9-shift matmul", timeit(fwd_vjp(conv_im2col), x), b)

    x4 = jax.random.normal(key, (b, 7, 7, 16), dt)
    w4 = jax.random.normal(key, (3, 3, 16, 256), dt) * 0.02

    def conv_s4d(x_):
        return jax.lax.conv_general_dilated(
            x_, w4, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    report("d) s4d 3x3 16->256 @7x7", timeit(fwd_vjp(conv_s4d), x4), b)

    x8 = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 4)))
    w8 = jnp.pad(w, ((0, 0), (0, 0), (0, 4), (0, 0)))

    def conv_c8(x_):
        return jax.lax.conv_general_dilated(
            x_, w8, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    report("e) conv NHWC C=8 padded", timeit(fwd_vjp(conv_c8), x8), b)

    # Numerical sanity for (c): the im2col matmul must equal the conv.
    y_ref = conv_nhwc(x)
    y_im = conv_im2col(x)
    err = float(jnp.max(jnp.abs((y_ref - y_im).astype(jnp.float32))))
    print(f"im2col vs conv max|err| = {err:.2e}")


if __name__ == "__main__":
    main()
