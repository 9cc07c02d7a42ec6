"""Per-op ceiling probe: each conv in the MNIST refine step vs its pure
im2col-matmul equivalent, to locate XLA conv-lowering inefficiency.

Usage: python benchmarks/probe_convops.py [--batch 16384]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BF16_PEAK = 197e12


def timeit(fn, *args, repeats: int = 5, inner: int = 30) -> float:
    @jax.jit
    def chained(first, *rest):
        def body(acc, _):
            bumped = jax.tree_util.tree_map(
                lambda v: v + (acc * 1e-20).astype(v.dtype)
                if jnp.issubdtype(v.dtype, jnp.floating) else v, first)
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16384)
    args = p.parse_args()
    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )
    enable_compile_cache()
    b = args.batch
    key = jax.random.PRNGKey(0)
    bf = jnp.bfloat16

    x0 = jax.random.normal(key, (b, 28, 28, 1), bf)
    w0 = jax.random.normal(key, (5, 5, 1, 64), bf)
    h1 = jax.random.normal(key, (b, 14, 14, 64), bf)
    w1 = jax.random.normal(key, (5, 5, 64, 128), bf)
    h2 = jax.random.normal(key, (b, 7, 7, 128), bf)

    # im2col-equivalent matmuls
    a1 = jax.random.normal(key, (b * 49, 1600), bf)
    k1 = jax.random.normal(key, (1600, 128), bf)
    a0 = jax.random.normal(key, (b * 196, 32), bf)  # 25 padded to 32
    k0 = jax.random.normal(key, (32, 64), bf)

    def vjp_in(xx, w, stride, yy):
        _, pull = jax.vjp(lambda v: conv(v, w, stride), xx)
        return pull(yy)[0]

    rows = {}

    def rec(name, secs, flops):
        rows[name] = {"ms": round(secs * 1e3, 3),
                      "mfu_pct": round(100 * flops / secs / BF16_PEAK, 1)}

    f_c0 = 2 * b * 14 * 14 * 64 * 25 * 1
    f_c1 = 2 * b * 7 * 7 * 128 * 25 * 64
    rec("conv0_fwd", timeit(lambda x: conv(x, w0, 2), x0), f_c0)
    rec("conv1_fwd", timeit(lambda x: conv(x, w1, 2), h1), f_c1)
    rec("conv0_vjp_in",
        timeit(lambda y: vjp_in(x0, w0, 2, y), h1), f_c0)
    rec("conv1_vjp_in",
        timeit(lambda y: vjp_in(h1, w1, 2, y), h2), f_c1)
    rec("mm_conv1_equiv", timeit(lambda a: a @ k1, a1),
        2 * a1.shape[0] * 1600 * 128)
    rec("mm_conv0_equiv", timeit(lambda a: a @ k0, a0),
        2 * a0.shape[0] * 32 * 64)
    print(json.dumps({"batch": b, **rows}, indent=2))


if __name__ == "__main__":
    main()
