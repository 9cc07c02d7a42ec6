"""Probe: HBM-traffic reductions for the production s2d refine pipeline.

At batch 2048 the fused G->refine(K=10) pipeline measures ~53% analytic MFU
and larger batches get slower — symptoms of HBM-bandwidth limits, not MXU
limits. Two traffic levers, measured on the REAL pipeline unit (same shapes
and math as bench.py):

  remat  — jax.checkpoint(loss, policy=nothing_saveable): the VJP
           recomputes the D forward instead of stashing conv activations
           (~37KB/sample/step saved writes+reads, +50% FLOPs on a cheap op)
  bf16   — carry x_s2d in bfloat16 across scan steps (halves carry traffic;
           update arithmetic still f32 master? no: pure bf16 here, parity
           checked separately before adoption)

Usage: python benchmarks/probe_refine_remat.py [--batch 2048] [--steps 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, repeats: int = 4, inner: int = 20) -> float:
    @jax.jit
    def chained(key, *rest):
        def body(acc, i):
            out = fn(jax.random.fold_in(key, i), *rest)
            leaves = [x.astype(jnp.float32).sum()
                      for x in jax.tree_util.tree_leaves(out)]
            return acc + sum(leaves), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(inner))
        return acc

    key = jax.random.PRNGKey(7)
    float(chained(key, *args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chained(key, *args))
        best = min(best, time.perf_counter() - t0)
    return best / inner


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()

    from collaborative_gan_sampling_tpu.config import get_preset
    from collaborative_gan_sampling_tpu.models import make_bundle
    from collaborative_gan_sampling_tpu.ops.conv_refine_ref import (
        depth_to_space,
    )
    from collaborative_gan_sampling_tpu.ops.refine_s2d import (
        make_d_fwd_s2d,
        make_g_fwd_s2d,
    )
    from collaborative_gan_sampling_tpu.sampling.refine import (
        refine_loss_per_sample,
    )
    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    cfg = get_preset("mnist")
    bundle = make_bundle(cfg.model)
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(0))
    b, k, rate = args.batch, args.steps, cfg.refine.rate
    g_fwd = make_g_fwd_s2d(bundle.g)
    d_fwd = make_d_fwd_s2d(bundle.d)

    def pipeline(key, remat: bool, bf16_carry: bool):
        z = bundle.sample_z(key, b)
        x0 = g_fwd(g_vars, z)  # f32 out (production)
        if bf16_carry:
            x0 = x0.astype(jnp.bfloat16)

        def loss_sum(x):
            return jnp.sum(refine_loss_per_sample(d_fwd(d_vars, x)))

        if remat:
            loss_sum = jax.checkpoint(
                loss_sum, policy=jax.checkpoint_policies.nothing_saveable)
        grad_fn = jax.grad(loss_sum)

        def step(x, _):
            g = grad_fn(x)
            return (x - rate * g).astype(x.dtype), None

        x_k, _ = jax.lax.scan(step, x0, None, length=k)
        return depth_to_space(x_k.astype(jnp.float32), 1), \
            d_fwd(d_vars, x_k)

    variants = [("baseline", False, False), ("remat", True, False),
                ("bf16", False, True), ("remat+bf16", True, True)]
    for name, remat, bf16 in variants:
        t = timeit(lambda key, r=remat, c=bf16: pipeline(key, r, c))
        print(f"{name:12s}: {t*1e3:7.3f} ms/batch  "
              f"{b/t:10.0f} samples/s")


if __name__ == "__main__":
    main()
