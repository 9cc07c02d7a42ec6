"""Probe: remat for the z-space refinement step (refine.space='z').

Each z-drift step differentiates through G AND D; the VJP stashes G's
deconv activations (the largest tensors in the pipeline). Recomputing them
(jax.checkpoint nothing_saveable) trades ~50% more forward FLOPs for
dropping those HBM writes+reads — same trade that won ~2% on the x-space
path (probe_refine_remat.py), but with much more stash traffic at stake.

MEASURED (v5e, MNIST shape, batch 2048, K=10): baseline 20.04 ms/batch
(102k samples/s), remat 22.16 ms/batch (92k) — remat is 10% WORSE. The
z-drift step is compute-bound (two G applications per step already), so
the extra recomputed G forward costs more than the stash traffic saved.
NOT adopted; the z path keeps plain jax.grad.

Usage: python benchmarks/probe_z_remat.py [--batch 2048] [--steps 10]
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
    b, k, rate = args.batch, args.steps, 0.05

    def pipeline(key, remat: bool):
        z0 = bundle.sample_z(key, b)

        def loss_sum(z):
            x = bundle.generate(g_vars, z, train=False)
            logits = bundle.discriminate(d_vars, x, None, train=False)
            return jnp.sum(refine_loss_per_sample(logits))

        if remat:
            loss_sum = jax.checkpoint(
                loss_sum, policy=jax.checkpoint_policies.nothing_saveable)
        grad_fn = jax.grad(loss_sum)

        def step(z, _):
            return z - rate * grad_fn(z), None

        z_k, _ = jax.lax.scan(step, z0, None, length=k)
        x = bundle.generate(g_vars, z_k, train=False)
        return x, bundle.discriminate(d_vars, x, None, train=False)

    for name, remat in [("baseline", False), ("remat", True)]:
        t = timeit(lambda key, r=remat: pipeline(key, r))
        print(f"{name:9s}: {t*1e3:7.3f} ms/batch  {b/t:10.0f} samples/s")


if __name__ == "__main__":
    main()
