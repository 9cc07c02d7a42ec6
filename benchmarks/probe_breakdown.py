"""Component-level timing breakdown of the refinement pipeline on the chip.

Times, per batch: G(z) alone, one D forward, one D fwd+input-VJP (= one
refine step), the K-step refine scan, and the full G+refine pipeline — to
locate where the non-MXU time goes (ROADMAP item 2 / VERDICT r1 item 3).

Usage: python benchmarks/probe_breakdown.py [--batch 16384] [--steps 10]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, repeats: int = 5, inner: int = 20) -> float:
    """Best wall time of `inner` chained applications inside one jit.

    The accumulator perturbs the first argument's leaves each iteration so
    the body is NOT loop-invariant (XLA would otherwise hoist it out of the
    scan and the measurement would be a single application)."""

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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16384)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()

    from collaborative_gan_sampling_tpu.config import get_preset
    from collaborative_gan_sampling_tpu.models import make_bundle
    from collaborative_gan_sampling_tpu.sampling.refine import (
        make_refine_fn,
        refine_loss_per_sample,
    )
    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    cfg = get_preset("mnist")
    bundle = make_bundle(cfg.model)
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(0))
    b = args.batch
    z = bundle.sample_z(jax.random.PRNGKey(1), b)
    x = bundle.generate(g_vars, z, train=False)

    def d_fwd(d_vars, x):
        return bundle.discriminate(d_vars, x, None, train=False)

    def d_step(d_vars, x):
        def loss(x):
            return jnp.sum(refine_loss_per_sample(d_fwd(d_vars, x)))
        return x - 0.02 * jax.grad(loss)(x)

    refine = make_refine_fn(
        bundle, dataclasses.replace(cfg.refine, steps=args.steps))

    def full(g_vars, d_vars, z):
        x0 = bundle.generate(g_vars, z, train=False)
        xk, aux = refine(d_vars, x0)
        return xk, aux["logits"]

    rows = {
        "g_only": timeit(lambda g, zz: bundle.generate(g, zz, train=False),
                         g_vars, z),
        "d_fwd": timeit(d_fwd, d_vars, x),
        "refine_step": timeit(d_step, d_vars, x),
        "refine_k": timeit(lambda d, xx: refine(d, xx)[0], d_vars, x),
        "full_pipeline": timeit(full, g_vars, d_vars, z),
    }
    out = {k: {"ms": round(v * 1e3, 3),
               "samples_per_sec": round(b / v, 1)} for k, v in rows.items()}
    out["batch"] = b
    out["k"] = args.steps
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
