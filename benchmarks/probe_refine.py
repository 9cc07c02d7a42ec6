"""Refinement-throughput probes (ROADMAP item 2 / VERDICT r1 item 3).

Measures the MNIST-shape G(z) -> K-step refine pipeline under several
implementation variants and batch sizes on the real chip, reporting
samples/sec and MFU (XLA cost-analysis FLOPs / wall time / bf16 peak).

Usage: python benchmarks/probe_refine.py [--steps 10]
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

# v5e (TPU v5 lite): 197 TFLOP/s bf16 peak per chip.
BF16_PEAK_FLOPS = 197e12


def build_run(batch_size: int, steps_k: int, rounds: int, carry_bf16: bool):
    from collaborative_gan_sampling_tpu.config import get_preset
    from collaborative_gan_sampling_tpu.models import make_bundle
    from collaborative_gan_sampling_tpu.sampling.refine import make_refine_fn

    cfg = get_preset("mnist")
    rcfg = dataclasses.replace(cfg.refine, steps=steps_k)
    bundle = make_bundle(cfg.model)
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(0))
    refine = make_refine_fn(bundle, rcfg)

    @jax.jit
    def run(g_vars, d_vars, key):
        def body(acc, i):
            z = bundle.sample_z(jax.random.fold_in(key, i), batch_size)
            x0 = bundle.generate(g_vars, z, train=False)
            if carry_bf16:
                x0 = x0.astype(jnp.bfloat16)
            x, aux = refine(d_vars, x0)
            return acc + jnp.sum(x.astype(jnp.float32)) + \
                jnp.sum(aux["logits"]), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(rounds))
        return acc

    return run, (g_vars, d_vars)


def measure(batch_size: int, steps_k: int, rounds: int = 20,
            repeats: int = 3, carry_bf16: bool = False) -> dict:
    run, (g_vars, d_vars) = build_run(batch_size, steps_k, rounds,
                                      carry_bf16)
    key = jax.random.PRNGKey(1)
    lowered = run.lower(g_vars, d_vars, key)
    compiled = lowered.compile()
    try:
        flops = compiled.cost_analysis()["flops"]
    except Exception:
        flops = None
    float(run(g_vars, d_vars, key))  # warmup, fully materialized
    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        float(run(g_vars, d_vars, jax.random.fold_in(key, 100 + r)))
        best = min(best, time.perf_counter() - t0)
    n = batch_size * rounds
    out = {
        "batch": batch_size,
        "k": steps_k,
        "carry_bf16": carry_bf16,
        "samples_per_sec": round(n / best, 1),
    }
    if flops:
        out["mfu_pct"] = round(100.0 * flops / best / BF16_PEAK_FLOPS, 1)
        out["gflops_per_call"] = round(flops / 1e9, 1)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()
    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )
    enable_compile_cache()

    for carry_bf16 in (False, True):
        for batch in (4096, 8192, 16384, 32768):
            r = measure(batch, args.steps, carry_bf16=carry_bf16)
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
