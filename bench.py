"""Benchmark harness — prints ONE JSON line with the primary metric.

Primary metric (BASELINE.json "metric"): refined samples/sec/chip at K=10
refinement steps, MNIST-shape DCGAN (28x28x1), measured warmup-excluded with
block_until_ready. ``vs_baseline`` is the speedup over the measured TF1-style
CPU reference loop (benchmarks/tf1_reference.py: one sess.run per refinement
step + host numpy update — the reference's execution model per SURVEY.md
section 3.2), cached in benchmarks/tf1_cpu_baseline.json.

Usage: python bench.py  [--batch N] [--steps K] [--no-tf-baseline]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax


def measure_refine_throughput(batch_size: int, steps_k: int,
                              rounds: int = 20, repeats: int = 3) -> dict:
    """Refined samples/sec with the full G(z)->refine-K pipeline.

    Measurement protocol: the repeat loop over `rounds` sample batches lives
    INSIDE one jitted ``lax.scan`` whose output is a scalar reduction that is
    fetched to the host. This (a) matches the production sampler's execution
    shape (sampling/collab.py scans batches on device) and (b) is required
    for correctness on remote-relay PJRT backends, where block_until_ready on
    the last of several async dispatches does not prove the earlier unfetched
    computations ran. Best of `repeats` timed calls, compile excluded.
    """
    import dataclasses

    import jax.numpy as jnp

    from collaborative_gan_sampling_tpu.config import get_preset
    from collaborative_gan_sampling_tpu.models import make_bundle
    from collaborative_gan_sampling_tpu.sampling.refine import (
        make_draw_refine_fn,
    )

    cfg = get_preset("mnist")
    rcfg = dataclasses.replace(cfg.refine, steps=steps_k)
    bundle = make_bundle(cfg.model)
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(0))
    # The same z->G->refine unit the production samplers scan over
    # (sampling/collab.py) — fully fused in s2d coordinates on this config.
    draw_refine = make_draw_refine_fn(bundle, rcfg)

    @jax.jit
    def run(g_vars, d_vars, key):
        def body(acc, i):
            x, _, logits = draw_refine(g_vars, d_vars,
                                       jax.random.fold_in(key, i),
                                       batch_size)
            return acc + jnp.sum(x) + jnp.sum(logits), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(rounds))
        return acc

    key = jax.random.PRNGKey(1)
    float(run(g_vars, d_vars, key))  # compile + warmup, fully materialized
    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        float(run(g_vars, d_vars, jax.random.fold_in(key, 100 + r)))
        best = min(best, time.perf_counter() - t0)
    n = batch_size * rounds
    sps = n / best
    return {
        "samples_per_sec": sps,
        "sec_per_batch": best / rounds,
        "batch_size": batch_size,
        "steps_k": steps_k,
        "rounds": rounds,
        "mfu_pct": round(100.0 * sps * _pipeline_flops_per_sample(steps_k)
                         / BF16_PEAK_FLOPS, 1),
        "device": str(jax.devices()[0]),
    }


# v5e (TPU v5 lite): 197 TFLOP/s bf16 peak per chip.
BF16_PEAK_FLOPS = 197e12


def _pipeline_flops_per_sample(steps_k: int) -> float:
    """Analytic FLOPs/sample of the measured pipeline (MNIST-28 preset:
    z=100, gf=df=64). XLA's cost_analysis under-reports on this backend, so
    MFU uses this hand count:

    D fwd:  conv0 14*14*64*25*1*2 + conv1 7*7*128*25*64*2 + dense 6272*2
            = 20.71 MFLOP
    refine step = D fwd + input-VJP (equal FLOPs)       = 41.42 MFLOP
    G:      project 100*6272*2 + bn + deconv0 7*7*128*25*64*2
            + deconv_out 14*14*64*25*1*2                = 21.33 MFLOP
    total = G + K * step + final D fwd.
    """
    d_fwd = (14 * 14 * 64 * 25 * 1 + 7 * 7 * 128 * 25 * 64 + 6272) * 2
    g_fwd = (100 * 6272 + 7 * 7 * 128 * 25 * 64 + 14 * 14 * 64 * 25) * 2
    return g_fwd + (2 * steps_k + 1) * d_fwd


def main() -> int:
    p = argparse.ArgumentParser()
    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--no-tf-baseline", action="store_true")
    args = p.parse_args()

    ours = measure_refine_throughput(args.batch, args.steps)

    baseline_sps = None
    if not args.no_tf_baseline:
        try:
            from benchmarks.tf1_reference import get_or_measure_baseline
            base = get_or_measure_baseline(steps_k=args.steps)
            baseline_sps = base["samples_per_sec"]
        except Exception as e:  # TF baseline is best-effort
            print(f"tf1 baseline unavailable: {e}", file=sys.stderr)

    result = {
        "metric": f"refined_samples_per_sec_per_chip_k{args.steps}_mnist",
        "value": round(ours["samples_per_sec"], 1),
        "unit": "samples/sec",
        "vs_baseline": (round(ours["samples_per_sec"] / baseline_sps, 1)
                        if baseline_sps else None),
        "mfu_pct": ours["mfu_pct"],
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
