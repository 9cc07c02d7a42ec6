"""Close the north star's "at equal FID" clause end-to-end (BASELINE.json).

The target reads "≥20x refined-samples/sec vs the TF1 CPU reference **at
equal FID**". ``benchmarks/tf1_reference.py`` measures the throughput
denominator with random weights; this runner proves the quality half by
running ONE trained checkpoint through BOTH execution models and FIDing
both pools with one feature net:

* **Arm tf1** — the reference's execution model (SURVEY.md section 3.2):
  weights exported via ``compat/tf1_export.py`` into the reference's TF1
  graph (``compat/tf1_graph.py``), refined with one ``sess.run`` per step
  + host numpy updates, on CPU. Timed -> the denominator, now with real
  weights.
* **Arm scan_f32** — the fused JAX ``lax.scan`` in float32 on CPU: the
  same math as arm tf1 with zero per-step dispatch. Pixel-level parity
  between the two pools is asserted (they are the same computation).
* **Arm prod** — the production TPU path exactly as shipped (bfloat16
  compute, s2d/Pallas fast paths). Timed -> the numerator.

Equality protocol: FID(tf1 pool) vs FID(prod pool) against the same real
stats under the same feature net, compared to the measured seed-to-seed
noise floor of the prod arm itself (two independent z pools). The claim
"Nx at equal FID" holds iff |FID_tf1 - FID_prod| <= noise floor.

Usage:
  python benchmarks/tf1_equal_fid.py --preset mnist \
      --workdir runs/mnist_q3/it3000 --batches 8 --batch 256
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="mnist")
    p.add_argument("--workdir", default="runs/mnist_q3/it3000",
                   help="trained checkpoint to run through both arms")
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--k", type=int, default=None, help="override refine.steps")
    p.add_argument("--rate", type=float, default=None)
    p.add_argument("--skip-cpu-scan", action="store_true",
                   help="skip the f32 CPU scan parity arm (slow on 1 core)")
    p.add_argument("--floor-pools", type=int, default=4,
                   help="independent alternate z pools for the noise-floor "
                        "statistic (>=4 pairwise gaps; VERDICT r3 item 6 — "
                        "a single-pair floor is a sample of size one)")
    p.add_argument("--out", default="runs/equal_fid")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from collaborative_gan_sampling_tpu.compat.tf1_export import export_tf1
    from collaborative_gan_sampling_tpu.compat.tf1_graph import TF1RefineLoop
    from collaborative_gan_sampling_tpu.config import get_preset
    from collaborative_gan_sampling_tpu.models import make_bundle
    from collaborative_gan_sampling_tpu.pipeline import Experiment
    from collaborative_gan_sampling_tpu.sampling.refine import make_refine_fn
    from collaborative_gan_sampling_tpu.training.gan import sampling_g_vars
    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    sidecar = os.path.join(args.workdir, "ckpts", "config.json")
    if os.path.exists(sidecar):
        # The exact experiment config that produced this checkpoint — the
        # deterministic-retrain path when the (gitignored) weight files
        # are absent on a fresh clone (same convention as
        # quality_intra1000.py).
        from collaborative_gan_sampling_tpu.config import Config

        with open(sidecar) as fh:
            cfg = Config.from_dict(json.load(fh)["config"])
        cfg = cfg.replace(workdir=args.workdir)
    else:
        cfg = get_preset(args.preset).replace(workdir=args.workdir)
    rcfg = cfg.refine
    if args.k is not None:
        rcfg = dataclasses.replace(rcfg, steps=args.k)
    if args.rate is not None:
        rcfg = dataclasses.replace(rcfg, rate=args.rate)
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.load_or_train()
    print(f"[equal_fid] {args.preset} checkpoint at step {int(state.step)}, "
          f"K={rcfg.steps} rate={rcfg.rate}", flush=True)

    bundle = exp.bundle
    g_vars, d_vars = sampling_g_vars(state), state.d_vars
    nb, bs = args.batches, args.batch
    shape = (bs, *bundle.data_shape)

    # One x0 pool, shared verbatim by every arm, plus `floor_pools`
    # independent alternate pools for the noise-floor statistic. Generated
    # with the production G.
    gen = jax.jit(lambda k, n: bundle.generate(
        g_vars, bundle.sample_z(k, n), train=False), static_argnums=1)
    key = jax.random.PRNGKey(1234)
    x0 = np.stack([np.asarray(gen(jax.random.fold_in(key, i), bs))
                   for i in range(nb)])
    x0_alts = [
        np.stack([np.asarray(gen(jax.random.fold_in(key,
                                                    1000 * (j + 1) + i), bs))
                  for i in range(nb)])
        for j in range(max(1, args.floor_pools))]

    results: dict = {"preset": args.preset, "workdir": args.workdir,
                     "step": int(state.step), "k": rcfg.steps,
                     "rate": rcfg.rate, "pool": nb * bs}

    # -- Arm tf1: the reference execution model, real weights, CPU ----------
    loop = TF1RefineLoop(export_tf1(g_vars, d_vars, cfg.model), cfg.model,
                         shape, objective=rcfg.objective)
    loop.refine(x0[0], rcfg.steps, rcfg.rate)  # warm the session
    x_tf1, secs_tf1 = loop.refine_pool(x0, rcfg.steps, rcfg.rate)
    loop.close()
    tf1_sps = nb * bs / secs_tf1
    results["tf1_samples_per_sec"] = tf1_sps
    print(f"[arm tf1] {tf1_sps:.1f} samples/s "
          f"({secs_tf1:.1f}s for {nb * bs})", flush=True)

    # -- Arm prod: the shipped TPU path (bf16 + fast paths), production
    # execution shape: the whole pool refined in ONE compiled call (the
    # samplers scan batches on device — per-batch dispatch would measure
    # the tunneled backend's round-trip latency, not the pipeline).
    refine_prod = make_refine_fn(bundle, rcfg)

    @jax.jit
    def refine_pool_prod(d_vars, pool):
        return jax.lax.map(lambda b: refine_prod(d_vars, b)[0], pool)

    def run_pool(pool):
        return np.asarray(refine_pool_prod(d_vars, jnp.asarray(pool)))

    x_prod = run_pool(x0)  # includes compile
    t0 = time.perf_counter()
    x_prod = run_pool(x0)
    secs_e2e = time.perf_counter() - t0
    x_prod_alts = [run_pool(p) for p in x0_alts]

    # Steady-state rate, bench.py protocol: `rounds` refinements of the
    # pool inside one compiled scan, scalar fetched. Each round refines a
    # rolled view of the pool (same samples, different batch layout) so
    # XLA cannot hoist the loop-invariant work out of the scan. On this
    # host the e2e number above is dominated by the tunneled PJRT relay's
    # per-dispatch latency + pool fetch, not by the pipeline.
    rounds = 20
    pool_dev = jnp.asarray(x0).reshape(-1, *shape[1:])

    @jax.jit
    def timed_rounds(d_vars, pool):
        def body(acc, i):
            p = jnp.roll(pool, i, axis=0).reshape(nb, *shape)
            out = jax.lax.map(lambda b: refine_prod(d_vars, b)[0], p)
            return acc + jnp.sum(out), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(rounds))
        return acc

    float(timed_rounds(d_vars, pool_dev))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(timed_rounds(d_vars, pool_dev))
        best = min(best, time.perf_counter() - t0)
    prod_sps = nb * bs * rounds / best
    results["prod_samples_per_sec"] = prod_sps
    results["prod_samples_per_sec_e2e_single_dispatch"] = nb * bs / secs_e2e
    results["prod_backend"] = jax.default_backend()
    print(f"[arm prod] {prod_sps:.1f} samples/s steady-state on "
          f"{jax.default_backend()} ({nb * bs / secs_e2e:.1f} e2e single "
          "dispatch incl. tunnel latency + pool fetch)", flush=True)

    # -- Arm scan_f32: same math as tf1, fused, f32, CPU --------------------
    if not args.skip_cpu_scan:
        mcfg32 = dataclasses.replace(cfg.model, compute_dtype="float32")
        bundle32 = make_bundle(mcfg32)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            refine32 = jax.jit(make_refine_fn(bundle32, rcfg))
            d32 = jax.device_put(d_vars, cpu)
            x_scan = np.stack([
                np.asarray(refine32(d32, jax.device_put(b, cpu))[0])
                for b in x0])
        max_diff = float(np.max(np.abs(x_scan - x_tf1)))
        results["max_abs_diff_tf1_vs_scan_f32"] = max_diff
        print(f"[parity] max |x_tf1 - x_scan_f32| = {max_diff:.2e}",
              flush=True)
        assert max_diff < 5e-3, (
            f"TF1 loop and fused f32 scan diverged: {max_diff}")
    else:
        x_scan = None

    # -- FID everything with one feature net / one real-stats pass ----------
    def fid(pool):
        return exp.fid_of_samples(jnp.asarray(pool.reshape(-1, *shape[1:])))

    fids = {"x0_standard": fid(x0), "tf1": fid(x_tf1), "prod": fid(x_prod)}
    for j, p in enumerate(x_prod_alts):
        fids[f"prod_seed_{chr(ord('b') + j)}"] = fid(p)
    if x_scan is not None:
        fids["scan_f32"] = fid(x_scan)
    # Noise floor as a statistic (VERDICT r3 item 6): all pairwise FID
    # gaps among the independent same-size prod pools. The ruler for
    # "equal" is the MAX pairwise gap — the most conservative same-
    # distribution difference actually observed.
    prod_fids = [fids["prod"]] + [
        fids[f"prod_seed_{chr(ord('b') + j)}"]
        for j in range(len(x_prod_alts))]
    pairs = [abs(a - b) for i, a in enumerate(prod_fids)
             for b in prod_fids[i + 1:]]
    noise_floor = max(pairs)
    gap = abs(fids["tf1"] - fids["prod"])
    results.update(
        fids={k: round(v, 6) for k, v in fids.items()},
        feature_net=exp._feature_label,
        noise_floor=round(noise_floor, 6),
        noise_floor_pairs=len(pairs),
        noise_floor_mean=round(sum(pairs) / len(pairs), 6),
        fid_gap_tf1_vs_prod=round(gap, 6),
        equal_fid=bool(gap <= max(noise_floor, 1e-3)),
        speedup_at_equal_fid=round(prod_sps / tf1_sps, 1),
    )
    print(json.dumps(results["fids"]), flush=True)
    print(f"[closure] speedup {results['speedup_at_equal_fid']}x, "
          f"FID gap {gap:.4f} vs noise floor max/mean "
          f"{noise_floor:.4f}/{results['noise_floor_mean']:.4f} "
          f"({len(pairs)} pairs) -> equal_fid={results['equal_fid']}",
          flush=True)

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"{args.preset}_k{rcfg.steps}.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
