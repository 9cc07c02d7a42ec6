"""Pool-to-pool FID noise floor at a fixed checkpoint.

The round-5 CelebA it8000 studies disagreed by 0.61 FID on the SAME
checkpoint's standard arm (crossover 3.775 vs converged-study 4.387 —
two independent 10k z pools through the identical serving path), and
the within-pool truncation curve swung 0.4 non-monotonically. Before
reading any per-arm delta at a degraded checkpoint, measure the
estimator's own spread: N independent z pools per method, FID each.

A method's win is interpretable only if its gap from standard exceeds
the max pairwise gap measured here (the same discipline
tf1_equal_fid.py --floor-pools applies to the equal-FID closure).

Methods: ``standard`` serves raw G(z); ``mhgan`` fills each pool with
independent chain passes (benchmarks/_campaign.mh_fill_pool);
``collab:gentle`` shapes D ONCE with the gentle schedule (the repo's
measured 40-batch protocol), then serves every pool under the FIXED
shaped D — pool spread under one shaping, the serving-path reality.

Usage (chip):
  python benchmarks/probe_pool_noise.py --preset celeba --iters 8000 \
      --workdir runs/celeba_conv/plain --pools 6 \
      --methods standard collab:gentle mhgan --out runs/celeba_conv
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="celeba")
    p.add_argument("--iters", type=int, default=8000)
    p.add_argument("--workdir", default="runs/celeba_conv/plain",
                   help="existing checkpoint dir (restored, never trained "
                        "past --iters; missing checkpoints retrain "
                        "deterministically from the config sidecar)")
    p.add_argument("--pool", type=int, default=10000)
    p.add_argument("--pools", type=int, default=6,
                   help="independent z pools per method")
    p.add_argument("--k", type=int, default=None,
                   help="refine steps for collab arms (default: preset)")
    p.add_argument("--rate", type=float, default=None)
    p.add_argument("--methods", nargs="+", default=["standard"],
                   choices=["standard", "mhgan", "collab:gentle"])
    p.add_argument("--out", default="runs/celeba_conv")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from collaborative_gan_sampling_tpu.config import get_preset
    from collaborative_gan_sampling_tpu.pipeline import Experiment
    from collaborative_gan_sampling_tpu.sampling.serve import ServingSampler
    from collaborative_gan_sampling_tpu.training.gan import sampling_g_vars
    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )
    from collaborative_gan_sampling_tpu.utils.retry import with_retries

    enable_compile_cache()

    cfg = get_preset(args.preset)
    cfg = cfg.replace(
        workdir=args.workdir,
        train=dataclasses.replace(cfg.train, niters=args.iters))
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.load_or_train()
    print(f"[pool_noise] {args.preset} at step {int(state.step)}",
          flush=True)
    metric = "kl" if exp.is_2d else "fid"

    rcfg = cfg.refine
    if args.k is not None:
        rcfg = dataclasses.replace(rcfg, steps=args.k)
    if args.rate is not None:
        rcfg = dataclasses.replace(rcfg, rate=args.rate)

    def score(samples) -> float:
        samples = jnp.asarray(samples[:args.pool])
        if exp.is_2d:
            from collaborative_gan_sampling_tpu.evals.metrics2d import (
                metrics_2d,
            )
            m = metrics_2d(samples, exp.spec, hq_std=cfg.eval.hq_std)
            return float(m[metric])
        return exp.fid_of_samples(samples)

    results = {}
    for method in args.methods:
        d_vars, serve_method, rcfg_m = state.d_vars, method, rcfg
        if method == "collab:gentle":
            rcfg_m = dataclasses.replace(rcfg, shaping_lr=3e-5,
                                         shaping_decay=0.8)
            res = with_retries(
                lambda: exp.sample(state, method="collab",
                                   refine_cfg=rcfg_m),
                label="shape once (gentle)")
            d_vars = res.aux.get("shaped_d_vars", state.d_vars)
            serve_method = "collab"
        fids = []
        for i in range(args.pools):
            key = jax.random.fold_in(jax.random.PRNGKey(90210),
                                     1000 * len(results) + i)
            if method == "mhgan":
                from benchmarks._campaign import mh_fill_pool

                samples, _, _ = with_retries(
                    lambda i=i: mh_fill_pool(exp, state, rcfg_m,
                                             args.pool,
                                             seed=90210 + 7 * i)[:3],
                    label=f"mh pool {i}")
                fids.append(score(samples))
            else:
                def serve(key=key, sm=serve_method, dv=d_vars):
                    srv = ServingSampler(exp.bundle, rcfg_m, method=sm,
                                         mesh=exp.mesh)
                    samples, _, _ = srv.generate(
                        sampling_g_vars(state), dv, key, args.pool,
                        quantize_images=False)
                    return score(samples)
                fids.append(with_retries(serve,
                                         label=f"{method} pool {i}"))
            print(f"[pool_noise] {method} pool {i}: "
                  f"{metric}={fids[-1]:.4f}", flush=True)
        gaps = [abs(a - b) for a, b in itertools.combinations(fids, 2)]
        mean = sum(fids) / len(fids)
        var = sum((f - mean) ** 2 for f in fids) / max(1, len(fids) - 1)
        results[method] = {
            metric: [round(f, 4) for f in fids],
            "mean": round(mean, 4), "std": round(var ** 0.5, 4),
            "max_gap": round(max(gaps), 4) if gaps else 0.0,
            "mean_gap": (round(sum(gaps) / len(gaps), 4) if gaps
                         else 0.0),
        }
        print(f"[pool_noise] {method}: mean={mean:.4f} "
              f"std={results[method]['std']} "
              f"max_gap={results[method]['max_gap']}", flush=True)

    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(
        args.out, f"pool_noise_it{args.iters}.json")
    with open(out_path, "w") as fh:
        json.dump({"preset": args.preset, "iters": args.iters,
                   "pool": args.pool, "pools": args.pools,
                   "metric": metric, "methods": results}, fh, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
