"""Converged-checkpoint EMA study: does EMA+collab flip positive once G
converges on the conditional flagship?

BASELINE.md's honest boundary (EMA section + round-3 retune): at the
*undertrained* ImageNet-64 it2000 checkpoint, EMA-standard (2.378) beats
EMA+collab even after re-tuning (K, rate) on the EMA arm (2.770), and the
recorded explanation — "the MNIST it3000 / CelebA it2000 regime, where
EMA+collab compounds to the repo-best numbers, needs a converged G" — is
an extrapolation from the unconditional presets, not a measurement on the
1000-class flagship. This runner measures it:

* trains a plain and an EMA arm to --iters (well past it2000) from the
  same seed (quality_ema.py protocol);
* tunes (K, rate) by grid **independently per arm** on a cheap eval
  (Experiment.select_hparams) — the methodological lesson of every EMA
  campaign in BASELINE.md ("always re-tune against the EMA generator");
* final full-eval table: {plain, ema} x {standard, collab@arm-tuned},
  one shared feature net for the whole comparison.

Outcome either closes the boundary (EMA+collab wins at convergence, as on
MNIST/CelebA) or revises it honestly (the 1000-class regime differs).

Usage:
  python benchmarks/quality_converged.py --preset imagenet64 \
      --iters 10000 --decay 0.999 --out runs/imagenet64_conv
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # The axon sitecustomize pins jax_platforms via jax.config, which beats
    # the env var — honor an explicit CPU request through jax.config too.
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="imagenet64")
    p.add_argument("--iters", type=int, default=10000)
    p.add_argument("--decay", type=float, default=0.999)
    p.add_argument("--ks", type=int, nargs="+", default=[2, 5, 10, 20])
    p.add_argument("--rates", type=float, nargs="+",
                   default=[0.001, 0.005, 0.01, 0.03])
    p.add_argument("--out", default="runs/imagenet64_conv")
    args = p.parse_args()

    from collaborative_gan_sampling_tpu.config import get_preset
    from collaborative_gan_sampling_tpu.pipeline import Experiment
    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )
    from collaborative_gan_sampling_tpu.utils.retry import with_retries

    enable_compile_cache()
    exps = {}
    for name, decay in [("plain", 0.0), ("ema", args.decay)]:
        cfg = get_preset(args.preset)
        cfg = cfg.replace(
            workdir=os.path.join(args.out, name),
            train=dataclasses.replace(cfg.train, niters=args.iters,
                                      g_ema_decay=decay))
        exp = Experiment(cfg, echo_metrics=False)
        state = exp.load_or_train()
        exps[name] = (exp, state, cfg)
        print(f"[converged {args.preset}] {name} arm at step "
              f"{int(state.step)}", flush=True)

    # One feature net / real-stats protocol for every number in the table
    # (feature nets are data-keyed, not model-keyed, so this is exact).
    ref_exp = exps["plain"][0]

    table, grids, tuned = {}, {}, {}
    for name, (exp, state, cfg) in exps.items():
        cfg_t = cfg.replace(eval=dataclasses.replace(
            cfg.eval, fid_num_samples=2048))
        exp_t = Experiment(cfg_t, echo_metrics=False)
        if not ref_exp.is_2d:  # 2D evals are closed-form, no feature net
            exp_t.adopt_eval_caches(ref_exp)  # feature space only
        (best_k, best_rate), grid = exp_t.select_hparams(
            state, ks=args.ks, rates=args.rates, method="collab",
            progress=True,
            cache_path=os.path.join(args.out, f"grid_{name}.jsonl"))
        tuned[name] = {"k": best_k, "rate": best_rate}
        grids[name] = {f"k={k},rate={r}": m for (k, r), m in grid.items()}
        print(f"[converged] {name} arm tuned (K, rate) = "
              f"({best_k}, {best_rate})", flush=True)

        rcfg = dataclasses.replace(cfg.refine, steps=best_k, rate=best_rate)
        metric = "kl" if ref_exp.is_2d else "fid"
        for method in ("standard", "collab"):

            def run_final(exp=exp, state=state, method=method, rcfg=rcfg):
                res = exp.sample(state, method=method, refine_cfg=rcfg)
                m = ref_exp.evaluate(res)
                return {**m, "accept_rate": res.accept_rate}

            table[f"{name}:{method}"] = with_retries(
                run_final, label=f"final {name}:{method}")
            print(json.dumps({"arm": name, "method": method,
                              metric: round(table[f"{name}:{method}"]
                                            [metric], 4)}), flush=True)

    result = {"preset": args.preset, "niters": args.iters,
              "decay": args.decay, "tuned": tuned, "grids": grids,
              "table": table}
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"converged_it{args.iters}.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
