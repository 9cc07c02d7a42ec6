"""Miniature CPU probe of the R1 penalty arms (train.r1_gamma and
refine.shaping_r1_gamma).

Same calibrated miniature configuration as quality_proximal_mini.py (tiny
DCGAN, 150-iter imperfect checkpoint, fixed procedural stream, trained-
classifier FID), answering two questions on one CPU core:

1. **Shaping R1** — collab's known failure mode is shaping destabilizing
   D's gradient field (the shape-guard campaigns, BASELINE.md). Does
   penalizing E||grad_x D(x_real)||^2 inside each shaping update rescue a
   deliberately hot shaping_lr, and what does it cost at the tuned one?
2. **Train R1** — does training D with R1 produce a checkpoint whose
   refinement/collab sampling is better behaved (smoother field to climb)?

Usage:
  JAX_PLATFORMS=cpu python benchmarks/quality_r1_mini.py --out runs/mini_r1
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


def _mini_cfg(workdir: str, r1_gamma: float = 0.0):
    from collaborative_gan_sampling_tpu.config import (
        Config,
        DataConfig,
        EvalConfig,
        ModelConfig,
        RefineConfig,
        TrainConfig,
    )

    return Config(
        name="mnist", seed=0, workdir=workdir,
        model=ModelConfig(kind="dcgan", z_dim=16, image_size=16, channels=1,
                          g_base_filters=16, d_base_filters=16,
                          compute_dtype="float32"),
        data=DataConfig(dataset="mnist"),
        train=TrainConfig(batch_size=64, niters=150, steps_per_call=50,
                          d_lr=2e-4, g_lr=2e-4, g_steps=2, ckpt_every=150,
                          r1_gamma=r1_gamma),
        refine=RefineConfig(steps=10, rate=0.03, num_batches=8,
                            batch_size=64, burn_in=128, shape_every=1,
                            shaping_lr=2e-4, gamma_percentile=50.0,
                            use_pallas=False),
        eval=EvalConfig(fid_num_samples=1024, fid_batch_size=128,
                        feature_train_steps=400),
    )


def main():
    from collaborative_gan_sampling_tpu.pipeline import Experiment

    p = argparse.ArgumentParser()
    p.add_argument("--gammas", default="0,1,10",
                   help="shaping_r1_gamma grid")
    p.add_argument("--train-gamma", type=float, default=10.0,
                   help="train.r1_gamma for the regularized checkpoint arm")
    p.add_argument("--hot-shaping-mult", type=float, default=10.0)
    p.add_argument("--out", default="runs/mini_r1")
    args = p.parse_args()

    table: dict = {}

    def run(exp, state, name, method, **kw):
        rcfg = dataclasses.replace(exp.cfg.refine, **kw)
        res = exp.sample(state, method=method, refine_cfg=rcfg)
        m = exp.evaluate(res)
        table[name] = {**m, "accept_rate": res.accept_rate}
        print(json.dumps({"cell": name, "fid": round(m["fid"], 3)}),
              flush=True)

    # -- arm 1: shaping R1 on the stock (unregularized) checkpoint ---------
    cfg = _mini_cfg(os.path.join(args.out, "ckpt"))
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.load_or_train()

    run(exp, state, "standard", "standard")
    run(exp, state, "refinement", "refinement")
    gammas = [float(s) for s in args.gammas.split(",")]
    for mult, tag in ((1.0, "tuned"), (args.hot_shaping_mult, "hot")):
        for g in gammas:
            run(exp, state, f"collab:shaping_lr={tag}:r1={g}", "collab",
                shaping_lr=cfg.refine.shaping_lr * mult, shaping_r1_gamma=g)

    # -- arm 2: train-time R1 checkpoint (same stream, same eval) ----------
    cfg_r1 = _mini_cfg(os.path.join(args.out, "ckpt_trainr1"),
                       r1_gamma=args.train_gamma)
    exp_r1 = Experiment(cfg_r1, echo_metrics=False)
    # Same feature net / real stats as arm 1 — FIDs comparable across arms.
    exp_r1.adopt_eval_caches(exp)
    state_r1 = exp_r1.load_or_train()
    for method in ("standard", "refinement", "collab"):
        run(exp_r1, state_r1, f"trainR1:{method}", method)

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "results.json")
    with open(path, "w") as fh:
        json.dump(table, fh, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
