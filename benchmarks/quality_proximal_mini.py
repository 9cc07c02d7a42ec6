"""Miniature CPU probe of the proximal guard (refine.proximal).

Runs the calibrated miniature configuration from tests/test_image_quality.py
(tiny DCGAN, 150-iter imperfect checkpoint, fixed procedural stream,
trained-classifier FID) and measures whether the DOT-style proximity cost
rescues a deliberately hot rate and what it costs at the tuned rate —
the same questions quality_proximal.py asks at TPU scale, answerable on
one CPU core in ~15 min. stop_score=0.5 cells give the reference guard.

Usage:
  JAX_PLATFORMS=cpu python benchmarks/quality_proximal_mini.py \
      --out runs/mini_proximal
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
    p.add_argument("--rates", default="0.03,0.3",
                   help="tuned rate and a 10x-hot one")
    p.add_argument("--proxs", default="0,1,5")
    p.add_argument("--out", default="runs/mini_proximal")
    args = p.parse_args()

    from collaborative_gan_sampling_tpu.config import (
        Config,
        DataConfig,
        EvalConfig,
        ModelConfig,
        RefineConfig,
        TrainConfig,
    )
    from collaborative_gan_sampling_tpu.pipeline import Experiment

    cfg = Config(
        name="mnist", seed=0, workdir=os.path.join(args.out, "ckpt"),
        model=ModelConfig(kind="dcgan", z_dim=16, image_size=16, channels=1,
                          g_base_filters=16, d_base_filters=16,
                          compute_dtype="float32"),
        data=DataConfig(dataset="mnist"),
        train=TrainConfig(batch_size=64, niters=150, steps_per_call=50,
                          d_lr=2e-4, g_lr=2e-4, g_steps=2, ckpt_every=150),
        refine=RefineConfig(steps=10, rate=0.03, num_batches=8,
                            batch_size=64, burn_in=128, shape_every=1,
                            shaping_lr=2e-4, gamma_percentile=50.0,
                            use_pallas=False),
        eval=EvalConfig(fid_num_samples=1024, fid_batch_size=128,
                        feature_train_steps=400),
    )
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.load_or_train()

    table = {}

    def run(name, method, **kw):
        rcfg = dataclasses.replace(cfg.refine, **kw)
        res = exp.sample(state, method=method, refine_cfg=rcfg)
        m = exp.evaluate(res)
        table[name] = {**m, "accept_rate": res.accept_rate}
        print(json.dumps({"cell": name, "fid": round(m["fid"], 3)}),
              flush=True)

    run("standard", "standard")
    rates = [float(s) for s in args.rates.split(",")]
    proxs = [float(s) for s in args.proxs.split(",")]
    for method in ("refinement", "collab"):
        for rate in rates:
            for prox in proxs:
                if rate * prox >= 2.0:
                    continue
                run(f"{method}:rate={rate}:prox={prox}", method,
                    rate=rate, proximal=prox)
            run(f"{method}:rate={rate}:stop=0.5", method, rate=rate,
                stop_score=0.5)

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "results.json")
    with open(path, "w") as fh:
        json.dump(table, fh, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
