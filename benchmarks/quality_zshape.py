"""z-space collab shaping/rejection tuning pass.

Session-3 measurement (BASELINE.md): at MNIST it1000, pure z-refinement
reached FID 0.750 but z-collab sat behind at 0.806 with the x-tuned
default shaping settings, and DRS pruned 60% of an already-refined pool.
This runner grids the collab-specific knobs (shaping_lr, shaping_decay,
gamma_percentile) at a fixed tuned (K, rate, space='z') to answer whether
shaping/rejection help at all in z-space once tuned for it.

Usage:
  python benchmarks/quality_zshape.py --preset mnist --iters 1000 \
      --workdir runs/mnist_q3/it1000 --k 20 --rate 0.05 --out runs/mnist_q3
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="mnist")
    p.add_argument("--iters", type=int, default=1000)
    p.add_argument("--workdir", default="runs/mnist_q3/it1000")
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--rate", type=float, default=0.05)
    p.add_argument("--shaping-lrs", default="3e-5,1e-4")
    p.add_argument("--decays", default="0.8,1.0")
    p.add_argument("--percentiles", default="50,80",
                   help="gamma_percentile grid (lower = more accepting)")
    p.add_argument("--out", default="runs/mnist_q3")
    args = p.parse_args()
    lrs = [float(s) for s in args.shaping_lrs.split(",")]
    decays = [float(s) for s in args.decays.split(",")]
    pcts = [float(s) for s in args.percentiles.split(",")]

    from collaborative_gan_sampling_tpu.config import get_preset
    from collaborative_gan_sampling_tpu.pipeline import Experiment
    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    cfg = get_preset(args.preset)
    cfg = cfg.replace(workdir=args.workdir,
                      train=dataclasses.replace(cfg.train,
                                                niters=args.iters))
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.load_or_train()

    base = dataclasses.replace(cfg.refine, steps=args.k, rate=args.rate,
                               space="z")
    table = {}

    def run(name, method, rcfg):
        res = exp.sample(state, method=method, refine_cfg=rcfg)
        m = exp.evaluate(res)
        table[name] = m
        print(json.dumps({"method": name, "fid": round(m["fid"], 4),
                          "accept": round(res.accept_rate, 3)}), flush=True)

    run("standard", "standard", None)
    run("z-refinement", "refinement", base)
    for lr in lrs:
        for decay in decays:
            for pct in pcts:
                rcfg = dataclasses.replace(base, shaping_lr=lr,
                                           shaping_decay=decay,
                                           gamma_percentile=pct)
                run(f"z-collab:lr={lr}:decay={decay}:pct={pct}",
                    "collab", rcfg)

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"zshape_it{args.iters}.json")
    with open(path, "w") as fh:
        json.dump(table, fh, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
