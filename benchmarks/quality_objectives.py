"""Refinement-objective comparison at a fixed imperfect checkpoint.

Evaluates the f-divergence drift families (RefineConfig.objective — DGflow,
arXiv:2012.00780) and Langevin noise on the same trained checkpoint:
refinement and collab under ns (reference default), kl, saturating, and
kl+noise (the KL Langevin flow). Reuses the checkpoint a prior
quality_imperfect.py run trained (same workdir layout).

Usage:
  python benchmarks/quality_objectives.py --preset mnist --iters 1000 \
      --workdir runs/mnist_q3/it1000 --k 20 --rate 0.01 --out runs/mnist_q3
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
    p.add_argument("--rate", type=float, default=0.01)
    p.add_argument("--noise", type=float, default=0.01)
    p.add_argument("--out", default="runs/mnist_q3")
    args = p.parse_args()

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

    table = {}
    std = exp.evaluate(exp.sample(state, method="standard"))
    table["standard"] = std
    print(json.dumps({"method": "standard", "fid": round(std["fid"], 4)}),
          flush=True)
    variants = [("ns", 0.0), ("kl", 0.0), ("saturating", 0.0),
                ("kl", args.noise)]
    for method in ("refinement", "collab"):
        for objective, noise in variants:
            rcfg = dataclasses.replace(cfg.refine, steps=args.k,
                                       rate=args.rate, objective=objective,
                                       noise=noise)
            res = exp.sample(state, method=method, refine_cfg=rcfg)
            m = exp.evaluate(res)
            name = f"{method}:{objective}" + (f"+noise{noise}" if noise
                                              else "")
            table[name] = m
            print(json.dumps({"method": name, "fid": round(m["fid"], 4),
                              "accept": round(res.accept_rate, 3)}),
                  flush=True)

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"objectives_it{args.iters}.json")
    with open(path, "w") as fh:
        json.dump(table, fh, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
