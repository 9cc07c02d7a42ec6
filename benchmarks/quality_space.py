"""x-space vs z-space refinement on one checkpoint, within one process.

Compares the reference's data-space refinement (refine.space='x') against
the DGflow-style latent drift ('z') for refinement and collab, each at its
own (K, rate) — the two spaces live on different rate scales (z wants
~5-10x larger; BASELINE.md measured the regime split: z shines near
convergence, x-collab on rough early checkpoints).

Usage:
  python benchmarks/quality_space.py --preset mnist --iters 1000 \
      --workdir runs/mnist_q3/it1000 --x-rate 0.01 --z-rate 0.1 \
      --out runs/mnist_q3
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
    p.add_argument("--x-rate", type=float, default=0.01)
    p.add_argument("--z-rate", type=float, default=0.1)
    p.add_argument("--ema", type=float, default=0.0,
                   help="train.g_ema_decay (sampling uses the EMA G)")
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
                                                niters=args.iters,
                                                g_ema_decay=args.ema))
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.load_or_train()

    table = {}
    std = exp.evaluate(exp.sample(state, method="standard"))
    table["standard"] = std
    print(json.dumps({"method": "standard", "fid": round(std["fid"], 4)}),
          flush=True)
    for method in ("refinement", "collab"):
        for space, rate in (("x", args.x_rate), ("z", args.z_rate)):
            rcfg = dataclasses.replace(cfg.refine, steps=args.k,
                                       rate=rate, space=space)
            res = exp.sample(state, method=method, refine_cfg=rcfg)
            m = exp.evaluate(res)
            name = f"{method}:{space}"
            table[name] = {**m, "rate": rate}
            print(json.dumps({"method": name, "fid": round(m["fid"], 4),
                              "accept": round(res.accept_rate, 3)}),
                  flush=True)

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"space_it{args.iters}.json")
    with open(path, "w") as fh:
        json.dump(table, fh, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
