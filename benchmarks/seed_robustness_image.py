"""Seed-robustness of the image-stack collab win (CelebA-64, imperfect G).

Round 1 established seed-robustness for the 2D claim (5 seeds,
runs/toy_seed_robustness.json); this does the same for the image-space
claim at the imperfect checkpoint: per seed, train 500 iters, then compare
standard vs collab FID at the tuned (K, rate) from the round-2 campaign.

Usage: python benchmarks/seed_robustness_image.py --seeds 0 1 2
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_seed(seed: int, out_dir: str, k: int, rate: float) -> dict:
    from collaborative_gan_sampling_tpu.config import get_preset
    from collaborative_gan_sampling_tpu.pipeline import Experiment

    cfg = get_preset("celeba")
    cfg = cfg.replace(
        seed=seed,
        workdir=os.path.join(out_dir, f"seed{seed}"),
        train=dataclasses.replace(cfg.train, niters=500),
        refine=dataclasses.replace(cfg.refine, steps=k, rate=rate))
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.load_or_train()
    row = {"seed": seed}
    for method in ("standard", "collab"):
        m = exp.evaluate(exp.sample(state, method=method))
        row[method] = round(m["fid"], 4)
    row["win"] = row["collab"] < row["standard"]
    print(json.dumps(row), flush=True)
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--k", type=int, default=50)
    p.add_argument("--rate", type=float, default=0.1)
    p.add_argument("--out", default="runs/celeba_seed_robustness")
    args = p.parse_args()

    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )
    enable_compile_cache()
    rows = [run_seed(s, args.out, args.k, args.rate) for s in args.seeds]
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "results.json"), "w") as fh:
        json.dump({"k": args.k, "rate": args.rate, "rows": rows}, fh,
                  indent=2)
    wins = sum(r["win"] for r in rows)
    print(json.dumps({"wins": wins, "total": len(rows)}), flush=True)


if __name__ == "__main__":
    main()
