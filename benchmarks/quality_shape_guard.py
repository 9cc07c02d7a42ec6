"""Shaping-schedule guard grid at a fixed hot (K, rate).

Companion to benchmarks/quality_stop.py: that campaign showed
refine.stop_score guards the refinement ascent, but the CelebA-64 it2000
coarse-setting collab failure (3.75 vs standard 2.06 at (20, 0.03)) is a
*shaping* pathology — refinement alone is fine there. This runner grids
the shaping trust-region knobs (shaping_anchor, shaping_decay,
shaping_target) at the hot setting to find a safe default that rescues
collab without per-checkpoint schedule tuning.

Usage:
  python benchmarks/quality_shape_guard.py --preset celeba --iters 2000 \
      --workdir runs/celeba_q3/it2000 --k 20 --rate 0.03 \
      --anchors 0,1,3 --decays 1.0,0.8 --out runs/celeba_q3
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
    p.add_argument("--preset", default="celeba")
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--workdir", default="runs/celeba_q3/it2000")
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--rate", type=float, default=0.03)
    p.add_argument("--anchors", default="0,1,3")
    p.add_argument("--decays", default="1.0,0.8")
    p.add_argument("--targets", default="0",
                   help="shaping_target grid (0 = off)")
    p.add_argument("--stop", type=float, default=0.0,
                   help="refine.stop_score to combine with the guards")
    p.add_argument("--out", default="runs/celeba_q3")
    args = p.parse_args()
    anchors = [float(s) for s in args.anchors.split(",")]
    decays = [float(s) for s in args.decays.split(",")]
    targets = [float(s) for s in args.targets.split(",")]

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
                               stop_score=args.stop)
    table = {}

    def run(name, method, rcfg):
        res = exp.sample(state, method=method, refine_cfg=rcfg)
        m = exp.evaluate(res)
        table[name] = m
        print(json.dumps({"method": name, "fid": round(m["fid"], 4),
                          "accept": round(res.accept_rate, 3)}), flush=True)

    run("standard", "standard", None)
    run("refinement", "refinement", base)
    for anchor in anchors:
        for decay in decays:
            for target in targets:
                rcfg = dataclasses.replace(base, shaping_anchor=anchor,
                                           shaping_decay=decay,
                                           shaping_target=target)
                run(f"collab:anchor={anchor}:decay={decay}:target={target}",
                    "collab", rcfg)

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"shape_guard_it{args.iters}.json")
    with open(path, "w") as fh:
        json.dump(table, fh, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    sys.exit(main() or 0)
