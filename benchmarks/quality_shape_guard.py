"""Shaping-schedule guard grid at a fixed hot (K, rate).

Companion to benchmarks/quality_stop.py: that campaign showed
refine.stop_score guards the refinement ascent, but the CelebA-64 it2000
coarse-setting collab failure (3.75 vs standard 2.06 at (20, 0.03)) is a
*shaping* pathology — refinement alone is fine there. This runner grids
the shaping trust-region knobs (shaping_anchor, shaping_decay,
shaping_target) at the hot setting to find a safe default that rescues
collab without per-checkpoint schedule tuning.

Measured (runs/celeba_q3/shape_guard_it2000.json): shaping_decay=0.8
recovers most of the damage (3.75 -> 2.35) but not to parity; the L2-SP
anchor alone barely moves it (its win is conditional-embedding-specific).

Usage:
  python benchmarks/quality_shape_guard.py --preset celeba --iters 2000 \
      --workdir runs/celeba_q3/it2000 --k 20 --rate 0.03 \
      --anchors 0,1,3 --decays 1.0,0.8 --out runs/celeba_q3
"""

from __future__ import annotations

import argparse
import dataclasses

from _campaign import Runner, floats, make_experiment


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

    exp, state, cfg = make_experiment(args.preset, args.iters, args.workdir)
    base = dataclasses.replace(cfg.refine, steps=args.k, rate=args.rate,
                               stop_score=args.stop)
    r = Runner(exp, state)
    r.run("standard", "standard")
    r.run("refinement", "refinement", base)
    for anchor in floats(args.anchors):
        for decay in floats(args.decays):
            for target in floats(args.targets):
                rcfg = dataclasses.replace(base, shaping_anchor=anchor,
                                           shaping_decay=decay,
                                           shaping_target=target)
                r.run(f"collab:anchor={anchor}:decay={decay}:target={target}",
                      "collab", rcfg)
    r.save(args.out, f"shape_guard_it{args.iters}.json")


if __name__ == "__main__":
    main()
