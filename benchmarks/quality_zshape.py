"""z-space collab shaping/rejection tuning pass.

Session-3 measurement (BASELINE.md): at MNIST it1000, pure z-refinement
reached FID 0.750 but z-collab sat behind at 0.806 with the x-tuned
default shaping settings, and DRS pruned 60% of an already-refined pool.
This runner grids the collab-specific knobs (shaping_lr, shaping_decay,
gamma_percentile) at a fixed tuned (K, rate, space='z') to answer whether
shaping/rejection help at all in z-space once tuned for it.

Measured answer (runs/mnist_q3/zshape_it1000.json): yes — at
lr=1e-4, decay=0.8, percentile=50, z-collab 0.568 beats z-refinement
0.658 (standard 0.888), restoring the paper's full-method ordering.

Usage:
  python benchmarks/quality_zshape.py --preset mnist --iters 1000 \
      --workdir runs/mnist_q3/it1000 --k 20 --rate 0.05 --out runs/mnist_q3
"""

from __future__ import annotations

import argparse
import dataclasses

from _campaign import Runner, floats, make_experiment


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
    p.add_argument("--ema", type=float, default=0.0,
                   help="train.g_ema_decay (sampling uses the EMA G)")
    p.add_argument("--out", default="runs/mnist_q3")
    args = p.parse_args()

    exp, state, cfg = make_experiment(args.preset, args.iters, args.workdir,
                                      g_ema_decay=args.ema)
    base = dataclasses.replace(cfg.refine, steps=args.k, rate=args.rate,
                               space="z")
    r = Runner(exp, state)
    r.run("standard", "standard")
    r.run("z-refinement", "refinement", base)
    for lr in floats(args.shaping_lrs):
        for decay in floats(args.decays):
            for pct in floats(args.percentiles):
                rcfg = dataclasses.replace(base, shaping_lr=lr,
                                           shaping_decay=decay,
                                           gamma_percentile=pct)
                r.run(f"z-collab:lr={lr}:decay={decay}:pct={pct}",
                      "collab", rcfg)
    r.save(args.out, f"zshape_it{args.iters}.json")


if __name__ == "__main__":
    main()
