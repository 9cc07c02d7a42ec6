"""Per-sample early-stop (refine.stop_score) robustness campaign.

The quality campaigns measured conclusion-inverting (K, rate) sensitivity:
a rate tuned at one checkpoint overshoots another (BASELINE.md). stop_score
freezes each sample once sigmoid(D(x)) crosses a threshold, bounding the
D-score ascent per sample. This runner measures the claim directly: at a
deliberately hot rate, does a threshold rescue refinement/collab FID, and
at the tuned rate, does it cost anything?

Usage:
  python benchmarks/quality_stop.py --preset mnist --iters 1000 \
      --workdir runs/mnist_q3/it1000 --k 20 --rates 0.01,0.1 \
      --stops 0,0.5,0.9 --out runs/mnist_q3
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
    p.add_argument("--rates", default="0.01,0.1",
                   help="comma list; include the tuned rate and a hot one")
    p.add_argument("--stops", default="0,0.5,0.9",
                   help="comma list of stop_score thresholds (0 = off)")
    p.add_argument("--out", default="runs/mnist_q3")
    args = p.parse_args()

    exp, state, cfg = make_experiment(args.preset, args.iters, args.workdir)
    r = Runner(exp, state)
    r.run("standard", "standard")
    for method in ("refinement", "collab"):
        for rate in floats(args.rates):
            for stop in floats(args.stops):
                rcfg = dataclasses.replace(cfg.refine, steps=args.k,
                                           rate=rate, stop_score=stop)
                m = r.run(f"{method}:rate={rate}:stop={stop}", method, rcfg)
                m.update(rate=rate, stop_score=stop)
    r.save(args.out, f"stop_it{args.iters}.json")


if __name__ == "__main__":
    main()
