"""Proximal (DOT-style) refinement robustness campaign (refine.proximal).

Mirrors quality_stop.py for the OTHER overshoot guard: the transport-cost
anchor p*(x - x0) (Tanaka arXiv:1910.06832) smoothly bounds how far
refinement carries each sample from G's output, where stop_score freezes
samples at a D-score threshold. Measured questions: at a deliberately hot
rate, does the anchor rescue refinement/collab FID; at the tuned rate,
does it cost anything; and how does it compare with stop_score=0.5 on the
same cells? Keep rate*proximal < 2 (explicit-Euler stability of the
anchor term — see RefineConfig.proximal).

Usage:
  python benchmarks/quality_proximal.py --preset mnist --iters 1000 \
      --workdir runs/mnist_q3/it1000 --k 20 --rates 0.01,0.1 \
      --proxs 0,1,5 --out runs/mnist_q3
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
    p.add_argument("--proxs", default="0,1,5",
                   help="comma list of proximal strengths (0 = off); "
                        "cells with rate*prox >= 2 are skipped (unstable)")
    p.add_argument("--out", default="runs/mnist_q3")
    args = p.parse_args()

    exp, state, cfg = make_experiment(args.preset, args.iters, args.workdir)
    r = Runner(exp, state)
    r.run("standard", "standard")
    for method in ("refinement", "collab"):
        for rate in floats(args.rates):
            for prox in floats(args.proxs):
                if rate * prox >= 2.0:
                    print(f"skip {method}:rate={rate}:prox={prox} "
                          "(rate*prox >= 2, unstable)", flush=True)
                    continue
                rcfg = dataclasses.replace(cfg.refine, steps=args.k,
                                           rate=rate, proximal=prox)
                m = r.run(f"{method}:rate={rate}:prox={prox}", method, rcfg)
                m.update(rate=rate, proximal=prox)
            # The stop_score reference point on the same (rate, K) cell.
            rcfg = dataclasses.replace(cfg.refine, steps=args.k, rate=rate,
                                       stop_score=0.5)
            m = r.run(f"{method}:rate={rate}:stop=0.5", method, rcfg)
            m.update(rate=rate, stop_score=0.5)
    r.save(args.out, f"proximal_it{args.iters}.json")


if __name__ == "__main__":
    main()
