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
    p.add_argument("--rates", default="0.01,0.1",
                   help="comma list; include the tuned rate and a hot one")
    p.add_argument("--stops", default="0,0.5,0.9",
                   help="comma list of stop_score thresholds (0 = off)")
    p.add_argument("--out", default="runs/mnist_q3")
    args = p.parse_args()
    rates = [float(s) for s in args.rates.split(",")]
    stops = [float(s) for s in args.stops.split(",")]

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
    for method in ("refinement", "collab"):
        for rate in rates:
            for stop in stops:
                rcfg = dataclasses.replace(cfg.refine, steps=args.k,
                                           rate=rate, stop_score=stop)
                res = exp.sample(state, method=method, refine_cfg=rcfg)
                m = exp.evaluate(res)
                name = f"{method}:rate={rate}:stop={stop}"
                table[name] = {**m, "rate": rate, "stop_score": stop}
                print(json.dumps({"method": name,
                                  "fid": round(m["fid"], 4),
                                  "accept": round(res.accept_rate, 3)}),
                      flush=True)

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"stop_it{args.iters}.json")
    with open(path, "w") as fh:
        json.dump(table, fh, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
