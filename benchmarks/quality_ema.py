"""EMA-generator quality measurement on an image preset.

Trains two checkpoints from the same seed — one tracking an EMA of G's
params (train.g_ema_decay), one not — then compares standard and collab
sampling FID within one process (same feature net, same stream). The EMA
generator is what sampling/serving use when tracked (training/gan.py
``sampling_g_vars``), so this measures the knob end to end.

Usage:
  python benchmarks/quality_ema.py --preset mnist --iters 1000 \
      --decay 0.999 --out runs/mnist_ema
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
    p.add_argument("--decay", type=float, default=0.999)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--rate", type=float, default=0.01)
    p.add_argument("--shaping-lr", type=float, default=None,
                   help="override refine.shaping_lr (gentle-shaping regime)")
    p.add_argument("--shaping-decay", type=float, default=None)
    p.add_argument("--out", default="runs/mnist_ema")
    args = p.parse_args()

    from collaborative_gan_sampling_tpu.config import get_preset
    from collaborative_gan_sampling_tpu.pipeline import Experiment
    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    table = {}
    exps = {}
    for name, decay in [("plain", 0.0), ("ema", args.decay)]:
        cfg = get_preset(args.preset)
        cfg = cfg.replace(
            workdir=os.path.join(args.out, name),
            train=dataclasses.replace(cfg.train, niters=args.iters,
                                      g_ema_decay=decay))
        exp = Experiment(cfg, echo_metrics=False)
        state = exp.load_or_train()
        exps[name] = (exp, state, cfg)

    # One feature net for the whole comparison: evaluate the 'ema' arm with
    # the 'plain' experiment's evaluator (feature nets are data-keyed, not
    # model-keyed, so this is exact).
    ref_exp = exps["plain"][0]
    for name, (exp, state, cfg) in exps.items():
        for method in ("standard", "collab"):
            shaping = {}
            if args.shaping_lr is not None:
                shaping["shaping_lr"] = args.shaping_lr
            if args.shaping_decay is not None:
                shaping["shaping_decay"] = args.shaping_decay
            rcfg = dataclasses.replace(cfg.refine, steps=args.k,
                                       rate=args.rate, **shaping)
            res = exp.sample(state, method=method, refine_cfg=rcfg)
            m = ref_exp.evaluate(res)
            table[f"{name}:{method}"] = m
            print(json.dumps({"arm": name, "method": method,
                              "fid": round(m["fid"], 4)}), flush=True)

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"results_it{args.iters}.json")
    with open(path, "w") as fh:
        json.dump(table, fh, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
