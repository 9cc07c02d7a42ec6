"""Per-class DRS calibration on the class-conditional preset.

The round-2 boundary finding (BASELINE.md): with 1000 classes, global DRS
calibration uses one logit max M for every class, but a projection
discriminator's logit scale is class-dependent — classes whose logits sit
below the global max get starved. RefineConfig.per_class_drs calibrates M
per class (scatter-max burn-in). This campaign isolates that effect at a
fixed checkpoint: reject and collab with per-class calibration on vs off.

Usage:
  python benchmarks/quality_conditional_drs.py --iters 2000 \
      --out runs/imagenet64_q3
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
    p.add_argument("--preset", default="imagenet64")
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--rate", type=float, default=0.005)
    p.add_argument("--intra", type=int, default=0,
                   help="also report intra-FID over the N most frequent "
                        "classes (eval.intra_fid_classes)")
    p.add_argument("--out", default="runs/imagenet64_q3")
    args = p.parse_args()

    from collaborative_gan_sampling_tpu.config import get_preset
    from collaborative_gan_sampling_tpu.pipeline import Experiment
    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    cfg = get_preset(args.preset)
    cfg = cfg.replace(
        workdir=os.path.join(args.out, f"it{args.iters}"),
        train=dataclasses.replace(cfg.train, niters=args.iters),
        eval=dataclasses.replace(cfg.eval,
                                 intra_fid_classes=args.intra))
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.load_or_train()

    table = {}

    def run(name, method, per_class):
        rcfg = dataclasses.replace(cfg.refine, steps=args.k,
                                   rate=args.rate,
                                   per_class_drs=per_class)
        res = exp.sample(state, method=method, refine_cfg=rcfg)
        m = exp.evaluate(res)
        table[name] = {**m, "accept_rate": res.accept_rate}
        print(json.dumps({"method": name, "fid": round(m["fid"], 4),
                          "accept": round(res.accept_rate, 3)}), flush=True)

    std = exp.evaluate(exp.sample(state, method="standard"))
    table["standard"] = std
    print(json.dumps({"method": "standard", "fid": round(std["fid"], 4)}),
          flush=True)
    run("reject:global", "reject", False)
    run("reject:per_class", "reject", True)
    run("collab:global", "collab", False)
    run("collab:per_class", "collab", True)

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"per_class_drs_it{args.iters}.json")
    with open(path, "w") as fh:
        json.dump(table, fh, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
