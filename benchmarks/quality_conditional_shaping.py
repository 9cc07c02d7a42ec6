"""Conditional-shaping mitigations on the class-conditional preset.

The round-2 boundary (BASELINE.md ImageNet-64): with 1000 classes and
~0.25 samples/class/batch, collab's D shaping destabilises the projection
discriminator — rejection alone beats collab at well-trained checkpoints.
This campaign measures the two mitigations at a fixed checkpoint, within
one process (same feature net, same stream):

  * ``refine.shaping_freeze_embed`` — trunk-only shaping (class-embedding
    rows frozen; their per-row gradient is ~batch/num_classes samples of
    noise).
  * ``refine.shaping_anchor`` — L2-SP trust region toward the restored D.
  * ``refine.shaping_class_weight`` — class-stratified shaping loss (each
    class present in the batch contributes equally).

Usage:
  python benchmarks/quality_conditional_shaping.py --iters 2000 \
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
    p.add_argument("--anchors", default="0.1,1.0")
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

    def run(name, method, **refine_overrides):
        rcfg = dataclasses.replace(cfg.refine, steps=args.k,
                                   rate=args.rate, **refine_overrides)
        res = exp.sample(state, method=method, refine_cfg=rcfg)
        m = exp.evaluate(res)
        table[name] = {**m, "accept_rate": res.accept_rate}
        print(json.dumps({"method": name, "fid": round(m["fid"], 4),
                          "accept": round(res.accept_rate, 3)}), flush=True)

    std = exp.evaluate(exp.sample(state, method="standard"))
    table["standard"] = std
    print(json.dumps({"method": "standard", "fid": round(std["fid"], 4)}),
          flush=True)
    run("reject", "reject")
    run("collab", "collab")
    run("collab:freeze_embed", "collab", shaping_freeze_embed=True)
    run("collab:class_weight", "collab", shaping_class_weight=True)
    for a in [float(s) for s in args.anchors.split(",") if s]:
        run(f"collab:anchor={a:g}", "collab", shaping_anchor=a)
        run(f"collab:freeze+anchor={a:g}", "collab",
            shaping_freeze_embed=True, shaping_anchor=a)

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"cond_shaping_it{args.iters}.json")
    with open(path, "w") as fh:
        json.dump(table, fh, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
