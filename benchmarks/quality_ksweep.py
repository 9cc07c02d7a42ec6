"""Refinement-depth sweep at a TRAINED flagship checkpoint (BASELINE
config 5 closure).

BASELINE.json configs[4] names "multi-step refinement sweep (k=1..50)"
on the class-conditional ImageNet-64 preset. The sweep machinery
(`Experiment.sweep` / `cli sweep`) ran on hardware in round 1 but only at
a 100-iter smoke checkpoint, where FID is flat in k because an untrained
D has no gradient signal to exploit (BASELINE.md "Refinement-depth sweep
machinery"). This runner produces the real curve: k = 1..50 at a
converged checkpoint (the quality_converged.py plain arm), for both pure
refinement and collab, at a fixed rate — showing where depth saturates
and whether collab's shaping shifts the optimum (the paper's K-λ
tradeoff, arXiv:1902.00813 §experiments, measured instead of quoted).

Usage (after quality_converged.py has produced the plain arm):
  python benchmarks/quality_ksweep.py --preset imagenet64 \
      --workdir runs/imagenet64_conv/plain --iters 10000 \
      --rate 0.01 --out runs/imagenet64_conv
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="imagenet64")
    p.add_argument("--workdir", default="runs/imagenet64_conv/plain",
                   help="checkpoint dir of an already-trained arm")
    p.add_argument("--iters", type=int, default=10000)
    p.add_argument("--ks", type=int, nargs="+",
                   default=[1, 2, 5, 10, 20, 50])
    p.add_argument("--rate", type=float, default=0.01)
    p.add_argument("--methods", nargs="+",
                   default=["refinement", "collab"])
    p.add_argument("--out", default="runs/imagenet64_conv")
    args = p.parse_args()

    from collaborative_gan_sampling_tpu.config import get_preset
    from collaborative_gan_sampling_tpu.pipeline import Experiment
    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    cfg = get_preset(args.preset)
    cfg = cfg.replace(
        workdir=args.workdir,
        train=dataclasses.replace(cfg.train, niters=args.iters),
        refine=dataclasses.replace(cfg.refine, rate=args.rate))
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.load_or_train()
    metric = "kl" if exp.is_2d else "fid"
    print(f"[ksweep {args.preset}] checkpoint at step {int(state.step)}",
          flush=True)

    table = {}
    for method in args.methods:
        for k in args.ks:
            rcfg = dataclasses.replace(cfg.refine, steps=k)
            t0 = time.perf_counter()
            res = exp.sample(state, method=method, refine_cfg=rcfg)
            wall = time.perf_counter() - t0  # includes compile for this k
            m = exp.evaluate(res)
            table[f"{method}:k={k}"] = {
                **m, "accept_rate": res.accept_rate,
                "sample_wall_s": round(wall, 3)}
            print(json.dumps({"method": method, "k": k,
                              metric: round(m[metric], 4),
                              "accept": round(res.accept_rate, 3),
                              "wall_s": round(wall, 2)}), flush=True)

    result = {"preset": args.preset, "niters": args.iters,
              "rate": args.rate, "ks": args.ks, "table": table}
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"ksweep_it{args.iters}.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
