"""Image-stack quality campaign at imperfect checkpoints (VERDICT r1 item 2).

The paper's image-space claim (arXiv:1902.00813): at a *fixed, imperfect*
generator, collaborative sampling (refine + reject + shape) lowers FID versus
standard sampling. Round 1 demonstrated this on MNIST at a 1000-iter
checkpoint but only ran CelebA-64 at a well-trained checkpoint (where
refinement over-shoots, matching the paper's own finding). This campaign runs
the missing experiment: train the preset to an imperfect and a well-trained
checkpoint, jointly tune (K, rate) per checkpoint by validation FID, then
benchmark standard / reject / refinement / collab at the tuned setting.

Usage:
  python benchmarks/quality_imperfect.py --preset celeba \
      --iters 500 2000 --out runs/celeba_q2
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_checkpoint(preset: str, niters: int, out_dir: str,
                   ks: list[int], rates: list[float]) -> dict:
    from collaborative_gan_sampling_tpu.config import get_preset
    from collaborative_gan_sampling_tpu.pipeline import Experiment

    cfg = get_preset(preset)
    workdir = os.path.join(out_dir, f"it{niters}")
    cfg = cfg.replace(workdir=workdir,
                      train=dataclasses.replace(cfg.train, niters=niters))
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.load_or_train()
    print(f"[{preset} it{niters}] trained to {int(state.step)}", flush=True)

    # Joint (K, rate) tuning by refinement FID (the cheap proxy for collab's
    # refinement arm — collab additionally shapes D, which only helps when
    # refinement itself helps).
    (best_k, best_rate), grid = exp.select_hparams(
        state, ks=ks, rates=rates, method="refinement")
    print(f"[{preset} it{niters}] best (K, rate) = ({best_k}, {best_rate})",
          flush=True)

    tuned = cfg.replace(refine=dataclasses.replace(
        cfg.refine, steps=best_k, rate=best_rate))
    exp_t = Experiment(tuned, echo_metrics=False)
    # Reuse the tuning phase's feature net + real stats (identical eval
    # protocol here, so the stats transfer exactly; recomputing would cost
    # a full feature-training pass per checkpoint on this 1-core host).
    exp_t.adopt_eval_caches(exp)
    table = exp_t.benchmark(state, methods=("standard", "reject",
                                            "refinement", "collab"))
    result = {
        "preset": preset,
        "niters": niters,
        "best_k": best_k,
        "best_rate": best_rate,
        "grid": {f"k={k},rate={r}": m for (k, r), m in grid.items()},
        "benchmark": table,
    }
    path = os.path.join(out_dir, f"results_it{niters}.json")
    os.makedirs(out_dir, exist_ok=True)
    with open(path, "w") as fh:
        json.dump(result, fh, indent=2)
    print(f"[{preset} it{niters}] " + json.dumps(
        {m: round(v["fid"], 4) for m, v in table.items()}), flush=True)
    return result


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="celeba")
    p.add_argument("--iters", type=int, nargs="+", default=[500, 2000])
    p.add_argument("--out", default="runs/celeba_q2")
    p.add_argument("--ks", type=int, nargs="+", default=[5, 10, 20])
    p.add_argument("--rates", type=float, nargs="+",
                   default=[0.005, 0.01, 0.03])
    args = p.parse_args()

    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )
    enable_compile_cache()
    for niters in args.iters:
        run_checkpoint(args.preset, niters, args.out, args.ks, args.rates)


if __name__ == "__main__":
    main()
