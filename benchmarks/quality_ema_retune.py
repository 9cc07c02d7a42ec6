"""Re-tune (K, rate) on the EMA arm of a quality_ema.py run.

BASELINE.md's EMA guidance is explicit: "always re-tune (K, rate) against
the EMA generator" — the EMA average is a smoother G whose residual wants
a different refinement schedule than the raw parameters. quality_ema.py
measures both arms at ONE (K, rate) (tuned for the plain arm); this
runner loads the EMA checkpoint it trained, tunes (K, rate) on collab FID
directly, and reports the retuned table within one process.

Usage:
  python benchmarks/quality_ema_retune.py --preset imagenet64 \
      --iters 2000 --decay 0.999 --out runs/imagenet64_ema
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
    p.add_argument("--decay", type=float, default=0.999)
    p.add_argument("--ks", type=int, nargs="+", default=[2, 5, 10, 20])
    p.add_argument("--rates", type=float, nargs="+",
                   default=[0.001, 0.005, 0.01, 0.03])
    p.add_argument("--best-k", type=int, default=None,
                   help="skip the grid and measure the final table at this "
                        "(K, rate) — requires --best-rate")
    p.add_argument("--best-rate", type=float, default=None)
    p.add_argument("--out", default="runs/imagenet64_ema",
                   help="quality_ema.py --out dir (expects <out>/ema ckpts)")
    args = p.parse_args()

    from collaborative_gan_sampling_tpu.config import get_preset
    from collaborative_gan_sampling_tpu.pipeline import Experiment
    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    # Final-table Experiment at the preset's full eval sample count — the
    # headline numbers must be comparable to quality_ema.py's tables (FID
    # is sample-count biased; a cheap-eval final table would not be).
    cfg = get_preset(args.preset)
    cfg = cfg.replace(
        workdir=os.path.join(args.out, "ema"),
        train=dataclasses.replace(cfg.train, niters=args.iters,
                                  g_ema_decay=args.decay),
    )
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.load_or_train()
    print(f"[ema retune {args.preset}] checkpoint at {int(state.step)}",
          flush=True)

    if (args.best_k is None) != (args.best_rate is None):
        p.error("--best-k and --best-rate must be given together")
    if args.best_k is not None:
        best_k, best_rate, grid = args.best_k, args.best_rate, {}
    else:
        # Tuning grid on a cheap 2048-sample eval (shares the feature net /
        # real stats cache where computed by the final-table Experiment).
        cfg_t = cfg.replace(eval=dataclasses.replace(
            cfg.eval, fid_num_samples=2048))
        exp_t = Experiment(cfg_t, echo_metrics=False)
        exp_t.adopt_eval_caches(exp)  # feature space only (protocols differ)
        (best_k, best_rate), grid = exp_t.select_hparams(
            state, ks=args.ks, rates=args.rates, method="collab")
    print(f"[ema retune] best (K, rate) = ({best_k}, {best_rate})",
          flush=True)

    table = {}
    for method in ("standard", "collab"):
        rcfg = dataclasses.replace(cfg.refine, steps=best_k, rate=best_rate)
        res = exp.sample(state, method=method, refine_cfg=rcfg)
        m = exp.evaluate(res)
        table[f"ema:{method}"] = {**m, "accept_rate": res.accept_rate}
        print(json.dumps({"arm": "ema", "method": method,
                          "fid": round(m["fid"], 4)}), flush=True)

    result = {"preset": args.preset, "niters": args.iters,
              "decay": args.decay, "best_k": best_k, "best_rate": best_rate,
              "grid": {f"k={k},rate={r}": m for (k, r), m in grid.items()},
              "table": table}
    path = os.path.join(args.out, f"retuned_it{args.iters}.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
