"""CLI (L6/C16): ``python -m collaborative_gan_sampling_tpu.cli <cmd> ...``.

Replaces the reference's per-experiment main scripts
(``synthetic/main_synthetic.py``, ``celebA/main.py``, ``mnist/main*.py`` —
approximate paths, SURVEY.md L6) with one entry point over named presets:

    cli train      --config toy2d [a.b=c ...]
    cli refine     --config toy2d refine.method=refinement
    cli collab     --config toy2d              # refine + reject + shape
    cli benchmark  --config toy2d              # all 5 strategies, one table
    cli eval       --config mnist              # FID / 2D metrics
    cli sweep      --config imagenet64 'sweep_steps=1,5,10,20,50'

Any config field is overridable as dotted key=value (config.apply_overrides).
"""

from __future__ import annotations

import argparse
import json
import sys

import jax

from collaborative_gan_sampling_tpu.config import (
    apply_overrides,
    get_preset,
    list_presets,
)
from collaborative_gan_sampling_tpu.pipeline import Experiment


# Measured self-guarding defaults (BASELINE.md "Per-sample early-stop
# robustness" + shape-guard grids): the refinement ascent stops per sample
# at D's decision boundary, and shaping self-disables once D can no longer
# separate real from refined. On every measured config this recipe is
# within noise of the per-checkpoint-tuned result where collab wins, and
# degrades gracefully to ~standard where hot settings would otherwise
# regress it catastrophically (CelebA it2000: 3.75 -> 2.09 vs std 2.06).
SAFE_OVERRIDES = ["refine.stop_score=0.5", "refine.shaping_target=0.5"]


def _build_cfg(args, overrides):
    cfg = get_preset(args.config)
    if args.workdir:
        cfg = cfg.replace(workdir=args.workdir)
    if getattr(args, "safe", False):
        # Applied before user overrides so explicit keys still win.
        cfg = apply_overrides(cfg, SAFE_OVERRIDES)
    return apply_overrides(cfg, overrides)


def _inspect(cfg) -> dict:
    """Summarise the workdir's latest checkpoint: step, parameter counts,
    optional-state presence (EMA generator, shaped D) and the saved config's
    model section — from cfg-derived paths only: no Experiment, no dataset
    load, nothing touches an accelerator."""
    import os

    import numpy as np

    from collaborative_gan_sampling_tpu.pipeline import (
        shaped_d_path as _shaped_d,
    )
    from collaborative_gan_sampling_tpu.utils.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        saved_config,
    )

    ckpt_dir = os.path.join(cfg.workdir, "ckpts")
    path = latest_checkpoint(ckpt_dir)
    if path is None:
        return {"workdir": cfg.workdir, "checkpoint": None,
                "note": "no checkpoint; run train first"}

    def n_params(tree) -> int:
        if isinstance(tree, dict):
            return sum(n_params(v) for v in tree.values())
        return int(np.size(tree)) if tree is not None else 0

    raw = restore_checkpoint(path)  # raw dict — no model construction
    saved = saved_config(ckpt_dir) or {}
    info = {
        "workdir": cfg.workdir,
        "checkpoint": path,
        "step": int(np.asarray(raw.get("step", -1))),
        "g_params": n_params(raw.get("g_vars", {}).get("params", {})),
        "d_params": n_params(raw.get("d_vars", {}).get("params", {})),
        "g_ema_tracked": raw.get("g_ema") is not None,
        "shaped_d_saved": os.path.exists(_shaped_d(cfg.workdir)),
        "model_config": saved.get("model"),
    }
    return info


def main(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    # Multi-host bootstrap: no-op unless a cluster env is configured
    # (JAX_COORDINATOR_ADDRESS); see parallel/multihost.py.
    from collaborative_gan_sampling_tpu.parallel.multihost import (
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed()
    parser = argparse.ArgumentParser(prog="cgs")
    parser.add_argument("command",
                        choices=["train", "refine", "collab", "benchmark",
                                 "eval", "sweep", "tune", "teaser",
                                 "profile", "generate", "export", "inspect",
                                 "import-tf1", "presets"])
    parser.add_argument("--config", default="toy2d",
                        help=f"preset: {list_presets()}")
    parser.add_argument("--workdir", default="")
    parser.add_argument("--mesh", action="store_true",
                        help="use all visible devices data-parallel")
    parser.add_argument("--method", default="",
                        help="sampling method override for refine/eval")
    parser.add_argument("--debug-nans", action="store_true",
                        help="enable jax_debug_nans (dev runs; SURVEY 5.2)")
    parser.add_argument("--safe", action="store_true",
                        help="apply the measured self-guarding sampling "
                             "recipe (refine.stop_score=0.5, "
                             "refine.shaping_target=0.5): hot (K, rate) "
                             "settings degrade to ~standard instead of "
                             "regressing; tuned wins are preserved")
    parser.add_argument("--auto-tune", action="store_true",
                        help="refine/collab: joint (K, rate) grid search on "
                             "the checkpoint first, then sample at the "
                             "tuned setting (the campaigns show the optimum "
                             "is checkpoint-dependent)")
    args, overrides = parser.parse_known_args(argv)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    if args.command == "presets":
        print(json.dumps(list_presets()))
        return 0

    sweep_steps = [1, 5, 10, 20, 50]
    tune_rates = None
    tune_objectives = None
    tune_spaces = None
    tune_stops = None
    tune_proxs = None
    gen_n, gen_out, gen_class = 10_000, "", None
    tf1_src, tf1_step = "", None
    exp_out, exp_platforms = "", None
    kept = []
    for ov in overrides:
        if ov.startswith("sweep_steps="):
            sweep_steps = [int(s) for s in ov.split("=", 1)[1].split(",")]
        elif ov.startswith("tune_rates="):
            tune_rates = [float(s) for s in ov.split("=", 1)[1].split(",")]
        elif ov.startswith("tune_objectives="):
            tune_objectives = ov.split("=", 1)[1].split(",")
        elif ov.startswith("tune_spaces="):
            tune_spaces = ov.split("=", 1)[1].split(",")
        elif ov.startswith("tune_stops="):
            tune_stops = [float(s) for s in ov.split("=", 1)[1].split(",")]
        elif ov.startswith("tune_proxs="):
            tune_proxs = [float(s) for s in ov.split("=", 1)[1].split(",")]
        elif args.command == "generate" and ov.startswith("n="):
            # generate-only keys: consumed ONLY for generate, so a typo'd
            # 'n=' on another command raises the unknown-field error
            # instead of being silently swallowed.
            gen_n = int(ov.split("=", 1)[1])
        elif args.command == "generate" and ov.startswith("out="):
            gen_out = ov.split("=", 1)[1]
        elif args.command == "generate" and ov.startswith("class="):
            gen_class = int(ov.split("=", 1)[1])
        elif args.command == "import-tf1" and ov.startswith("tf1="):
            tf1_src = ov.split("=", 1)[1]
        elif args.command == "import-tf1" and ov.startswith("step="):
            tf1_step = int(ov.split("=", 1)[1])
        elif args.command == "export" and ov.startswith("out="):
            exp_out = ov.split("=", 1)[1]
        elif args.command == "export" and ov.startswith("platforms="):
            exp_platforms = tuple(ov.split("=", 1)[1].split(","))
        elif args.command == "export" and ov.startswith("class="):
            gen_class = int(ov.split("=", 1)[1])
        else:
            kept.append(ov)
    cfg = _build_cfg(args, kept)

    if args.command == "import-tf1":
        # Migration path for reference users: convert a TF1 tf.train.Saver
        # checkpoint (SURVEY.md C15) into a native checkpoint in the workdir
        # ('cgs import-tf1 --config celeba tf1=/path/to/ckpt_dir [step=N]'),
        # after which refine/collab/benchmark/eval run on the imported (G, D).
        if not tf1_src:
            print("import-tf1 requires tf1=<path to TF1 checkpoint dir or "
                  "prefix>", file=sys.stderr)
            return 2
        from collaborative_gan_sampling_tpu.compat.tf1_import import (
            tf1_to_checkpoint,
        )

        path = tf1_to_checkpoint(tf1_src, cfg, step=tf1_step)
        print(json.dumps({"checkpoint": path, "workdir": cfg.workdir}))
        return 0

    if args.command == "inspect":
        # Checkpoint introspection — never trains, never touches the
        # accelerator or the dataset (only cfg-derived paths), unlike the
        # other post-training commands which fall back to load_or_train.
        print(json.dumps(_inspect(cfg), indent=2))
        return 0

    exp = Experiment(cfg, use_mesh=args.mesh)

    if args.command == "train":
        state = exp.train()
        print(json.dumps({"trained_steps": int(state.step),
                          "workdir": cfg.workdir}))
        return 0

    state = exp.load_or_train()

    if args.command in ("refine", "collab"):
        method = (args.method or
                  ("collab" if args.command == "collab"
                   else cfg.refine.method))
        refine_cfg = None
        tuned = {}
        if args.auto_tune:
            if method not in ("refinement", "collab"):
                # (K, rate) only drive the refining methods; tuning a grid
                # another sampler never reads would waste a full sweep and
                # report misleading tuned values.
                print(json.dumps({"note": f"--auto-tune ignored for "
                                          f"method={method!r} (no (K, rate) "
                                          "to tune)"}), file=sys.stderr)
            else:
                import dataclasses

                # Tune under the method actually being run: shaping changes
                # D's gradient field, so refinement-tuned (K, rate) under-
                # tune the collaborative arm (BASELINE.md closure sections).
                (bk, br), _ = exp.select_hparams(state, sweep_steps,
                                                 tune_rates, method=method)
                refine_cfg = dataclasses.replace(cfg.refine, steps=bk,
                                                 rate=br)
                tuned = {"tuned_k": bk, "tuned_rate": br}
        res = exp.sample(state, method=method, refine_cfg=refine_cfg)
        metrics = exp.evaluate(res)
        print(json.dumps({"method": method, **tuned, **metrics}))
        return 0

    if args.command == "benchmark":
        table = exp.benchmark(state)
        print(json.dumps(table, indent=2))
        return 0

    if args.command == "eval":
        method = args.method or cfg.refine.method
        res = exp.sample(state, method=method)
        print(json.dumps({"method": method, **exp.evaluate(res)}))
        return 0

    if args.command == "generate":
        # Serving path: compile-once sampler streaming accepted samples
        # ('n=100000 out=samples.npz', optional 'class=7' for targeted
        # conditional serving); see sampling/serve.py.
        method = args.method or cfg.refine.method
        _, _, stats = exp.generate(state, gen_n, method=method,
                                   out=gen_out or None, class_id=gen_class)
        print(json.dumps(stats))
        return 0

    if args.command == "export":
        # AOT serving export: the serving round (weights + DRS calibration
        # + shaped D baked in) as a self-contained StableHLO artifact
        # ('out=sampler.stablehlo', 'platforms=tpu,cpu', 'class=7');
        # load anywhere with sampling.export.load_sampler — no model code.
        if not exp_out:
            print("export requires out=<artifact path>", file=sys.stderr)
            return 2
        meta = exp.export(state, exp_out,
                          method=args.method or None,
                          platforms=exp_platforms, class_id=gen_class)
        print(json.dumps({"out": exp_out, **meta}))
        return 0

    if args.command == "profile":
        logdir = exp.profile(state)
        print(json.dumps({"trace_dir": logdir}))
        return 0

    if args.command == "teaser":
        # C17: the README-animation figure — samples flowing along dD/dx.
        out = exp.teaser(state)
        print(json.dumps(out))
        return 0

    if args.command == "sweep":
        # BASELINE config 5: refinement-depth sweep k=1..50, data-parallel;
        # also reports the auto-selected best depth (min FID / mode-KL).
        best_k, out = exp.select_k(state, sweep_steps,
                                   method=args.method or "refinement")
        print(json.dumps({"best_k": best_k, "sweep": out}))
        return 0

    if args.command == "tune":
        # Joint (K, rate[, objective][, space][, stop][, prox]) grid: per-
        # checkpoint tuning ('tune_objectives=ns,kl,saturating' /
        # 'tune_spaces=x,z' / 'tune_stops=0,0.5,0.9' / 'tune_proxs=0,0.1,1'
        # add axes; z-space wants ~5-10x larger rates, widen tune_rates
        # accordingly).
        best, out = exp.select_hparams(
            state, sweep_steps, tune_rates,
            method=args.method or "refinement",
            objectives=tune_objectives, spaces=tune_spaces,
            stops=tune_stops, proxs=tune_proxs)
        names = ["k", "rate"]
        result = {"best_k": best[0], "best_rate": best[1]}
        if tune_objectives is not None:
            names.append("obj")
            result["best_objective"] = best[len(names) - 1]
        if tune_spaces is not None:
            names.append("space")
            result["best_space"] = best[len(names) - 1]
        if tune_stops is not None:
            names.append("stop")
            result["best_stop"] = best[len(names) - 1]
        if tune_proxs is not None:
            names.append("prox")
            result["best_proximal"] = best[len(names) - 1]
        result["grid"] = {",".join(f"{n}={v}" for n, v in
                                   zip(names, cell)): m
                          for cell, m in out.items()}
        print(json.dumps(result))
        return 0

    raise AssertionError(args.command)


if __name__ == "__main__":
    sys.exit(main())
