"""Intra-FID at 1000 classes with a scaled eval protocol (C13 closure).

The conditional-closure campaign (quality_conditional_closure.py) measured
global FID on the imagenet64 flagship but its 10k-sample protocol leaves
~10 samples/class — below any defensible per-class covariance, so intra-FID
(the metric that catches class swaps global FID cannot see) was undefined
at 1000 classes. The chip refines >10^5 samples in seconds; only the eval
protocol was blocking. This runner scales it:

* ``>= per-class-target x 1000`` ACCEPTED samples per arm, streamed through
  the production serving path (sampling/serve.py — device-compacted
  uint8, so host memory stays bounded at any pool size);
* matching-size labelled real pool from the dataset;
* features extracted in device chunks (one shared feature net), per-class
  (mu, Sigma) + f64 Frechet on host (evals/fid.per_class_fid);
* arms: standard, collab at the tuned (K, rate), collab --safe. Collab
  arms shape D with the same 40-batch protocol as every measured collab
  row (one sample() pass), then serve under the persisted shaped D —
  'train once, shape once, serve many times'.

Real/fake pools see identical uint8 quantization (the dataset is stored
uint8 and normalized on gather; served samples are device-quantized with
the same transform), so the comparison is artifact-free.

Usage:
  python benchmarks/quality_intra1000.py --workdir runs/imagenet64_q3/cond_it2000 \
      --k 10 --rate 0.03 --per-class 128
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="imagenet64")
    p.add_argument("--workdir", default="runs/imagenet64_q3/cond_it2000",
                   help="trained conditional checkpoint")
    p.add_argument("--k", type=int, default=10,
                   help="tuned refinement steps (cond_closure best_k)")
    p.add_argument("--rate", type=float, default=0.03,
                   help="tuned refinement rate (cond_closure best_rate)")
    p.add_argument("--per-class", type=int, default=128,
                   help="target mean accepted samples per class")
    p.add_argument("--min-count", type=int, default=32)
    p.add_argument("--chunk", type=int, default=8192,
                   help="host->device feature-extraction chunk")
    p.add_argument("--num-classes", type=int, default=0,
                   help="override model.num_classes (0 = preset value; the "
                        "imagenet64 preset is already 1000-class)")
    p.add_argument("--iters", type=int, default=0,
                   help="override train.niters (0 = sidecar/preset value)")
    p.add_argument("--out", default="runs/imagenet64_q3")
    p.add_argument("--platform", default="",
                   help="force a jax platform (e.g. 'cpu' for smokes): the "
                        "axon sitecustomize pins jax_platforms via "
                        "jax.config, which beats the JAX_PLATFORMS env var")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from collaborative_gan_sampling_tpu.config import get_preset
    from collaborative_gan_sampling_tpu.data.images import normalize_images
    from collaborative_gan_sampling_tpu.evals.fid import (
        frechet_distance_host,
        per_class_fid,
        stats_from_features,
    )
    from collaborative_gan_sampling_tpu.pipeline import Experiment
    from collaborative_gan_sampling_tpu.sampling.serve import ServingSampler
    from collaborative_gan_sampling_tpu.training.gan import sampling_g_vars
    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    sidecar = os.path.join(args.workdir, "ckpts", "config.json")
    if os.path.exists(sidecar):
        # The exact experiment config that produced this checkpoint —
        # required for the deterministic retrain path when the (gitignored)
        # weight files are absent on a fresh clone.
        from collaborative_gan_sampling_tpu.config import Config

        with open(sidecar) as fh:
            cfg = Config.from_dict(json.load(fh)["config"])
        cfg = cfg.replace(workdir=args.workdir)
    else:
        cfg = get_preset(args.preset).replace(workdir=args.workdir)
    if args.num_classes:
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, num_classes=args.num_classes))
    if args.iters:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, niters=args.iters))
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.load_or_train()
    n_classes = cfg.model.num_classes
    n_pool = args.per_class * n_classes
    print(f"[intra1000] {args.preset} checkpoint at step {int(state.step)}, "
          f"K={args.k} rate={args.rate}, pool>={n_pool} "
          f"({args.per_class}/class x {n_classes})", flush=True)

    feature_fn = exp._feature_fn()
    g_vars = sampling_g_vars(state)
    bs = cfg.eval.fid_batch_size
    fdim = jax.eval_shape(
        feature_fn, jax.ShapeDtypeStruct((1, *exp.bundle.data_shape),
                                         jnp.float32)).shape[-1]

    def feats_of_u8(u8: np.ndarray) -> np.ndarray:
        """uint8 host pool -> (N, fdim) f32 features, device-chunked.

        The tail that does not fill a feature batch runs as its own
        (once-compiled) call so no sample is dropped — at 1000 classes a
        truncated tail would silently thin the rarest classes.
        """
        fn = jax.jit(lambda u: jax.lax.map(
            feature_fn, normalize_images(u).reshape(-1, bs, *u.shape[1:])
        ).reshape(-1, fdim))
        tail_fn = jax.jit(lambda u: feature_fn(normalize_images(u)))
        outs = []
        step = (args.chunk // bs) * bs
        n = (u8.shape[0] // bs) * bs
        for i in range(0, n, step):
            outs.append(np.asarray(fn(jnp.asarray(u8[i:min(i + step, n)]))))
        if u8.shape[0] > n:
            outs.append(np.asarray(tail_fn(jnp.asarray(u8[n:]))))
        return np.concatenate(outs) if outs else np.zeros((0, fdim),
                                                          np.float32)

    # -- Real side: labelled pool + features, device-chunked ----------------
    key = jax.random.PRNGKey(4242)
    real_feats, real_labels = [], []
    real_fn = jax.jit(lambda k: (lambda xl: (jax.lax.map(
        feature_fn, xl[0].reshape(-1, bs, *xl[0].shape[1:])
    ).reshape(-1, fdim), xl[1]))(exp.dataset.batch(k, args.chunk)))
    for i in range(-(-n_pool // args.chunk)):
        f, lab = real_fn(jax.random.fold_in(key, i))
        real_feats.append(np.asarray(f))
        real_labels.append(np.asarray(lab))
    fr = np.concatenate(real_feats)
    lr = np.concatenate(real_labels)
    real_stats = stats_from_features(jnp.asarray(fr))
    print(f"[real] {fr.shape[0]} features", flush=True)

    table = {}

    def measure(name: str, method: str, d_vars, rcfg, arm_idx: int) -> None:
        srv = ServingSampler(exp.bundle, rcfg, method=method, mesh=exp.mesh)
        samples, labels, stats = srv.generate(
            g_vars, d_vars, jax.random.fold_in(key, 1000 + arm_idx), n_pool)
        ff = feats_of_u8(np.asarray(samples))
        lf = np.asarray(labels)[:ff.shape[0]]
        del samples
        res = per_class_fid(fr, lr, ff, lf, min_count=args.min_count)
        gfid = frechet_distance_host(
            stats_from_features(jnp.asarray(ff)), real_stats)
        counts = np.unique(lf, return_counts=True)[1]
        table[name] = {
            "intra_fid": res["intra_fid"],
            "intra_fid_classes": res["intra_fid_classes"],
            "global_fid": gfid,
            "pool": int(ff.shape[0]),
            "accept_rate": stats.get("accept_rate", 1.0),
            "samples_per_sec": stats.get("samples_per_sec"),
            "per_class_min": int(counts.min()),
            "per_class_mean": float(counts.mean()),
            # Full per-class map persisted so the cross-arm intersection
            # re-scoring (and any future re-quote) needs no rerun.
            "per_class": {str(c): round(float(v), 6)
                          for c, v in res["per_class"].items()},
        }
        print(json.dumps({"arm": name, **{
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in table[name].items() if k != "per_class"}}),
            flush=True)

    rcfg_t = dataclasses.replace(cfg.refine, steps=args.k, rate=args.rate)

    # standard: raw G(z), accept-all — the baseline arm.
    measure("standard", "standard", state.d_vars, rcfg_t, 0)

    # collab (tuned): shape D with the measured 40-batch protocol, then
    # serve under the fixed shaped D.
    res = exp.sample(state, method="collab", refine_cfg=rcfg_t)
    measure("collab", "collab", res.aux["shaped_d_vars"], rcfg_t, 1)

    # collab --safe: stop_score + shaping_target guards (its own shaped D —
    # the guard changes the shaping trajectory).
    rcfg_s = dataclasses.replace(rcfg_t, stop_score=0.5, shaping_target=0.5)
    res_s = exp.sample(state, method="collab", refine_cfg=rcfg_s)
    measure("collab:safe", "collab", res_s.aux["shaped_d_vars"], rcfg_s, 2)

    # Intersection re-scoring (VERDICT r3 weak 5): arms with rejection can
    # starve classes below min_count, so the per-arm means above average
    # over DIFFERENT class sets; the airtight comparison re-means every arm
    # over the common measured classes.
    from collaborative_gan_sampling_tpu.evals.fid import (
        intersection_intra_fid,
    )

    inter = intersection_intra_fid(
        {name: t["per_class"] for name, t in table.items()})
    print(json.dumps({"intersection": inter["intra_fid"],
                      "classes": inter["classes"]}), flush=True)

    result = {"preset": args.preset, "workdir": args.workdir,
              "step": int(state.step), "k": args.k, "rate": args.rate,
              "per_class_target": args.per_class,
              "min_count": args.min_count,
              "feature_net": exp._feature_label,
              "real_pool": int(fr.shape[0]),
              "intersection": inter,
              "table": table}
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "intra1000_it2000.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
