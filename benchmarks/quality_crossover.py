"""Collab-benefit vs checkpoint-quality crossover curve (VERDICT r3
item 2 — the definitive domain-of-validity measurement).

The paper's claim (arXiv:1902.00813) is that collaborative sampling
improves *imperfect* generators; the repo's campaign matrix brackets the
edge of that claim (MNIST it500 −43% ... it2000 −23% ... flagship
it10000 regression) but never measured it deliberately. This runner
does: ONE preset, ONE seed, checkpoints at several training depths from
a single training trajectory, and at every depth a per-checkpoint-tuned
collab arm vs the standard arm — locating the break-even depth where
collab's FID win crosses zero.

Protocol notes:
* one shared feature net + per-depth-shared real stats for every number
  (the within-run-comparability rule of every campaign runner);
* per-depth (K, rate) tuning by grid with auto-extension
  (select_hparams extend_grid — boundary optima chase themselves);
* final arms scored over EQUAL accepted-sample pools through the
  serving path (the pool-size-fair protocol of quality_converged.py);
* ``--safe`` arm included at each depth: the self-guarding recipe's
  whole pitch is robustness across exactly this axis;
* round 5 adds the full method matrix per depth (VERDICT r4 item 4):
  reject (pure DRS), refinement (accept-all), and mhgan arms, so the
  curve says WHICH component (rejection vs shaping vs drift) breaks
  first as D converges. MH fills its pool via _campaign.mh_fill_pool
  (chains are real-initialized; never-accepting chains are dropped by
  the leak guard, so one pass does not fill — see that docstring).

Each curve_cache.jsonl record is stamped with its measurement protocol
{preset, pool, ks, rates}; rows from a different protocol are skipped at
load (ADVICE r4). A cached depth row missing some arms (e.g. the round-4
three-arm rows) is BACKFILLED: the stored tuned (K, rate) is reused and
only the missing arms are measured, then an updated record is appended
(later records win on load).

Usage:
  python benchmarks/quality_crossover.py --preset celeba \
      --depths 500 1000 2000 4000 7000 10000 --out runs/celeba_crossover
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="celeba")
    p.add_argument("--depths", type=int, nargs="+",
                   default=[500, 1000, 2000, 4000, 7000, 10000])
    p.add_argument("--ks", type=int, nargs="+", default=[2, 5, 10, 20])
    p.add_argument("--rates", type=float, nargs="+",
                   default=[0.001, 0.005, 0.01, 0.03])
    p.add_argument("--extend-grid", type=int, default=2)
    p.add_argument("--pool", type=int, default=10000)
    p.add_argument("--fid-samples", type=int, default=2048,
                   help="tuning-grid FID pool (final arms use --pool)")
    p.add_argument("--out", default="runs/celeba_crossover")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from collaborative_gan_sampling_tpu.config import get_preset
    from collaborative_gan_sampling_tpu.pipeline import Experiment
    from collaborative_gan_sampling_tpu.sampling.serve import ServingSampler
    from collaborative_gan_sampling_tpu.training.gan import sampling_g_vars
    from collaborative_gan_sampling_tpu.utils.checkpoint import (
        save_checkpoint,
    )
    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )
    from collaborative_gan_sampling_tpu.utils.retry import with_retries

    enable_compile_cache()
    depths = sorted(args.depths)

    # -- One training trajectory, snapshotted at every depth ---------------
    base = get_preset(args.preset)
    train_dir = os.path.join(args.out, "train")
    states = {}
    cfg_train = base.replace(
        workdir=train_dir,
        train=dataclasses.replace(base.train, niters=depths[-1]))
    exp = Experiment(cfg_train, echo_metrics=False)
    state = None
    for d in depths:
        snap_dir = os.path.join(args.out, f"it{d}", "ckpts")
        cfg_d = cfg_train.replace(
            workdir=os.path.join(args.out, f"it{d}"),
            train=dataclasses.replace(cfg_train.train, niters=d))
        exp_d = Experiment(cfg_d, echo_metrics=False)
        try:
            states[d] = exp_d.load_state()
            state = states[d]
            print(f"[crossover] it{d}: snapshot restored", flush=True)
            continue
        except FileNotFoundError:
            pass
        state = exp.train(niters=d, state=state, resume=state is None)
        save_checkpoint(snap_dir, d, state, config=cfg_d)
        # Re-load the snapshot rather than aliasing `state`: the jitted
        # train chunk donates its input buffers, so continuing training
        # would delete any live reference to them.
        states[d] = exp_d.load_state()
        print(f"[crossover] it{d}: trained + snapshotted", flush=True)

    # -- Shared eval caches (one feature net; real stats per protocol) -----
    ref_exp = exp
    metric = "kl" if ref_exp.is_2d else "fid"
    if not ref_exp.is_2d:
        ref_exp._feature_fn()

    def serve_fid(exp_e, st, method, d_vars, rcfg, salt):
        srv = ServingSampler(exp_e.bundle, rcfg, method=method,
                             mesh=exp_e.mesh)
        samples, _, stats = srv.generate(
            sampling_g_vars(st), d_vars,
            jax.random.fold_in(jax.random.PRNGKey(4040), salt), args.pool,
            quantize_images=False)
        return {"fid": ref_exp.fid_of_samples(
                    jnp.asarray(samples[:args.pool])),
                "accept_rate": stats.get("accept_rate", 1.0)}

    # The full per-depth method matrix (SURVEY §3.5's benchmark mode laid
    # along the checkpoint-depth axis). Order matters only for reporting.
    ARMS = ("standard", "reject", "refinement", "mhgan", "collab",
            "collab_safe")

    # Per-depth result cache: a campaign interrupted mid-curve loses at
    # most the current depth, and the artifact is re-written after every
    # depth (same resumability contract as quality_converged.py finals).
    # Records are protocol-stamped; later records for a depth win (the
    # arm-backfill path appends an updated row).
    protocol = {"preset": args.preset, "pool": args.pool,
                "ks": list(args.ks), "rates": list(args.rates)}
    curve_cache = os.path.join(args.out, "curve_cache.jsonl")
    curve = {}
    if os.path.exists(curve_cache):
        with open(curve_cache) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue  # torn tail line from a killed writer
                proto = rec.get("protocol")
                if proto is None:
                    print(f"[crossover] it{rec['depth']}: unstamped legacy "
                          "cache row — skipping (re-measure or stamp its "
                          "protocol)", flush=True)
                    continue
                if proto != protocol:
                    mism = sorted(k for k in set(proto) | set(protocol)
                                  if proto.get(k) != protocol.get(k))
                    print(f"[crossover] it{rec['depth']}: cached under "
                          f"different {'/'.join(mism)} — skipping",
                          flush=True)
                    continue
                curve[str(rec["depth"])] = rec["row"]

    def append_cache(d: int, row: dict) -> None:
        import fcntl

        with open(curve_cache, "a") as fh:
            fcntl.flock(fh, fcntl.LOCK_EX)
            try:
                fh.write(json.dumps({"depth": d, "row": row,
                                     "protocol": protocol}) + "\n")
                fh.flush()
            finally:
                fcntl.flock(fh, fcntl.LOCK_UN)

    def write_artifact():
        result = {"preset": args.preset, "depths": depths,
                  "pool": args.pool, "metric": metric,
                  "arms": list(ARMS), "curve": curve}
        path = os.path.join(args.out, "crossover.json")
        with open(path, "w") as fh:
            json.dump(result, fh, indent=2)
        return path

    for di, d in enumerate(depths):
        cached_row = curve.get(str(d))
        missing = ([a for a in ARMS if a not in cached_row]
                   if cached_row is not None else list(ARMS))
        if cached_row is not None and not missing:
            print(f"[crossover] it{d} (cached)", flush=True)
            continue
        cfg_d = cfg_train.replace(
            workdir=os.path.join(args.out, f"it{d}"),
            train=dataclasses.replace(cfg_train.train, niters=d),
            eval=dataclasses.replace(cfg_train.eval,
                                     fid_num_samples=args.fid_samples))
        exp_t = Experiment(cfg_d, echo_metrics=False)
        if not ref_exp.is_2d:
            exp_t.adopt_eval_caches(ref_exp)
        if cached_row is None:
            (bk, br), grid = exp_t.select_hparams(
                states[d], ks=list(args.ks), rates=list(args.rates),
                method="collab", progress=True,
                extend_grid=args.extend_grid,
                cache_path=os.path.join(args.out, f"grid_it{d}.jsonl"))
            print(f"[crossover] it{d} tuned (K, rate) = ({bk}, {br})",
                  flush=True)
            row = {"tuned": {"k": bk, "rate": br},
                   "grid_cells": len(grid)}
        else:
            # Arm backfill: reuse the row's measured tuned cell — the
            # grid already ran under this exact protocol.
            row = dict(cached_row)
            bk, br = row["tuned"]["k"], row["tuned"]["rate"]
            print(f"[crossover] it{d}: backfilling {missing} at cached "
                  f"tuned ({bk}, {br})", flush=True)
        rcfg_t = dataclasses.replace(cfg_d.refine, steps=bk, rate=br)
        rcfg_s = dataclasses.replace(rcfg_t, stop_score=0.5,
                                     shaping_target=0.5)

        def run_arms(row=row, missing=missing, d=d, di=di, exp_t=exp_t,
                     rcfg_t=rcfg_t, rcfg_s=rcfg_s):
            st = states[d]
            if ref_exp.is_2d:
                specs = {"standard": ("standard", rcfg_t),
                         "reject": ("reject", rcfg_t),
                         "refinement": ("refinement", rcfg_t),
                         "mhgan": ("mhgan", rcfg_t),
                         "collab": ("collab", rcfg_t),
                         "collab_safe": ("collab", rcfg_s)}
                for arm in missing:
                    method, rc = specs[arm]
                    res = exp_t.sample(st, method=method, refine_cfg=rc)
                    row[arm] = ref_exp.evaluate(res)
                return row
            # Unshaped-D serving arms (salts 0/3/4; 1/2 are collab's).
            for arm, method, salt in (("standard", "standard", 0),
                                      ("reject", "reject", 3),
                                      ("refinement", "refinement", 4)):
                if arm in missing:
                    row[arm] = serve_fid(exp_t, st, method, st.d_vars,
                                         rcfg_t, 10 * di + salt)
            if "mhgan" in missing:
                from benchmarks._campaign import mh_fill_pool

                samples, passes, total = mh_fill_pool(
                    exp_t, st, rcfg_t, args.pool, seed=808 + di)
                row["mhgan"] = {"fid": ref_exp.fid_of_samples(
                                    jnp.asarray(samples)),
                                "pool": int(samples.shape[0]),
                                "mh_passes": passes,
                                "mh_total_accepted": total}
            for arm, rc, salt in (("collab", rcfg_t, 1),
                                  ("collab_safe", rcfg_s, 2)):
                if arm in missing:
                    res = exp_t.sample(st, method="collab", refine_cfg=rc)
                    shaped = res.aux.get("shaped_d_vars", st.d_vars)
                    row[arm] = serve_fid(exp_t, st, "collab", shaped, rc,
                                         10 * di + salt)
            return row

        curve[str(d)] = with_retries(run_arms, label=f"crossover it{d}")
        row = curve[str(d)]
        if metric in row.get("standard", {}):
            s = row["standard"][metric]
            for arm in ARMS[1:]:
                if metric in row.get(arm, {}):
                    row[f"{arm}_delta_pct"] = round(
                        100.0 * (row[arm][metric] - s) / s, 2)
        print(json.dumps({"depth": d, **{
            a: round(row[a][metric], 4) for a in ARMS
            if metric in row.get(a, {})},
            "delta_pct": row.get("collab_delta_pct")}), flush=True)
        append_cache(d, row)
        write_artifact()

    path = write_artifact()
    print(f"wrote {path}")

    # Companion figure: FID vs depth, standard / collab / collab_safe.
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6.5, 4.2))
        xs = depths
        for arm, style in (("standard", "o-"), ("reject", "v:"),
                           ("refinement", "d:"), ("mhgan", "x:"),
                           ("collab", "s-"), ("collab_safe", "^--")):
            ys = [curve.get(str(d), {}).get(arm, {}).get(metric)
                  for d in xs]
            if all(v is not None for v in ys):
                ax.plot(xs, ys, style, label=arm)
        ax.set_xscale("log")
        ax.set_xlabel("training iterations (checkpoint depth)")
        ax.set_ylabel(metric.upper())
        ax.set_title(f"{args.preset}: collab benefit vs checkpoint depth")
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "crossover.png"), dpi=150)
        print(f"wrote {os.path.join(args.out, 'crossover.png')}")
    except Exception as e:  # viz is best-effort
        print(f"crossover plot skipped: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
