"""Converged-checkpoint study: the full method matrix + mitigation arms
at a truly converged flagship checkpoint, under a pool-size-fair eval.

Round 3 measured the first version of this study and found collab LOSING
at the it10000 ImageNet-64 checkpoint (standard 1.61/1.56 vs collab
3.03/3.57) — but with three methodological holes the round-3 verdict
called out (VERDICT r3 item 1 + weak 2/6):

* the final table had only {standard, collab} — no reject/refinement
  arms, so "is it the refinement, the DRS bias, or the shaping?" was
  unanswerable;
* collab ran with preset defaults — none of the repo's own prescribed
  mitigations for well-trained checkpoints (shaping_anchor, --safe
  guards, the gentle-shaping schedule that rescued CelebA it2000);
* both arms tuned to the (K, rate) grid's lowest corner, silently.

This version closes all three, plus one more this round found: the old
protocol scored each arm over ALL its accepted samples, so rejecting
arms (accept ~0.25) were scored on ~2.5k samples while standard arms got
~10k — and FID's small-sample bias is not negligible at that gap. Here
every arm is scored over the SAME number of accepted samples (streamed
through the production serving path until the pool fills), and the
pool-size bias itself is measured and reported (``pool_bias``: the
standard pool's FID at each truncation).

Arms per generator (plain / EMA), all at the per-generator tuned
(K, rate) from an auto-extending grid (select_hparams extend_grid):

    standard        raw G(z)
    reject          DRS only (k=0 decomposition arm)
    refinement      refine only, accept-all
    mhgan           MH-GAN chain baseline
    refine_reject   collab machinery with shaping disabled
    collab          refine + DRS + 40-batch shaping (measured protocol)
    collab:anchor   + shaping_anchor=1.0 (L2-SP trust region)
    collab:safe     + stop_score=0.5, shaping_target=0.5 (--safe recipe)
    collab:gentle   + shaping_lr=3e-5, shaping_decay=0.8 (CelebA rescue)

Collab-family arms shape D with the repo's measured 40-batch protocol
(one Experiment.sample pass), then serve the equal-size pool under the
FIXED shaped D — 'train once, shape once, serve many times', identical
to the intra-FID campaign's protocol. ``fid`` is the equal-pool number;
``fid_full_pool`` is the round-3-protocol number (all accepted samples
of the 40-batch pass) kept for cross-round continuity. The MH-GAN arm
fills its equal pool with repeated independent chain passes
(_campaign.mh_fill_pool — real-initialized chains that never accept a
G proposal are dropped by the leak guard, so one pass does NOT fill).

Finals are cached per (gen, method) in finals_<gen>.jsonl with the
protocol {preset, iters, pool, tuned} stamped on each record; rows
measured under a different protocol are skipped at load time instead of
silently reused (ADVICE r4). Arms that ignore the tuned (K, rate) —
standard, reject, mhgan — survive a tuned-cell change.

Usage:
  python benchmarks/quality_converged.py --preset imagenet64 \
      --iters 10000 --decay 0.999 --out runs/imagenet64_conv
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # The axon sitecustomize pins jax_platforms via jax.config, which beats
    # the env var — honor an explicit CPU request through jax.config too.
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="imagenet64")
    p.add_argument("--iters", type=int, default=10000)
    p.add_argument("--decay", type=float, default=0.999)
    p.add_argument("--ks", type=int, nargs="+", default=[1, 2, 5, 10, 20])
    p.add_argument("--rates", type=float, nargs="+",
                   default=[0.0001, 0.0003, 0.001, 0.005, 0.01, 0.03])
    p.add_argument("--extend-grid", type=int, default=2,
                   help="select_hparams auto-extension budget when the "
                        "tuned cell lands on a grid edge")
    p.add_argument("--pool", type=int, default=10000,
                   help="accepted-sample pool size every arm is scored on")
    p.add_argument("--arms", nargs="+", default=None,
                   help="subset of method arms to run (default: all)")
    p.add_argument("--gens", nargs="+", default=["plain", "ema"],
                   choices=["plain", "ema"],
                   help="generator arms to run (plain / ema); finals for "
                        "gens NOT run are still merged into the output "
                        "from their finals_<gen>.jsonl cache")
    p.add_argument("--out", default="runs/imagenet64_conv")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from collaborative_gan_sampling_tpu.config import get_preset
    from collaborative_gan_sampling_tpu.pipeline import Experiment
    from collaborative_gan_sampling_tpu.sampling.serve import ServingSampler
    from collaborative_gan_sampling_tpu.training.gan import sampling_g_vars
    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )
    from collaborative_gan_sampling_tpu.utils.retry import with_retries

    enable_compile_cache()

    def finals_cache_path(gen: str) -> str:
        return os.path.join(args.out, f"finals_{gen}.jsonl")

    # Arms whose measurement ignores the tuned (K, rate): standard is the
    # raw G(z) pool, reject is DRS on raw G(z) (no refinement), mhgan uses
    # only mh_chain_len/batch geometry. Every other arm refines, so its
    # cached final is stale the moment the tuned cell changes (e.g. a grid
    # extension moving the optimum) and must be invalidated (ADVICE r4).
    TUNE_FREE = ("standard", "reject", "mhgan")

    def load_finals(gen: str, tuned_kr: dict | None = None) -> dict:
        """arm-name -> full result row, from the per-arm finals cache (a
        campaign interrupted mid-finals loses at most the current arm).

        Each record carries the protocol it was measured under
        ({preset, iters, pool, tuned}); rows from a different protocol —
        a rerun in the same --out with a different checkpoint depth, pool
        size, or tuned cell — are skipped with a note instead of silently
        reused under the new invocation's metadata (ADVICE r4)."""
        rows = {}
        path = finals_cache_path(gen)
        if os.path.exists(path):
            with open(path) as fh:
                for line in fh:
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue  # torn tail line from a killed writer
                    proto = rec.get("protocol")
                    if proto is None:
                        print(f"[finals] {gen}:{rec['method']}: unstamped "
                              "legacy cache row — skipping (re-measure or "
                              "stamp its protocol)", flush=True)
                        continue
                    want = {"preset": args.preset, "iters": args.iters,
                            "pool": args.pool}
                    mism = [k for k, v in want.items()
                            if proto.get(k) != v]
                    if (rec["method"] not in TUNE_FREE
                            and tuned_kr is not None
                            and proto.get("tuned") != tuned_kr):
                        mism.append("tuned")
                    if mism:
                        print(f"[finals] {gen}:{rec['method']}: cached "
                              f"under different {'/'.join(mism)} "
                              f"({ {k: proto.get(k) for k in mism} }) — "
                              "skipping", flush=True)
                        continue
                    rows[rec["method"]] = rec["row"]
        return rows

    def append_final(gen: str, method: str, row: dict,
                     tuned_kr: dict | None) -> None:
        import fcntl

        rec = {"method": method, "row": row,
               "protocol": {"preset": args.preset, "iters": args.iters,
                            "pool": args.pool, "tuned": tuned_kr}}
        with open(finals_cache_path(gen), "a") as fh:
            fcntl.flock(fh, fcntl.LOCK_EX)
            try:
                fh.write(json.dumps(rec) + "\n")
                fh.flush()
            finally:
                fcntl.flock(fh, fcntl.LOCK_UN)

    exps = {}
    for name, decay in [("plain", 0.0), ("ema", args.decay)]:
        if name not in args.gens:
            continue
        cfg = get_preset(args.preset)
        cfg = cfg.replace(
            workdir=os.path.join(args.out, name),
            train=dataclasses.replace(cfg.train, niters=args.iters,
                                      g_ema_decay=decay))
        exp = Experiment(cfg, echo_metrics=False)
        state = exp.load_or_train()
        exps[name] = (exp, state, cfg)
        print(f"[converged {args.preset}] {name} arm at step "
              f"{int(state.step)}", flush=True)

    # One feature net / real-stats protocol for every number in the table
    # (feature nets are data-keyed, not model-keyed, so this is exact).
    ref_exp = next(iter(exps.values()))[0]
    metric = "kl" if ref_exp.is_2d else "fid"

    def equal_pool_eval(exp, state, method: str, d_vars, rcfg,
                        arm_idx: int):
        """FID over exactly `--pool` accepted samples, streamed through
        the serving path under a FIXED d_vars (float samples — same
        quantization as every grid/final eval in the repo)."""
        srv = ServingSampler(exp.bundle, rcfg, method=method, mesh=exp.mesh)
        key = jax.random.fold_in(jax.random.PRNGKey(777), arm_idx)
        samples, _, stats = srv.generate(sampling_g_vars(state), d_vars,
                                         key, args.pool,
                                         quantize_images=False)
        fid = ref_exp.fid_of_samples(jnp.asarray(samples[:args.pool]))
        out = {"fid": fid, "pool": int(min(args.pool, samples.shape[0])),
               "accept_rate": stats.get("accept_rate", 1.0),
               "samples_per_sec": stats.get("samples_per_sec")}
        return out, samples

    table, grids, tuned = {}, {}, {}
    pool_bias = {}
    for name, (exp, state, cfg) in exps.items():
        cfg_t = cfg.replace(eval=dataclasses.replace(
            cfg.eval, fid_num_samples=2048))
        exp_t = Experiment(cfg_t, echo_metrics=False)
        if not ref_exp.is_2d:  # 2D evals are closed-form, no feature net
            exp_t.adopt_eval_caches(ref_exp)  # feature space only
        (best_k, best_rate), grid = exp_t.select_hparams(
            state, ks=list(args.ks), rates=list(args.rates),
            method="collab", progress=True,
            extend_grid=args.extend_grid,
            cache_path=os.path.join(args.out, f"grid_{name}.jsonl"))
        tuned[name] = {"k": best_k, "rate": best_rate}
        grids[name] = {f"k={k},rate={r}": m for (k, r), m in grid.items()}
        print(f"[converged] {name} arm tuned (K, rate) = "
              f"({best_k}, {best_rate})", flush=True)

        rcfg_t = dataclasses.replace(cfg.refine, steps=best_k,
                                     rate=best_rate)
        r = dataclasses.replace
        # (method for the 40-batch pass, refine cfg, serve under shaped D?)
        variants = {
            "standard": ("standard", rcfg_t),
            "reject": ("reject", rcfg_t),
            "refinement": ("refinement", rcfg_t),
            "mhgan": ("mhgan", rcfg_t),
            "refine_reject": ("collab", r(rcfg_t, shape_every=0)),
            "collab": ("collab", rcfg_t),
            "collab:anchor": ("collab", r(rcfg_t, shaping_anchor=1.0)),
            "collab:safe": ("collab", r(rcfg_t, stop_score=0.5,
                                        shaping_target=0.5)),
            "collab:gentle": ("collab", r(rcfg_t, shaping_lr=3e-5,
                                          shaping_decay=0.8)),
        }
        if args.arms:
            variants = {k: v for k, v in variants.items() if k in args.arms}

        done = load_finals(name, tuned[name])
        # Seed the table from EVERY validated cached final of this gen (not
        # just the --arms subset) so an interrupted-then-narrowed rerun
        # never drops completed arms from the merged output (ADVICE r4).
        for vname, vrow in done.items():
            table[f"{name}:{vname}"] = vrow
        for arm_idx, (vname, (method, rcfg)) in enumerate(variants.items()):
            if vname in done:
                print(f"[converged] {name}:{vname} (cached)", flush=True)
                continue

            def run_final(vname=vname, method=method, rcfg=rcfg,
                          arm_idx=arm_idx):
                # 40-batch measured protocol: shapes D for collab arms and
                # provides the round-3-continuity full-pool number.
                res = exp.sample(state, method=method, refine_cfg=rcfg)
                full = ref_exp.evaluate(res)
                row = {f"{k}_full_pool" if k == metric else k: v
                       for k, v in full.items()}
                row["accept_rate_full_pool"] = row.pop("accept_rate",
                                                       res.accept_rate)
                if ref_exp.is_2d:
                    # 2D metrics are per-sample means — no pool-size bias;
                    # the 40-batch pass IS the measurement.
                    row[metric] = full[metric]
                    return row
                # Equal-pool protocol: serve under the FIXED (shaped) D.
                d_vars = (res.aux.get("shaped_d_vars", state.d_vars)
                          if method == "collab" else state.d_vars)
                serve_method = ("collab" if method == "collab"
                                else method)
                if serve_method == "mhgan":
                    # Serving has no MH chains; fill the equal pool with
                    # repeated independent chain passes. (The round-4
                    # version truncated ONE pass under an "accept-all, so
                    # it fills" comment that was false: real-initialized
                    # chains that never accept a G proposal are dropped by
                    # the real-data leak guard — see mh_fill_pool's
                    # docstring for the mechanism.)
                    from benchmarks._campaign import mh_fill_pool

                    samples, passes, total = mh_fill_pool(
                        exp, state, rcfg, args.pool, initial=res,
                        seed=31337 + arm_idx)
                    row["fid"] = ref_exp.fid_of_samples(
                        jnp.asarray(samples))
                    row["pool"] = int(samples.shape[0])
                    row["mh_passes"] = passes
                    row["mh_total_accepted"] = total
                    return row
                eq, samples = equal_pool_eval(exp, state, serve_method,
                                              d_vars, rcfg, arm_idx)
                row.update(eq)
                if vname == "standard" and name == "plain":
                    # Pool-size bias curve: the confound the round-3 table
                    # carried, measured on the best-understood pool.
                    for n_t in (2048, 2560, 5120, args.pool):
                        pool_bias[str(n_t)] = ref_exp.fid_of_samples(
                            jnp.asarray(samples[:n_t]))
                    print("[pool_bias] " + json.dumps(
                        {k: round(v, 4) for k, v in pool_bias.items()}),
                        flush=True)
                return row

            table[f"{name}:{vname}"] = with_retries(
                run_final, label=f"final {name}:{vname}")
            append_final(name, vname, table[f"{name}:{vname}"],
                         tuned[name])
            print(json.dumps({
                "arm": name, "method": vname,
                **{k: round(v, 4) for k, v in table[f"{name}:{vname}"]
                   .items() if isinstance(v, (int, float)) and k in (
                       metric, f"{metric}_full_pool", "accept_rate",
                       "pool")}}), flush=True)

    # Merge finals for generator arms NOT run this invocation (their
    # caches are the canonical record of completed arms), and carry
    # forward tuned/grids/pool_bias from an earlier artifact so a
    # --gens-partial rerun never erases measured results.
    path = os.path.join(args.out, f"converged_it{args.iters}.json")
    prev_table = {}
    if os.path.exists(path):
        with open(path) as fh:
            prev = json.load(fh)
        if (prev.get("preset"), prev.get("pool")) == (args.preset,
                                                      args.pool):
            for cur, prev_d in ((tuned, prev.get("tuned", {})),
                                (grids, prev.get("grids", {}))):
                for k, v in prev_d.items():
                    cur.setdefault(k, v)
            if not pool_bias:
                pool_bias = prev.get("pool_bias", {})
            prev_table = prev.get("table", {})
        else:
            print(f"[converged] NOT merging {path}: measured under "
                  f"preset={prev.get('preset')} pool={prev.get('pool')}",
                  flush=True)
    for gen in ("plain", "ema"):
        if gen not in args.gens:
            for vname, row in load_finals(gen, tuned.get(gen)).items():
                table.setdefault(f"{gen}:{vname}", row)
    for k, v in prev_table.items():
        table.setdefault(k, v)
    result = {"preset": args.preset, "niters": args.iters,
              "decay": args.decay, "pool": args.pool, "metric": metric,
              "tuned": tuned, "pool_bias": pool_bias, "grids": grids,
              "table": table}
    os.makedirs(args.out, exist_ok=True)
    with open(path, "w") as fh:
        json.dump(result, fh, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
