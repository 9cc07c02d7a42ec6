"""Experiment orchestration: wires config -> data -> models -> train ->
sample -> eval.

This is the layer the reference spreads across its per-experiment
``main*.py`` scripts (SURVEY.md section 3 call stacks); here it is one
reusable `Experiment` object used by the CLI, the benchmark harness
(bench.py) and the tests. Phases mirror the reference's modes:

* ``train``     — GAN training with periodic logging/checkpoints (3.1/3.3)
* ``sample``    — any of the five strategies on a restored ckpt (3.2)
* ``benchmark`` — the method-comparison matrix (3.5)
* ``evaluate``  — 2D metrics or FID (3.4)
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp

from collaborative_gan_sampling_tpu.config import Config
from collaborative_gan_sampling_tpu.data import (
    load_image_dataset,
    make_mixture,
    sample_mixture,
)
from collaborative_gan_sampling_tpu.evals import metrics_2d
from collaborative_gan_sampling_tpu.evals.features import make_feature_fn
from collaborative_gan_sampling_tpu.evals.fid import streaming_stats
from collaborative_gan_sampling_tpu.models import GANBundle, make_bundle
from collaborative_gan_sampling_tpu.parallel.mesh import make_mesh, replicate
from collaborative_gan_sampling_tpu.sampling import METHODS, SampleResult, sample
from collaborative_gan_sampling_tpu.training import (
    TrainState,
    create_train_state,
    make_train_chunk,
    sampling_g_vars,
)
from collaborative_gan_sampling_tpu.utils.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from collaborative_gan_sampling_tpu.utils.logging import MetricsWriter
from collaborative_gan_sampling_tpu.utils.prng import step_key
from collaborative_gan_sampling_tpu.utils.retry import with_retries


def shaped_d_path(workdir: str) -> str:
    """Where a workdir's persisted shaped discriminator lives (single
    source of truth — Experiment and `cli inspect` both use this)."""
    return os.path.join(workdir, "shaped_d.msgpack")


def _append_cache_line(cache_path: str, cell: tuple, metrics: dict) -> None:
    """Append one grid-cell record under an exclusive lock: concurrent
    writers sharing a cache_path (two arms of a campaign) must not
    interleave or tear JSONL lines."""
    import fcntl

    with open(cache_path, "a") as fh:
        fcntl.flock(fh, fcntl.LOCK_EX)
        try:
            fh.write(json.dumps({"cell": list(cell),
                                 "metrics": metrics}) + "\n")
            fh.flush()
        finally:
            fcntl.flock(fh, fcntl.LOCK_UN)


def _grid_edges(best: tuple, ks: list, rates: list) -> list[str]:
    """Which swept (K, rate) axes the best cell sits on the boundary of.

    Returns a subset of ["k:low", "k:high", "rate:low", "rate:high"];
    axes with a single value are never boundaries (nothing was swept).
    K's hard floor of 1 is not a boundary either — there is nothing
    below it to miss."""
    edges = []
    k, rate = best[0], best[1]
    if len(set(ks)) > 1:
        if k == min(ks) and k > 1:
            edges.append("k:low")
        elif k == max(ks):
            edges.append("k:high")
    if len(set(rates)) > 1:
        if rate == min(rates):
            edges.append("rate:low")
        elif rate == max(rates):
            edges.append("rate:high")
    return edges


def _extend_axis(vals: list, side: str, integer: bool) -> int | float | None:
    """One geometric step past the low/high edge of a sorted-able grid
    axis (log-space extrapolation of the edge ratio). Returns None when
    the axis cannot extend further (K's floor of 1, or a degenerate
    ratio)."""
    s = sorted(set(vals))
    if len(s) < 2:
        return None
    if side == "low":
        new = s[0] * (s[0] / s[1])
    else:
        new = s[-1] * (s[-1] / s[-2])
    if integer:
        new = max(1, int(round(new)))
        return new if new not in s else None
    new = float(f"{new:.6g}")
    return new if new not in s and new > 0 else None


class Experiment:
    def __init__(self, cfg: Config, use_mesh: bool = False,
                 echo_metrics: bool = True):
        self.cfg = cfg.validate()
        self.bundle: GANBundle = make_bundle(cfg.model)
        self.base_key = jax.random.PRNGKey(cfg.seed)
        self.workdir = cfg.workdir
        self.ckpt_dir = os.path.join(cfg.workdir, "ckpts")
        self.mesh = (make_mesh(cfg.mesh.data_axis)
                     if use_mesh and len(jax.devices()) > 1 else None)
        if self.mesh is not None:
            n = self.mesh.size
            for name, bs in (("train.batch_size", cfg.train.batch_size),
                             ("refine.batch_size", cfg.refine.batch_size),
                             ("eval.fid_batch_size",
                              cfg.eval.fid_batch_size)):
                if bs % n:
                    raise ValueError(
                        f"{name}={bs} is not divisible by the {n}-device "
                        "data mesh; batch-axis sharding needs equal "
                        "per-device shards")
        self._echo = echo_metrics

        self.is_2d = cfg.model.kind == "mlp"
        if self.is_2d:
            self.spec = make_mixture(cfg.data.dataset, cfg.data.ring_radius,
                                     cfg.data.mixture_std)

            def data_fn(key, n):
                return sample_mixture(key, self.spec, n), None
        else:
            self.dataset = load_image_dataset(cfg.data,
                                              image_size=cfg.model.image_size)
            if (self.bundle.conditional
                    and self.dataset.num_classes > cfg.model.num_classes):
                # Real-batch labels would index past G/D's embedding tables
                # (out-of-bounds gather -> silent garbage -> NaN training).
                raise ValueError(
                    f"model.num_classes={cfg.model.num_classes} is smaller "
                    f"than the dataset's {self.dataset.num_classes} classes "
                    f"({self.dataset.name}); label embeddings would be "
                    "indexed out of bounds. Match model.num_classes to the "
                    "dataset (or use an unconditional model).")

            def data_fn(key, n):
                imgs, labels = self.dataset.batch(key, n)
                if not self.bundle.conditional:
                    labels = None
                return imgs, labels

        self.data_fn: Callable = data_fn

    # -- training -----------------------------------------------------------

    def train(self, niters: int | None = None, resume: bool = True,
              state: TrainState | None = None) -> TrainState:
        cfg = self.cfg
        niters = niters if niters is not None else cfg.train.niters
        if state is None:
            state = create_train_state(self.bundle, cfg.train, self.base_key)
            if resume:
                path = latest_checkpoint(self.ckpt_dir)
                if path:
                    state = restore_checkpoint(path, target=state,
                                               config=cfg)
        if self.mesh is not None:
            state = replicate(self.mesh, state)
        chunk = make_train_chunk(self.bundle, cfg.train, self.data_fn,
                                 self.base_key, mesh=self.mesh)
        spc = cfg.train.steps_per_call
        writer = MetricsWriter(os.path.join(self.workdir, "train.jsonl"),
                               echo=self._echo,
                               tensorboard_dir=(os.path.join(self.workdir,
                                                             "tb")
                                                if cfg.train.tensorboard
                                                else None),
                               # From-scratch runs truncate: a retrain must
                               # not append a second step sequence after a
                               # stale one (steps stay monotonic for any
                               # by-step consumer); resumes keep appending.
                               append=int(state.step) > 0)
        import time as _time
        tail_chunk = None
        try:
            while int(state.step) < niters:
                t0 = _time.perf_counter()
                remaining = niters - int(state.step)
                if remaining < spc:
                    # Tail chunk: don't overshoot niters (one extra compile).
                    if tail_chunk is None:
                        tail_chunk = make_train_chunk(
                            self.bundle, cfg.train, self.data_fn,
                            self.base_key, mesh=self.mesh,
                            steps_per_call=remaining)
                    state, metrics = tail_chunk(state)
                else:
                    state, metrics = chunk(state)
                step = int(state.step)  # host sync: chunk fully materialized
                steps_run = min(remaining, spc)  # tail chunk runs < spc
                iters_per_s = steps_run / (_time.perf_counter() - t0)
                if step % max(spc, cfg.train.log_every) < spc or step >= niters:
                    writer.write(step, phase="train",
                                 iters_per_s=round(iters_per_s, 2), **metrics)
                if cfg.train.ckpt_every and (
                        step % cfg.train.ckpt_every < spc or step >= niters):
                    save_checkpoint(self.ckpt_dir, step, state, config=cfg)
                if cfg.train.viz_every and step % cfg.train.viz_every < spc:
                    self._training_viz(state, step)
        finally:
            writer.close()
        return state

    def load_state(self) -> TrainState:
        """Restore the latest training checkpoint (the sampling phases'
        entry condition, like the reference's Saver.restore)."""
        state = create_train_state(self.bundle, self.cfg.train, self.base_key)
        path = latest_checkpoint(self.ckpt_dir)
        if path is None:
            raise FileNotFoundError(
                f"no checkpoint under {self.ckpt_dir}; run train first")
        state = restore_checkpoint(path, target=state, config=self.cfg)
        if self.mesh is not None:
            state = replicate(self.mesh, state)
        return state

    def load_or_train(self, niters: int | None = None) -> TrainState:
        """Trained state at the configured iteration count: restore the
        latest checkpoint, resuming training if it is behind
        (train.niters or the ``niters`` override). Silently returning a
        behind checkpoint mislabels every downstream metric — to evaluate
        an intermediate checkpoint, set train.niters to its step (the
        campaign runners' convention)."""
        target = niters if niters is not None else self.cfg.train.niters
        try:
            state = self.load_state()
        except FileNotFoundError:
            return self.train(niters=niters)
        if int(state.step) < target:
            print(f"[load_or_train] checkpoint at step {int(state.step)} < "
                  f"niters {target}; resuming training", flush=True)
            return self.train(niters=niters)
        return state

    # -- sampling -----------------------------------------------------------

    def sample(self, state: TrainState, method: str | None = None,
               key: jax.Array | None = None,
               use_shaped_d: bool = False,
               refine_cfg=None) -> SampleResult:
        """Run a sampling strategy. With use_shaped_d, refinement runs under
        a previously-saved shaped discriminator (save_shaped_d) — the
        'train once, shape once, refine many times' path. `refine_cfg`
        overrides cfg.refine (used by the K-sweep)."""
        key = key if key is not None else step_key(self.base_key, 0, "eval")
        d_vars = state.d_vars
        if use_shaped_d:
            d_vars = self.load_shaped_d(template=state.d_vars)
        cond_fn = None
        if (self.bundle.conditional
                and getattr(getattr(self, "dataset", None), "labels", None)
                is not None):
            cond_fn = self.dataset.batch_by_labels
        return sample(self.bundle, sampling_g_vars(state), d_vars,
                      refine_cfg or self.cfg.refine, key, method=method,
                      data_fn=self.data_fn, mesh=self.mesh,
                      cond_data_fn=cond_fn)

    def generate(self, state: TrainState, n: int,
                 method: str | None = None, use_shaped_d: bool = False,
                 key: jax.Array | None = None, out: str | None = None,
                 class_id: int | None = None):
        """Serving entry (the production path): stream >= n ACCEPTED samples
        through the compile-once ServingSampler (sampling/serve.py).

        For method='collab', serving needs a shaped discriminator: it is
        loaded from the workdir when one was persisted (save_shaped_d) or
        `use_shaped_d` is set; otherwise one collab pass shapes D first and
        persists it — 'train once, shape once, serve many times'.
        Returns (samples, labels|None, stats); with `out`, also writes an
        .npz with the samples (+labels) and records the path in stats.
        """
        from collaborative_gan_sampling_tpu.sampling.serve import (
            ServingSampler,
        )
        method = method or self.cfg.refine.method
        key = key if key is not None else step_key(self.base_key, 9, "eval")
        d_vars = state.d_vars
        if method == "collab":
            if use_shaped_d or os.path.exists(self._shaped_d_path()):
                d_vars = self.load_shaped_d(template=state.d_vars)
            else:
                res = self.sample(state, method="collab",
                                  key=jax.random.fold_in(key, 0))
                self.save_shaped_d(res)
                d_vars = res.aux["shaped_d_vars"]
        elif use_shaped_d:
            # Honor the flag for every method (as sample() does): serving
            # refinement/rejection under a previously shaped D is the
            # 'train once, shape once, refine many times' path.
            d_vars = self.load_shaped_d(template=state.d_vars)
        srv = ServingSampler(self.bundle, self.cfg.refine, method=method,
                             mesh=self.mesh, class_id=class_id)
        samples, labels, stats = srv.generate(
            sampling_g_vars(state), d_vars, jax.random.fold_in(key, 1), n)
        if out:
            import numpy as np
            arrays = {"samples": samples}
            if labels is not None:
                arrays["labels"] = labels
            np.savez(out, **arrays)
            stats["out"] = out
        return samples, labels, stats

    def export(self, state: TrainState, out: str,
               method: str | None = None, use_shaped_d: bool = False,
               platforms: tuple[str, ...] | None = None,
               class_id: int | None = None, key: jax.Array | None = None,
               ) -> dict:
        """AOT serving export (sampling/export.py): serialize the serving
        round — weights, DRS calibration and (for collab) the shaped D
        baked in — to a self-contained StableHLO artifact at `out`.
        Shaped-D handling mirrors generate(): load it, or shape-and-persist
        on first use. Returns the sidecar meta dict."""
        from collaborative_gan_sampling_tpu.sampling.export import (
            export_sampler,
        )
        from collaborative_gan_sampling_tpu.sampling.serve import (
            ServingSampler,
        )
        method = method or self.cfg.refine.method
        key = key if key is not None else step_key(self.base_key, 11, "eval")
        d_vars = state.d_vars
        if method == "collab":
            if use_shaped_d or os.path.exists(self._shaped_d_path()):
                d_vars = self.load_shaped_d(template=state.d_vars)
            else:
                res = self.sample(state, method="collab",
                                  key=jax.random.fold_in(key, 0))
                self.save_shaped_d(res)
                d_vars = res.aux["shaped_d_vars"]
        elif use_shaped_d:
            d_vars = self.load_shaped_d(template=state.d_vars)
        srv = ServingSampler(self.bundle, self.cfg.refine, method=method,
                             mesh=None, class_id=class_id)
        return export_sampler(srv, sampling_g_vars(state), d_vars,
                              jax.random.fold_in(key, 1), out,
                              platforms=platforms)

    def fid_refine(self, state: TrainState, key: jax.Array | None = None,
                   steps: int | None = None,
                   rate: float | None = None) -> SampleResult:
        """FID-backprop refinement (arXiv:2009.14075): refine G samples by
        descending the differentiable Frechet distance to the real stats —
        a beyond-reference capability (sampling/fid_refine.py)."""
        from collaborative_gan_sampling_tpu.sampling.fid_refine import (
            make_fid_refine_fn,
        )

        key = key if key is not None else step_key(self.base_key, 3, "eval")
        cfg = self.cfg.refine
        refine = make_fid_refine_fn(self._feature_fn(), self.real_stats(),
                                    steps or cfg.steps, rate or cfg.rate)

        @jax.jit
        def run(g_vars, d_vars, key):
            def body(carry, i):
                k = jax.random.fold_in(key, i)
                k_z, k_lab = jax.random.split(k)
                z = self.bundle.sample_z(k_z, cfg.batch_size)
                labels = (self.bundle.sample_labels(k_lab, cfg.batch_size)
                          if self.bundle.conditional else None)
                x0 = self.bundle.generate(g_vars, z, labels, train=False)
                x, aux = refine(x0)
                logits = self.bundle.discriminate(d_vars, x, labels,
                                                  train=False)
                out_labels = (labels if labels is not None
                              else jnp.zeros((), jnp.int32))
                return carry, (x, logits, aux["fid_end"], out_labels)

            _, outs = jax.lax.scan(body, None, jnp.arange(cfg.num_batches))
            return outs

        xs, logits, fids, labels = run(sampling_g_vars(state),
                                       state.d_vars, key)
        samples = xs.reshape((-1,) + xs.shape[2:])
        labels = (labels.reshape(-1) if self.bundle.conditional else None)
        return SampleResult(samples, jnp.ones(samples.shape[0], bool),
                            logits.reshape(-1), labels,
                            {"batch_fid_end": jnp.mean(fids)})

    def sweep(self, state: TrainState, ks: list[int],
              method: str = "refinement") -> dict[int, dict]:
        """Refinement-depth sweep k in `ks` (BASELINE config 5). Feature net
        and real-data stats are computed once and reused across k; each k is
        one compiled program (static scan length)."""
        import dataclasses

        out = {}
        for k in ks:
            rcfg = dataclasses.replace(self.cfg.refine, steps=k)
            res = self.sample(state, method=method, refine_cfg=rcfg)
            out[k] = self.evaluate(res)
        return out

    # -- shaped-D persistence (C11 + C15) -----------------------------------

    def _shaped_d_path(self) -> str:
        return shaped_d_path(self.workdir)

    def save_shaped_d(self, result: SampleResult) -> str:
        """Persist the shaped discriminator a collab run produced, so later
        refinement/rejection runs reuse it without re-shaping."""
        from flax import serialization

        shaped = result.aux.get("shaped_d_vars")
        if shaped is None:
            raise ValueError("result has no shaped_d_vars "
                             "(only collab sampling shapes D)")
        path = self._shaped_d_path()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        blob = serialization.msgpack_serialize(
            serialization.to_state_dict(jax.device_get(shaped)))
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, path)
        return path

    def load_shaped_d(self, template: Any):
        from flax import serialization

        path = self._shaped_d_path()
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"no shaped discriminator at {path}; run collab sampling "
                "and save_shaped_d first")
        with open(path, "rb") as fh:
            raw = serialization.msgpack_restore(fh.read())
        return serialization.from_state_dict(dict(template), raw)

    # -- evaluation ---------------------------------------------------------

    def evaluate_2d(self, result: SampleResult) -> dict[str, float]:
        m = metrics_2d(result.samples, self.spec,
                       hq_std=self.cfg.eval.hq_std,
                       weights=result.accepted.astype(jnp.float32))
        out = {k: float(v) for k, v in m.items()}
        out["accept_rate"] = result.accept_rate
        return out

    def _feature_fn(self):
        if not hasattr(self, "_cached_feature_fn"):
            spec = self.cfg.eval.feature_net
            labels = getattr(getattr(self, "dataset", None), "labels", None)
            if spec == "auto" and not self.is_2d and labels is not None:
                # Labelled image data: train a small classifier and use its
                # penultimate features — far more discriminative than random
                # projections (lower FID noise floor). Seconds on TPU.
                from collaborative_gan_sampling_tpu.evals.features import (
                    train_classifier_features,
                )
                num_classes = int(jax.device_get(labels.max())) + 1

                def labelled_fn(key, n):
                    return self.dataset.batch(key, n)

                self._cached_feature_fn, _ = train_classifier_features(
                    labelled_fn, num_classes, self.bundle.data_shape,
                    steps=self.cfg.eval.feature_train_steps,
                    seed=self.cfg.seed)
                self._feature_label = "trained_classifier"
            elif spec == "auto" and not self.is_2d:
                # Unlabeled image data: self-supervised RotNet features —
                # random projections cannot resolve FID differences here.
                from collaborative_gan_sampling_tpu.evals.features import (
                    train_rotation_features,
                )

                def unlabelled_fn(key, n):
                    x, _ = self.data_fn(key, n)
                    return x

                self._cached_feature_fn, _ = train_rotation_features(
                    unlabelled_fn, self.bundle.data_shape,
                    steps=self.cfg.eval.feature_train_steps,
                    seed=self.cfg.seed)
                self._feature_label = "rotnet"
            else:
                self._cached_feature_fn, self._feature_label = \
                    make_feature_fn(spec, self.bundle.data_shape,
                                    seed=self.cfg.seed)
        return self._cached_feature_fn

    def adopt_eval_caches(self, src: "Experiment",
                          include_real_stats: bool | None = None) -> None:
        """Adopt `src`'s trained feature net (and optionally its real-data
        FID stats) so two Experiments over the same data evaluate in the
        same feature space without retraining — the campaign runners'
        within-run-comparability pattern, centralized.

        The real stats are REAL-SIDE only and depend on eval.fid_num_samples
        / fid_batch_size; with the default (None) they are adopted only when
        both configs agree on those, and requesting them explicitly under a
        mismatch raises instead of silently mislabeling the eval protocol."""
        self._cached_feature_fn = src._feature_fn()
        self._feature_label = src._feature_label
        same_protocol = (
            src.cfg.eval.fid_num_samples == self.cfg.eval.fid_num_samples
            and src.cfg.eval.fid_batch_size == self.cfg.eval.fid_batch_size)
        if include_real_stats is None:
            include_real_stats = same_protocol
        if include_real_stats:
            if not same_protocol:
                raise ValueError(
                    "adopt_eval_caches(include_real_stats=True) across "
                    "different eval protocols: src has "
                    f"{src.cfg.eval.fid_num_samples}/"
                    f"{src.cfg.eval.fid_batch_size} samples/batch, self has "
                    f"{self.cfg.eval.fid_num_samples}/"
                    f"{self.cfg.eval.fid_batch_size} — the real-side stats "
                    "would mislabel the protocol")
            if hasattr(src, "_real_stats"):
                self._real_stats = src._real_stats

    def real_stats(self, key: jax.Array | None = None):
        """(mu, Sigma) of the real data under the feature net — computed
        once and cached in-process; with eval.real_stats_path additionally
        persisted to / loaded from an npz (the reference's precomputed-stats
        pattern, SURVEY.md C13 — pytorch-fid key conventions accepted, so
        externally computed Inception stats drop in)."""
        if not hasattr(self, "_real_stats"):
            import os

            from collaborative_gan_sampling_tpu.evals.fid import (
                load_stats,
                save_stats,
            )

            cfg = self.cfg.eval
            key = key if key is not None else step_key(self.base_key, 1,
                                                       "eval")
            feature_fn = self._feature_fn()
            if cfg.real_stats_path and os.path.exists(cfg.real_stats_path):
                stats, label = load_stats(cfg.real_stats_path)
                if label and label != self._feature_label:
                    raise ValueError(
                        f"{cfg.real_stats_path} was computed under feature "
                        f"net {label!r} but this run uses "
                        f"{self._feature_label!r} — FID across feature nets "
                        "is meaningless; recompute or fix eval.feature_net")
                fdim = jax.eval_shape(
                    feature_fn,
                    jax.ShapeDtypeStruct(
                        (1, *self.bundle.data_shape), jnp.float32)).shape[-1]
                if stats.mu.shape[0] != fdim:
                    raise ValueError(
                        f"{cfg.real_stats_path}: stats are {stats.mu.shape[0]}"
                        f"-dim but the feature net emits {fdim}-dim features")
                self._real_stats = stats
                return self._real_stats
            nb = max(1, cfg.fid_num_samples // cfg.fid_batch_size)

            def real_batch(k, n):
                x, _ = self.data_fn(k, n)
                return x

            self._real_stats = jax.jit(
                lambda k: streaming_stats(feature_fn, real_batch, nb,
                                          cfg.fid_batch_size, k))(key)
            if cfg.real_stats_path:
                save_stats(cfg.real_stats_path,
                           jax.device_get(self._real_stats),
                           feature_net=self._feature_label)
        return self._real_stats

    @staticmethod
    def _accepted_pool(result: SampleResult, n: int | None = None
                       ) -> tuple[jax.Array, jax.Array | None]:
        """Host-compacted accepted subset (samples, labels|None), first-n.

        The single place the accepted-mask compaction lives: every eval
        path shares one definition of "the pool being scored" (and one
        empty-pool shape to guard against)."""
        samples, labels = result.samples, result.labels
        if result.accepted is not None:
            mask = jax.device_get(result.accepted).astype(bool)
            samples = jax.device_get(samples)[mask]
            if labels is not None:
                labels = jax.device_get(labels)[mask]
        samples = jnp.asarray(samples)
        if n is not None:
            samples = samples[:n]
            if labels is not None:
                labels = jnp.asarray(labels)[:n]
        return samples, (jnp.asarray(labels) if labels is not None else None)

    def _feats_of(self, x: jax.Array, bs: int) -> tuple[jax.Array, int]:
        """Batched feature extraction: (features, rows_used). `bs` must be
        in [1, x.shape[0]] — callers guard empty pools first."""
        feature_fn = self._feature_fn()
        m = (x.shape[0] // bs) * bs
        f = jax.lax.map(feature_fn, x[:m].reshape(-1, bs, *x.shape[1:]))
        return f.reshape(-1, f.shape[-1]), m

    def fid_of_samples(self, samples: jax.Array,
                       accepted: jax.Array | None = None) -> float:
        """FID between the real stats and a pool of samples (optionally the
        accepted subset — host-compacted then re-batched)."""
        from collaborative_gan_sampling_tpu.evals.fid import (
            stats_from_features,
        )
        self._feature_fn()
        if accepted is not None:
            mask = jax.device_get(accepted).astype(bool)
            samples = jax.device_get(samples)[mask]
        samples = jnp.asarray(samples)
        if samples.shape[0] == 0:
            # Nothing accepted (e.g. aggressive gamma): FID is undefined;
            # +inf keeps sweeps/tuners well-ordered instead of crashing.
            return float("inf")
        bs = min(self.cfg.eval.fid_batch_size, samples.shape[0])
        feats, _ = self._feats_of(samples, bs)
        stats = stats_from_features(feats)
        # eval.newton_schulz_iters > 0 selects the on-device all-matmul
        # Newton-Schulz cross term (MXU path, f32); the default (0) is the
        # f64 host eigh path — f32 cannot resolve FIDs that are ~1e-5 of the
        # covariance trace (see frechet_distance_host).
        ns_iters = self.cfg.eval.newton_schulz_iters
        if ns_iters > 0:
            from collaborative_gan_sampling_tpu.evals.fid import (
                frechet_distance,
            )
            return float(jax.jit(frechet_distance, static_argnums=2)(
                stats, self.real_stats(), ns_iters))
        from collaborative_gan_sampling_tpu.evals.fid import (
            frechet_distance_host,
        )
        return frechet_distance_host(stats, self.real_stats())

    def evaluate(self, result: SampleResult) -> dict[str, float]:
        if self.is_2d:
            return self.evaluate_2d(result)
        self._feature_fn()  # ensure label exists
        out = {"fid": self.fid_of_samples(result.samples, result.accepted),
               "accept_rate": result.accept_rate,
               "feature_net": self._feature_label}
        if self.cfg.eval.prd_samples > 0:
            out.update(self.precision_recall(result))
        if self.cfg.eval.kid_subsets > 0:
            out.update(self.kid(result))
        if (self.cfg.eval.intra_fid_classes > 0 and self.bundle.conditional
                and result.labels is not None):
            out.update(self.intra_fid(result))
        return out

    def intra_fid(self, result: SampleResult, n: int | None = None
                  ) -> dict[str, float]:
        """Per-class FID averaged over the eval.intra_fid_classes most
        frequent classes (evals/fid.per_class_fid) — the conditional-GAN
        metric global FID cannot substitute for."""
        from collaborative_gan_sampling_tpu.evals.fid import per_class_fid

        ecfg = self.cfg.eval
        n = n or ecfg.fid_num_samples
        self._feature_fn()
        samples, labels_f = self._accepted_pool(result, n)
        if samples.shape[0] == 0:
            # Empty accepted pool: undefined, +inf (same contract as FID).
            return {"intra_fid": float("inf"), "intra_fid_classes": 0.0}
        key = step_key(self.base_key, 5, "eval")
        x_real, labels_r = self.dataset.batch(key, min(n, samples.shape[0]))
        bs = min(ecfg.fid_batch_size, samples.shape[0], x_real.shape[0])
        fr, mr = self._feats_of(x_real, bs)
        ff, mf = self._feats_of(samples, bs)
        res = per_class_fid(fr, labels_r[:mr], ff, labels_f[:mf],
                            min_count=ecfg.intra_fid_min_count,
                            max_classes=ecfg.intra_fid_classes)
        return {"intra_fid": res["intra_fid"],
                "intra_fid_classes": res["intra_fid_classes"]}

    def kid(self, result: SampleResult, n: int | None = None
            ) -> dict[str, float]:
        """Kernel Inception Distance (arXiv:1801.01401) over the same
        feature space as FID — unbiased, reliable at small sample counts
        (evals/kid.py). Mean/std over eval.kid_subsets random subsets."""
        from collaborative_gan_sampling_tpu.evals.kid import kid

        ecfg = self.cfg.eval
        n = n or ecfg.fid_num_samples
        self._feature_fn()
        samples, _ = self._accepted_pool(result, n)
        if samples.shape[0] < 2:
            return {"kid": float("inf"), "kid_std": 0.0}
        key = step_key(self.base_key, 4, "eval")
        x_real, _ = self.data_fn(key, min(n, samples.shape[0]))
        bs = min(ecfg.fid_batch_size, samples.shape[0], x_real.shape[0])

        mean, std = jax.jit(
            lambda a, b, k: kid(self._feats_of(a, bs)[0],
                                self._feats_of(b, bs)[0], k,
                                n_subsets=ecfg.kid_subsets,
                                subset_size=ecfg.kid_subset_size)
        )(x_real, samples, jax.random.fold_in(key, 1))
        return {"kid": float(mean), "kid_std": float(std)}

    def precision_recall(self, result: SampleResult,
                         n: int | None = None) -> dict[str, float]:
        """Improved precision/recall (arXiv:1904.06991) over the same
        feature space as FID: precision = realism of accepted samples,
        recall = coverage of the real distribution (the image-space
        analogue of the paper's %HQ / mode-coverage pair)."""
        from collaborative_gan_sampling_tpu.evals.prd import (
            precision_recall,
        )

        n = n or self.cfg.eval.prd_samples or 2048
        self._feature_fn()
        samples, _ = self._accepted_pool(result, n)
        if samples.shape[0] <= self.cfg.eval.prd_k:
            # k-NN radii are undefined for pools of <= k points (an
            # aggressive-gamma run can accept almost nothing): report zero
            # realism/coverage rather than crashing or the trivial 1.0.
            return {"precision": 0.0, "recall": 0.0}
        key = step_key(self.base_key, 3, "eval")
        x_real, _ = self.data_fn(key, n)
        bs = min(self.cfg.eval.fid_batch_size, samples.shape[0], n)

        pr = jax.jit(lambda a, b: precision_recall(
            self._feats_of(a, bs)[0], self._feats_of(b, bs)[0],
            k=self.cfg.eval.prd_k))(x_real, samples)
        return {k: float(v) for k, v in pr.items()}

    def _training_viz(self, state: TrainState, step: int) -> None:
        """Periodic training visuals (the reference's every-100-steps sample
        grid / decision-surface dumps — SURVEY.md sections 3.1/3.3)."""
        key = step_key(self.base_key, step, "eval")
        n = 64
        z = self.bundle.sample_z(key, n)
        labels = (self.bundle.sample_labels(jax.random.fold_in(key, 1), n)
                  if self.bundle.conditional else None)
        x = self.bundle.generate(state.g_vars, z, labels, train=False)
        if self.is_2d:
            from collaborative_gan_sampling_tpu.viz import plot_2d_overview

            x_real, _ = self.data_fn(jax.random.fold_in(key, 2), 512)
            plot_2d_overview(
                os.path.join(self.workdir, f"viz_{step:08d}.png"),
                self.bundle, state.d_vars, self.spec, x_real, x,
                title=f"step {step}")
        else:
            from collaborative_gan_sampling_tpu.viz import save_image_grid

            save_image_grid(
                os.path.join(self.workdir, f"samples_{step:08d}.png"), x)

    # -- profiling ----------------------------------------------------------

    def profile(self, state: TrainState | None = None,
                chunks: int = 3) -> str:
        """Capture a jax.profiler trace of train chunks + one refinement run
        (SURVEY.md section 5.1); view with TensorBoard/XProf."""
        from collaborative_gan_sampling_tpu.utils.profiling import trace

        state = state if state is not None else self.load_or_train()
        chunk = make_train_chunk(self.bundle, self.cfg.train, self.data_fn,
                                 self.base_key, mesh=self.mesh)
        state, m = chunk(state)  # compile outside the trace
        jax.block_until_ready(m)
        logdir = os.path.join(self.workdir, "trace")
        with trace(logdir):
            for _ in range(chunks):
                with jax.profiler.StepTraceAnnotation("train_chunk"):
                    state, m = chunk(state)
            jax.block_until_ready(m)
            with jax.profiler.StepTraceAnnotation("refinement"):
                res = self.sample(state, method="refinement")
            jax.block_until_ready(res.samples)
        return logdir

    # -- teaser / viz -------------------------------------------------------

    def teaser(self, state: TrainState | None = None,
               n_points: int = 256) -> dict[str, str]:
        """C17: refinement-trajectory + overview figures for the 2D stack."""
        if not self.is_2d:
            raise ValueError("teaser is a 2D-stack artifact")
        import dataclasses

        from collaborative_gan_sampling_tpu.sampling.refine import (
            make_refine_fn,
        )
        from collaborative_gan_sampling_tpu.viz import (
            plot_2d_overview,
            plot_refinement_trajectories,
        )

        state = state if state is not None else self.load_or_train()
        key = step_key(self.base_key, 2, "eval")
        rcfg = dataclasses.replace(self.cfg.refine, use_pallas=False)
        refine = jax.jit(make_refine_fn(self.bundle, rcfg,
                                        return_trajectory=True))
        z = self.bundle.sample_z(key, n_points)
        x0 = self.bundle.generate(sampling_g_vars(state), z)
        x_k, aux = refine(state.d_vars, x0)
        x_real, _ = self.data_fn(jax.random.fold_in(key, 1), n_points * 4)
        from collaborative_gan_sampling_tpu.viz import save_teaser_gif

        traj_path = plot_refinement_trajectories(
            os.path.join(self.workdir, "teaser_trajectories.png"),
            aux["traj"], self.spec)
        overview_path = plot_2d_overview(
            os.path.join(self.workdir, "overview.png"), self.bundle,
            state.d_vars, self.spec, x_real, x0, x_k,
            title=f"{self.cfg.name} @ step {int(state.step)}")
        gif_path = save_teaser_gif(
            os.path.join(self.workdir, "teaser.gif"), aux["traj"], self.spec)
        return {"trajectories": traj_path, "overview": overview_path,
                "gif": gif_path}

    def select_k(self, state: TrainState, ks: list[int] | None = None,
                 method: str = "refinement",
                 metric: str | None = None) -> tuple[int, dict[int, dict]]:
        """Auto-select the refinement depth K by validation metric.

        The K-sweep shows a per-checkpoint optimum (BASELINE.md): too few
        steps under-refine, too many over-refine. Runs `sweep` over `ks`
        (default 1..50 log-spaced) and returns (best_k, full table), where
        best minimizes FID (images) or mode-KL (2D)."""
        ks = ks or [1, 2, 5, 10, 20, 50]
        metric = metric or ("kl" if self.is_2d else "fid")
        table = self.sweep(state, ks, method=method)
        best_k = min(table, key=lambda k: table[k][metric])
        return best_k, table

    def select_hparams(self, state: TrainState,
                       ks: list[int] | None = None,
                       rates: list[float] | None = None,
                       method: str = "refinement",
                       metric: str | None = None,
                       objectives: list[str] | None = None,
                       spaces: list[str] | None = None,
                       stops: list[float] | None = None,
                       proxs: list[float] | None = None,
                       progress: bool = False,
                       cache_path: str | None = None,
                       extend_grid: int = 0,
                       ) -> tuple[tuple, dict]:
        """Joint (K, rate[, objective][, space]) auto-tuning by validation
        metric (VERDICT r1 item 2): the paper's finding is that refinement
        depth and step size must be tuned *per checkpoint* — a rate that
        helps an imperfect G over-shoots a well-trained one. The objective
        axis (ns/kl/saturating) and the space axis (x-space vs DGflow
        latent drift — note z wants ~5-10x larger rates than x, so pass a
        grid spanning both scales) are optional; both measured material
        wins at the MNIST it1000 checkpoint (−4% and −32%, BASELINE.md).
        Feature net + real stats are built once; each grid cell is one
        compiled program (K static, rate baked).

        Returns ((best_k, best_rate), {(k, rate): metrics}) — with
        `objectives`/`spaces`/`stops`/`proxs` the cells extend to
        (k, rate[, obj][, space][, stop][, prox]) in that order. The
        `stops` axis tunes the per-sample early-stop threshold
        (stop_score); `proxs` tunes the DOT-style proximity cost
        (refine.proximal) — both cap the over-shoot that otherwise forces
        the (K, rate) grid to extreme corners at well-trained
        checkpoints.

        A best cell on the edge of the swept (K, rate) grid means the true
        optimum is plausibly outside it (the round-3 converged study tuned
        both arms to the grid's lowest corner and nobody noticed): a
        boundary optimum always prints a warning, and with
        ``extend_grid`` > 0 the grid auto-extends geometrically past the
        offending edge up to that many times until the optimum is
        interior."""
        import dataclasses

        ks = list(ks or [1, 5, 10, 20])
        rates = list(rates if rates is not None
                     else self._default_rate_grid())
        metric = metric or ("kl" if self.is_2d else "fid")
        with_obj = objectives is not None
        with_space = spaces is not None
        with_stop = stops is not None
        with_prox = proxs is not None
        objs = objectives if with_obj else [self.cfg.refine.objective]
        spcs = spaces if with_space else [
            getattr(self.cfg.refine, "space", "x")]
        stps = stops if with_stop else [
            getattr(self.cfg.refine, "stop_score", 0.0)]
        prxs = proxs if with_prox else [
            getattr(self.cfg.refine, "proximal", 0.0)]
        # Per-cell JSONL cache: long grids on the tunneled backend must
        # survive relay drops — a restarted grid skips finished cells.
        # Malformed lines (a torn concurrent append) are skipped, not fatal;
        # later duplicates win.
        cached: dict[tuple, dict] = {}
        if cache_path and os.path.exists(cache_path):
            with open(cache_path) as fh:
                for line in fh:
                    try:
                        rec = json.loads(line)
                        cached[tuple(rec["cell"])] = rec["metrics"]
                    except (json.JSONDecodeError, KeyError, TypeError):
                        continue
        table: dict[tuple, dict] = {}

        def run_cells(ks_now: list, rates_now: list) -> None:
            for prox in prxs:
                for stop in stps:
                    for space in spcs:
                        for obj in objs:
                            for rate in rates_now:
                                for k in ks_now:
                                    cell = (k, rate)
                                    cell += (obj,) if with_obj else ()
                                    cell += (space,) if with_space else ()
                                    cell += (stop,) if with_stop else ()
                                    cell += (prox,) if with_prox else ()
                                    if cell in table:
                                        continue
                                    if cell in cached:
                                        table[cell] = cached[cell]
                                        if progress:
                                            print(
                                                f"[select_hparams] {cell} "
                                                f"(cached) -> {metric}="
                                                f"{table[cell][metric]:.4f}",
                                                flush=True)
                                        continue
                                    rcfg = dataclasses.replace(
                                        self.cfg.refine, steps=k, rate=rate,
                                        objective=obj, space=space,
                                        stop_score=stop, proximal=prox)

                                    def run_cell(rcfg=rcfg):
                                        res = self.sample(state,
                                                          method=method,
                                                          refine_cfg=rcfg)
                                        return self.evaluate(res)

                                    t0 = time.perf_counter()
                                    table[cell] = with_retries(
                                        run_cell, label=f"grid {cell}")
                                    cell_s = time.perf_counter() - t0
                                    if cache_path:
                                        _append_cache_line(
                                            cache_path, cell, table[cell])
                                    if progress:
                                        print(f"[select_hparams] {cell} -> "
                                              f"{metric}="
                                              f"{table[cell][metric]:.4f} "
                                              f"({cell_s:.0f}s)",
                                              flush=True)

        extensions = 0
        while True:
            run_cells(ks, rates)
            best = min(table, key=lambda kr: table[kr][metric])
            edges = _grid_edges(best, ks, rates)
            if not edges:
                break
            if extensions >= extend_grid:
                print(f"[select_hparams] WARNING: best cell {best} lies on "
                      f"the {'/'.join(edges)} edge of the swept grid — the "
                      "true optimum is plausibly outside it (pass "
                      "extend_grid>0 to auto-extend)", flush=True)
                break
            grew = False
            for edge in edges:
                axis, side = edge.split(":")
                vals = ks if axis == "k" else rates
                new = _extend_axis(vals, side, integer=(axis == "k"))
                if new is not None:
                    vals.append(new)
                    vals.sort()
                    grew = True
                    if progress:
                        print(f"[select_hparams] extending {axis} grid "
                              f"{side} -> {new}", flush=True)
            if not grew:  # e.g. K already at its floor of 1
                break
            extensions += 1
        return best, table

    def _default_rate_grid(self) -> list[float]:
        """Half-decade grid bracketing the preset's rate."""
        base = self.cfg.refine.rate
        return [round(base * m, 6) for m in (0.25, 0.5, 1.0, 2.0, 4.0)]

    # -- benchmark matrix ---------------------------------------------------

    def benchmark(self, state: TrainState,
                  methods: tuple[str, ...] = METHODS) -> dict[str, dict]:
        """The reference's mode=='benchmark': all strategies side by side."""
        writer = MetricsWriter(os.path.join(self.workdir, "benchmark.jsonl"),
                               echo=self._echo)
        table = {}
        for method in methods:
            res = self.sample(state, method=method)
            table[method] = self.evaluate(res)
            writer.write(int(state.step), phase="benchmark", method=method,
                         **table[method])
        writer.close()
        return table
