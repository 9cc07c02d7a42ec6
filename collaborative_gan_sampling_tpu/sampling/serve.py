"""Serving path — persistent, compile-once sample generation.

The one-shot samplers in sampling/collab.py build and jit their whole
program per call (the right shape for experiments: every call is a fresh
strategy run). A production server has the opposite profile: ONE (G, D)
pair, calibrated once, then an open-ended stream of "give me a batch of
accepted samples" requests. Re-tracing per request would dominate latency.

`ServingSampler` builds the per-round program once:

    z -> G -> [K-step refinement] -> D logits -> [DRS accept]

jitted a single time; every subsequent `round()` re-enters the same
compiled executable (same shapes, new PRNG key). DRS calibration (the
burn-in logit max M) runs once up front and is carried as a plain array
argument, so recalibrating against a newly shaped D is also free.

Method semantics (serving view of SURVEY.md C12's matrix):

    standard     raw G(z); accept-all
    refinement   refine; accept-all
    reject       DRS on raw G(z)
    collab       refine + DRS under a SHAPED discriminator — shaping is a
                 *calibration-time* activity (the reference defines collab
                 sampling as a post-training phase, and its shaped D is
                 reusable: Experiment.save_shaped_d). The caller passes the
                 shaped d_vars; this module does not mutate D per request,
                 which is what makes the compiled program reusable.

MH-GAN is not offered here: its chains re-walk the proposal history per
batch and gain nothing from a persistent program; use sampling.sample.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from collaborative_gan_sampling_tpu.config import RefineConfig
from collaborative_gan_sampling_tpu.data.images import denormalize_images
from collaborative_gan_sampling_tpu.models import GANBundle
from collaborative_gan_sampling_tpu.parallel.mesh import constrain_batch
from collaborative_gan_sampling_tpu.sampling.refine import make_draw_refine_fn
from collaborative_gan_sampling_tpu.sampling.rejection import (
    drs_accept_mask,
    estimate_logit_max,
    estimate_logit_max_per_class,
)

SERVING_METHODS = ("standard", "refinement", "reject", "collab")


class ServingSampler:
    """Compile-once sampler for one (bundle, RefineConfig, method) triple.

    Usage:
        srv = ServingSampler(bundle, cfg, method="collab", mesh=mesh)
        m = srv.calibrate(g_vars, shaped_d_vars, key)      # burn-in, once
        x, labels, acc, logits = srv.round(g_vars, shaped_d_vars, m, key)
        samples, labels, stats = srv.generate(g_vars, d_vars, key, n=100_000)
    """

    def __init__(self, bundle: GANBundle, cfg: RefineConfig,
                 method: str = "collab", mesh=None,
                 class_id: int | None = None):
        if method not in SERVING_METHODS:
            raise ValueError(
                f"serving supports {SERVING_METHODS}, not {method!r}")
        if class_id is not None and not bundle.conditional:
            raise ValueError("class_id needs a conditional model")
        if class_id is not None and not 0 <= class_id < bundle.num_classes:
            raise ValueError(
                f"class_id {class_id} out of range [0, {bundle.num_classes})")
        self.bundle = bundle
        self.cfg = cfg
        self.method = method
        self.mesh = mesh
        self.class_id = class_id
        self._refine_on = method in ("refinement", "collab")
        self._reject_on = method in ("reject", "collab")
        self._per_class = (bool(getattr(cfg, "per_class_drs", False))
                           and bundle.conditional)
        self._draw_refine = (make_draw_refine_fn(bundle, cfg, mesh)
                             if self._refine_on else None)
        self._round = jax.jit(self._build_round())
        self._calibrate = jax.jit(self._build_calibrate())

    # -- program builders ---------------------------------------------------

    def _labels_for(self, key: jax.Array, n: int) -> jax.Array | None:
        """Random labels, or every-sample `class_id` for targeted serving."""
        if not self.bundle.conditional:
            return None
        if self.class_id is not None:
            return jnp.full((n,), self.class_id, jnp.int32)
        return self.bundle.sample_labels(key, n)

    def _draw_score(self, g_vars: Any, d_vars: Any, key: jax.Array,
                    n: int):
        """One candidate batch + its final logits (refined when enabled)."""
        k_z, k_lab = jax.random.split(key)
        labels = self._labels_for(k_lab, n)
        if self._refine_on:
            return self._draw_refine(g_vars, d_vars, key, n, labels=labels)
        z = constrain_batch(self.mesh, self.bundle.sample_z(k_z, n))
        x = self.bundle.generate(g_vars, z, labels, train=False)
        logits = self.bundle.discriminate(d_vars, x, labels, train=False)
        return x, labels, logits

    def _build_calibrate(self):
        cfg = self.cfg

        def calibrate(g_vars, d_vars, key):
            if not self._reject_on:
                return jnp.float32(0.0)

            def burn(k, n):
                x, labels, _ = self._draw_score(g_vars, d_vars, k, n)
                return x, labels

            if self._per_class:
                return estimate_logit_max_per_class(
                    self.bundle, d_vars, burn, key, cfg.burn_in,
                    cfg.batch_size, self.bundle.num_classes)
            return estimate_logit_max(self.bundle, d_vars, burn, key,
                                      cfg.burn_in, cfg.batch_size)

        return calibrate

    def _build_round(self):
        cfg = self.cfg

        def round_fn(g_vars, d_vars, m, key):
            def body(carry, i):
                k = jax.random.fold_in(key, i)
                k_draw, k_acc = jax.random.split(k)
                x, labels, logits = self._draw_score(g_vars, d_vars, k_draw,
                                                     cfg.batch_size)
                if self._reject_on:
                    if self._per_class:
                        eff, eff_m = logits - m[labels], jnp.float32(0.0)
                    else:
                        eff, eff_m = logits, m
                    acc = drs_accept_mask(k_acc, eff, eff_m, cfg.gamma,
                                          cfg.eps_drs, cfg.gamma_percentile,
                                          use_pallas=cfg.use_pallas)
                else:
                    acc = jnp.ones(logits.shape, bool)
                lab = (labels if labels is not None
                       else jnp.zeros((), jnp.int32))
                return carry, (x, lab, acc, logits)

            _, (xs, labels, acc, logits) = jax.lax.scan(
                body, None, jnp.arange(cfg.num_batches))
            flat = lambda a: a.reshape((-1,) + a.shape[2:])  # noqa: E731
            return (flat(xs),
                    flat(labels) if self.bundle.conditional else None,
                    acc.reshape(-1), logits.reshape(-1))

        return round_fn

    # -- public API ---------------------------------------------------------

    def calibrate(self, g_vars: Any, d_vars: Any,
                  key: jax.Array) -> jax.Array:
        """Burn-in DRS calibration (no-op scalar for accept-all methods)."""
        return self._calibrate(g_vars, d_vars, key)

    def round(self, g_vars: Any, d_vars: Any, m: jax.Array,
              key: jax.Array):
        """One compiled serving round: (samples, labels|None, accept, logits)
        with cfg.num_batches * cfg.batch_size candidates."""
        return self._round(g_vars, d_vars, m, key)

    def _build_compact(self, cap: int, quantize: bool):
        """Jitted on-device compaction: gather the first `cap` accepted rows
        so the host transfer is O(accepted), not O(candidates) — on tunneled
        / remote PJRT backends the device->host fetch, not the compute, is
        the serving bottleneck (minimise host<->device transfers). Images
        are optionally quantized to uint8 on device (4x less traffic; what
        a production image service stores anyway)."""

        def compact(x, labels, acc):
            # nonzero(size=cap) lists the true indices first, then pads —
            # the first `count` gathered rows are exactly the accepted ones.
            idx = jnp.nonzero(acc, size=cap, fill_value=0)[0]
            count = jnp.minimum(jnp.sum(acc.astype(jnp.int32)), cap)
            x_sel = x[idx]
            if quantize:
                # The canonical float->uint8 transform (rounds, unlike a bare
                # astype truncation) so served pixels match eval/viz exactly.
                x_sel = denormalize_images(x_sel)
            lab_sel = labels[idx] if labels is not None else None
            return x_sel, lab_sel, count

        return jax.jit(compact)

    def generate(self, g_vars: Any, d_vars: Any, key: jax.Array, n: int,
                 max_rounds: int = 1000, quantize_images: bool = True):
        """Stream rounds until >= n accepted samples.

        Returns (samples[n], labels[n]|None, stats). Image samples are
        returned uint8 [0, 255] by default (quantize_images — done on
        device, before the host fetch); 2D/flat samples stay float32.
        Compile time is excluded from the reported throughput (one-time
        serving cost; steady-state rate is the serving-relevant number).
        """
        quantize = quantize_images and len(self.bundle.data_shape) == 3
        k_cal, k_serve = jax.random.split(key)
        m = self.calibrate(g_vars, d_vars, k_cal)
        per_round = self.cfg.num_batches * self.cfg.batch_size
        # Warm-up round: compiles the executable AND measures the accept
        # rate, which sizes the static compaction buffer (30% headroom;
        # overflowing rounds just contribute `cap` samples — the first-k of
        # an iid accepted set is still unbiased).
        x0, lab0, acc0, _ = self.round(g_vars, d_vars, m,
                                       jax.random.fold_in(k_serve, 0))
        rate0 = float(jnp.mean(acc0.astype(jnp.float32)))
        cap = min(per_round, max(64, int(per_round * (1.3 * rate0 + 0.05))))
        compact = self._build_compact(cap, quantize)

        xs, labs, total, rounds, overflow = [], [], 0, 0, 0

        def take(x, labels, acc):
            nonlocal total, rounds, overflow
            x_sel, lab_sel, count = compact(x, labels, acc)
            k = int(count)
            overflow += int(jnp.sum(acc.astype(jnp.int32))) - k
            xs.append(np.asarray(x_sel)[:k])
            if self.bundle.conditional:
                labs.append(np.asarray(lab_sel)[:k])
            total += k
            rounds += 1
            return k

        # The warm-up round's candidates are real accepted samples — keep
        # them (at a low accept rate a round is a large fraction of the
        # total work). Its wall time stays excluded from the throughput
        # stat, which reports the steady-state compiled rate.
        warm = take(x0, lab0, acc0)
        timed = 0
        t0 = time.perf_counter()
        while total < n:
            if rounds >= max_rounds:
                raise RuntimeError(
                    f"generate: {total}/{n} accepted after {rounds} rounds "
                    f"(accept rate too low — relax gamma/gamma_percentile)")
            x, labels, acc, _ = self.round(
                g_vars, d_vars, m, jax.random.fold_in(k_serve, rounds))
            timed += take(x, labels, acc)
        dt = time.perf_counter() - t0

        samples = np.concatenate(xs)[:n]
        out_labels = (np.concatenate(labs)[:n]
                      if self.bundle.conditional else None)
        stats = {
            "n": int(n),
            "rounds": int(rounds),
            "candidates": int(rounds * per_round),
            "accept_rate": float((total + overflow) / (rounds * per_round)),
            "overflow_dropped": int(overflow),
            "seconds": round(dt, 4),
            # Steady-state rate: accepted samples from the timed (post-
            # compile) rounds only. None when the warm-up round alone
            # satisfied n (no timed rounds ran).
            "samples_per_sec": (round(timed / dt, 1) if timed else None),
            "warmup_samples": int(warm),
            "dtype": "uint8" if quantize else "float32",
            "method": self.method,
        }
        return samples, out_labels, stats
