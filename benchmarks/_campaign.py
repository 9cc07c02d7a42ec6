"""Shared helpers for the quality-campaign runner scripts.

Each benchmarks/quality_*.py measures one question on one checkpoint
within one process (same feature net, same fixed procedural stream —
only within-run orderings are comparable across processes; BASELINE.md).
This module holds the common setup/run/save plumbing.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def floats(csv: str) -> list[float]:
    return [float(s) for s in csv.split(",")]


def make_experiment(preset: str, iters: int, workdir: str, **train_kw):
    """Build the Experiment on `workdir`'s checkpoint (trains if absent)."""
    from collaborative_gan_sampling_tpu.config import get_preset
    from collaborative_gan_sampling_tpu.pipeline import Experiment
    from collaborative_gan_sampling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    cfg = get_preset(preset)
    cfg = cfg.replace(workdir=workdir,
                      train=dataclasses.replace(cfg.train, niters=iters,
                                                **train_kw))
    exp = Experiment(cfg, echo_metrics=False)
    return exp, exp.load_or_train(), cfg


def mh_fill_pool(exp, state, rcfg, pool: int, initial=None,
                 seed: int = 31337, max_passes: int = 25):
    """Accepted MH-GAN pool of >= `pool` samples via repeated independent
    chain passes; returns (samples[<=pool], passes, total_accepted).

    MH-GAN has no persistent serving program (sampling/serve.py: chains
    re-walk the proposal history per batch), so the equal-pool protocol
    cannot stream it through ServingSampler. And a single
    ``exp.sample(method='mhgan')`` pass does NOT fill its candidate count:
    chains are REAL-initialized (Turner et al.'s calibration variant), and
    a chain that never accepts a G proposal still holds its real
    initializer — emitting it would leak training data into the scored
    pool, so those chains are dropped (the real-init guard in
    sampling/collab.py::_sample_mhgan). That drop is the round-4 "chain
    truncation": one 40x256 pass on the ImageNet-64 it10000 checkpoint
    kept only 4,874 of 10,240 candidates. Pool fairness therefore needs
    more passes, not truncation of one.
    """
    import jax
    import numpy as np

    from collaborative_gan_sampling_tpu.pipeline import Experiment

    pools, total, passes = [], 0, 0
    if initial is not None:
        s, _ = Experiment._accepted_pool(initial)
        pools.append(np.asarray(jax.device_get(s)))
        total += int(s.shape[0])
        passes += 1
    while total < pool and passes < max_passes:
        res = exp.sample(
            state, method="mhgan", refine_cfg=rcfg,
            key=jax.random.fold_in(jax.random.PRNGKey(seed), passes))
        s, _ = Experiment._accepted_pool(res)
        pools.append(np.asarray(jax.device_get(s)))
        total += int(s.shape[0])
        passes += 1
        print(f"[mh_fill_pool] pass {passes}: {total}/{pool} accepted",
              flush=True)
    samples = np.concatenate(pools)[:pool]
    return samples, passes, total


class Runner:
    """Accumulates named (method, refine_cfg) cells into a results table."""

    def __init__(self, exp, state):
        self.exp, self.state = exp, state
        self.table: dict[str, dict] = {}

    def run(self, name: str, method: str, rcfg=None) -> dict:
        res = self.exp.sample(self.state, method=method, refine_cfg=rcfg)
        m = self.exp.evaluate(res)
        self.table[name] = m
        print(json.dumps({"method": name, "fid": round(m["fid"], 4),
                          "accept": round(res.accept_rate, 3)}), flush=True)
        return m

    def save(self, out_dir: str, filename: str) -> str:
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, filename)
        with open(path, "w") as fh:
            json.dump(self.table, fh, indent=2)
        print(f"wrote {path}")
        return path
