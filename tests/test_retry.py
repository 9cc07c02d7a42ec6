"""Retry helper + grid-cell cache: resilience of long campaigns against
the tunneled backend's transient relay drops (utils/retry.py; the
select_hparams cache_path added after a 2h converged-study grid died to a
single dropped remote_compile response).

The reference never needed any of this (one local tf.Session); it is part
of the framework's failure-recovery subsystem (SURVEY §5.3).
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import pytest

from collaborative_gan_sampling_tpu.utils.retry import (
    is_transient_backend_error,
    with_retries,
)


class JaxRuntimeError(RuntimeError):
    """Stand-in matching jax's exception by __name__ (what the filter
    keys on), so the test does not have to fabricate a real XLA error."""


def test_with_retries_recovers_after_transient_errors():
    sleeps = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise JaxRuntimeError(
                "INTERNAL: http://127.0.0.1:8093/remote_compile: read "
                "body: response body closed before all bytes were read")
        return "ok"

    out = with_retries(flaky, retries=3, backoff_s=7.0,
                       _sleep=sleeps.append)
    assert out == "ok"
    assert calls["n"] == 3
    assert sleeps == [7.0, 14.0]  # linear backoff


def test_with_retries_gives_up_after_budget():
    def always_down():
        raise JaxRuntimeError("UNAVAILABLE: Socket closed")

    with pytest.raises(JaxRuntimeError):
        with_retries(always_down, retries=2, _sleep=lambda _: None)


def test_with_retries_propagates_non_transient_immediately():
    calls = {"n": 0}

    def broken():
        calls["n"] += 1
        raise ValueError("INTERNAL looking message on the wrong type")

    with pytest.raises(ValueError):
        with_retries(broken, retries=5, _sleep=lambda _: None)
    assert calls["n"] == 1  # never retried: wrong exception type


def test_transient_filter_requires_marker_and_type():
    assert is_transient_backend_error(
        JaxRuntimeError("INTERNAL: remote_compile failed"))
    # Right type, non-transient message (a real compile error):
    assert not is_transient_backend_error(
        JaxRuntimeError("RESOURCE_EXHAUSTED: out of VMEM"))
    assert not is_transient_backend_error(ValueError("INTERNAL"))


def test_select_hparams_cell_cache(tmp_path):
    """Second run with the same cache_path recomputes nothing: sampling is
    poisoned and the cached table still comes back identical."""
    from tests.test_pipeline import _tiny_toy_cfg
    from collaborative_gan_sampling_tpu.pipeline import Experiment

    cfg = _tiny_toy_cfg(tmp_path / "run")
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    cache = str(tmp_path / "grid.jsonl")
    best1, table1 = exp.select_hparams(state, ks=[1, 2], rates=[0.05],
                                       cache_path=cache)
    with open(cache) as fh:
        recs = [json.loads(line) for line in fh]
    assert {tuple(r["cell"]) for r in recs} == set(table1)

    def poisoned(*a, **k):
        raise AssertionError("cache miss: sample() was called")

    exp2 = Experiment(cfg, echo_metrics=False)
    exp2.sample = poisoned  # type: ignore[method-assign]
    best2, table2 = exp2.select_hparams(state, ks=[1, 2], rates=[0.05],
                                        cache_path=cache)
    assert best2 == best1
    for cell in table1:
        assert table2[cell]["kl"] == pytest.approx(table1[cell]["kl"])

    # A widened grid only computes the new cells (cache file grows by 1).
    exp3 = Experiment(cfg, echo_metrics=False)
    _, table3 = exp3.select_hparams(state, ks=[1, 2, 3], rates=[0.05],
                                    cache_path=cache)
    assert len(table3) == 3
    with open(cache) as fh:
        assert len(fh.readlines()) == 3


def test_select_hparams_retries_transient_cell(tmp_path, monkeypatch):
    """A transient backend error inside one grid cell is retried in place
    instead of killing the whole grid."""
    from tests.test_pipeline import _tiny_toy_cfg
    from collaborative_gan_sampling_tpu.pipeline import Experiment
    from collaborative_gan_sampling_tpu.utils import retry as retry_mod

    monkeypatch.setattr(retry_mod.time, "sleep", lambda _: None)
    cfg = _tiny_toy_cfg(tmp_path / "run")
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()

    real_sample = exp.sample
    fails = {"left": 1}

    def flaky_sample(*a, **k):
        if fails["left"] > 0:
            fails["left"] -= 1
            raise JaxRuntimeError("INTERNAL: remote_compile: read body")
        return real_sample(*a, **k)

    exp.sample = flaky_sample  # type: ignore[method-assign]
    best, table = exp.select_hparams(state, ks=[1], rates=[0.05])
    assert len(table) == 1 and fails["left"] == 0
    assert np.isfinite(table[best]["kl"])
