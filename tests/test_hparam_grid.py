"""Grid-boundary detection / auto-extension in Experiment.select_hparams.

VERDICT r3 item 5: the round-3 converged study tuned both arms to the
grid's lowest corner and the plain ``min`` over the table silently
accepted it. A boundary optimum must (a) always warn, and (b) with
``extend_grid`` > 0 geometrically extend the offending axis until the
optimum is interior.
"""

import json

from collaborative_gan_sampling_tpu.config import (
    DataConfig,
    ModelConfig,
    TrainConfig,
    get_preset,
)
from collaborative_gan_sampling_tpu.pipeline import (
    Experiment,
    _extend_axis,
    _grid_edges,
)


def test_grid_edges_interior_and_boundaries():
    ks, rates = [1, 5, 10, 20], [0.001, 0.01, 0.1]
    assert _grid_edges((5, 0.01), ks, rates) == []
    assert _grid_edges((20, 0.01), ks, rates) == ["k:high"]
    assert _grid_edges((5, 0.001), ks, rates) == ["rate:low"]
    assert _grid_edges((20, 0.1), ks, rates) == ["k:high", "rate:high"]
    # K's floor of 1 is not a boundary — nothing exists below it.
    assert _grid_edges((1, 0.01), ks, rates) == []
    # K=2 at the low edge IS a boundary (k=1 was never tried).
    assert _grid_edges((2, 0.01), [2, 5, 10], rates) == ["k:low"]
    # Unswept axes (single value) are never boundaries.
    assert _grid_edges((5, 0.01), [5], rates) == []
    assert _grid_edges((5, 0.01), ks, [0.01]) == []


def test_extend_axis_geometric():
    assert _extend_axis([2, 5, 10, 20], "low", integer=True) == 1
    assert _extend_axis([10, 20, 50], "high", integer=True) == 125
    assert _extend_axis([1, 2, 5], "low", integer=True) is None  # floor
    new = _extend_axis([0.001, 0.005, 0.01], "low", integer=False)
    assert abs(new - 0.0002) < 1e-9
    new = _extend_axis([0.01, 0.03], "high", integer=False)
    assert abs(new - 0.09) < 1e-9
    assert _extend_axis([0.01], "low", integer=False) is None


def _fake_grid_exp(tmp_path, k_opt, rate_opt):
    """A real (tiny, untrained) toy Experiment whose sample/evaluate are
    replaced by a deterministic log-space quadratic with a known optimum —
    select_hparams' control flow under test, no device work."""
    import math

    cfg = get_preset("toy2d").replace(
        workdir=str(tmp_path / "run"),
        model=ModelConfig(kind="mlp", z_dim=2, g_hidden=8, d_hidden=8,
                          g_layers=2, d_layers=2, compute_dtype="float32"),
        data=DataConfig(dataset="ring8"),
        train=TrainConfig(niters=0, batch_size=32),
    )
    exp = Experiment(cfg, echo_metrics=False)
    exp.sample = lambda state, method=None, refine_cfg=None: refine_cfg
    exp.evaluate = lambda rcfg: {
        "kl": (math.log(rcfg.steps / k_opt) ** 2
               + math.log(rcfg.rate / rate_opt) ** 2)}
    return exp


def test_boundary_warning_without_extension(tmp_path, capsys):
    exp = _fake_grid_exp(tmp_path, k_opt=0.5, rate_opt=1e-5)
    best, table = exp.select_hparams(None, ks=[2, 5, 10],
                                     rates=[0.001, 0.01, 0.1])
    assert best == (2, 0.001)  # lowest corner
    out = capsys.readouterr().out
    assert "WARNING" in out and "k:low" in out and "rate:low" in out
    assert len(table) == 9  # no extension happened


def test_auto_extension_reaches_interior(tmp_path):
    # Optimum at (k=20ish, rate=0.0002ish): one axis extends high, one low.
    exp = _fake_grid_exp(tmp_path, k_opt=20.0, rate_opt=2e-4)
    best, table = exp.select_hparams(None, ks=[2, 5, 10],
                                     rates=[0.001, 0.01, 0.1],
                                     extend_grid=4)
    ks = sorted({c[0] for c in table})
    rates = sorted({c[1] for c in table})
    assert best[0] not in (min(ks), max(ks))
    assert best[1] not in (min(rates), max(rates))
    assert _grid_edges(best, ks, rates) == []
    assert max(ks) > 10 and min(rates) < 0.001


def test_extension_stops_at_k_floor(tmp_path):
    # Optimum below k=1: extension bottoms out at the K floor and stops
    # rather than looping (rate axis interior).
    exp = _fake_grid_exp(tmp_path, k_opt=0.1, rate_opt=0.01)
    best, table = exp.select_hparams(None, ks=[2, 5, 10],
                                     rates=[0.001, 0.01, 0.1],
                                     extend_grid=10)
    assert best[0] == 1
    assert sorted({c[0] for c in table})[0] == 1


def test_cache_skips_torn_lines_and_reuses_cells(tmp_path):
    cache = tmp_path / "grid.jsonl"
    # A finished cell, then a torn line (crashed concurrent writer).
    with open(cache, "w") as fh:
        fh.write(json.dumps({"cell": [5, 0.01],
                             "metrics": {"kl": 0.0}}) + "\n")
        fh.write('{"cell": [10, 0.0\n')  # torn (truncated JSON)
    exp = _fake_grid_exp(tmp_path, k_opt=5.0, rate_opt=0.01)
    calls = []
    orig = exp.sample

    def counting_sample(state, method=None, refine_cfg=None):
        calls.append((refine_cfg.steps, refine_cfg.rate))
        return orig(state, method=method, refine_cfg=refine_cfg)

    exp.sample = counting_sample
    best, table = exp.select_hparams(None, ks=[2, 5, 10],
                                     rates=[0.001, 0.01, 0.1],
                                     cache_path=str(cache))
    assert best == (5, 0.01)  # cached kl=0.0 wins
    assert (5, 0.01) not in calls  # cache hit — never recomputed
    # Cache grew by exactly the 8 non-cached cells, under the lock, and
    # every line now parses.
    with open(cache) as fh:
        lines = fh.readlines()
    parsed = []
    for line in lines:
        try:
            parsed.append(tuple(json.loads(line)["cell"]))
        except (json.JSONDecodeError, KeyError):
            pass
    assert len(parsed) == 9
    assert len(set(parsed)) == 9  # no duplicate appends
