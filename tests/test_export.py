"""AOT serving export (sampling/export.py): StableHLO artifact + SavedModel.

The exported blob must be self-contained (weights + DRS calibration baked
in): a fresh load with no model code must reproduce the live sampler's
outputs bit-for-bit on the same platform.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collaborative_gan_sampling_tpu.config import ModelConfig, RefineConfig
from collaborative_gan_sampling_tpu.models import make_bundle
from collaborative_gan_sampling_tpu.sampling.export import (
    export_sampler,
    load_sampler,
)
from collaborative_gan_sampling_tpu.sampling.serve import ServingSampler


def _sampler(method="collab", conditional=False):
    mcfg = ModelConfig(kind="dcgan", z_dim=8, image_size=16, channels=1,
                       g_base_filters=8, d_base_filters=8,
                       num_classes=4 if conditional else 0,
                       compute_dtype="float32")
    rcfg = RefineConfig(steps=2, rate=0.05, num_batches=2, batch_size=8,
                        burn_in=16, use_pallas=False)
    bundle = make_bundle(mcfg)
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(0))
    return ServingSampler(bundle, rcfg, method=method), g_vars, d_vars


@pytest.mark.parametrize("method", ["standard", "collab"])
def test_export_roundtrip_matches_live(tmp_path, method):
    srv, g_vars, d_vars = _sampler(method)
    path = str(tmp_path / f"sampler_{method}.stablehlo")
    key = jax.random.PRNGKey(7)
    meta = export_sampler(srv, g_vars, d_vars, key, path,
                          platforms=("cpu",))
    assert os.path.exists(path) and meta["candidates_per_round"] == 16
    assert json.load(open(path + ".json"))["method"] == method

    # Live reference outputs under the same key the artifact will get.
    m = srv.calibrate(g_vars, d_vars, jax.random.split(key)[0])
    serve_key = jax.random.PRNGKey(3)
    want = srv.round(g_vars, d_vars, m, serve_key)

    fn, meta2 = load_sampler(path)
    got = fn(jnp.asarray(serve_key, jnp.uint32))
    assert meta2["rejection"] == (method == "collab")
    x_w, _, acc_w, log_w = want
    x_g, _, acc_g, log_g = got[0], None, got[2], got[3]
    # The deserialized executable compiles through a different path than
    # the live jit (observed diffs ~1e-9 absolute) — same program, float
    # noise only; the boolean accept decisions must agree exactly.
    np.testing.assert_allclose(np.asarray(x_g), np.asarray(x_w),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(acc_g), np.asarray(acc_w))
    np.testing.assert_allclose(np.asarray(log_g), np.asarray(log_w),
                               rtol=1e-4, atol=1e-5)


def test_export_conditional_carries_labels(tmp_path):
    srv, g_vars, d_vars = _sampler("refinement", conditional=True)
    path = str(tmp_path / "cond.stablehlo")
    export_sampler(srv, g_vars, d_vars, jax.random.PRNGKey(0), path,
                   platforms=("cpu",))
    fn, meta = load_sampler(path)
    assert meta["conditional"] is True
    x, labels, acc, logits = fn(jnp.asarray(jax.random.PRNGKey(1),
                                            jnp.uint32))
    assert labels.shape == (16,)
    assert int(labels.max()) < 4
    assert bool(acc.all())  # refinement = accept-all


def test_export_multiplatform_blob(tmp_path):
    """A ('tpu', 'cpu') export is produced on a CPU-only host (cross-
    platform lowering) and still runs here via the cpu entry."""
    srv, g_vars, d_vars = _sampler("standard")
    path = str(tmp_path / "multi.stablehlo")
    meta = export_sampler(srv, g_vars, d_vars, jax.random.PRNGKey(0), path)
    assert meta["platforms"] == ["tpu", "cpu"]
    fn, _ = load_sampler(path)
    x, *_ = fn(jnp.asarray(jax.random.PRNGKey(2), jnp.uint32))
    assert np.isfinite(np.asarray(x)).all()


def test_export_tf_savedmodel(tmp_path):
    tf = pytest.importorskip("tensorflow")
    from collaborative_gan_sampling_tpu.sampling.export import (
        export_tf_savedmodel,
    )

    srv, g_vars, d_vars = _sampler("collab")
    key = jax.random.PRNGKey(5)
    d = export_tf_savedmodel(srv, g_vars, d_vars, key,
                             str(tmp_path / "saved_model"))
    loaded = tf.saved_model.load(d)
    serve_key = np.asarray(jax.random.PRNGKey(11), np.uint32)
    out = loaded.serve_round(tf.constant(serve_key))
    m = srv.calibrate(g_vars, d_vars, jax.random.split(key)[0])
    want = srv.round(g_vars, d_vars, jnp.asarray(jax.device_get(m)),
                     jnp.asarray(serve_key))
    want = tuple(o for o in want if o is not None)
    assert len(out) == len(want)
    np.testing.assert_allclose(out[0].numpy(), np.asarray(want[0]),
                               rtol=1e-5, atol=1e-5)
