"""TF1 export (compat/tf1_export.py) round-trip + graph-parity gates.

The export path is the inverse of the import path (C15 both directions),
so the gates are: export -> import recovers the exact trees; a real Saver
checkpoint written by the exporter re-imports; and the reference's TF1
discriminator graph rebuilt from exported weights (compat/tf1_graph.py)
scores samples identically to the native Flax D — the precondition for the
north-star "at equal FID" closure (benchmarks/tf1_equal_fid.py).
"""

import dataclasses

import numpy as np
import pytest

tf_root = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from collaborative_gan_sampling_tpu.compat.tf1_export import (  # noqa: E402
    export_tf1,
    state_to_tf1,
    write_tf1_checkpoint,
)
from collaborative_gan_sampling_tpu.compat.tf1_graph import (  # noqa: E402
    TF1RefineLoop,
    build_tf1_discriminator,
)
from collaborative_gan_sampling_tpu.compat.tf1_import import (  # noqa: E402
    TF1ImportError,
    import_tf1,
    read_tf1_checkpoint,
)
from collaborative_gan_sampling_tpu.config import (  # noqa: E402
    ModelConfig,
)
from collaborative_gan_sampling_tpu.models import make_bundle  # noqa: E402

MLP_CFG = ModelConfig(kind="mlp", z_dim=4, data_dim=2, g_hidden=16,
                      d_hidden=16, g_layers=2, d_layers=2,
                      compute_dtype="float32")
DCGAN_CFG = ModelConfig(kind="dcgan", z_dim=8, image_size=16, channels=1,
                        g_base_filters=8, d_base_filters=8,
                        compute_dtype="float32")


def _init(cfg, seed=0):
    bundle = make_bundle(cfg)
    return bundle, *bundle.init(jax.random.PRNGKey(seed))


def _assert_trees_equal(got, want):
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        got, want)


@pytest.mark.parametrize("cfg", [MLP_CFG, DCGAN_CFG], ids=["mlp", "dcgan"])
def test_export_import_roundtrip(cfg):
    _, g_vars, d_vars = _init(cfg)
    tf_vars = export_tf1(g_vars, d_vars, cfg)
    g_back, d_back = import_tf1(tf_vars, cfg)
    _assert_trees_equal(g_back, g_vars)
    _assert_trees_equal(d_back, d_vars)


def test_saver_checkpoint_roundtrip(tmp_path):
    """write_tf1_checkpoint produces files tf.train.Saver conventions can
    resolve (directory form) and whose variables survive bit-exact."""
    _, g_vars, d_vars = _init(MLP_CFG)
    tf_vars = export_tf1(g_vars, d_vars, MLP_CFG)
    prefix = write_tf1_checkpoint(tf_vars, str(tmp_path / "model-100"))
    assert prefix == str(tmp_path / "model-100")
    back = read_tf1_checkpoint(str(tmp_path))  # latest_checkpoint resolution
    for name, arr in tf_vars.items():
        np.testing.assert_array_equal(back[name], arr)
    g_back, d_back = import_tf1(str(tmp_path), MLP_CFG)
    _assert_trees_equal(g_back, g_vars)
    _assert_trees_equal(d_back, d_vars)


def test_export_rejects_conditional_dcgan():
    cfg = dataclasses.replace(DCGAN_CFG, num_classes=4)
    _, g_vars, d_vars = _init(cfg)
    with pytest.raises(TF1ImportError, match="conditional"):
        export_tf1(g_vars, d_vars, cfg)


@pytest.mark.parametrize("cfg,shape", [(MLP_CFG, (32, 2)),
                                       (DCGAN_CFG, (8, 16, 16, 1))],
                         ids=["mlp", "dcgan"])
def test_tf1_graph_logit_parity(cfg, shape):
    """The reference's D graph rebuilt from exported weights scores samples
    identically to the native Flax D (eval mode, float32)."""
    bundle, g_vars, d_vars = _init(cfg)
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(7), shape,
                                      minval=-1.0, maxval=1.0))
    want = np.asarray(bundle.discriminate(d_vars, jnp.asarray(x),
                                          train=False))
    loop = TF1RefineLoop(export_tf1(g_vars, d_vars, cfg), cfg, shape)
    got = loop.score(x)
    loop.close()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("cfg,shape,use_s2d,tol", [
    (MLP_CFG, (32, 2), False, 1e-5),
    (DCGAN_CFG, (8, 16, 16, 1), False, 1e-4),
    (DCGAN_CFG, (8, 16, 16, 1), True, 1e-4),
], ids=["mlp", "dcgan-scan", "dcgan-s2d"])
def test_tf1_loop_matches_fused_scan(cfg, shape, use_s2d, tol):
    """The north star's 'same math' clause: the reference's per-step
    sess.run loop and the fused JAX scan produce the same refined samples
    from the same weights and the same x0."""
    from collaborative_gan_sampling_tpu.config import RefineConfig
    from collaborative_gan_sampling_tpu.sampling.refine import make_refine_fn

    bundle, g_vars, d_vars = _init(cfg)
    rcfg = RefineConfig(steps=8, rate=0.05, use_s2d=use_s2d)
    x0 = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), shape,
                                       minval=-0.5, maxval=0.5))

    loop = TF1RefineLoop(export_tf1(g_vars, d_vars, cfg), cfg, shape)
    x_tf1, _ = loop.refine(x0, steps=rcfg.steps, rate=rcfg.rate)
    loop.close()

    refine = jax.jit(make_refine_fn(bundle, rcfg))
    x_scan, aux = refine(d_vars, jnp.asarray(x0))
    np.testing.assert_allclose(np.asarray(x_scan), x_tf1, rtol=tol, atol=tol)
    # And the final logits agree (the acceptance stage sees the same scores).
    want_logits = np.asarray(bundle.discriminate(
        d_vars, jnp.asarray(x_tf1), train=False))
    np.testing.assert_allclose(np.asarray(aux["logits"]), want_logits,
                               rtol=1e-3, atol=1e-3)


def test_state_to_tf1_ema_paths():
    from collaborative_gan_sampling_tpu.config import (
        Config,
        TrainConfig,
    )
    from collaborative_gan_sampling_tpu.training import create_train_state

    bundle = make_bundle(MLP_CFG)
    tcfg = TrainConfig(batch_size=8, niters=10, g_ema_decay=0.99)
    state = create_train_state(bundle, tcfg, jax.random.PRNGKey(0))
    tf_vars = state_to_tf1(state, MLP_CFG, use_ema=True)
    np.testing.assert_array_equal(
        tf_vars["generator/fc0/Matrix"],
        np.asarray(state.g_ema["fc0"]["kernel"], np.float32))

    tcfg0 = TrainConfig(batch_size=8, niters=10, g_ema_decay=0.0)
    state0 = create_train_state(bundle, tcfg0, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="EMA"):
        state_to_tf1(state0, MLP_CFG, use_ema=True)
