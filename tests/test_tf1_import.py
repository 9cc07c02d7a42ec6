"""TF1 Saver checkpoint import (compat/tf1_import.py).

The migration path for reference users (SURVEY.md C15: every sampling mode
restores a trained ``tf.train.Saver`` checkpoint): build the reference's
graphs in ``tf.compat.v1`` with the carpedm20 variable naming, save a real
Saver checkpoint, import it, and require exact forward parity between the
TF1 graph and the Flax models on the imported weights.
"""

import os

import numpy as np
import pytest

# No global disable_eager_execution() (it would break tf.saved_model in
# this pytest process); each graph lives in an explicit tf.Graph() context.
tf = pytest.importorskip("tensorflow").compat.v1

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from collaborative_gan_sampling_tpu.compat.tf1_import import (  # noqa: E402
    TF1ImportError,
    import_dcgan,
    import_mlp,
    read_tf1_checkpoint,
    tf1_to_checkpoint,
)
from collaborative_gan_sampling_tpu.config import (  # noqa: E402
    ModelConfig,
    apply_overrides,
    get_preset,
)
from collaborative_gan_sampling_tpu.models import make_bundle  # noqa: E402

RNG = np.random.default_rng(42)


def _var(name, shape, positive=False):
    init = (RNG.uniform(0.5, 1.5, shape) if positive
            else RNG.standard_normal(shape) * 0.2).astype(np.float32)
    return tf.get_variable(name, initializer=tf.constant(init))


def _bn_eval(x, scope):
    with tf.variable_scope(scope):
        c = int(x.shape[-1])
        gamma = _var("gamma", (c,), positive=True)
        beta = _var("beta", (c,))
        mean = _var("moving_mean", (c,))
        var = _var("moving_variance", (c,), positive=True)
    return tf.nn.batch_normalization(x, mean, var, beta, gamma, 1e-5)


def _linear(x, out_dim, scope):
    with tf.variable_scope(scope):
        w = _var("Matrix", (int(x.shape[-1]), out_dim))
        b = _var("bias", (out_dim,))
    return tf.matmul(x, w) + b


def _conv(x, out_ch, scope):
    with tf.variable_scope(scope):
        w = _var("w", (5, 5, int(x.shape[-1]), out_ch))
        b = _var("biases", (out_ch,))
    return tf.nn.bias_add(
        tf.nn.conv2d(x, w, strides=[1, 2, 2, 1], padding="SAME"), b)


def _deconv(x, out_ch, scope):
    b_, h, w_, in_ch = [int(s) for s in x.shape]
    with tf.variable_scope(scope):
        w = _var("w", (5, 5, out_ch, in_ch))
        b = _var("biases", (out_ch,))
    y = tf.nn.conv2d_transpose(x, w, output_shape=[b_, 2 * h, 2 * w_, out_ch],
                               strides=[1, 2, 2, 1], padding="SAME")
    return tf.nn.bias_add(y, b)


DCGAN_CFG = ModelConfig(kind="dcgan", z_dim=8, image_size=16, channels=1,
                        g_base_filters=8, d_base_filters=8,
                        compute_dtype="float32")


def _build_tf1_dcgan(batch):
    """Reference-named 16x16 DCGAN (n=2 stages): eval-mode forward graph."""
    z_ph = tf.placeholder(tf.float32, (batch, 8), name="z")
    x_ph = tf.placeholder(tf.float32, (batch, 16, 16, 1), name="x")
    with tf.variable_scope("generator"):
        h = _linear(z_ph, 4 * 4 * 16, "g_h0_lin")
        h = tf.reshape(h, (batch, 4, 4, 16))
        h = tf.nn.relu(_bn_eval(h, "g_bn0"))
        h = _deconv(h, 8, "g_h1")
        h = tf.nn.relu(_bn_eval(h, "g_bn1"))
        gen = tf.nn.tanh(_deconv(h, 1, "g_h2"))
    with tf.variable_scope("discriminator"):
        h = tf.nn.leaky_relu(_conv(x_ph, 8, "d_h0_conv"), alpha=0.2)
        h = _conv(h, 16, "d_h1_conv")
        h = tf.nn.leaky_relu(_bn_eval(h, "d_bn1"), alpha=0.2)
        h = tf.reshape(h, (batch, 4 * 4 * 16))
        logit = _linear(h, 1, "d_h2_lin")
    # An optimizer slot + bookkeeping var, as a real Saver checkpoint has;
    # the importer must ignore them.
    tf.get_variable("generator/g_h0_lin/Matrix/Adam",
                    initializer=tf.zeros((8, 256)))
    tf.get_variable("beta1_power", initializer=tf.constant(0.5))
    return z_ph, x_ph, gen, logit


def _saved_dcgan(tmp_path, batch=4):
    """Run the TF1 graph, save a Saver checkpoint; return (vars, tf outputs)."""
    z = RNG.standard_normal((batch, 8)).astype(np.float32)
    x = RNG.standard_normal((batch, 16, 16, 1)).astype(np.float32)
    with tf.Graph().as_default():
        z_ph, x_ph, gen, logit = _build_tf1_dcgan(batch)
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            g_out, d_out = sess.run([gen, logit], {z_ph: z, x_ph: x})
            tf.train.Saver().save(sess, os.path.join(str(tmp_path), "model"),
                                  global_step=25_000)
    return z, x, g_out, d_out


def test_dcgan_import_forward_parity(tmp_path):
    z, x, g_want, d_want = _saved_dcgan(tmp_path)
    tf_vars = read_tf1_checkpoint(str(tmp_path))  # directory resolution
    assert any(n.endswith("g_h1/w") for n in tf_vars)
    g_vars, d_vars = import_dcgan(tf_vars, DCGAN_CFG)

    bundle = make_bundle(DCGAN_CFG)
    g_got = bundle.generate(g_vars, jnp.asarray(z), train=False)
    d_got = bundle.discriminate(d_vars, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(g_got), g_want, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(d_got), d_want[:, 0], rtol=1e-4,
                               atol=1e-4)


def test_dcgan_import_rejects_conditional_and_bad_shapes(tmp_path):
    import dataclasses

    _saved_dcgan(tmp_path)
    tf_vars = read_tf1_checkpoint(str(tmp_path))
    with pytest.raises(TF1ImportError, match="unconditional"):
        import_dcgan(tf_vars, dataclasses.replace(DCGAN_CFG, num_classes=10))
    with pytest.raises(TF1ImportError, match="shape"):
        import_dcgan(tf_vars, dataclasses.replace(DCGAN_CFG, z_dim=100))
    with pytest.raises(TF1ImportError, match="no variable matching"):
        import_dcgan({k: v for k, v in tf_vars.items()
                      if not k.endswith("g_h0_lin/Matrix")}, DCGAN_CFG)


MLP_CFG = ModelConfig(kind="mlp", z_dim=4, data_dim=2, g_hidden=32,
                      g_layers=3, d_hidden=32, d_layers=3,
                      compute_dtype="float32")


def _build_tf1_mlp(batch):
    """Synthetic-stack MLPs under two naming conventions the inferrer must
    handle: TF-layers style (dense, dense_1, ...) under a 'generator' scope
    and carpedm20-ish d_fc{i}/w,b scopes for the discriminator."""
    z_ph = tf.placeholder(tf.float32, (batch, 4), name="z")
    x_ph = tf.placeholder(tf.float32, (batch, 2), name="x")
    h = z_ph
    with tf.variable_scope("generator"):
        for scope in ["dense", "dense_1", "dense_2"]:
            h = tf.nn.relu(_linear(h, 32, scope))
        gen = _linear(h, 2, "dense_3")
    h = x_ph
    for i in range(3):
        with tf.variable_scope(f"d_fc{i}"):
            w = _var("w", (int(h.shape[-1]), 32))
            b = _var("b", (32,))
        h = tf.nn.relu(tf.matmul(h, w) + b)
    with tf.variable_scope("d_out"):
        w = _var("w", (32, 1))
        b = _var("b", (1,))
    logit = tf.matmul(h, w) + b
    return z_ph, x_ph, gen, logit


def test_mlp_import_forward_parity():
    batch = 8
    z = RNG.standard_normal((batch, 4)).astype(np.float32)
    x = RNG.standard_normal((batch, 2)).astype(np.float32)
    with tf.Graph().as_default():
        z_ph, x_ph, gen, logit = _build_tf1_mlp(batch)
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            g_want, d_want = sess.run([gen, logit], {z_ph: z, x_ph: x})
            names = [v.name.split(":")[0] for v in tf.global_variables()]
            tf_vars = dict(zip(names, sess.run(tf.global_variables())))

    g_vars, d_vars = import_mlp(tf_vars, MLP_CFG)
    bundle = make_bundle(MLP_CFG)
    g_got = bundle.generate(g_vars, jnp.asarray(z), train=False)
    d_got = bundle.discriminate(d_vars, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(g_got), g_want, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_got), d_want[:, 0], rtol=1e-4,
                               atol=1e-5)


def test_mlp_import_explicit_scopes_and_chain_error():
    batch = 2
    with tf.Graph().as_default():
        _build_tf1_mlp(batch)
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            names = [v.name.split(":")[0] for v in tf.global_variables()]
            tf_vars = dict(zip(names, sess.run(tf.global_variables())))

    # Explicit scope lists pin the order when names defeat inference.
    g_vars, _ = import_mlp(
        tf_vars, MLP_CFG,
        g_scopes=["generator/dense", "generator/dense_1",
                  "generator/dense_2", "generator/dense_3"],
        d_scopes=["d_fc0", "d_fc1", "d_fc2", "d_out"])
    assert g_vars["params"]["out"]["kernel"].shape == (32, 2)

    # A wrong order must fail the dimension-chain check loudly, not import
    # silently-wrong weights.
    with pytest.raises(TF1ImportError, match="chain|input dim"):
        import_mlp(tf_vars, MLP_CFG,
                   g_scopes=["generator/dense_3", "generator/dense",
                             "generator/dense_1", "generator/dense_2"],
                   d_scopes=["d_fc0", "d_fc1", "d_fc2", "d_out"])


def test_cli_import_tf1_command(tmp_path):
    """`cgs import-tf1 --config toy2d tf1=<saver dir>` writes a native
    checkpoint the sampling commands pick up (the documented migration)."""
    batch = 4
    z = RNG.standard_normal((batch, 4)).astype(np.float32)
    with tf.Graph().as_default():
        z_ph, _, gen, _ = _build_tf1_mlp(batch)
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            g_want = sess.run(gen, {z_ph: z})
            tf.train.Saver().save(sess, os.path.join(str(tmp_path), "model"),
                                  global_step=3)

    from collaborative_gan_sampling_tpu.cli import main

    wd = os.path.join(str(tmp_path), "wd")
    rc = main(["import-tf1", "--config", "toy2d", "--workdir", wd,
               f"tf1={tmp_path}",
               "model.z_dim=4", "model.g_hidden=32", "model.g_layers=3",
               "model.d_hidden=32", "model.d_layers=3",
               "model.compute_dtype=float32"])
    assert rc == 0

    from collaborative_gan_sampling_tpu.utils.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
    )

    raw = restore_checkpoint(latest_checkpoint(os.path.join(wd, "ckpts")))
    g_vars = {"params": raw["g_vars"]["params"]}
    got = make_bundle(MLP_CFG).generate(g_vars, jnp.asarray(z), train=False)
    np.testing.assert_allclose(np.asarray(got), g_want, rtol=1e-4, atol=1e-5)


def test_tf1_to_checkpoint_feeds_load_or_train(tmp_path):
    """The end-to-end migration: import -> native checkpoint -> load_or_train
    returns the imported weights without retraining on top of them."""
    batch = 2
    with tf.Graph().as_default():
        _build_tf1_mlp(batch)
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            names = [v.name.split(":")[0] for v in tf.global_variables()]
            tf_vars = dict(zip(names, sess.run(tf.global_variables())))

    cfg = get_preset("toy2d").replace(workdir=str(tmp_path))
    cfg = cfg.replace(model=MLP_CFG)
    cfg = apply_overrides(cfg, ["train.niters=7"])
    path = tf1_to_checkpoint(tf_vars, cfg)
    assert os.path.exists(path)

    from collaborative_gan_sampling_tpu.pipeline import Experiment

    exp = Experiment(cfg)
    state = exp.load_or_train()
    assert int(state.step) == 7  # treated as finished, not resumed
    want = np.asarray(tf_vars["generator/dense_3/Matrix"])
    got = np.asarray(state.g_vars["params"]["out"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=1e-6)
