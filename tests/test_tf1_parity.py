"""TF1 <-> JAX op-semantics parity (SURVEY.md section 7 hard part 4).

The reference's DCGAN is built from TF1 ops whose padding/update semantics
are easy to silently mismatch: stride-2 'SAME' conv and conv2d_transpose
(with explicit output_shape), leaky relu, and AdamOptimizer's epsilon
placement. Each is pinned here against ``tf.compat.v1`` numerically, with
shared weights.
"""

import numpy as np
import pytest

# No global disable_eager_execution(): every graph is built inside an
# explicit `with tf.Graph().as_default()` context (graph mode locally),
# leaving process-global eager mode on for tf.saved_model users
# (tests/test_export.py) collected in the same pytest process.
tf = pytest.importorskip("tensorflow").compat.v1

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
from flax import linen as nn  # noqa: E402

from collaborative_gan_sampling_tpu.ops.nn import lrelu  # noqa: E402


def _run_tf(graph_fn, feeds):
    with tf.Graph().as_default():
        outputs = graph_fn()
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            return sess.run(outputs, feeds)


def test_conv2d_same_stride2_matches_tf1():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 11, 11, 3)).astype(np.float32)  # odd size
    w = rng.standard_normal((5, 5, 3, 7)).astype(np.float32)

    def tf_graph():
        xp = tf.placeholder(tf.float32, x.shape, name="x")
        return tf.nn.conv2d(xp, tf.constant(w), strides=[1, 2, 2, 1],
                            padding="SAME")

    want = _run_tf(tf_graph, {"x:0": x})

    conv = nn.Conv(7, (5, 5), strides=(2, 2), padding="SAME",
                   use_bias=False, dtype=jnp.float32)
    got = conv.apply({"params": {"kernel": jnp.asarray(w)}}, jnp.asarray(x))
    assert got.shape == want.shape  # ceil(11/2) = 6
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_conv2d_transpose_same_stride2_matches_tf1():
    """The reference's deconv2d: output_shape = 2 * input (even sizes)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    # TF1 transpose kernel layout: (kh, kw, out_ch, in_ch)
    w_tf = rng.standard_normal((5, 5, 6, 4)).astype(np.float32)

    def tf_graph():
        xp = tf.placeholder(tf.float32, x.shape, name="x")
        return tf.nn.conv2d_transpose(
            xp, tf.constant(w_tf), output_shape=[2, 16, 16, 6],
            strides=[1, 2, 2, 1], padding="SAME")

    want = _run_tf(tf_graph, {"x:0": x})

    # Flax ConvTranspose kernel layout: (kh, kw, in_ch, out_ch); TF1's
    # conv2d_transpose is the gradient of conv2d, which also flips the
    # kernel spatially relative to Flax's direct transposed convolution.
    w_flax = np.flip(np.transpose(w_tf, (0, 1, 3, 2)), axis=(0, 1)).copy()
    deconv = nn.ConvTranspose(6, (5, 5), strides=(2, 2), padding="SAME",
                              use_bias=False, dtype=jnp.float32)
    got = deconv.apply({"params": {"kernel": jnp.asarray(w_flax)}},
                       jnp.asarray(x))
    assert got.shape == (2, 16, 16, 6)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_lrelu_matches_tf1():
    x = np.linspace(-3, 3, 101).astype(np.float32)

    def tf_graph():
        xp = tf.placeholder(tf.float32, x.shape, name="x")
        return tf.nn.leaky_relu(xp, alpha=0.2)

    want = _run_tf(tf_graph, {"x:0": x})
    np.testing.assert_allclose(np.asarray(lrelu(jnp.asarray(x))), want,
                               rtol=1e-6)


def test_adam_trajectory_matches_tf1():
    """optax.adam vs tf.compat.v1.train.AdamOptimizer on a quadratic:
    identical (lr, beta1, beta2, eps) must give identical trajectories —
    this pins the epsilon placement (TF1: outside bias correction)."""
    lr, b1, b2, eps = 1e-2, 0.5, 0.999, 1e-8
    w0 = np.array([1.0, -2.0, 3.0], np.float32)

    def tf_graph():
        w = tf.get_variable("w", initializer=tf.constant(w0))
        loss = tf.reduce_sum(tf.square(w) * np.array([1., 2., 3.],
                                                     np.float32))
        opt = tf.train.AdamOptimizer(lr, beta1=b1, beta2=b2, epsilon=eps)
        step = opt.minimize(loss)
        return step, w

    with tf.Graph().as_default():
        step, w = tf_graph()
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            for _ in range(20):
                sess.run(step)
            want = sess.run(w)

    tx = optax.adam(lr, b1=b1, b2=b2, eps=eps)
    params = jnp.asarray(w0)
    state = tx.init(params)
    grad_fn = jax.grad(lambda p: jnp.sum(p ** 2 * jnp.array([1., 2., 3.])))
    for _ in range(20):
        updates, state = tx.update(grad_fn(params), state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), want, rtol=1e-4,
                               atol=1e-5)
