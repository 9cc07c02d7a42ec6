"""Conv-D fused refinement: s2d reference + Pallas kernel parity gates.

The s2d reference (ops/conv_refine_ref.py) is pinned exactly against the
Flax model + jax.grad; the Pallas kernel (ops/conv_refine_pallas.py) is
pinned against the scan path in interpreter mode. On real TPU the kernel
compiles and matches (verified manually; see module docstring) but is slower
than the XLA scan path and intentionally not wired into production.
"""

import jax
import jax.numpy as jnp
import numpy as np

from collaborative_gan_sampling_tpu.config import ModelConfig, RefineConfig
from collaborative_gan_sampling_tpu.models import make_bundle
from collaborative_gan_sampling_tpu.ops.conv_refine_pallas import (
    d2s4,
    fused_refine_conv28,
    s2d4,
    supports_conv_pallas_refine,
)
from collaborative_gan_sampling_tpu.ops.conv_refine_ref import (
    d_forward_s2d,
    d_input_grad_s2d,
    depth_to_space,
    fold_dcgan_d,
    space_to_depth,
)
from collaborative_gan_sampling_tpu.sampling.refine import make_refine_fn


def _model(seed=0):
    cfg = ModelConfig(kind="dcgan", z_dim=100, image_size=28, channels=1,
                      g_base_filters=64, d_base_filters=64,
                      compute_dtype="float32")
    bundle = make_bundle(cfg)
    _, d_vars = bundle.init(jax.random.PRNGKey(seed))
    # Non-trivial BN stats so the folding is genuinely exercised.
    bs = jax.tree.map(lambda a: jnp.abs(a) + 0.3, d_vars["batch_stats"])
    return bundle, dict(d_vars, batch_stats=bs)


def test_s2d_roundtrips():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 28, 28, 1))
    np.testing.assert_allclose(
        np.asarray(depth_to_space(space_to_depth(x), 1)), np.asarray(x))
    np.testing.assert_allclose(np.asarray(d2s4(s2d4(x))), np.asarray(x))


def test_reference_forward_matches_model():
    bundle, d_vars = _model()
    params = fold_dcgan_d(d_vars)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 28, 28, 1))
    want = bundle.discriminate(d_vars, x, train=False)
    got, _ = d_forward_s2d(params, space_to_depth(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_reference_input_grad_matches_jax_grad():
    bundle, d_vars = _model()
    params = fold_dcgan_d(d_vars)
    x = jax.random.normal(jax.random.PRNGKey(2), (6, 28, 28, 1))

    def loss(x):
        return jnp.sum(jax.nn.softplus(
            -bundle.discriminate(d_vars, x, train=False)))

    want = jax.grad(loss)(x)
    _, g_s2d = d_input_grad_s2d(params, space_to_depth(x))
    got = depth_to_space(g_s2d, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-7)


def test_pallas_kernel_matches_scan_oracle_interpret():
    bundle, d_vars = _model()
    x0 = jax.random.normal(jax.random.PRNGKey(3), (12, 28, 28, 1)) * 0.5
    for steps, rate in [(1, 0.05), (4, 0.02)]:
        scan_fn = jax.jit(make_refine_fn(
            bundle, RefineConfig(steps=steps, rate=rate, use_pallas=False)))
        x_want, aux = scan_fn(d_vars, x0)
        x_got, lg = fused_refine_conv28(d_vars, x0, steps, rate, tile=4,
                                        interpret=True)
        np.testing.assert_allclose(np.asarray(x_got), np.asarray(x_want),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(lg), np.asarray(aux["logits"]),
                                   rtol=1e-4, atol=1e-5)


def test_gate_not_wired_and_conditions():
    bundle, _ = _model()
    cfg = RefineConfig(use_pallas=True)
    # CPU backend in tests -> gate is off; also verify it is not referenced
    # from the production refine path.
    assert not supports_conv_pallas_refine(bundle, cfg, None)
    import inspect

    from collaborative_gan_sampling_tpu.sampling import refine as refine_mod
    assert "conv_refine_pallas" not in inspect.getsource(refine_mod)
