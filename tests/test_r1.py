"""R1 gradient penalty (train.r1_gamma, Mescheder et al. arXiv:1801.04406).

R1 adds 0.5*gamma*E[||grad_x D(x_real)||^2] to the D loss — smoothing the
exact gradient field refinement follows (SURVEY.md C4). Pinned here:
(1) the reported 'r1' metric equals the directly computed E||grad||^2,
(2) one penalized D step equals a hand-derived jax.grad update of
    NS-loss + penalty (the wiring is exact, not approximate),
(3) the fused (FusedProp) and alternating trainers agree on the penalty,
(4) training with R1 measurably shrinks D's input gradients,
(5) the second-order program compiles through conv/BN/label-embedding.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from collaborative_gan_sampling_tpu.config import (
    DataConfig,
    ModelConfig,
    TrainConfig,
)
from collaborative_gan_sampling_tpu.data import make_mixture, sample_mixture
from collaborative_gan_sampling_tpu.models import make_bundle
from collaborative_gan_sampling_tpu.training import (
    create_train_state,
    make_train_chunk,
    nonsaturating_d_loss,
)
from collaborative_gan_sampling_tpu.utils.prng import step_key

GAMMA = 3.0


def _setup(**tkw):
    mcfg = ModelConfig(kind="mlp", z_dim=4, g_hidden=32, d_hidden=32,
                       compute_dtype="float32")
    tcfg = TrainConfig(batch_size=64, steps_per_call=1, d_lr=1e-3, g_lr=1e-3,
                       r1_gamma=GAMMA, **tkw)
    bundle = make_bundle(mcfg)
    spec = make_mixture("ring8", std=0.1)
    data_fn = lambda key, n: (sample_mixture(key, spec, n), None)
    return bundle, tcfg, data_fn


def _mean_sq_input_grad(bundle, d_vars, x):
    gx = jax.grad(lambda a: jnp.sum(bundle.discriminate(d_vars, a,
                                                        train=False)))(x)
    return float(jnp.mean(jnp.sum(gx ** 2, axis=1)))


def test_r1_metric_matches_direct_computation():
    bundle, tcfg, data_fn = _setup()
    base = jax.random.PRNGKey(0)
    state0 = create_train_state(bundle, tcfg, base)
    d_vars0 = jax.tree.map(jnp.copy, state0.d_vars)
    chunk = make_train_chunk(bundle, tcfg, data_fn, base)
    _, metrics = chunk(state0)

    # Same draw as d_update step 0: step_key(base, 0, 'data') -> split 3.
    k_data, _, _ = jax.random.split(step_key(base, jnp.int32(0), "data"), 3)
    x_real, _ = data_fn(k_data, 64)
    want = _mean_sq_input_grad(bundle, d_vars0, x_real)
    np.testing.assert_allclose(float(metrics["r1"]), want, rtol=1e-5)


def test_r1_step_matches_hand_derived_update():
    """One alternating D step with R1 == Adam step on the hand-built
    objective NS(lr, lf) + 0.5*gamma*E||grad_x D(x_real)||^2."""
    bundle, tcfg, data_fn = _setup()
    base = jax.random.PRNGKey(0)
    chunk = make_train_chunk(bundle, tcfg, data_fn, base)
    state1, _ = chunk(create_train_state(bundle, tcfg, base))
    state_ref = create_train_state(bundle, tcfg, base)  # chunk donated its input

    key = step_key(base, jnp.int32(0), "data")
    k_data, k_z, _ = jax.random.split(key, 3)
    x_real, _ = data_fn(k_data, 64)
    z = bundle.sample_z(k_z, 64)
    x_fake = bundle.generate(state_ref.g_vars, z, train=False)

    def d_loss(d_params):
        d_vars = dict(state_ref.d_vars, params=d_params)
        score = lambda a: bundle.discriminate(d_vars, a, train=False)
        gx = jax.grad(lambda a: jnp.sum(score(a)))(x_real)
        r1 = jnp.mean(jnp.sum(gx ** 2, axis=1))
        return (nonsaturating_d_loss(score(x_real), score(x_fake))
                + 0.5 * GAMMA * r1)

    grads = jax.grad(d_loss)(state_ref.d_vars["params"])
    tx = optax.adam(1e-3, b1=0.5)
    upd, _ = tx.update(grads, tx.init(state_ref.d_vars["params"]),
                       state_ref.d_vars["params"])
    want = optax.apply_updates(state_ref.d_vars["params"], upd)
    for a, b in zip(jax.tree_util.tree_leaves(state1.d_vars["params"]),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6)


def test_r1_fused_matches_alternating_at_step0():
    base = jax.random.PRNGKey(0)
    vals = []
    for fused in (False, True):
        bundle, tcfg, data_fn = _setup(fused_prop=fused)
        chunk = make_train_chunk(bundle, tcfg, data_fn, base)
        _, metrics = chunk(create_train_state(bundle, tcfg, base))
        vals.append(float(metrics["r1"]))
    np.testing.assert_allclose(vals[0], vals[1], rtol=1e-5)


def test_r1_shrinks_input_gradients():
    base = jax.random.PRNGKey(0)
    norms = {}
    for gamma in (0.0, 10.0):
        bundle, tcfg, data_fn = _setup()
        tcfg = dataclasses.replace(tcfg, r1_gamma=gamma, steps_per_call=100,
                                   batch_size=128)
        state = create_train_state(bundle, tcfg, base)
        chunk = make_train_chunk(bundle, tcfg, data_fn, base)
        for _ in range(3):
            state, _ = chunk(state)
        x, _ = data_fn(jax.random.PRNGKey(7), 512)
        norms[gamma] = _mean_sq_input_grad(bundle, state.d_vars, x)
    assert norms[10.0] < 0.5 * norms[0.0], norms


def test_shaping_r1_step_matches_hand_derived_update():
    """One shaping update with R1 == Adam step on
    NS(real, refined) + 0.5*gamma*E||grad_x D(x_real)||^2."""
    from collaborative_gan_sampling_tpu.training.shaping import (
        make_shaping_step,
    )

    bundle, tcfg, data_fn = _setup()
    base = jax.random.PRNGKey(3)
    state0 = create_train_state(bundle, tcfg, base)
    x_real, _ = data_fn(jax.random.PRNGKey(4), 64)
    x_ref = bundle.generate(state0.g_vars,
                            bundle.sample_z(jax.random.PRNGKey(5), 64),
                            train=False)

    shape_step = make_shaping_step(bundle, lr=1e-3, r1_gamma=GAMMA)
    sstate = shape_step.init(state0.d_vars)
    sstate1, loss = shape_step(sstate, x_real, x_ref)

    def shaping_loss(d_params):
        d_vars = dict(state0.d_vars, params=d_params)
        score = lambda a: bundle.discriminate(d_vars, a, train=False)
        gx = jax.grad(lambda a: jnp.sum(score(a)))(x_real)
        r1 = jnp.mean(jnp.sum(gx ** 2, axis=1))
        return (nonsaturating_d_loss(score(x_real), score(x_ref))
                + 0.5 * GAMMA * r1)

    np.testing.assert_allclose(float(loss),
                               float(shaping_loss(state0.d_vars["params"])),
                               rtol=1e-5)
    grads = jax.grad(shaping_loss)(state0.d_vars["params"])
    tx = optax.adam(1e-3, b1=0.5)
    upd, _ = tx.update(grads, tx.init(state0.d_vars["params"]),
                       state0.d_vars["params"])
    want = optax.apply_updates(state0.d_vars["params"], upd)
    for a, b in zip(jax.tree_util.tree_leaves(sstate1.d_vars["params"]),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6)


def test_shaping_r1_composes_in_collab_scan():
    """collab with refine.shaping_r1_gamma compiles (second-order inside
    the fused scan) and returns finite samples."""
    from collaborative_gan_sampling_tpu.config import RefineConfig
    from collaborative_gan_sampling_tpu.sampling import sample

    bundle, tcfg, data_fn = _setup()
    base = jax.random.PRNGKey(0)
    state = create_train_state(bundle, tcfg, base)
    rcfg = RefineConfig(method="collab", steps=3, rate=0.05, num_batches=3,
                        batch_size=32, burn_in=32, use_pallas=False,
                        shape_every=1, shaping_r1_gamma=2.0)
    res = sample(bundle, state.g_vars, state.d_vars, rcfg,
                 jax.random.PRNGKey(1), method="collab", data_fn=data_fn)
    assert bool(jnp.isfinite(res.samples).all())


def test_r1_compiles_through_conv_bn_and_embeddings():
    from collaborative_gan_sampling_tpu.data import load_image_dataset

    mcfg = ModelConfig(kind="dcgan", z_dim=8, image_size=16, channels=1,
                       g_base_filters=8, d_base_filters=8, num_classes=4,
                       compute_dtype="float32")
    bundle = make_bundle(mcfg)
    ds = load_image_dataset(DataConfig(dataset="mnist"), image_size=16,
                            procedural_n=64)
    data_fn = lambda key, n: (ds.batch(key, n)[0],
                              ds.batch(key, n)[1] % 4)
    for fused in (False, True):
        tcfg = TrainConfig(batch_size=8, steps_per_call=2, r1_gamma=1.0,
                           fused_prop=fused)
        base = jax.random.PRNGKey(0)
        state = create_train_state(bundle, tcfg, base)
        chunk = make_train_chunk(bundle, tcfg, data_fn, base)
        state, m = chunk(state)
        assert int(state.step) == 2
        assert np.isfinite(float(m["r1"]))
        for v in m.values():
            assert np.isfinite(float(v))
