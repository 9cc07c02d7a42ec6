"""Generator EMA (train.g_ema_decay) — tracking, sampling use, and
checkpoint compatibility."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from collaborative_gan_sampling_tpu.config import ModelConfig, TrainConfig
from collaborative_gan_sampling_tpu.data import make_mixture, sample_mixture
from collaborative_gan_sampling_tpu.models import make_bundle
from collaborative_gan_sampling_tpu.training import (
    create_train_state,
    make_train_chunk,
    sampling_g_vars,
)


def _setup(g_ema_decay=0.0, fused_prop=False):
    mcfg = ModelConfig(kind="mlp", z_dim=4, g_hidden=32, d_hidden=32,
                       compute_dtype="float32")
    tcfg = TrainConfig(batch_size=64, steps_per_call=10, d_lr=1e-3,
                       g_lr=1e-3, g_ema_decay=g_ema_decay,
                       fused_prop=fused_prop)
    bundle = make_bundle(mcfg)
    spec = make_mixture("ring8", std=0.1)
    data_fn = lambda key, n: (sample_mixture(key, spec, n), None)
    base = jax.random.PRNGKey(0)
    state = create_train_state(bundle, tcfg, base)
    chunk = make_train_chunk(bundle, tcfg, data_fn, base)
    return bundle, state, chunk


def _l1(a, b):
    return sum(float(jnp.sum(jnp.abs(x - y)))
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


def test_ema_off_by_default():
    _, state, chunk = _setup()
    assert state.g_ema is None
    state, _ = chunk(state)
    assert state.g_ema is None
    assert sampling_g_vars(state) is state.g_vars


def test_ema_lags_live_params():
    """With decay close to 1 the EMA stays nearer the initial params than
    the live params do, and differs from both."""
    _, state0, chunk = _setup(g_ema_decay=0.95)
    init = jax.tree.map(jnp.copy, state0.g_vars["params"])
    state, _ = chunk(state0)
    assert state.g_ema is not None
    assert _l1(state.g_ema, init) < _l1(state.g_vars["params"], init)
    assert _l1(state.g_ema, state.g_vars["params"]) > 0

    sv = sampling_g_vars(state)
    assert sv["params"] is state.g_ema


def test_ema_exact_recursion():
    """One chunk of n steps: EMA equals the hand-unrolled recursion over the
    per-step params (run twice with per-step states to reconstruct),
    including the TF1 num_updates decay warmup min(d, (1+t)/(10+t))."""
    d = 0.9
    bundle, state, _ = _setup(g_ema_decay=d)
    mcfg_state = state
    # Re-build a 1-step chunk so we can observe every intermediate state.
    tcfg = TrainConfig(batch_size=64, steps_per_call=1, d_lr=1e-3,
                       g_lr=1e-3, g_ema_decay=d)
    spec = make_mixture("ring8", std=0.1)
    data_fn = lambda key, n: (sample_mixture(key, spec, n), None)
    chunk1 = make_train_chunk(bundle, tcfg, data_fn, jax.random.PRNGKey(0))
    ema = jax.tree.map(jnp.copy, mcfg_state.g_vars["params"])
    st = mcfg_state
    for t in range(1, 4):
        st, _ = chunk1(st)
        dt = min(d, (1.0 + t) / (10.0 + t))
        ema = jax.tree.map(lambda e, p: dt * e + (1 - dt) * p, ema,
                           st.g_vars["params"])
    np.testing.assert_allclose(
        np.concatenate([np.ravel(x) for x in
                        jax.tree_util.tree_leaves(st.g_ema)]),
        np.concatenate([np.ravel(x) for x in
                        jax.tree_util.tree_leaves(ema)]), rtol=2e-5,
        atol=1e-6)


def test_ema_warmup_sheds_the_init():
    """With a decay whose flat horizon exceeds the run length (0.999 over
    10 steps), the warmup schedule keeps the weight on the random init
    below prod_t (1+t)/(10+t) ~ 2e-3 — without it 0.999^10 ~ 0.99 of the
    init would survive (the measured FID-34 failure, runs/mnist_ema/)."""
    _, state0, chunk = _setup(g_ema_decay=0.999)
    init = jax.tree.map(jnp.copy, state0.g_vars["params"])
    state, _ = chunk(state0)  # 10 steps
    # EMA must be far closer to the live params than to the init.
    assert _l1(state.g_ema, state.g_vars["params"]) < _l1(state.g_ema, init)


def test_ema_with_fused_prop():
    _, state, chunk = _setup(g_ema_decay=0.9, fused_prop=True)
    state, _ = chunk(state)
    assert state.g_ema is not None
    assert _l1(state.g_ema, state.g_vars["params"]) > 0


def test_old_checkpoint_restores_into_ema_state(tmp_path):
    """A checkpoint written before TrainState.g_ema existed (no such key)
    restores into an EMA-off state; with EMA enabled the restore still
    errors (missing real data) rather than silently zero-filling."""
    from flax import serialization

    from collaborative_gan_sampling_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    _, state, _ = _setup()  # ema off -> g_ema=None
    # Simulate the old format: drop the g_ema key entirely.
    sd = serialization.to_state_dict(jax.device_get(state))
    sd.pop("g_ema")
    path = tmp_path / "ckpt_00000001.msgpack"
    path.write_bytes(serialization.msgpack_serialize(sd))

    restored = restore_checkpoint(str(path), target=state)
    assert restored.g_ema is None
    np.testing.assert_array_equal(np.asarray(restored.step),
                                  np.asarray(state.step))

    # Round-trip WITH ema tracked.
    _, state_ema, chunk = _setup(g_ema_decay=0.9)
    state_ema, _ = chunk(state_ema)
    p = save_checkpoint(str(tmp_path / "ema"), 1, state_ema)
    back = restore_checkpoint(p, target=state_ema)
    assert _l1(back.g_ema, state_ema.g_ema) == 0.0
