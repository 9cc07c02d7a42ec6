"""Flax Inception-v3 pool3 (evals/inception.py): architecture shape/layout
correctness with random-init weights, save/load, and the torch-state-dict
converter — so real pretrained weights are drop-in when obtainable
(SURVEY.md section 7 stage 4; VERDICT round 1 next-round item 4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collaborative_gan_sampling_tpu.evals.features import make_feature_fn
from collaborative_gan_sampling_tpu.evals.inception import (
    POOL3_DIM,
    InceptionV3Features,
    conversion_layer_names,
    init_inception_variables,
    load_inception_variables,
    make_inception_feature_fn,
    params_from_torch_state_dict,
    preprocess_for_inception,
    save_inception_params,
)


@pytest.fixture(scope="module")
def variables():
    return init_inception_variables(0)


def test_architecture_tree_and_feature_dim(variables):
    params = variables["params"]
    expected_blocks = {
        "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "Conv2d_3b_1x1",
        "Conv2d_4a_3x3", "Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
        "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a",
        "Mixed_7b", "Mixed_7c"}
    assert set(params) == expected_blocks
    # Canonical channel plan at key points.
    assert params["Conv2d_1a_3x3"]["conv"]["kernel"].shape == (3, 3, 3, 32)
    assert params["Mixed_5b"]["branch5x5_2"]["conv"]["kernel"].shape == \
        (5, 5, 48, 64)
    assert params["Mixed_6b"]["branch7x7_2"]["conv"]["kernel"].shape == \
        (1, 7, 128, 128)
    assert params["Mixed_7c"]["branch3x3dbl_1"]["conv"]["kernel"].shape == \
        (1, 1, 2048, 448)
    # ~24M parameters, like the real net (pool3 trunk, no fc/aux).
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    assert 20e6 < n_params < 26e6

    feats = InceptionV3Features().apply(
        variables, jnp.zeros((2, 299, 299, 3), jnp.float32))
    assert feats.shape == (2, POOL3_DIM)
    assert np.isfinite(np.asarray(feats)).all()


def test_preprocess_grayscale_and_resize():
    x = jnp.zeros((3, 28, 28, 1), jnp.float32)
    out = preprocess_for_inception(x)
    assert out.shape == (3, 299, 299, 3)
    # Channel replication: a gray ramp stays equal across channels.
    x = jnp.linspace(-1, 1, 28 * 28).reshape(1, 28, 28, 1)
    out = preprocess_for_inception(x)
    np.testing.assert_allclose(np.asarray(out[..., 0]),
                               np.asarray(out[..., 1]), rtol=1e-6)


def test_save_load_and_feature_fn_spec(tmp_path, variables):
    path = os.path.join(tmp_path, "inception.msgpack")
    save_inception_params(path, variables)

    fn, label = make_feature_fn(f"inception:{path}", (28, 28, 1))
    assert label == "inception_v3"
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 28, 28, 1),
                           minval=-1.0, maxval=1.0)
    feats = fn(x)
    assert feats.shape == (2, POOL3_DIM)
    assert np.isfinite(np.asarray(feats)).all()
    # Loaded weights reproduce the in-memory net exactly.
    direct = InceptionV3Features().apply(variables,
                                         preprocess_for_inception(x))
    np.testing.assert_allclose(np.asarray(feats), np.asarray(direct),
                               atol=1e-5)


def test_missing_weight_file_clear_error():
    with pytest.raises(FileNotFoundError, match="save_inception_params"):
        make_feature_fn("inception:/nonexistent/w.msgpack", (28, 28, 1))


def test_load_validates_tree(tmp_path, variables):
    from flax import serialization

    bad = serialization.to_state_dict(jax.device_get(variables))
    del bad["params"]["Mixed_7c"]
    path = os.path.join(tmp_path, "bad.msgpack")
    with open(path, "wb") as fh:
        fh.write(serialization.msgpack_serialize(bad))
    with pytest.raises(ValueError, match="Mixed_7c"):
        load_inception_variables(path)


def test_torch_state_dict_conversion_roundtrip(variables):
    """Invert our layout into a torch-style state dict, convert back, and
    check the forward pass is bit-identical — proves the name map and the
    (O,I,H,W)->(H,W,I,O) kernel transpose are exactly right."""
    params = variables["params"]
    stats = variables["batch_stats"]

    def get(tree, path):
        for part in path.split("/"):
            tree = tree[part]
        return tree

    sd = {}
    for torch_prefix, flax_path in conversion_layer_names():
        conv = get(params, flax_path)["conv"]
        bn_p = get(params, flax_path)["bn"]
        bn_s = get(stats, flax_path)["bn"]
        sd[f"{torch_prefix}.conv.weight"] = np.asarray(
            conv["kernel"]).transpose(3, 2, 0, 1)
        sd[f"{torch_prefix}.bn.weight"] = np.asarray(bn_p["scale"])
        sd[f"{torch_prefix}.bn.bias"] = np.asarray(bn_p["bias"])
        sd[f"{torch_prefix}.bn.running_mean"] = np.asarray(bn_s["mean"])
        sd[f"{torch_prefix}.bn.running_var"] = np.asarray(bn_s["var"])
    # Entries past pool3 (fc / AuxLogits) must be ignored.
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)

    converted = params_from_torch_state_dict(sd)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 299, 299, 3))
    a = InceptionV3Features().apply(variables, x)
    b = InceptionV3Features().apply(converted, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fid_pool_semantics():
    """The FID graph's pooling deviations from stock torchvision: 3x3/s1
    avg pools exclude padding from the divisor (a constant image stays
    constant at the borders), and Mixed_7c's pool branch is a MAX pool."""
    from collaborative_gan_sampling_tpu.evals.inception import (
        InceptionE,
        _avg_pool_3x3_same,
        _max_pool_3x3_same,
    )

    ones = jnp.ones((1, 5, 5, 2))
    # count_include_pad=False: corner windows average 4 real ones -> 1.0
    # (the include-pad default would give 4/9 at corners).
    np.testing.assert_allclose(np.asarray(_avg_pool_3x3_same(ones)), 1.0)
    x = jnp.zeros((1, 5, 5, 1)).at[0, 2, 2, 0].set(1.0)
    mp = np.asarray(_max_pool_3x3_same(x))
    assert mp[0, 2, 2, 0] == 1.0 and mp[0, 1, 1, 0] == 1.0  # 3x3 max spread

    # Mixed_7b/7c differ ONLY in the pool branch; same params must give
    # different outputs on a border-structured input.
    key = jax.random.PRNGKey(0)
    xin = jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 8, 1280))
    e_avg = InceptionE(pool_branch="avg")
    e_max = InceptionE(pool_branch="max")
    variables = e_avg.init(key, xin)
    out_avg = e_avg.apply(variables, xin)
    out_max = e_max.apply(variables, xin)
    assert out_avg.shape == out_max.shape == (1, 8, 8, 2048)
    assert not np.allclose(np.asarray(out_avg), np.asarray(out_max))
