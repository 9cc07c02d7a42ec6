import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from collaborative_gan_sampling_tpu.evals import (
    FIDStats,
    frechet_distance,
    make_feature_fn,
    stats_from_features,
    streaming_stats,
)
from collaborative_gan_sampling_tpu.ops.sqrtm import (
    sqrtm_newton_schulz,
    trace_sqrtm_product,
)


def _random_psd(key, n, cond=10.0):
    q, _ = np.linalg.qr(np.asarray(
        jax.random.normal(key, (n, n)), np.float64))
    eigs = np.linspace(1.0, cond, n)
    return (q * eigs) @ q.T


def test_sqrtm_matches_scipy():
    a = _random_psd(jax.random.PRNGKey(0), 16)
    got = np.asarray(sqrtm_newton_schulz(jnp.asarray(a, jnp.float32), 30))
    want = scipy.linalg.sqrtm(a).real
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_trace_sqrtm_product_matches_scipy():
    s1 = _random_psd(jax.random.PRNGKey(1), 12)
    s2 = _random_psd(jax.random.PRNGKey(2), 12, cond=5.0)
    got = float(trace_sqrtm_product(jnp.asarray(s1, jnp.float32),
                                    jnp.asarray(s2, jnp.float32), 30))
    want = np.trace(scipy.linalg.sqrtm(s1 @ s2)).real
    assert got == pytest.approx(want, rel=2e-3)


def test_trace_sqrtm_eigh_matches_scipy():
    from collaborative_gan_sampling_tpu.ops.sqrtm import (
        trace_sqrtm_product_eigh,
    )
    s1 = _random_psd(jax.random.PRNGKey(11), 12)
    s2 = _random_psd(jax.random.PRNGKey(12), 12, cond=5.0)
    got = float(trace_sqrtm_product_eigh(jnp.asarray(s1, jnp.float32),
                                         jnp.asarray(s2, jnp.float32)))
    want = np.trace(scipy.linalg.sqrtm(s1 @ s2)).real
    assert got == pytest.approx(want, rel=1e-3)


def test_trace_sqrtm_eigh_rank_deficient():
    """The regime that breaks Newton-Schulz: rank r << n covariances."""
    from collaborative_gan_sampling_tpu.ops.sqrtm import (
        trace_sqrtm_product_eigh,
    )
    rng = np.random.default_rng(0)
    x1 = rng.standard_normal((8, 32))  # rank <= 7
    x2 = rng.standard_normal((10, 32))
    s1 = np.cov(x1, rowvar=False)
    s2 = np.cov(x2, rowvar=False)
    got = float(trace_sqrtm_product_eigh(jnp.asarray(s1, jnp.float32),
                                         jnp.asarray(s2, jnp.float32)))
    want = np.trace(scipy.linalg.sqrtm(s1 @ s2)).real
    assert np.isfinite(got)
    assert got == pytest.approx(want, rel=0.05, abs=0.5)


def test_frechet_closed_form_identical_gaussians():
    s = _random_psd(jax.random.PRNGKey(3), 8)
    st = FIDStats(mu=jnp.zeros(8), sigma=jnp.asarray(s, jnp.float32),
                  n=jnp.float32(1e4))
    fid = float(frechet_distance(st, st, 30))
    assert abs(fid) < 0.05  # exactly zero in exact arithmetic


def test_frechet_closed_form_mean_shift():
    # Same covariance, shifted mean: FID = ||dmu||^2 exactly.
    s = _random_psd(jax.random.PRNGKey(4), 8)
    mu2 = jnp.asarray(np.arange(8), jnp.float32)
    a = FIDStats(jnp.zeros(8), jnp.asarray(s, jnp.float32), jnp.float32(1))
    b = FIDStats(mu2, jnp.asarray(s, jnp.float32), jnp.float32(1))
    want = float(jnp.dot(mu2, mu2))
    assert float(frechet_distance(a, b, 30)) == pytest.approx(want, rel=1e-2)


def test_frechet_closed_form_diagonal():
    # Diagonal Gaussians: FID = ||dmu||^2 + sum (sqrt(s1) - sqrt(s2))^2.
    d1 = np.array([1.0, 2.0, 3.0], np.float32)
    d2 = np.array([2.0, 2.0, 1.0], np.float32)
    a = FIDStats(jnp.zeros(3), jnp.diag(jnp.asarray(d1)), jnp.float32(1))
    b = FIDStats(jnp.ones(3), jnp.diag(jnp.asarray(d2)), jnp.float32(1))
    want = 3.0 + float(np.sum((np.sqrt(d1) - np.sqrt(d2)) ** 2))
    assert float(frechet_distance(a, b, 30)) == pytest.approx(want, rel=1e-2)


def test_streaming_stats_match_direct():
    key = jax.random.PRNGKey(5)

    def feature_fn(x):
        return x

    def batch_fn(k, n):
        return jax.random.normal(k, (n, 6)) * 2 + 1

    st_stream = jax.jit(
        lambda k: streaming_stats(feature_fn, batch_fn, 50, 64, k))(key)
    # Ground truth from a big direct sample of the same distribution.
    direct = stats_from_features(
        jax.random.normal(jax.random.PRNGKey(9), (3200, 6)) * 2 + 1)
    np.testing.assert_allclose(np.asarray(st_stream.mu),
                               np.asarray(direct.mu), atol=0.15)
    np.testing.assert_allclose(np.asarray(st_stream.sigma),
                               np.asarray(direct.sigma), atol=0.4)


def test_streaming_stats_stable_with_large_means():
    """The one-pass sum/sum-sq formula cancels catastrophically in f32 when
    feature means are large (relu classifier features); the Chan-merge
    implementation must stay accurate."""
    key = jax.random.PRNGKey(7)
    shift = 50.0  # large mean relative to unit variance

    def feature_fn(x):
        return x

    def batch_fn(k, n):
        return jax.random.normal(k, (n, 8)) + shift

    st = jax.jit(lambda k: streaming_stats(feature_fn, batch_fn, 64, 128,
                                           k))(key)
    np.testing.assert_allclose(np.asarray(st.mu), shift, rtol=1e-3)
    # Covariance ~ identity; the old formula would produce O(10) garbage.
    np.testing.assert_allclose(np.asarray(st.sigma), np.eye(8), atol=0.06)


def test_frechet_distance_host_matches_scipy():
    from collaborative_gan_sampling_tpu.evals.fid import (
        frechet_distance_host,
    )
    s1 = _random_psd(jax.random.PRNGKey(21), 10)
    s2 = _random_psd(jax.random.PRNGKey(22), 10, cond=4.0)
    mu1, mu2 = np.zeros(10), np.linspace(0, 1, 10)
    a = FIDStats(jnp.asarray(mu1, jnp.float32), jnp.asarray(s1, jnp.float32),
                 jnp.float32(1))
    b = FIDStats(jnp.asarray(mu2, jnp.float32), jnp.asarray(s2, jnp.float32),
                 jnp.float32(1))
    got = frechet_distance_host(a, b)
    want = (np.sum((mu1 - mu2) ** 2) + np.trace(s1) + np.trace(s2)
            - 2 * np.trace(scipy.linalg.sqrtm(
                np.asarray(s1, np.float32).astype(np.float64)
                @ np.asarray(s2, np.float32).astype(np.float64))).real)
    assert got == pytest.approx(want, rel=1e-3)


def test_trained_classifier_features_separate_classes():
    from collaborative_gan_sampling_tpu.config import DataConfig
    from collaborative_gan_sampling_tpu.data import load_image_dataset
    from collaborative_gan_sampling_tpu.evals.features import (
        train_classifier_features,
    )

    ds = load_image_dataset(DataConfig(dataset="mnist"), procedural_n=1024)

    def data_fn(key, n):
        return ds.batch(key, n)

    feature_fn, info = train_classifier_features(
        data_fn, 10, (28, 28, 1), steps=80, batch=64)
    assert float(info["final_loss"]) < 2.1  # below log(10) chance level
    x, y = ds.batch(jax.random.PRNGKey(0), 256)
    f = np.asarray(feature_fn(x))
    assert f.shape == (256, 256)
    y = np.asarray(y)
    # Same-class features must sit closer to their OWN centroid than
    # OTHER-class features do — a constant/random feature map fails this
    # (the earlier own-vs-other-centroid form was vacuously true for any
    # feature map, since a centroid near-minimizes distance to its points).
    c0 = f[y == y[0]].mean(0)
    d_own = np.linalg.norm(f[y == y[0]] - c0, axis=1).mean()
    d_cross = np.linalg.norm(f[y != y[0]] - c0, axis=1).mean()
    assert d_own < d_cross


def test_rotation_features_learn_orientation():
    from collaborative_gan_sampling_tpu.config import DataConfig
    from collaborative_gan_sampling_tpu.data import load_image_dataset
    from collaborative_gan_sampling_tpu.data.images import normalize_images
    from collaborative_gan_sampling_tpu.evals.features import (
        train_rotation_features,
    )

    ds = load_image_dataset(DataConfig(dataset="mnist"), procedural_n=512)

    def data_fn(key, n):
        x, _ = ds.batch(key, n)
        return x

    feature_fn, info = train_rotation_features(data_fn, (28, 28, 1),
                                               steps=300, batch=64)
    # 4-way chance level is log(4) ~ 1.386; must be decisively below (CPU
    # conv reductions are slightly nondeterministic run-to-run, so leave
    # real margin rather than asserting near the chance line).
    assert float(info["final_loss"]) < 1.25
    x = data_fn(jax.random.PRNGKey(0), 64)
    f = feature_fn(x)
    assert f.shape == (64, 256)
    assert np.isfinite(np.asarray(f)).all()


def test_fid_discriminates_distributions():
    """FID(real, real') << FID(real, shifted) with the random_conv net."""
    feature_fn, label = make_feature_fn("random_conv", (16, 16, 1))
    assert label == "random_conv"
    key = jax.random.PRNGKey(0)

    def mk(k, shift):
        return jnp.clip(
            jax.random.normal(k, (128, 16, 16, 1)) * 0.2 + shift, -1, 1)

    f_real1 = feature_fn(mk(jax.random.fold_in(key, 0), 0.0))
    f_real2 = feature_fn(mk(jax.random.fold_in(key, 1), 0.0))
    f_shift = feature_fn(mk(jax.random.fold_in(key, 2), 0.8))
    s1, s2, s3 = map(stats_from_features, (f_real1, f_real2, f_shift))
    # Default (eigh) cross term: the 128-sample, 512-feature stats here are
    # heavily rank-deficient — exactly what the robust path is for.
    fid_same = float(frechet_distance(s1, s2))
    fid_diff = float(frechet_distance(s1, s3))
    assert fid_diff > 10 * max(fid_same, 1e-3)


# -- precomputed real-stats npz (SURVEY.md C13: the reference's pattern) ----

def _rand_stats(dim=6, seed=0):
    from collaborative_gan_sampling_tpu.evals.fid import FIDStats

    rng = np.random.default_rng(seed)
    a = rng.standard_normal((32, dim)).astype(np.float32)
    return FIDStats(mu=jnp.asarray(a.mean(0)),
                    sigma=jnp.asarray(np.cov(a, rowvar=False,
                                             dtype=np.float32)),
                    n=jnp.float32(32))


def test_stats_npz_roundtrip(tmp_path):
    from collaborative_gan_sampling_tpu.evals.fid import load_stats, save_stats

    stats = _rand_stats()
    path = str(tmp_path / "real_stats.npz")
    save_stats(path, stats, feature_net="random_conv")
    loaded, label = load_stats(path)
    assert label == "random_conv"
    np.testing.assert_allclose(np.asarray(loaded.mu), np.asarray(stats.mu))
    np.testing.assert_allclose(np.asarray(loaded.sigma),
                               np.asarray(stats.sigma))
    assert float(loaded.n) == 32


def test_stats_npz_pytorch_fid_convention(tmp_path):
    """Foreign npz files (pytorch-fid: mu/sigma; TTUR: mean/cov aliases)
    load without n or a feature-net label."""
    from collaborative_gan_sampling_tpu.evals.fid import load_stats

    stats = _rand_stats(dim=4, seed=1)
    p1 = str(tmp_path / "ptfid.npz")
    np.savez(p1, mu=np.asarray(stats.mu), sigma=np.asarray(stats.sigma))
    loaded, label = load_stats(p1)
    assert label == ""
    np.testing.assert_allclose(np.asarray(loaded.mu), np.asarray(stats.mu))

    p2 = str(tmp_path / "ttur.npz")
    np.savez(p2, mean=np.asarray(stats.mu), cov=np.asarray(stats.sigma))
    loaded2, _ = load_stats(p2)
    np.testing.assert_allclose(np.asarray(loaded2.sigma),
                               np.asarray(stats.sigma))

    p3 = str(tmp_path / "junk.npz")
    np.savez(p3, foo=np.zeros(3))
    with pytest.raises(ValueError, match="expected keys"):
        load_stats(p3)

    p4 = str(tmp_path / "bad_shape.npz")
    np.savez(p4, mu=np.zeros(4), sigma=np.zeros((3, 3)))
    with pytest.raises(ValueError, match="inconsistent"):
        load_stats(p4)
