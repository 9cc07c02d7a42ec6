import os

import jax
import jax.numpy as jnp
import numpy as np

from collaborative_gan_sampling_tpu.config import ModelConfig, RefineConfig
from collaborative_gan_sampling_tpu.data import make_mixture, sample_mixture
from collaborative_gan_sampling_tpu.models import make_bundle
from collaborative_gan_sampling_tpu.sampling.refine import make_refine_fn
from collaborative_gan_sampling_tpu.viz import (
    plot_2d_overview,
    plot_refinement_trajectories,
    save_image_grid,
)


def test_save_image_grid(tmp_path):
    imgs = jnp.zeros((10, 8, 8, 1)).at[:, 2:6, 2:6, :].set(1.0)
    path = save_image_grid(str(tmp_path / "grid.png"), imgs, nrow=4)
    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_save_image_grid_rgb(tmp_path):
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (6, 8, 8, 3)) * 2 - 1
    path = save_image_grid(str(tmp_path / "rgb.png"), imgs, nrow=3)
    assert os.path.exists(path)


def test_teaser_gif(tmp_path):
    from collaborative_gan_sampling_tpu.viz import save_teaser_gif

    spec = make_mixture("ring8", std=0.1)
    traj = np.linspace(0, 1, 6)[:, None, None] * np.ones((6, 32, 2))
    path = save_teaser_gif(str(tmp_path / "t.gif"), traj, spec)
    assert os.path.exists(path) and os.path.getsize(path) > 1000
    with open(path, "rb") as fh:
        assert fh.read(6) in (b"GIF87a", b"GIF89a")


def test_2d_plots(tmp_path):
    bundle = make_bundle(ModelConfig(kind="mlp", g_hidden=16, d_hidden=16,
                                     compute_dtype="float32"))
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(0))
    spec = make_mixture("ring8", std=0.1)
    x_real = sample_mixture(jax.random.PRNGKey(1), spec, 128)
    z = bundle.sample_z(jax.random.PRNGKey(2), 128)
    x_gen = bundle.generate(g_vars, z)

    p1 = plot_2d_overview(str(tmp_path / "ov.png"), bundle, d_vars, spec,
                          x_real, x_gen, x_gen)
    assert os.path.getsize(p1) > 1000

    refine = jax.jit(make_refine_fn(bundle,
                                    RefineConfig(steps=4, rate=0.1,
                                                 use_pallas=False),
                                    return_trajectory=True))
    _, aux = refine(d_vars, x_gen[:16])
    p2 = plot_refinement_trajectories(str(tmp_path / "traj.png"),
                                      aux["traj"], spec)
    assert os.path.getsize(p2) > 1000
