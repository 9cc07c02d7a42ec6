"""Visualization (C14) — the reference's plot identity, from device arrays.

Reference behavior (``synthetic/utils.py`` plot fns, ``teaser/``,
``celebA/utils.py::save_images`` — approximate paths, SURVEY.md C14):
2D scatter of real/generated/refined points, the D decision surface contour,
the dD/dx quiver field (the repo's signature teaser figure), KDE density
plots, refinement-trajectory figures, and tiled sample-grid montages for the
image models.

All field evaluations (D logits on a grid, gradient field, refinement
trajectories) are computed on device in one jitted call; matplotlib only
ever touches small host numpy arrays. Matplotlib's 'Agg' backend is forced —
plots are file artifacts, never windows.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from collaborative_gan_sampling_tpu.data.synthetic2d import MixtureSpec  # noqa: E402
from collaborative_gan_sampling_tpu.sampling.refine import (  # noqa: E402
    refine_loss_per_sample,
)


def _fields_fn(bundle):
    """Jitted (d_vars, pts) -> (logits, -grad) for one bundle, cached on the
    bundle instance: a fresh @jax.jit closure per plot call would retrace
    every viz interval (trace + cache-lookup dispatch on a 1-core host)."""
    cached = getattr(bundle, "_viz_fields_jit", None)
    if cached is not None:
        return cached

    @jax.jit
    def fields(d_vars, pts):
        logits = bundle.discriminate(d_vars, pts, train=False)

        def loss_sum(x):
            return jnp.sum(refine_loss_per_sample(
                bundle.discriminate(d_vars, x, train=False)))

        grad = jax.grad(loss_sum)(pts)
        return logits, -grad  # refinement moves along -grad

    # GANBundle is a frozen dataclass; the cache is incidental state, not a
    # field — bypass the frozen guard.
    object.__setattr__(bundle, "_viz_fields_jit", fields)
    return fields


def _grid_fields(bundle, d_vars, lim: float, n: int = 40):
    """D logits and refinement gradient field on an (n, n) grid — one jit."""
    xs = jnp.linspace(-lim, lim, n)
    xx, yy = jnp.meshgrid(xs, xs)
    pts = jnp.stack([xx.ravel(), yy.ravel()], axis=1)
    logits, vec = _fields_fn(bundle)(d_vars, pts)
    return (np.asarray(xx), np.asarray(yy),
            np.asarray(logits).reshape(n, n),
            np.asarray(vec).reshape(n, n, 2))


def plot_2d_overview(path: str, bundle, d_vars, spec: MixtureSpec,
                     x_real: Any, x_gen: Any, x_refined: Any | None = None,
                     lim: float = 3.0, title: str = "") -> str:
    """Scatter + decision surface + quiver + KDE — the 4-panel overview."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    x_real = np.asarray(x_real)[:2000]
    x_gen = np.asarray(x_gen)[:2000]
    xx, yy, surface, vec = _grid_fields(bundle, d_vars, lim)

    fig, axes = plt.subplots(1, 4, figsize=(22, 5))

    ax = axes[0]
    ax.scatter(x_real[:, 0], x_real[:, 1], s=4, alpha=0.4, label="real",
               color="tab:blue")
    ax.scatter(x_gen[:, 0], x_gen[:, 1], s=4, alpha=0.4, label="generated",
               color="tab:orange")
    if x_refined is not None:
        x_refined = np.asarray(x_refined)[:2000]
        ax.scatter(x_refined[:, 0], x_refined[:, 1], s=4, alpha=0.4,
                   label="refined", color="tab:green")
    ax.legend(markerscale=3)
    ax.set_title("samples")

    ax = axes[1]
    cs = ax.contourf(xx, yy, surface, levels=30, cmap="RdBu_r")
    fig.colorbar(cs, ax=ax)
    ax.scatter(np.asarray(spec.means)[:, 0], np.asarray(spec.means)[:, 1],
               marker="*", s=120, color="k")
    ax.set_title("D decision surface (logit)")

    ax = axes[2]
    skip = 2
    u, v = vec[::skip, ::skip, 0], vec[::skip, ::skip, 1]
    mag = np.hypot(u, v)
    # Direction field colored by magnitude; cap arrow length at the 90th
    # percentile so a few huge gradients don't drown the field.
    cap = np.percentile(mag, 90) + 1e-12
    scale = np.minimum(mag, cap) / (mag + 1e-12)
    ax.quiver(xx[::skip, ::skip], yy[::skip, ::skip], u * scale, v * scale,
              mag, cmap="viridis", angles="xy")
    ax.scatter(np.asarray(spec.means)[:, 0], np.asarray(spec.means)[:, 1],
               marker="*", s=120, color="r")
    ax.set_title("refinement field  -dl/dx")

    ax = axes[3]
    pool = x_refined if x_refined is not None else x_gen
    h = ax.hist2d(pool[:, 0], pool[:, 1], bins=60,
                  range=[[-lim, lim], [-lim, lim]], cmap="magma")
    fig.colorbar(h[3], ax=ax)
    ax.set_title("sample density (KDE-style)")

    for ax in axes:
        ax.set_xlim(-lim, lim)
        ax.set_ylim(-lim, lim)
        ax.set_aspect("equal")
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_refinement_trajectories(path: str, traj: Any,
                                 spec: MixtureSpec | None = None,
                                 lim: float = 3.0,
                                 max_traj: int = 64) -> str:
    """The teaser figure (C17): samples flowing along D's gradient field.

    `traj` is the (K+1, B, 2) array from refine(..., return_trajectory=True).
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    traj = np.asarray(traj)[:, :max_traj]
    fig, ax = plt.subplots(figsize=(6, 6))
    for b in range(traj.shape[1]):
        ax.plot(traj[:, b, 0], traj[:, b, 1], lw=0.7, alpha=0.5,
                color="tab:gray")
    ax.scatter(traj[0, :, 0], traj[0, :, 1], s=14, color="tab:orange",
               label="start", zorder=3)
    ax.scatter(traj[-1, :, 0], traj[-1, :, 1], s=14, color="tab:green",
               label="refined", zorder=3)
    if spec is not None:
        ax.scatter(np.asarray(spec.means)[:, 0], np.asarray(spec.means)[:, 1],
                   marker="*", s=140, color="k", label="modes", zorder=4)
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_aspect("equal")
    ax.legend()
    ax.set_title("refinement trajectories")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def save_teaser_gif(path: str, traj: Any, spec: MixtureSpec | None = None,
                    lim: float = 3.0, max_traj: int = 256,
                    fps: int = 8) -> str:
    """The reference README's animated teaser: samples flowing along D's
    gradient field, one frame per refinement step (C17)."""
    from matplotlib import animation

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    traj = np.asarray(traj)[:, :max_traj]
    fig, ax = plt.subplots(figsize=(5, 5))
    if spec is not None:
        ax.scatter(np.asarray(spec.means)[:, 0], np.asarray(spec.means)[:, 1],
                   marker="*", s=140, color="k", zorder=4)
    scat = ax.scatter(traj[0, :, 0], traj[0, :, 1], s=10,
                      color="tab:orange", zorder=3)
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_aspect("equal")
    title = ax.set_title("refinement step 0")

    def update(k):
        scat.set_offsets(traj[k])
        frac = k / max(1, len(traj) - 1)
        scat.set_color((1 - frac) * np.array([1.0, 0.5, 0.05])
                       + frac * np.array([0.17, 0.63, 0.17]))
        title.set_text(f"refinement step {k}")
        return scat, title

    anim = animation.FuncAnimation(fig, update, frames=len(traj))
    anim.save(path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return path


def save_image_grid(path: str, images: Any, nrow: int = 8) -> str:
    """Tile (N, H, W, C) images in [-1, 1] into a montage png
    (reference ``save_images``)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imgs = np.asarray(images)
    imgs = np.clip((imgs + 1.0) * 127.5, 0, 255).astype(np.uint8)
    n, h, w, c = imgs.shape
    ncol = (n + nrow - 1) // nrow
    grid = np.zeros((ncol * h, nrow * w, c), np.uint8)
    for i in range(n):
        r, col = divmod(i, nrow)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = imgs[i]
    if c == 1:
        # Pin the absolute intensity scale: without vmin/vmax matplotlib
        # contrast-stretches each montage to its own min/max, so grids from
        # different steps are not visually comparable.
        grid = grid[..., 0]
        plt.imsave(path, grid, cmap="gray", vmin=0, vmax=255)
    else:
        plt.imsave(path, grid)
    return path
