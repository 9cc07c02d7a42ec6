"""Pallas fused K-step refinement kernel (C4 fast path).

The north-star spec (BASELINE.json / SURVEY.md section 2 native-components
note) requires the K-step refinement inner loop lowered to Pallas so samples
stay VMEM-resident across all K steps. This kernel implements the full loop
for the MLP discriminator (the 2D synthetic stack, C2):

    for k in 1..K:
        logit  = MLP(x)                      # forward, all matmuls on MXU
        dlogit = -sigmoid(-logit)            # d softplus(-l) / dl
        g      = backprop_to_input(dlogit)   # hand-written VJP, in-kernel
        x      = x - rate * g

One ``pallas_call`` per refined batch: x never leaves VMEM between steps, the
weights are loaded once, and the K-step loop is a ``fori_loop`` *inside* the
kernel — versus the reference's 2K host<->device round-trips per batch
(SURVEY.md section 3.2) and versus the lax.scan path's K HBM round-trips for
x. The scan implementation (sampling/refine.py) is the parity oracle; the
test suite gates this kernel on allclose agreement over random (params, x0,
K, rate) — SURVEY.md section 4 "kernel parity".

Conv discriminators keep the XLA-fused scan path (hand-writing conv VJPs in
Pallas buys nothing over XLA's own fusions there — SURVEY.md section 7
stage 5 scopes Pallas to MLP-D).

Weights layout: a list of (kernel, bias) with kernel (in, out) — exactly
Flax Dense param shapes. Hidden activations use relu; the final layer is a
1-unit linear head, kept as a (h, 128)-padded matmul so every MXU op in the
kernel is lane-aligned.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mlp_params_from_dvars(d_vars: Any) -> list[tuple[jax.Array, jax.Array]]:
    """Extract ordered (kernel, bias) pairs from MLPDiscriminator variables."""
    params = d_vars["params"]
    # Sort numerically: lexicographic order would put 'fc10' before 'fc2'
    # and silently reorder weights for discriminators with >=10 hidden layers.
    layers = sorted((k for k in params if k.startswith("fc")),
                    key=lambda s: int(s[2:]))
    out = [(params[k]["kernel"], params[k]["bias"]) for k in layers]
    out.append((params["out"]["kernel"], params["out"]["bias"]))
    return out


def _refine_kernel(steps: int, rate: float, n_hidden: int,
                   x_ref, *refs):
    """Kernel body. refs = [W0, b0, ..., WL, bL, Wout, bout, x_out, logit_out].

    All weight matrices arrive pre-padded to lane-aligned shapes; the head
    is padded to 128 output columns of which column 0 is the real logit.
    """
    n_layers = n_hidden + 1  # hidden layers + head
    w_refs = refs[0:2 * n_layers:2]
    b_refs = refs[1:2 * n_layers:2]
    x_out_ref = refs[2 * n_layers]
    logit_out_ref = refs[2 * n_layers + 1]

    ws = [w_ref[:] for w_ref in w_refs]
    bs = [b_ref[:] for b_ref in b_refs]

    def forward(x):
        """Returns (logit column (B, 128) with real logit in col 0, acts)."""
        acts = [x]
        h = x
        for i in range(n_hidden):
            z = jnp.dot(h, ws[i], preferred_element_type=jnp.float32) + bs[i]
            h = jnp.maximum(z, 0.0)
            acts.append(h)
        logit = jnp.dot(h, ws[-1],
                        preferred_element_type=jnp.float32) + bs[-1]
        return logit, acts

    def step(_, x):
        logit, acts = forward(x)
        # d/dlogit softplus(-logit) = -sigmoid(-logit); only column 0 of the
        # padded head is real — zero the rest so they contribute nothing.
        dlogit = -jax.nn.sigmoid(-logit)
        col = jax.lax.broadcasted_iota(jnp.int32, dlogit.shape, 1)
        dlogit = jnp.where(col == 0, dlogit, 0.0)
        # Backward through the head and hidden stack to the input.
        da = jnp.dot(dlogit, ws[-1].T, preferred_element_type=jnp.float32)
        for i in range(n_hidden - 1, -1, -1):
            dz = jnp.where(acts[i + 1] > 0, da, 0.0)
            da = jnp.dot(dz, ws[i].T, preferred_element_type=jnp.float32)
        return x - rate * da

    x = jax.lax.fori_loop(0, steps, step, x_ref[:])
    x_out_ref[:] = x
    logit, _ = forward(x)
    logit_out_ref[:] = logit[:, :1]


@functools.partial(jax.jit,
                   static_argnames=("steps", "rate", "tile", "interpret"))
def fused_refine_mlp(d_vars: Any, x0: jax.Array, steps: int, rate: float,
                     tile: int = 512,
                     interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """K-step fused refinement of x0 (B, D) under an MLP discriminator.

    Returns (x_K, final logits), matching sampling/refine.py's scan path
    (without gradient clipping — the Pallas path is gated to clip_norm == 0).
    """
    params = _mlp_params_from_dvars(d_vars)
    b, d = x0.shape
    n_hidden = len(params) - 1

    # Pad every dimension to TPU lane/sublane alignment. Zero-padding is
    # exact: padded input columns meet zero weight rows, padded hidden units
    # get bias 0 and weight 0 so relu(0)=0 contributes nothing, and the
    # padded head columns are masked in the kernel.
    d_pad = _round_up(d, 128)
    b_pad = _round_up(b, tile)
    x_p = jnp.zeros((b_pad, d_pad), jnp.float32).at[:b, :d].set(
        x0.astype(jnp.float32))

    padded: list[jax.Array] = []
    in_dim = d_pad
    for i, (w, bia) in enumerate(params):
        out_dim = _round_up(w.shape[1], 128)
        w_p = jnp.zeros((in_dim, out_dim), jnp.float32).at[
            :w.shape[0], :w.shape[1]].set(w.astype(jnp.float32))
        b_p = jnp.zeros((1, out_dim), jnp.float32).at[0, :bia.shape[0]].set(
            bia.astype(jnp.float32))
        padded += [w_p, b_p]
        in_dim = out_dim

    grid = (b_pad // tile,)
    x_spec = pl.BlockSpec((tile, d_pad), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(p.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for p in padded]
    out_specs = (
        pl.BlockSpec((tile, d_pad), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_refine_kernel, steps, rate, n_hidden)
    x_out, logits = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[x_spec] + w_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        ),
        interpret=interpret,
    )(x_p, *padded)
    return x_out[:b, :d], logits[:b, 0]


def supports_pallas_refine(bundle, cfg, labels) -> bool:
    """The fused kernel covers: MLP D, unconditional, no grad clipping,
    TPU backend (CPU test runs use the scan oracle instead)."""
    from collaborative_gan_sampling_tpu.models.mlp import MLPDiscriminator

    return (isinstance(getattr(bundle, "d", None), MLPDiscriminator)
            and labels is None and cfg.clip_norm == 0 and cfg.use_pallas
            and getattr(cfg, "objective", "ns") == "ns"
            and getattr(cfg, "stop_score", 0.0) == 0.0
            and getattr(cfg, "proximal", 0.0) == 0.0
            and jax.default_backend() == "tpu")
