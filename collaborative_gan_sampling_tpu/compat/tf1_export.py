"""Export native checkpoints to the reference's TF1 variable layout (C15).

The exact inverse of ``compat/tf1_import.py``: a Flax ``(g_vars, d_vars)``
pair becomes a ``{tf1_variable_name: np.ndarray}`` map in the carpedm20
naming the reference inherits (SURVEY.md C7/C15, ``celebA/model.py``
approximate path), optionally written as a real ``tf.train.Saver``
checkpoint a TF1 process can restore.

Two uses:

* **Migration out** — the mirror of the migration-in path, so "switch to
  this framework" is not a one-way door.
* **The north-star 'at equal FID' closure** (BASELINE.json) — the TF1
  reference execution model (one ``sess.run`` per refinement step,
  ``benchmarks/tf1_reference.py``) must run from the SAME trained weights
  as the fused JAX scan to show the throughput ratio holds at equal FID.
  This module carries the weights across; ``benchmarks/tf1_equal_fid.py``
  runs both arms and FIDs both pools.

Layout facts are the import module's, inverted (each pinned by the
round-trip tests in ``tests/test_tf1_export.py``):

* Flax ``Dense`` kernel ``[in, out]`` -> dense ``Matrix`` (identity);
* Flax ``Conv`` HWIO kernel -> conv ``w`` (identity);
* Flax ``ConvTranspose`` HWIO kernel -> TF1 ``conv2d_transpose`` ``w``
  ``[kh, kw, out, in]`` via spatial flip + ``(0, 1, 3, 2)`` transpose
  (an involution — the same op as the import direction);
* Flax ``BatchNorm`` ``{scale, bias}`` + ``{mean, var}`` -> contrib
  ``batch_norm`` ``{gamma, beta, moving_mean, moving_variance}``.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from collaborative_gan_sampling_tpu.config import ModelConfig


def _np(tree: Any) -> Any:
    import jax

    return jax.tree.map(lambda a: np.asarray(a, dtype=np.float32), tree)


def _deconv_kernel_tf(w_flax: np.ndarray) -> np.ndarray:
    """Flax ConvTranspose HWIO -> TF1 conv2d_transpose [kh, kw, out, in].

    flip . transpose(0,1,3,2) is its own inverse (tf1_import._deconv_kernel).
    """
    return np.flip(np.transpose(w_flax, (0, 1, 3, 2)), axis=(0, 1)).copy()


def _bn_vars(params: Mapping, stats: Mapping, scope: str) -> dict:
    return {
        f"{scope}/gamma": params["scale"],
        f"{scope}/beta": params["bias"],
        f"{scope}/moving_mean": stats["mean"],
        f"{scope}/moving_variance": stats["var"],
    }


def export_dcgan(g_vars: Mapping, d_vars: Mapping, cfg: ModelConfig
                 ) -> dict[str, np.ndarray]:
    """(g_vars, d_vars) Flax trees -> carpedm20-named TF1 variable map.

    Inverse of ``tf1_import.import_dcgan`` (same layer correspondence
    table); conditional models are rejected for the same reason imports
    are — the reference's TF1 DCGAN graphs have no label-embedding slots.
    """
    from collaborative_gan_sampling_tpu.compat.tf1_import import (
        TF1ImportError,
    )
    from collaborative_gan_sampling_tpu.models.dcgan import num_stages

    if cfg.kind != "dcgan":
        raise TF1ImportError(
            f"export_dcgan needs kind='dcgan', got {cfg.kind!r}")
    if cfg.num_classes:
        raise TF1ImportError(
            "conditional DCGANs (num_classes > 0) have projection/embedding "
            "parameters the reference's TF1 graphs cannot hold — export an "
            "unconditional model")
    gp, gs = _np(g_vars["params"]), _np(g_vars.get("batch_stats", {}))
    dp, ds = _np(d_vars["params"]), _np(d_vars.get("batch_stats", {}))
    n = num_stages(cfg.image_size)

    out: dict[str, np.ndarray] = {
        "generator/g_h0_lin/Matrix": gp["project"]["kernel"],
        "generator/g_h0_lin/bias": gp["project"]["bias"],
    }
    out.update(_bn_vars(gp["bn_project"], gs["bn_project"],
                        "generator/g_bn0"))
    for i in range(n - 1):
        out[f"generator/g_h{i + 1}/w"] = _deconv_kernel_tf(
            gp[f"deconv{i}"]["kernel"])
        out[f"generator/g_h{i + 1}/biases"] = gp[f"deconv{i}"]["bias"]
        out.update(_bn_vars(gp[f"bn{i}"], gs[f"bn{i}"],
                            f"generator/g_bn{i + 1}"))
    out[f"generator/g_h{n}/w"] = _deconv_kernel_tf(
        gp["deconv_out"]["kernel"])
    out[f"generator/g_h{n}/biases"] = gp["deconv_out"]["bias"]

    out["discriminator/d_h0_conv/w"] = dp["conv0"]["kernel"]
    out["discriminator/d_h0_conv/biases"] = dp["conv0"]["bias"]
    for i in range(1, n):
        out[f"discriminator/d_h{i}_conv/w"] = dp[f"conv{i}"]["kernel"]
        out[f"discriminator/d_h{i}_conv/biases"] = dp[f"conv{i}"]["bias"]
        out.update(_bn_vars(dp[f"bn{i}"], ds[f"bn{i}"],
                            f"discriminator/d_bn{i}"))
    out[f"discriminator/d_h{n}_lin/Matrix"] = dp["out"]["kernel"]
    out[f"discriminator/d_h{n}_lin/bias"] = dp["out"]["bias"]
    return out


def export_mlp(g_vars: Mapping, d_vars: Mapping, cfg: ModelConfig
               ) -> dict[str, np.ndarray]:
    """(g_vars, d_vars) Flax MLP trees -> TF1 variable map.

    Names follow the synthetic stack's scope convention the importer
    infers from (``generator/fc{i}``, ``discriminator/out`` — SURVEY.md C2
    approximate naming): natural name sort recovers graph order, so an
    exported map re-imports without explicit scope lists.
    """
    from collaborative_gan_sampling_tpu.compat.tf1_import import (
        TF1ImportError,
    )

    if cfg.kind != "mlp":
        raise TF1ImportError(f"export_mlp needs kind='mlp', got {cfg.kind!r}")
    out: dict[str, np.ndarray] = {}
    for who, tree in (("generator", _np(g_vars["params"])),
                      ("discriminator", _np(d_vars["params"]))):
        for scope, layer in tree.items():
            out[f"{who}/{scope}/Matrix"] = layer["kernel"]
            out[f"{who}/{scope}/bias"] = layer["bias"]
    return out


def export_tf1(g_vars: Mapping, d_vars: Mapping, cfg: ModelConfig
               ) -> dict[str, np.ndarray]:
    """TF1 variable map for either model family (dispatch mirror of
    ``tf1_import.import_tf1``)."""
    from collaborative_gan_sampling_tpu.compat.tf1_import import (
        TF1ImportError,
    )

    if cfg.kind == "dcgan":
        return export_dcgan(g_vars, d_vars, cfg)
    if cfg.kind == "mlp":
        return export_mlp(g_vars, d_vars, cfg)
    raise TF1ImportError(f"unsupported model kind {cfg.kind!r}")


def write_tf1_checkpoint(tf_vars: Mapping[str, np.ndarray],
                         prefix: str) -> str:
    """Write a real ``tf.train.Saver`` checkpoint a TF1 process restores.

    Builds a throwaway graph of ``tf.Variable``s named as in ``tf_vars``
    and saves once. Returns the checkpoint prefix (``Saver.save``'s return),
    alongside which the ``checkpoint`` index file is written so the
    reference's ``tf.train.latest_checkpoint``-based ``load()`` helpers
    resolve it.
    """
    import tensorflow.compat.v1 as tf

    with tf.Graph().as_default():
        for name, arr in sorted(tf_vars.items()):
            tf.get_variable(name, initializer=np.asarray(arr, np.float32))
        saver = tf.train.Saver()
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            return saver.save(sess, prefix)


def state_to_tf1(state: Any, cfg: ModelConfig,
                 prefix: str | None = None, use_ema: bool = False):
    """Convenience: a TrainState -> TF1 variable map (or Saver ckpt).

    ``use_ema`` substitutes the EMA generator parameters — what
    sampling/serving would use — for the raw ones.
    """
    g_vars = state.g_vars
    if use_ema:
        if state.g_ema is None:
            raise ValueError("use_ema=True but the state tracks no EMA "
                             "(train.g_ema_decay == 0)")
        g_vars = dict(g_vars, params=state.g_ema)
    tf_vars = export_tf1(g_vars, state.d_vars, cfg)
    if prefix is not None:
        return write_tf1_checkpoint(tf_vars, prefix)
    return tf_vars
