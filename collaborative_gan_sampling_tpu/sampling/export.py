"""Ahead-of-time serving export — the sampler as a self-contained artifact.

Production serving wants the sampler without the framework: no Python model
code at load time, no version skew between the training and serving fleets.
``jax.export`` serializes the traced serving program

    key -> z -> G -> [K-step refinement] -> D logits -> [DRS accept]

to portable StableHLO with the trained weights AND the DRS calibration
(burn-in logit max M) baked in as constants. The artifact is a single file,
loadable by any JAX runtime via :func:`load_sampler` (plus a JSON sidecar
with shapes/method so servers can validate before loading), and exportable
for multiple platforms at once (e.g. ``("tpu", "cpu")``) so the same blob
serves on TPU and runs in CPU CI.

``export_tf_savedmodel`` additionally wraps the same program via ``jax2tf``
into a TF SavedModel for TF-Serving fleets (interop only — the compute is
the identical StableHLO under native serialization).

The reference has no serving story at all (single ``tf.Session`` scripts,
SURVEY.md L6); this module plus sampling/serve.py is the TPU-native
production path BASELINE.json's "large-scale serving" intent asks for.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

from collaborative_gan_sampling_tpu.sampling.serve import ServingSampler

_META_SUFFIX = ".json"


def _meta_path(path: str) -> str:
    return path + _META_SUFFIX


def export_sampler(sampler: ServingSampler, g_vars: Any, d_vars: Any,
                   key: jax.Array, path: str,
                   platforms: Sequence[str] | None = None) -> dict:
    """Serialize one serving round to `path`; returns the sidecar meta dict.

    The exported callable takes ONE argument — a uint32[2] PRNG key — and
    returns ``(samples, labels|None, accept_mask, logits)`` for
    ``cfg.num_batches * cfg.batch_size`` candidates, exactly like
    ``ServingSampler.round`` (weights, DRS calibration M and, for collab,
    the shaped D are constants inside the program).

    ``platforms`` defaults to ``("tpu", "cpu")`` — cross-platform lowering
    happens at export time, no TPU needed to produce a TPU artifact.
    """
    if sampler.mesh is not None:
        raise ValueError(
            "export_sampler serializes a single-device program (serving "
            "replicas scale by running one artifact per chip); build the "
            "ServingSampler with mesh=None")
    platforms = tuple(platforms) if platforms else ("tpu", "cpu")
    k_cal, _ = jax.random.split(key)
    m = sampler.calibrate(g_vars, d_vars, k_cal)
    m = jax.device_get(m)  # constant-fold the calibration into the export

    def serve_round(serve_key):
        return sampler._round(g_vars, d_vars, m, serve_key)

    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
    exported = jax_export.export(jax.jit(serve_round),
                                 platforms=list(platforms))(key_spec)
    blob = exported.serialize()
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(blob)
    os.replace(tmp, path)

    cfg = sampler.cfg
    meta = {
        "format": "jax.export/stablehlo",
        "method": sampler.method,
        "platforms": list(platforms),
        "batch_size": cfg.batch_size,
        "num_batches": cfg.num_batches,
        "candidates_per_round": cfg.batch_size * cfg.num_batches,
        "data_shape": list(sampler.bundle.data_shape),
        "conditional": sampler.bundle.conditional,
        "class_id": sampler.class_id,
        "refine_steps": cfg.steps if sampler._refine_on else 0,
        "rejection": sampler._reject_on,
        "key_dtype": "uint32[2]",
        "bytes": len(blob),
    }
    with open(_meta_path(path), "w") as fh:
        json.dump(meta, fh, indent=2, sort_keys=True)
    return meta


def load_sampler(path: str) -> tuple[Callable[[jax.Array], Any], dict]:
    """(callable, meta) from an :func:`export_sampler` artifact.

    The callable takes a uint32[2] PRNG key and returns
    ``(samples, labels|None, accept_mask, logits)``. No model code, config
    or checkpoint is needed — the blob is self-contained.
    """
    with open(path, "rb") as fh:
        exported = jax_export.deserialize(bytearray(fh.read()))
    meta = {}
    if os.path.exists(_meta_path(path)):
        with open(_meta_path(path)) as fh:
            meta = json.load(fh)
    return exported.call, meta


def export_tf_savedmodel(sampler: ServingSampler, g_vars: Any, d_vars: Any,
                         key: jax.Array, directory: str) -> str:
    """The same serving round as a TF SavedModel (TF-Serving interop).

    Uses jax2tf native serialization: the SavedModel carries the identical
    StableHLO program wrapped in a tf.function named ``serve_round`` whose
    input is a uint32[2] PRNG key. TensorFlow is imported lazily.
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    if not tf.executing_eagerly():
        raise RuntimeError(
            "export_tf_savedmodel needs TensorFlow eager mode "
            "(tf.saved_model.save is a TF2 API); this process has "
            "tf.compat.v1.disable_eager_execution() in effect")
    if sampler.mesh is not None:
        raise ValueError("export a single-device program (mesh=None)")
    k_cal, _ = jax.random.split(key)
    m = jax.device_get(sampler.calibrate(g_vars, d_vars, k_cal))

    def serve_round(serve_key):
        out = sampler._round(g_vars, d_vars, m, serve_key)
        # tf.function outputs must be tensors; drop the None labels slot
        # for unconditional models (meta records conditionality).
        return tuple(o for o in out if o is not None)

    tf_fn = tf.function(
        jax2tf.convert(serve_round, with_gradient=False),
        input_signature=[tf.TensorSpec((2,), tf.uint32, name="key")],
        autograph=False)
    module = tf.Module()
    module.serve_round = tf_fn
    tf.saved_model.save(module, directory)
    return directory
