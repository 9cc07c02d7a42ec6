"""TF1-style CPU reference for the refinement loop — the baseline to beat.

SURVEY.md section 6: "the real deliverable baseline is *measured*, not quoted —
run the TF1 reference on CPU ... to get refined-samples/sec". The reference
repo's source is not present in this environment, so this module implements
the reference's *architecture of execution* faithfully (from SURVEY.md
section 3.2) rather than its exact code:

* TF1 graph semantics via ``tf.compat.v1`` with eager disabled;
* a DCGAN discriminator graph matching C7 (stride-2 5x5 convs, lrelu,
  batchnorm, linear logit) at the benchmark resolution;
* the K-step refinement loop exactly as the reference runs it: ONE
  ``sess.run(tf.gradients(loss, x))`` per step with the
  ``x_{k+1} = x_k - lam * g`` update applied in **host numpy** between
  steps — i.e. 2K host<->device boundary crossings per batch.

This is the per-step-dispatch execution model whose removal is the point of
the rebuild; measuring it on this host's CPU gives the denominator for
bench.py's ``vs_baseline``.
"""

from __future__ import annotations

import json
import os
import time

BASELINE_CACHE = os.path.join(os.path.dirname(__file__),
                              "tf1_cpu_baseline.json")


def measure_tf1_refine_throughput(image_size: int = 28, channels: int = 1,
                                  batch_size: int = 64, steps_k: int = 10,
                                  rate: float = 0.02, num_batches: int = 4,
                                  warmup_batches: int = 1,
                                  base_filters: int = 64) -> dict:
    """Refined samples/sec of the TF1-style CPU loop. Slow by design."""
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    import numpy as np
    import tensorflow.compat.v1 as tf

    tf.disable_eager_execution()
    tf.reset_default_graph()

    def lrelu(x, leak=0.2):
        return tf.maximum(x, leak * x)

    # carpedm20-style raw-op primitives (tf.layers is gone under Keras 3).
    def conv2d(x, out_ch, name):
        in_ch = int(x.shape[-1])
        w = tf.get_variable(f"{name}/w", [5, 5, in_ch, out_ch],
                            initializer=tf.truncated_normal_initializer(
                                stddev=0.02))
        b = tf.get_variable(f"{name}/b", [out_ch],
                            initializer=tf.zeros_initializer())
        return tf.nn.conv2d(x, w, strides=[1, 2, 2, 1], padding="SAME") + b

    def batch_norm(x, name):
        ch = int(x.shape[-1])
        gamma = tf.get_variable(f"{name}/gamma", [ch],
                                initializer=tf.ones_initializer())
        beta = tf.get_variable(f"{name}/beta", [ch],
                               initializer=tf.zeros_initializer())
        mean = tf.get_variable(f"{name}/mean", [ch],
                               initializer=tf.zeros_initializer(),
                               trainable=False)
        var = tf.get_variable(f"{name}/var", [ch],
                              initializer=tf.ones_initializer(),
                              trainable=False)
        return tf.nn.batch_normalization(x, mean, var, beta, gamma, 1e-5)

    def discriminator(x, df_dim=base_filters):
        # C7 discriminator: conv stack, bn after all but first, linear logit.
        h = lrelu(conv2d(x, df_dim, "conv0"))
        n_stages = {28: 2, 32: 3, 64: 4}[image_size]
        for i in range(1, n_stages):
            h = conv2d(h, df_dim * (2 ** i), f"conv{i}")
            h = lrelu(batch_norm(h, f"bn{i}"))
        h = tf.reshape(h, [batch_size, -1])
        w = tf.get_variable("out/w", [int(h.shape[-1]), 1],
                            initializer=tf.truncated_normal_initializer(
                                stddev=0.02))
        return tf.matmul(h, w)[:, 0]

    x_ph = tf.placeholder(tf.float32, [batch_size, image_size, image_size,
                                       channels])
    with tf.variable_scope("D"):
        logits = discriminator(x_ph)
    refine_loss = tf.reduce_sum(tf.nn.softplus(-logits))
    grad = tf.gradients(refine_loss, x_ph)[0]

    rng = np.random.default_rng(0)
    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        times = []
        for b in range(warmup_batches + num_batches):
            x = rng.standard_normal(
                (batch_size, image_size, image_size, channels)).astype(
                    np.float32)
            t0 = time.perf_counter()
            for _ in range(steps_k):  # the reference's hot loop: one
                g = sess.run(grad, {x_ph: x})  # sess.run per refinement step
                x = x - rate * g  # host-side numpy update
            dt = time.perf_counter() - t0
            if b >= warmup_batches:
                times.append(dt)
    sec_per_batch = sum(times) / len(times)
    return {
        "samples_per_sec": batch_size / sec_per_batch,
        "batch_size": batch_size,
        "steps_k": steps_k,
        "image_size": image_size,
        "channels": channels,
        "num_batches": num_batches,
        "host": "cpu",
        "execution_model": "tf1 sess.run per refine step + host numpy update",
    }


def get_or_measure_baseline(**kw) -> dict:
    """Measure once, cache to disk (the TF1 CPU run is slow)."""
    key = json.dumps(kw, sort_keys=True)
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as fh:
            cache = json.load(fh)
    if key not in cache:
        cache[key] = measure_tf1_refine_throughput(**kw)
        with open(BASELINE_CACHE, "w") as fh:
            json.dump(cache, fh, indent=2)
    return cache[key]


if __name__ == "__main__":
    print(json.dumps(get_or_measure_baseline(), indent=2))
