from collaborative_gan_sampling_tpu.ops.nn import lrelu  # noqa: F401
