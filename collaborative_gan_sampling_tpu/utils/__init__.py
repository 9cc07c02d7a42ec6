from collaborative_gan_sampling_tpu.utils.prng import step_key, split_for_batch  # noqa: F401
from collaborative_gan_sampling_tpu.utils.logging import MetricsWriter  # noqa: F401
