from collaborative_gan_sampling_tpu.evals.metrics2d import (  # noqa: F401
    metrics_2d,
    mode_assignments,
)
