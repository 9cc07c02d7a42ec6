from collaborative_gan_sampling_tpu.training.gan import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_chunk,
    nonsaturating_d_loss,
    nonsaturating_g_loss,
    sampling_g_vars,
)
from collaborative_gan_sampling_tpu.training.shaping import (  # noqa: F401
    ShapingState,
    create_shaping_state,
    make_shaping_step,
)
