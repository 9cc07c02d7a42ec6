from collaborative_gan_sampling_tpu.data.synthetic2d import (  # noqa: F401
    MixtureSpec,
    make_mixture,
    sample_mixture,
)
from collaborative_gan_sampling_tpu.data.images import (  # noqa: F401
    ImageDataset,
    load_image_dataset,
)
