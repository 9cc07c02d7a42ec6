from collaborative_gan_sampling_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    batch_sharding,
    constrain_batch,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from collaborative_gan_sampling_tpu.parallel.multihost import (  # noqa: F401
    maybe_initialize_distributed,
)
