from collaborative_gan_sampling_tpu.evals.metrics2d import (  # noqa: F401
    metrics_2d,
    mode_assignments,
)
from collaborative_gan_sampling_tpu.evals.fid import (  # noqa: F401
    FIDStats,
    fid_between,
    frechet_distance,
    stats_from_features,
    streaming_stats,
)
from collaborative_gan_sampling_tpu.evals.features import (  # noqa: F401
    make_feature_fn,
)
from collaborative_gan_sampling_tpu.evals.prd import (  # noqa: F401
    precision_recall,
)
from collaborative_gan_sampling_tpu.evals.kid import (  # noqa: F401
    kid,
    mmd2_unbiased,
)
