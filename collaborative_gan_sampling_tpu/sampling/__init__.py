from collaborative_gan_sampling_tpu.sampling.collab import (  # noqa: F401
    METHODS,
    SampleResult,
    sample,
    sample_refine_reject,
)
from collaborative_gan_sampling_tpu.sampling.refine import (  # noqa: F401
    make_refine_fn,
    refine_samples,
)
from collaborative_gan_sampling_tpu.sampling.rejection import (  # noqa: F401
    drs_accept_mask,
    drs_acceptance_prob,
    estimate_logit_max,
)
from collaborative_gan_sampling_tpu.sampling.mh import (  # noqa: F401
    fit_platt,
    make_mh_sampler,
)
