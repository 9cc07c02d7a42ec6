"""Reference-compatible entry: ``synthetic/main_synthetic.py`` flags."""

import sys

from collaborative_gan_sampling_tpu.compat._shared import run


def main(argv=None) -> int:
    return run("toy2d", argv,
               defaults={"niters": 4000, "batch_size": 256, "lr": 1e-3,
                         "rollout_rate": 0.1})


if __name__ == "__main__":
    sys.exit(main())
