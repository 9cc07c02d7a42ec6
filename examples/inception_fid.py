"""Using the real Inception-v3 pool3 for reference-comparable FID.

Offline environments can't download the pretrained weights, but the full
architecture + loader ship in-tree. The moment you have a torchvision /
pytorch-fid checkpoint (pt_inception-2015-12-05 state dict), convert once
and every FID in the framework becomes Inception-FID:

    import torch  # only needed for the one-time conversion
    from collaborative_gan_sampling_tpu.evals.inception import (
        params_from_torch_state_dict, save_inception_params)

    sd = torch.load("pt_inception-2015-12-05.pth", map_location="cpu")
    variables = params_from_torch_state_dict(sd)
    save_inception_params("inception_v3.msgpack", variables)

Then point any config at it:

    python -m collaborative_gan_sampling_tpu.cli eval --config celeba \
        eval.feature_net=inception:inception_v3.msgpack

For a smoke run without real weights (features are meaningless but the
whole pipeline executes):

    from collaborative_gan_sampling_tpu.evals.inception import (
        init_inception_variables, save_inception_params)
    save_inception_params("/tmp/incep_rand.msgpack",
                          init_inception_variables(0))
"""

if __name__ == "__main__":
    from collaborative_gan_sampling_tpu.evals.inception import (
        init_inception_variables,
        save_inception_params,
    )

    path = save_inception_params("/tmp/incep_rand.msgpack",
                                 init_inception_variables(0))
    print(f"random-init Inception variables written to {path}; pass "
          f"eval.feature_net=inception:{path} to any cli command")
