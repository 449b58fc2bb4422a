from panacea_tpu.diffusion import (  # noqa: F401
    denoiser,
    discretization,
    guiders,
    loss,
    samplers,
    scaling,
    sigma_sampling,
    util,
    weighting,
)
