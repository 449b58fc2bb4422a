from panacea_tpu.models import (  # noqa: F401
    clip,
    conditioner,
    controlnet,
    engine,
    layers,
    transformer,
    unet,
    vae,
)
