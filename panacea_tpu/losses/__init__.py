from panacea_tpu.losses.lpips import LPIPS, VGG16Features  # noqa: F401
from panacea_tpu.losses.vae_losses import (  # noqa: F401
    GeneralLPIPSWithDiscriminator,
    LatentLPIPS,
    NLayerDiscriminator,
    adaptive_weight,
    hinge_d_loss,
    kl_divergence,
    vanilla_d_loss,
)
