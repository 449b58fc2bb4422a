"""Dump the panaceaplus checkpoint's state-dict KEY LIST (names + shapes)
without any weights.

The real `panaceaplus_40k_deepspeed.ckpt` is not available in this
environment, but its key set is fully determined by the reference model
config (/root/reference/configs/inference_nuscenes.yaml): the torch modules
are instantiated on the `meta` device (no memory, no compute) at the FULL
production size and their state-dict names/shapes recorded. The OpenCLIP
ViT-H text tower (conditioner.embedders.0.model.*) cannot be instantiated
(open_clip is not installed); its keys are generated from the documented
ViT-H-14 text config (width 1024, 24 layers, heads 16, mlp 4096, vocab
49408, ctx 77 — open_clip model_configs/ViT-H-14.json) which the CLIP
parity test independently validates against transformers weights.

Output: tests/fixtures/panaceaplus_keys.json  {key: [shape...]}
Consumed by: inference.py --dry_convert (whole-checkpoint name-coverage
proof) and tests/test_convert.py.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    import torch
    import yaml

    from reference_loader import load_reference

    REF = load_reference()
    cfg = yaml.safe_load(
        open("/root/reference/configs/inference_nuscenes.yaml"))
    mp = cfg["model"]["params"]
    net = dict(mp["network_config"]["params"])
    cn = dict(net.pop("controlnet_config")["params"])
    # use_checkpoint wraps blocks in checkpoint_wrapper (training-only
    # machinery); param names are identical without it
    net["use_checkpoint"] = False
    cn["use_checkpoint"] = False
    cn_cfg = {
        "target": "sgm.modules.diffusionmodules.controlmodel.ControlNet3D",
        "params": cn,
    }

    keys: dict[str, list[int]] = {}

    def record(module: torch.nn.Module, prefix: str):
        for k, v in module.state_dict().items():
            keys[prefix + k] = list(v.shape)

    with torch.device("meta"):
        unet = REF["controlmodel"].ControlledUNetModel3D(
            controlnet_config=cn_cfg, **net)
    record(unet, "model.diffusion_model.")

    dd = dict(mp["first_stage_config"]["params"]["ddconfig"])
    embed_dim = mp["first_stage_config"]["params"]["embed_dim"]
    z = dd["z_channels"]
    model_mod = REF["model"]

    class FirstStage(torch.nn.Module):
        # AutoencoderKL naming (sgm/models/autoencoder.py:333-368):
        # encoder/decoder + quant convs
        def __init__(self):
            super().__init__()
            self.encoder = model_mod.Encoder(**dd)
            self.decoder = model_mod.Decoder(**dd)
            self.quant_conv = torch.nn.Conv2d(2 * z, 2 * embed_dim, 1)
            self.post_quant_conv = torch.nn.Conv2d(embed_dim, z, 1)

    with torch.device("meta"):
        fs = FirstStage()
    record(fs, "first_stage_model.")

    # OpenCLIP ViT-H-14 text tower, visual deleted
    # (encoders/modules.py:577-585)
    W, L, V, CTX, MLP = 1024, 24, 49408, 77, 4096
    p = "conditioner.embedders.0.model."
    keys[p + "positional_embedding"] = [CTX, W]
    keys[p + "text_projection"] = [W, W]
    keys[p + "logit_scale"] = []
    keys[p + "token_embedding.weight"] = [V, W]
    keys[p + "ln_final.weight"] = [W]
    keys[p + "ln_final.bias"] = [W]
    keys[p + "attn_mask"] = [CTX, CTX]
    for i in range(L):
        r = f"{p}transformer.resblocks.{i}."
        for ln in ("ln_1", "ln_2"):
            keys[r + ln + ".weight"] = [W]
            keys[r + ln + ".bias"] = [W]
        keys[r + "attn.in_proj_weight"] = [3 * W, W]
        keys[r + "attn.in_proj_bias"] = [3 * W]
        keys[r + "attn.out_proj.weight"] = [W, W]
        keys[r + "attn.out_proj.bias"] = [W]
        keys[r + "mlp.c_fc.weight"] = [MLP, W]
        keys[r + "mlp.c_fc.bias"] = [MLP]
        keys[r + "mlp.c_proj.weight"] = [W, MLP]
        keys[r + "mlp.c_proj.bias"] = [W]

    out = os.path.join(REPO, "tests", "fixtures", "panaceaplus_keys.json")
    with open(out, "w") as f:
        json.dump(keys, f, indent=0, sort_keys=True)
    print(f"{len(keys)} keys -> {out}")


if __name__ == "__main__":
    main()
