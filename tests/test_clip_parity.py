"""CLIP text tower parity: my flax implementation with weights converted from
a randomly-initialized transformers CLIPTextModel must match its outputs.
This validates both the architecture and the converter's qkv/linear/LN
transforms end-to-end."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from panacea_tpu.models.clip import CLIPTextTransformer


def hf_to_flax_params(model, layers):
    """Map a transformers CLIPTextModel state dict onto CLIPTextTransformer."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    p = {
        "token_embedding": {
            "embedding": sd["text_model.embeddings.token_embedding.weight"]
        },
        "positional_embedding":
            sd["text_model.embeddings.position_embedding.weight"],
        "ln_final": {
            "scale": sd["text_model.final_layer_norm.weight"],
            "bias": sd["text_model.final_layer_norm.bias"],
        },
    }
    for i in range(layers):
        pre = f"text_model.encoder.layers.{i}"
        blk = {
            "ln_1": {"scale": sd[f"{pre}.layer_norm1.weight"],
                     "bias": sd[f"{pre}.layer_norm1.bias"]},
            "ln_2": {"scale": sd[f"{pre}.layer_norm2.weight"],
                     "bias": sd[f"{pre}.layer_norm2.bias"]},
            "mlp_fc": {"kernel": sd[f"{pre}.mlp.fc1.weight"].T,
                       "bias": sd[f"{pre}.mlp.fc1.bias"]},
            "mlp_proj": {"kernel": sd[f"{pre}.mlp.fc2.weight"].T,
                         "bias": sd[f"{pre}.mlp.fc2.bias"]},
            "attn": {},
        }
        for name, hf in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                         ("v_proj", "v_proj"), ("out_proj", "out_proj")):
            blk["attn"][name] = {
                "kernel": sd[f"{pre}.self_attn.{hf}.weight"].T,
                "bias": sd[f"{pre}.self_attn.{hf}.bias"],
            }
        p[f"resblock_{i}"] = blk
    return jax.tree.map(jnp.asarray, p)


@pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
def test_clip_matches_transformers(act):
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=256,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=16, hidden_act=act,
    )
    torch.manual_seed(0)
    hf = CLIPTextModel(cfg).eval()
    tokens = np.array([[49, 3, 7, 999, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]])
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens)).last_hidden_state.numpy()

    model = CLIPTextTransformer(
        vocab_size=1000, width=64, heads=4, layers=3, context_length=16,
        penultimate=False, act=act,
    )
    params = hf_to_flax_params(hf, 3)
    out = model.apply({"params": params}, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_concat_timestep_embedder():
    from panacea_tpu.models.conditioner import ConcatTimestepEmbedderND

    emb = ConcatTimestepEmbedderND(outdim=32)
    out = emb(np.array([[256.0, 512.0], [128.0, 128.0]]))
    assert out.shape == (2, 64)
    assert np.all(np.isfinite(np.asarray(out)))
