"""Frozen OpenCLIP ViT-H-14 text tower (flax).

TPU-native equivalent of the reference FrozenOpenCLIPEmbedder
(sgm/modules/encoders/modules.py:559-632): token + positional embedding, 24
pre-LN transformer blocks with causal masking, penultimate-layer output (the
last block is skipped), then ln_final. Output: (B, 77, 1024) fp32.

The tower is frozen in Panacea — pure inference code; weights come from the
torch checkpoint via the converter in panacea_tpu/utils/convert.py.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from panacea_tpu.data.tokenizer import CONTEXT_LENGTH, SimpleTokenizer
from panacea_tpu.ops.attention import merge_heads, split_heads

Dtype = Any


class CLIPAttention(nn.Module):
    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        d = self.width // self.heads
        q = nn.Dense(self.width, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.width, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.width, dtype=self.dtype, name="v_proj")(x)
        qh = split_heads(q, self.heads)
        kh = split_heads(k, self.heads)
        vh = split_heads(v, self.heads)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32) * (d**-0.5)
        logits = logits + mask[None, None]
        probs = nn.softmax(logits, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
        return nn.Dense(self.width, dtype=self.dtype, name="out_proj")(
            merge_heads(out)
        )


def quick_gelu(x):
    """OpenAI CLIP activation (x * sigmoid(1.702 x)); OpenCLIP ViT-H uses
    exact gelu."""
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPBlock(nn.Module):
    width: int
    heads: int
    act: str = "gelu"  # 'gelu' (OpenCLIP ViT-H) | 'quick_gelu' (OpenAI CLIP-L)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        x = x + CLIPAttention(self.width, self.heads, dtype=self.dtype,
                              name="attn")(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="mlp_fc")(h)
        h = quick_gelu(h) if self.act == "quick_gelu" else nn.gelu(
            h, approximate=False
        )
        h = nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(h)
        return x + h


class CLIPTextTransformer(nn.Module):
    """ViT-H-14 text config: width 1024, 16 heads, 24 layers, vocab 49408."""

    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = CONTEXT_LENGTH
    penultimate: bool = True
    act: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        """tokens: (B, context_length) int32 -> (B, context_length, width)."""
        x = nn.Embed(self.vocab_size, self.width, dtype=self.dtype,
                     name="token_embedding")(tokens)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = x + pos.astype(x.dtype)
        causal = jnp.triu(
            jnp.full((self.context_length, self.context_length), -jnp.inf,
                     dtype=jnp.float32),
            k=1,
        )
        n_blocks = self.layers - 1 if self.penultimate else self.layers
        for i in range(self.layers):
            block = CLIPBlock(self.width, self.heads, act=self.act,
                              dtype=self.dtype, name=f"resblock_{i}")
            if i < n_blocks:
                x = block(x, causal)
            else:
                # instantiate unused tail blocks so the param tree matches the
                # full checkpoint; their compute is skipped (penultimate output,
                # modules.py:617-623)
                _ = block(jnp.zeros_like(x[:1]), causal)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)


class FrozenOpenCLIPEmbedder:
    """Host-side wrapper: tokenizer + jitted apply (config-compat with the
    reference embedder block, configs/inference_nuscenes.yaml:79-84)."""

    def __init__(self, arch="ViT-H-14", version=None, device=None, max_length=77,
                 freeze=True, layer="penultimate", bpe_path=None,
                 width=1024, heads=16, layers=24, vocab_size=49408):
        assert layer in ("last", "penultimate")
        self.model = CLIPTextTransformer(
            vocab_size=vocab_size, width=width, heads=heads, layers=layers,
            context_length=max_length, penultimate=(layer == "penultimate"),
        )
        self.tokenizer = SimpleTokenizer(bpe_path)
        self.max_length = max_length
        self.params = None  # set by checkpoint loading
        self._apply = None
        self.input_key = "txt"
        self.ucg_rate = 0.0
        self.is_trainable = False
        self.legacy_ucg_val = None

    def init_params(self, rng):
        import jax as _jax

        tokens = jnp.zeros((1, self.max_length), dtype=jnp.int32)
        self.params = _jax.jit(
            lambda k: self.model.init(k, tokens)["params"]
        )(rng)
        return self.params

    def __call__(self, texts):
        import jax

        if self.params is None:
            self.init_params(jax.random.PRNGKey(0))
        if self._apply is None:
            self._apply = jax.jit(
                lambda p, t: self.model.apply({"params": p}, t)
            )
        tokens = jnp.asarray(self.tokenizer(texts, self.max_length))
        return self._apply(self.params, tokens)

    def encode(self, texts):
        return self(texts)


class FrozenCLIPEmbedder(FrozenOpenCLIPEmbedder):
    """SD1.x-style HF CLIP-L text encoder (reference FrozenCLIPEmbedder,
    modules.py:385): width 768, 12 heads, 12 layers, quick_gelu, last layer."""

    def __init__(self, version=None, device=None, max_length=77, freeze=True,
                 layer="last", layer_idx=None, bpe_path=None):
        super().__init__(
            max_length=max_length, freeze=freeze,
            layer=layer if layer in ("last", "penultimate") else "last",
            bpe_path=bpe_path, width=768, heads=12, layers=12,
        )
        self.model = CLIPTextTransformer(
            vocab_size=49408, width=768, heads=12, layers=12,
            context_length=max_length,
            penultimate=(layer == "penultimate"), act="quick_gelu",
        )


class CLIPVisionTransformer(nn.Module):
    """OpenCLIP ViT vision tower (ViT-H/14 defaults): patch embed, class token,
    pre-LN transformer (no causal mask), pooled output through the projection.
    Backs FrozenOpenCLIPImageEmbedder (reference modules.py:635)."""

    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    heads: int = 16
    layers: int = 32
    output_dim: int = 1024
    act: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, output_tokens: bool = False):
        """x: (B, H, W, 3) preprocessed images."""
        b = x.shape[0]
        h = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    use_bias=False, dtype=self.dtype, name="patch_embed")(x)
        h = h.reshape(b, -1, self.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.width,))
        h = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.width)).astype(h.dtype), h],
            axis=1,
        )
        n_tok = h.shape[1]
        pos = self.param("positional_embedding", nn.initializers.normal(0.02),
                         (n_tok, self.width))
        h = h + pos.astype(h.dtype)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(h)
        zero_mask = jnp.zeros((n_tok, n_tok), dtype=jnp.float32)
        for i in range(self.layers):
            h = CLIPBlock(self.width, self.heads, act=self.act,
                          dtype=self.dtype, name=f"resblock_{i}")(h, zero_mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(h)
        pooled = h[:, 0]
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (self.width, self.output_dim))
        pooled = pooled @ proj.astype(pooled.dtype)
        if output_tokens:
            return pooled, h[:, 1:]
        return pooled


class FrozenOpenCLIPImageEmbedder:
    """CLIP image embedder (reference modules.py:635-720): resize+normalize to
    224, pooled CLIP embedding, optional ucg and repeat-to-max-len."""

    OPENAI_MEAN = (0.48145466, 0.4578275, 0.40821073)
    OPENAI_STD = (0.26862954, 0.26130258, 0.27577711)

    def __init__(self, arch="ViT-H-14", version=None, device=None,
                 max_length=77, freeze=True, antialias=True, ucg_rate=0.0,
                 unsqueeze_dim=False, repeat_to_max_len=False,
                 num_image_crops=0, output_tokens=False,
                 width=1280, heads=16, layers=32, output_dim=1024):
        self.model = CLIPVisionTransformer(
            width=width, heads=heads, layers=layers, output_dim=output_dim,
        )
        self.unsqueeze_dim = unsqueeze_dim
        self.repeat_to_max_len = repeat_to_max_len
        self.max_length = max_length
        self.output_tokens = output_tokens
        self.params = None
        self._apply = None
        self.input_key = None
        self.ucg_rate = ucg_rate
        self.is_trainable = False
        self.legacy_ucg_val = None

    def init_params(self, rng):
        import jax as _jax

        x = jnp.zeros((1, 224, 224, 3))
        self.params = _jax.jit(
            lambda k: self.model.init(k, x)["params"]
        )(rng)
        return self.params

    def preprocess(self, x):
        """x: (B, H, W, 3) in [-1, 1] -> CLIP-normalized 224x224."""
        import jax as _jax

        x = _jax.image.resize(
            x, (x.shape[0], 224, 224, 3), method="bicubic"
        )
        x = (x + 1.0) / 2.0
        return (x - jnp.asarray(self.OPENAI_MEAN)) / jnp.asarray(
            self.OPENAI_STD
        )

    def __call__(self, x):
        import jax as _jax

        if self.params is None:
            self.init_params(_jax.random.PRNGKey(0))
        if self._apply is None:
            self._apply = _jax.jit(
                lambda p, v: self.model.apply({"params": p}, v)
            )
        emb = self._apply(self.params, self.preprocess(jnp.asarray(x)))
        if self.unsqueeze_dim:
            emb = emb[:, None, :]
        if self.repeat_to_max_len:
            e = emb[:, None, :] if emb.ndim == 2 else emb
            return jnp.tile(e, (1, self.max_length, 1))
        return emb

    def encode(self, x):
        return self(x)
