"""GeneralConditioner and non-text embedders.

Equivalent of sgm/modules/encoders/modules.py:95-249, 1016-1057. Embedders are
host-side objects (the text tower carries its own jitted apply); outputs are
routed to conditioning keys:

  txt             -> 'crossattn'  (B, 77, 1024)
  cond_img        -> 'cond_feat'  (B*T, H, W, 19)   — BEV-layout hint passthrough
  final_cond_zero -> 'concat'     (B*T, h, w, 4)    — VAE latent of cond frames

Inputs arrive channels-last: images (B, T, H, W, C); the (b t) flattening of the
reference (modules.py:156-164) happens here too.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from panacea_tpu.registry import instantiate_from_config

_CFG_KEYS = ("vector", "crossattn", "concat", "cond_feat", "cond_bev_feat")


def _flatten_bt(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B*T, H, W, C)"""
    if x.ndim == 5:
        b, t = x.shape[:2]
        return x.reshape((b * t,) + x.shape[2:])
    return x


class IdentityEncoder:
    """Passes the rendered 19-ch BEV layout straight through
    (modules.py:244-249)."""

    def __init__(self):
        self.input_key = None
        self.ucg_rate = 0.0
        self.is_trainable = False
        self.legacy_ucg_val = None

    def __call__(self, x):
        return jnp.asarray(x)

    def encode(self, x):
        return self(x)


class VAEEmbedder:
    """Encodes the conditioning-frame stack with the frozen VAE
    (modules.py:1016-1057); wired to the engine's first stage by
    ``DiffusionEngine3D.setup_vaeembedder`` equivalent."""

    def __init__(self, down_blur_factor: int = 1):
        assert down_blur_factor >= 1
        self.down_blur_factor = down_blur_factor
        self.encode_fn = None  # set by the engine: images -> scaled latents
        self.input_key = None
        self.ucg_rate = 0.0
        self.is_trainable = False
        self.legacy_ucg_val = None

    def __call__(self, x):
        assert self.encode_fn is not None, "VAEEmbedder not wired to a first stage"
        x = jnp.asarray(x)
        if self.down_blur_factor > 1:
            h, w = x.shape[-3:-1]
            small = jax.image.resize(
                x,
                x.shape[:-3] + (h // self.down_blur_factor,
                                w // self.down_blur_factor, x.shape[-1]),
                method="bilinear",
            )
            x = jax.image.resize(x, x.shape, method="bilinear")
        return self.encode_fn(x)

    def encode(self, x):
        return self(x)


class ConcatTimestepEmbedderND:
    """Embeds N scalar conditions (e.g. original_size) with sinusoidal
    timestep embeddings and flattens (reference modules.py:978)."""

    def __init__(self, outdim: int = 256):
        self.outdim = outdim
        self.input_key = None
        self.ucg_rate = 0.0
        self.is_trainable = False
        self.legacy_ucg_val = None

    def __call__(self, x):
        from panacea_tpu.diffusion.util import timestep_embedding

        x = jnp.asarray(x, dtype=jnp.float32)
        if x.ndim == 1:
            x = x[:, None]
        b, dims = x.shape
        emb = timestep_embedding(x.reshape(-1), self.outdim)
        return emb.reshape(b, dims * self.outdim)


class ClassEmbedder:
    """Class-id embedding table (reference modules.py:268). Holds its own
    params (frozen-style host wrapper like the text embedders)."""

    def __init__(self, embed_dim: int, n_classes: int = 1000,
                 add_sequence_dim: bool = False):
        self.embed_dim = embed_dim
        self.n_classes = n_classes
        self.add_sequence_dim = add_sequence_dim
        self.params = None
        self.input_key = None
        self.ucg_rate = 0.0
        self.is_trainable = False
        self.legacy_ucg_val = None

    def init_params(self, rng):
        self.params = jax.random.normal(
            rng, (self.n_classes, self.embed_dim)
        ) * 0.02
        return self.params

    def __call__(self, c):
        if self.params is None:
            self.init_params(jax.random.PRNGKey(0))
        emb = self.params[jnp.asarray(c, dtype=jnp.int32)]
        if self.add_sequence_dim:
            emb = emb[:, None, :]
        return emb


class DownSampler:
    """Conv hint downsampler embedder (reference modules.py DownSampler:
    13-ch rendered layout -> /8 latent-res features). Holds its own flax
    module + params like the other host-side embedders."""

    def __init__(self, dims: int = 2, model_input_channels: int = 4,
                 in_channels: int = 13):
        import flax.linen as nn

        class _Net(nn.Module):
            out_ch: int

            @nn.compact
            def __call__(self, x):
                widths = [16, 16, 32, 32, 96, 96]
                strides = [1, 2, 2, 2, 1, 1]
                for i, (w, s) in enumerate(zip(widths, strides)):
                    x = nn.Conv(w, (3, 3), strides=(s, s), padding=1,
                                name=f"conv{i}")(x)
                    x = nn.silu(x)
                return nn.Conv(self.out_ch, (3, 3), padding=1,
                               kernel_init=nn.initializers.zeros,
                               name="conv_out")(x)

        self.net = _Net(model_input_channels)
        self.in_channels = in_channels
        self.params = None
        self._apply = None
        self.input_key = None
        self.ucg_rate = 0.0
        self.is_trainable = False
        self.legacy_ucg_val = None

    def init_params(self, rng):
        x = jnp.zeros((1, 32, 32, self.in_channels))
        self.params = jax.jit(lambda k: self.net.init(k, x)["params"])(rng)
        return self.params

    def __call__(self, x):
        if self.params is None:
            self.init_params(jax.random.PRNGKey(0))
        if self._apply is None:
            self._apply = jax.jit(
                lambda p, v: self.net.apply({"params": p}, v)
            )
        return self._apply(self.params, jnp.asarray(x))


class FrozenT5Embedder:
    """T5 text encoder via transformers' flax model (reference modules.py:302).
    Requires local weights (zero-egress image) — raises a clear error when
    absent."""

    def __init__(self, version: str = "google/t5-v1_1-xxl", device=None,
                 max_length: int = 77, freeze: bool = True):
        self.version = version
        self.max_length = max_length
        self._model = None
        self._tok = None
        self.input_key = None
        self.ucg_rate = 0.0
        self.is_trainable = False
        self.legacy_ucg_val = None

    def _load(self):
        from transformers import AutoTokenizer, FlaxT5EncoderModel

        self._tok = AutoTokenizer.from_pretrained(self.version)
        self._model = FlaxT5EncoderModel.from_pretrained(self.version)

    def __call__(self, texts):
        if self._model is None:
            self._load()
        batch = self._tok(
            list(texts), truncation=True, max_length=self.max_length,
            padding="max_length", return_tensors="np",
        )
        out = self._model(input_ids=batch["input_ids"])
        return jnp.asarray(out.last_hidden_state)


class GeneralConditioner:
    """Runs embedders, routes outputs by key/dim, applies ucg dropout
    (modules.py:95-220)."""

    # channels-last analogue of OUTPUT_DIM2KEYS (modules.py:96):
    # 2D -> vector, 3D -> crossattn, 4D/5D image-like -> concat
    OUTPUT_DIM2KEYS = {2: "vector", 3: "crossattn", 4: "concat", 5: "concat"}
    KEY2CATDIM = {"vector": -1, "crossattn": -2, "concat": -1}

    def __init__(self, emb_models: List[dict]):
        self.embedders = []
        for cfg in emb_models:
            emb = instantiate_from_config(cfg)
            emb.input_key = cfg.get("input_key")
            emb.ucg_rate = cfg.get("ucg_rate", 0.0)
            emb.is_trainable = cfg.get("is_trainable", False)
            self.embedders.append(emb)

    def __call__(
        self,
        batch: Dict[str, Any],
        force_zero_embeddings: Optional[List[str]] = None,
        rng: Optional[jax.Array] = None,
        apply_ucg: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        force_zero_embeddings = force_zero_embeddings or []
        output: Dict[str, jnp.ndarray] = {}
        for embedder in self.embedders:
            key = embedder.input_key
            val = batch[key]
            if key in ("final_cond_zero", "cond_img"):
                val = _flatten_bt(jnp.asarray(val))
            emb_out = embedder(val)
            if not isinstance(emb_out, (list, tuple)):
                emb_out = [emb_out]
            for emb in emb_out:
                if key == "cond_img":
                    out_key = "cond_feat"
                else:
                    out_key = self.OUTPUT_DIM2KEYS[emb.ndim]
                if apply_ucg and embedder.ucg_rate > 0.0 and rng is not None:
                    rng, sub = jax.random.split(rng)
                    keep = jax.random.bernoulli(
                        sub, 1.0 - embedder.ucg_rate, (emb.shape[0],)
                    ).astype(emb.dtype)
                    emb = emb * keep.reshape((-1,) + (1,) * (emb.ndim - 1))
                if key in force_zero_embeddings:
                    emb = jnp.zeros_like(emb)
                if out_key in output:
                    output[out_key] = jnp.concatenate(
                        (output[out_key], emb), axis=self.KEY2CATDIM[out_key]
                    )
                else:
                    output[out_key] = emb
        return output

    def get_unconditional_conditioning(
        self,
        batch_c: Dict[str, Any],
        batch_uc: Optional[Dict[str, Any]] = None,
        force_uc_zero_embeddings: Optional[List[str]] = None,
    ):
        """(modules.py:206-220): c from batch, uc from batch_uc (e.g. empty
        prompts); ucg dropout disabled for both."""
        c = self(batch_c, apply_ucg=False)
        uc = self(
            batch_c if batch_uc is None else batch_uc,
            force_zero_embeddings=force_uc_zero_embeddings,
            apply_ucg=False,
        )
        return c, uc
