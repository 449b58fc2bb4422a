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
from panacea_tpu.models.clip import FrozenOpenCLIPEmbedder as _OpenCLIPBase

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


class ClassEmbedderForMultiCond(ClassEmbedder):
    """Batch-dict variant of ClassEmbedder (modules.py:290-300): embeds
    ``batch[key]`` in place, unwrapping a single-element list."""

    def __call__(self, batch, key=None):
        out = dict(batch)
        key = key or self.input_key
        v = out[key]
        islist = isinstance(v, list)
        c = v[0] if islist else v
        emb = super().__call__(c)
        out[key] = [emb] if islist else emb
        return out


class FrozenByT5Embedder(FrozenT5Embedder):
    """Character-aware ByT5 text encoder (modules.py:343-380). Same gated
    transformers path as FrozenT5Embedder with the ByT5 tokenizer."""

    def __init__(self, version: str = "google/byt5-base", device=None,
                 max_length: int = 77, freeze: bool = True):
        super().__init__(version=version, device=device,
                         max_length=max_length, freeze=freeze)

    def _load(self):
        from transformers import ByT5Tokenizer, FlaxT5EncoderModel

        self._tok = ByT5Tokenizer.from_pretrained(self.version)
        self._model = FlaxT5EncoderModel.from_pretrained(self.version)


class FrozenOpenCLIPEmbedder2(_OpenCLIPBase):
    """OpenCLIP text encoder with layer selection + optional EOT pooling
    (modules.py:450-607). ``legacy=True`` returns the selected layer's
    token states (ln_final applied); ``always_return_pooled`` additionally
    returns the eot-token embedding @ text_projection."""

    def __init__(self, *args, always_return_pooled: bool = False,
                 legacy: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.return_pooled = always_return_pooled
        self.legacy = legacy
        # (width, width) — set via load_text_projection; the coverage
        # checker deliberately skips *.text_projection for the standard
        # (never-pooled) Panacea embedder, so this class pulls it itself
        self.text_projection = None

    def load_text_projection(self, state_dict, prefix: str = "") -> bool:
        """Pull the learned pooled-output projection out of a torch-style
        state dict (open_clip stores it as ``<prefix>.text_projection``,
        applied as ``x @ text_projection``). ``prefix`` scopes the lookup
        to this embedder's own text tower — with multiple towers in one
        checkpoint (SDXL-style dual encoders) an unscoped suffix match
        could silently load the wrong projection. Returns True if found."""
        for k, v in state_dict.items():
            if (k.startswith(prefix) and k.endswith("text_projection")
                    and getattr(v, "ndim", 0) == 2):
                arr = v.detach().cpu().numpy() if hasattr(v, "detach") else v
                self.text_projection = jnp.asarray(arr)
                return True
        return False

    def __call__(self, texts):
        import jax as _jax

        z = super().__call__(texts)
        if not self.return_pooled:
            return z
        tokens = jnp.asarray(self.tokenizer(texts, self.max_length))
        eot = jnp.argmax(tokens, axis=-1)
        if self.text_projection is None:
            # the pooled path is meaningless without the LEARNED projection —
            # an identity stand-in would silently return wrong embeddings
            raise ValueError(
                "FrozenOpenCLIPEmbedder2.always_return_pooled requires "
                "text_projection to be set from converted weights")
        pooled = z[jnp.arange(z.shape[0]), eot] @ self.text_projection
        return z, pooled


class FrozenCLIPT5Encoder:
    """CLIP-L + T5 dual text encoding (modules.py:795-821): returns
    [clip_z, t5_z]."""

    def __init__(self, clip_version="openai/clip-vit-large-patch14",
                 t5_version="google/t5-v1_1-xl", device=None,
                 clip_max_length: int = 77, t5_max_length: int = 77):
        # the NATIVE CLIP-L tower (models/clip.py, no HF download) — the
        # same class registry.py resolves for sgm FrozenCLIPEmbedder
        from panacea_tpu.models.clip import FrozenCLIPEmbedder

        self.clip_encoder = FrozenCLIPEmbedder(max_length=clip_max_length)
        self.t5_encoder = FrozenT5Embedder(
            t5_version, device, max_length=t5_max_length)
        self.input_key = None
        self.ucg_rate = 0.0
        self.is_trainable = False
        self.legacy_ucg_val = None

    def __call__(self, texts):
        return [self.clip_encoder(texts), self.t5_encoder(texts)]


class SpatialRescaler:
    """N-stage spatial resize + optional 1x1/kxk channel remap conv
    (modules.py:823-880). Channels-last."""

    def __init__(self, n_stages: int = 1, method: str = "bilinear",
                 multiplier: float = 0.5, in_channels: int = 3,
                 out_channels=None, bias: bool = False,
                 wrap_video: bool = False, kernel_size: int = 1,
                 remap_output: bool = False):
        assert n_stages >= 0
        assert method in ("nearest", "linear", "bilinear", "trilinear",
                          "bicubic", "area")
        self.n_stages = n_stages
        self.method = {"area": "linear"}.get(method, method)
        self.multiplier = multiplier
        self.remap = out_channels is not None or remap_output
        self.params = None
        self._net = None
        if self.remap:
            import flax.linen as nn

            class _Map(nn.Module):
                out_ch: int
                k: int
                use_bias: bool

                @nn.compact
                def __call__(self, x):
                    return nn.Conv(self.out_ch, (self.k, self.k),
                                   padding=self.k // 2,
                                   use_bias=self.use_bias,
                                   name="channel_mapper")(x)

            self._net = _Map(out_channels or in_channels, kernel_size, bias)
        self.wrap_video = wrap_video
        self.input_key = None
        self.ucg_rate = 0.0
        self.is_trainable = False
        self.legacy_ucg_val = None

    def __call__(self, x):
        x = jnp.asarray(x)
        squeeze_video = False
        if self.wrap_video and x.ndim == 5:     # (B, T, H, W, C)
            b, t = x.shape[:2]
            x = x.reshape((b * t,) + x.shape[2:])
            squeeze_video = True
        for _ in range(self.n_stages):
            n, h, w, c = x.shape
            x = jax.image.resize(
                x, (n, int(h * self.multiplier), int(w * self.multiplier), c),
                method=self.method)
        if squeeze_video:
            x = x.reshape((b, t) + x.shape[1:])
        if self.remap:
            if self.params is None:
                self.params = self._net.init(
                    jax.random.PRNGKey(0), x)["params"]
            x = self._net.apply({"params": self.params}, x)
        return x

    def encode(self, x):
        return self(x)


class LowScaleEncoder:
    """Low-res conditioning encoder with DDPM noise augmentation
    (modules.py:883-994): encode through a first-stage model, q_sample at a
    random noise level, resize to ``output_size``. Returns (z, noise_level)."""

    def __init__(self, model_config, linear_start: float,
                 linear_end: float, timesteps: int = 1000,
                 max_noise_level: int = 250, output_size: int = 64,
                 scale_factor: float = 1.0):
        self.model = instantiate_from_config(model_config)
        self.model_params = None
        self.max_noise_level = max_noise_level
        self.out_size = output_size
        self.scale_factor = scale_factor
        from panacea_tpu.diffusion.util import make_beta_schedule

        betas = make_beta_schedule("linear", timesteps,
                                   linear_start=linear_start,
                                   linear_end=linear_end)
        ac = jnp.asarray(np.cumprod(1.0 - betas, axis=0), jnp.float32)
        self.sqrt_alphas_cumprod = jnp.sqrt(ac)
        self.sqrt_one_minus_alphas_cumprod = jnp.sqrt(1.0 - ac)
        self.input_key = None
        self.ucg_rate = 0.0
        self.is_trainable = False
        self.legacy_ucg_val = None

    def q_sample(self, x, t, noise):
        a = self.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        s = self.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        return a * x + s * noise

    def __call__(self, x, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(rng, 3)
        if self.model_params is None:
            self.model_params = self.model.init(
                k1, jnp.asarray(x)[:1])["params"]
        z = self.model.apply({"params": self.model_params}, jnp.asarray(x),
                             method=self.model.encode)
        z = z * self.scale_factor
        t = jax.random.randint(k2, (z.shape[0],), 0, self.max_noise_level)
        z = self.q_sample(z, t, jax.random.normal(k3, z.shape, z.dtype))
        if self.out_size is not None:
            n, h, w, c = z.shape
            z = jax.image.resize(z, (n, self.out_size, self.out_size, c),
                                 method="nearest")
        return z, t

    def decode(self, z):
        return self.model.apply({"params": self.model_params},
                                z / self.scale_factor,
                                method=self.model.decode)


class GaussianEncoder:
    """VAE Encoder + diagonal-Gaussian sample with KL log
    (modules.py:997-1014): returns (log dict, z) with z flattened to
    (B, H*W, C)."""

    def __init__(self, weight: float = 1.0, flatten_output: bool = True,
                 **encoder_kwargs):
        from panacea_tpu.models.vae import Encoder

        self.net = Encoder(**encoder_kwargs)
        self.weight = weight
        self.flatten_output = flatten_output
        self.params = None
        self.input_key = None
        self.ucg_rate = 0.0
        self.is_trainable = False
        self.legacy_ucg_val = None

    def __call__(self, x, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(rng)
        x = jnp.asarray(x)
        if self.params is None:
            self.params = self.net.init(k1, x[:1])["params"]
        m = self.net.apply({"params": self.params}, x)
        mean, logvar = jnp.split(m, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(k2, mean.shape, mean.dtype)
        var = jnp.exp(logvar)
        kl = 0.5 * jnp.sum(mean**2 + var - 1.0 - logvar, axis=(1, 2, 3))
        log = {"kl_loss": kl.mean()}
        log["loss"] = log["kl_loss"]
        log["weight"] = self.weight
        if self.flatten_output:
            n, h, w, c = z.shape
            z = z.reshape(n, h * w, c)
        return log, z


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
            if isinstance(embedder, ClassEmbedderForMultiCond):
                # this embedder consumes the whole batch dict and returns it
                # with batch[key] embedded in place (modules.py:290-300; the
                # reference class is unreachable-as-shipped — its
                # super().forward signature mismatches — so we give it the
                # working contract it was written for)
                emb_out = embedder(batch, key=key)[key]
            else:
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
