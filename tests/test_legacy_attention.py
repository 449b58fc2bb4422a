"""LegacyAttentionBlock3D vs a torch transcription of the reference
AttentionBlock3D (openaimodel.py:603-677 + QKVAttentionLegacy :699-724 /
QKVAttention :731-760), incl. the dead-qkv_temporal quirk."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panacea_tpu.models.legacy_attention import (
    LegacyAttentionBlock3D,
    qkv_attention,
)


def _torch_block(torch, c, heads, t, new_order):
    tn = torch.nn

    class QKVAttn(tn.Module):
        def __init__(self, n_heads, legacy):
            super().__init__()
            self.n_heads = n_heads
            self.legacy = legacy

        def forward(self, qkv):
            bs, width, length = qkv.shape
            ch = width // (3 * self.n_heads)
            scale = 1 / (ch ** 0.25)
            if self.legacy:
                q, k, v = qkv.reshape(bs * self.n_heads, ch * 3,
                                      length).split(ch, dim=1)
            else:
                q, k, v = qkv.chunk(3, dim=1)
                q = q.reshape(bs * self.n_heads, ch, length)
                k = k.reshape(bs * self.n_heads, ch, length)
                v = v.reshape(bs * self.n_heads, ch, length)
            w = torch.einsum("bct,bcs->bts", q * scale, k * scale)
            w = torch.softmax(w.float(), dim=-1).type(w.dtype)
            a = torch.einsum("bts,bcs->bct", w, v)
            return a.reshape(bs, -1, length)

    class Block(tn.Module):
        def __init__(self):
            super().__init__()
            self.norm = tn.GroupNorm(32 if c % 32 == 0 else c, c)
            self.qkv = tn.Conv1d(c, 3 * c, 1)
            self.attention = QKVAttn(heads, legacy=not new_order)
            self.proj_out = tn.Conv1d(c, c, 1)
            self.norm_temporal = tn.GroupNorm(32 if c % 32 == 0 else c, c)
            self.qkv_temporal = tn.Conv1d(c, 3 * c, 1)
            self.attention_temporal = QKVAttn(heads, legacy=not new_order)
            self.proj_out_temporal = tn.Conv1d(c, c, 1)

        def forward(self, x):  # x: (b*t, c, h, w)
            b, cc, h, w = x.shape
            xf = x.reshape(b, cc, -1)
            hh = self.attention(self.qkv(self.norm(xf)))
            hh = self.proj_out(hh)
            x = (xf + hh).reshape(b, cc, h, w)
            # (b t) c h w -> (b h w) c t  (reference einops rearrange)
            bb = b // t
            xt = x.reshape(bb, t, cc, h, w).permute(0, 3, 4, 2, 1)
            xt = xt.reshape(bb * h * w, cc, t)
            # reference bug: SPATIAL qkv used on the temporal tokens
            ht = self.attention_temporal(self.qkv(self.norm_temporal(xt)))
            ht = self.proj_out_temporal(ht)
            out = xt + ht
            out = out.reshape(bb, h, w, cc, t).permute(0, 4, 3, 1, 2)
            return out.reshape(b, cc, h, w)

    return Block()


@pytest.mark.parametrize("new_order", [False, True])
def test_legacy_attention_block3d_torch_parity(new_order):
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(0)
    b, t, h, w, c, heads = 1, 2, 4, 6, 64, 4

    blk = LegacyAttentionBlock3D(channels=c, num_heads=heads, num_frames=t,
                                 use_new_attention_order=new_order)
    x = rs.randn(b * t, h, w, c).astype(np.float32)
    params = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    ref = _torch_block(torch, c, heads, t, new_order)
    sd = ref.state_dict()
    rsd = {k: torch.from_numpy(rs.randn(*v.shape).astype(np.float32) * 0.2)
           for k, v in sd.items()}
    ref.load_state_dict(rsd)

    # map torch params -> flax tree (Conv1d k=1 == Dense: (out,in,1) -> (in,out))
    def dense(prefix):
        return {
            "kernel": jnp.asarray(
                rsd[f"{prefix}.weight"].numpy()[:, :, 0].T),
            "bias": jnp.asarray(rsd[f"{prefix}.bias"].numpy()),
        }

    def gn(prefix, target):
        params[target]["GroupNorm_0"]["scale"] = jnp.asarray(
            rsd[f"{prefix}.weight"].numpy())
        params[target]["GroupNorm_0"]["bias"] = jnp.asarray(
            rsd[f"{prefix}.bias"].numpy())

    params["qkv"] = dense("qkv")
    params["proj_out"] = dense("proj_out")
    params["qkv_temporal"] = dense("qkv_temporal")
    params["proj_out_temporal"] = dense("proj_out_temporal")
    gn("norm", "norm")
    gn("norm_temporal", "norm_temporal")

    got = np.asarray(blk.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_qkv_attention_orders_differ():
    rs = np.random.RandomState(1)
    qkv = jnp.asarray(rs.randn(2, 5, 3 * 4 * 8).astype(np.float32))
    a = qkv_attention(qkv, 4, legacy_order=True)
    b = qkv_attention(qkv, 4, legacy_order=False)
    assert a.shape == b.shape == (2, 5, 32)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_unet_builds_with_legacy_attention():
    """use_spatial_transformer=False routes every attention site to the
    legacy QKV block (openaimodel.py:1013-1035)."""
    from panacea_tpu.models.unet import UNetModel3D

    m = UNetModel3D(in_channels=4, out_channels=4, model_channels=32,
                    num_res_blocks=1, attention_resolutions=(1,),
                    channel_mult=(1,), num_head_channels=16, num_frames=2,
                    context_dim=64, use_spatial_transformer=False,
                    use_checkpoint=False)
    x = jnp.zeros((2, 8, 24, 4))
    ts = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((1, 77, 64))
    params = m.init(jax.random.PRNGKey(0), x, ts, ctx)["params"]
    flat = str(jax.tree_util.tree_structure(params))
    assert "qkv" in flat and "blocks_temporal" not in flat
    out = m.apply({"params": params}, x, ts, ctx)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
