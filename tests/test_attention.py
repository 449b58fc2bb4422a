"""Attention op tests: Pallas flash kernel (interpret mode on CPU) vs XLA einsum
reference, plus panorama view helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panacea_tpu.ops.attention import attention_xla
from panacea_tpu.ops.flash_attention import flash_attention
from panacea_tpu.ops.panorama import merge_views, neighbor_kv, split_views


def rand_qkv(key, b, sq, skv, h, d, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, sq, h, d), dtype)
    k = jax.random.normal(k2, (b, skv, h, d), dtype)
    v = jax.random.normal(k3, (b, skv, h, d), dtype)
    return q, k, v


@pytest.mark.parametrize(
    "sq,skv",
    [
        (64, 64),      # square self-attn, single block
        (128, 77),     # text cross-attn shape (kv padding + masking)
        (100, 260),    # both dims unaligned
        (8, 8),        # temporal (tiny sequence)
    ],
)
def test_flash_matches_xla(sq, skv):
    q, k, v = rand_qkv(jax.random.PRNGKey(0), 2, sq, skv, 3, 64)
    ref = attention_xla(q, k, v)
    out = flash_attention(q, k, v, block_q=64, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_multiblock_kv_streaming():
    q, k, v = rand_qkv(jax.random.PRNGKey(1), 1, 256, 512, 2, 64)
    ref = attention_xla(q, k, v)
    out = flash_attention(q, k, v, block_q=64, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_bf16():
    q, k, v = rand_qkv(jax.random.PRNGKey(2), 1, 64, 64, 2, 64, dtype=jnp.bfloat16)
    ref = attention_xla(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32))
    out = flash_attention(q, k, v, block_q=64, block_k=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_split_merge_views_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 24, 5))
    v = split_views(x)
    assert v.shape == (2, 6, 4, 4, 5)
    np.testing.assert_array_equal(np.asarray(merge_views(v)), np.asarray(x))
    # view 2 of the split equals width slice [8:12] of the panorama
    np.testing.assert_array_equal(np.asarray(v[:, 2]), np.asarray(x[:, :, 8:12]))


def test_neighbor_kv_wraparound():
    # distinct constant per view
    x = jnp.arange(6, dtype=jnp.float32)[None, :, None, None] * jnp.ones((1, 6, 3, 1))
    nk = neighbor_kv(x)
    assert nk.shape == (1, 6, 6, 1)
    # view 0's KV = [view 5 (left), view 1 (right)]
    np.testing.assert_allclose(np.asarray(nk[0, 0, :3, 0]), 5.0)
    np.testing.assert_allclose(np.asarray(nk[0, 0, 3:, 0]), 1.0)
    # view 3's KV = [view 2, view 4]
    np.testing.assert_allclose(np.asarray(nk[0, 3, :3, 0]), 2.0)
    np.testing.assert_allclose(np.asarray(nk[0, 3, 3:, 0]), 4.0)


def test_intra_view_attention_equals_blockwise():
    """Batched per-view attention == reference's width-sliced python loop
    (attention.py:436-441)."""
    b, h, wv, c_heads, d = 1, 4, 8, 2, 16
    x = jax.random.normal(jax.random.PRNGKey(3), (b, h, 6 * wv, c_heads * d))
    views = split_views(x)  # (b, 6, h, wv, C)
    tokens = views.reshape(b * 6, h * wv, c_heads, d)
    out_batched = attention_xla(tokens, tokens, tokens)
    # reference-style: slice width, attend within each slice
    for vi in range(6):
        sl = x[:, :, vi * wv:(vi + 1) * wv, :].reshape(b, h * wv, c_heads, d)
        ref = attention_xla(sl, sl, sl)
        np.testing.assert_allclose(
            np.asarray(out_batched[vi]), np.asarray(ref[0]), rtol=1e-5, atol=1e-5
        )


def test_ragged_kv_lens_flash_and_xla():
    """Per-row kv_lens must equal attention over the truncated K/V — both in
    the XLA fallback and the Pallas kernel (interpret mode on CPU). This is
    the mechanism behind the inter-view dead-wraparound quirk (view 5 attends
    to its left neighbor only, attention.py:545-559)."""
    from panacea_tpu.ops.flash_attention import flash_attention

    rs = np.random.RandomState(0)
    b, sq, skv, h, d = 4, 16, 160, 2, 32
    q = jnp.asarray(rs.randn(b, sq, h, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, skv, h, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, skv, h, d).astype(np.float32))
    kv_lens = jnp.asarray([160, 80, 130, 1], jnp.int32)

    out_xla = attention_xla(q, k, v, kv_lens=kv_lens)
    out_flash = flash_attention(q, k, v, kv_lens=kv_lens, interpret=True)
    for i, n in enumerate([160, 80, 130, 1]):
        ref = attention_xla(q[i:i + 1], k[i:i + 1, :n], v[i:i + 1, :n])
        np.testing.assert_allclose(np.asarray(out_xla[i]), np.asarray(ref[0]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_flash[i]), np.asarray(ref[0]),
                                   rtol=1e-4, atol=1e-4)


def test_partial_attention_merge_equals_concat_kv():
    """Flash-style decomposition (per-KV-block partials + online-softmax
    merge) must equal one attention over the concatenated K/V — the identity
    behind the XLA-fusable inter-view stage (each block keeps Skv == Sq)."""
    from panacea_tpu.ops.attention import (
        attention_partial_xla,
        merge_attention_partials,
    )

    rs = np.random.RandomState(0)
    b, sq, h, d = 3, 32, 2, 16
    q = jnp.asarray(rs.randn(b, sq, h, d).astype(np.float32))
    ka = jnp.asarray(rs.randn(b, sq, h, d).astype(np.float32))
    va = jnp.asarray(rs.randn(b, sq, h, d).astype(np.float32))
    kb = jnp.asarray(rs.randn(b, 24, h, d).astype(np.float32))
    vb = jnp.asarray(rs.randn(b, 24, h, d).astype(np.float32))

    merged = merge_attention_partials(
        attention_partial_xla(q, ka, va), attention_partial_xla(q, kb, vb))
    ref = attention_xla(q, jnp.concatenate([ka, kb], 1),
                        jnp.concatenate([va, vb], 1))
    np.testing.assert_allclose(np.asarray(merged), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # single-block merge is plain normalization
    one = merge_attention_partials(attention_partial_xla(q, ka, va))
    np.testing.assert_allclose(np.asarray(one),
                               np.asarray(attention_xla(q, ka, va)),
                               rtol=1e-5, atol=1e-5)


def test_geglu_fused_matches_reference():
    import jax
    import jax.numpy as jnp

    from panacea_tpu.ops.geglu import geglu_matmul, geglu_reference

    for tokens, c, mult in [(300, 64, 4), (1024, 128, 4), (8, 32, 2)]:
        ks = jax.random.split(jax.random.PRNGKey(tokens), 3)
        x = jax.random.normal(ks[0], (tokens, c))
        w = jax.random.normal(ks[1], (c, 2 * c * mult)) * 0.05
        b = jax.random.normal(ks[2], (2 * c * mult,)) * 0.1
        got = geglu_matmul(x, w, b, interpret=True)
        ref = geglu_reference(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)


def test_geglu_tiles_respect_vmem_at_every_dtype():
    """Regression for the fp32 scoped-VMEM OOM (Mosaic rejects >16 MB kernel
    stacks): the tile budget must use the operands' REAL itemsizes. At the
    ds1 production shape the bf16 pick keeps the big 1024-row tile while
    fp32 must shrink; every pick stays under the 12 MB target with its own
    itemsize and divides `inner` exactly."""
    from panacea_tpu.ops.geglu import _pick_tiles

    def footprint(bm, bn, c, inner, isx, isw):
        return 2 * (bm * c * isx + 2 * c * bn * isw + bm * bn * isx) \
            + 8 * bm * bn

    # (tokens, c, inner) covering the UNet/ControlNet FF shapes incl. the
    # observed-OOM ds1 call (49152, 320, 1280) and the awkward inner=1250
    shapes = [(49152, 320, 1280), (12288, 640, 2560), (3072, 1280, 5120),
              (49152, 320, 1250), (8, 32, 64)]
    for tokens, c, inner in shapes:
        for isx, isw in [(2, 2), (4, 4), (4, 2)]:
            bm, bn = _pick_tiles(tokens, c, inner, isx, isw)
            assert inner % bn == 0, (tokens, c, inner, isx, isw, bm, bn)
            # Mosaic lane rule: whenever inner admits a legal tiling at all
            # (inner % 128 == 0), the pick must be a 128-multiple — the fp32
            # leg of the drift guard hit bn=320 at (3072, 1280, 5120) before
            # this was pinned
            assert inner % 128 != 0 or bn % 128 == 0, (
                tokens, c, inner, isx, isw, bm, bn)
            assert bm % 8 == 0 or bm == tokens, (tokens, bm)
            fp = footprint(bm, bn, c, inner, isx, isw)
            # the shrink loop's floor (bm<=256 and bn<=256) is never hit at
            # these shapes, so the 12 MB target must hold
            assert fp <= 12 * 1024 * 1024 or (bm <= 256 and bn <= 256), (
                tokens, c, inner, isx, isw, bm, bn, fp / 2**20)
    # the production bf16 pick must keep its measured-fast big tile
    assert _pick_tiles(49152, 320, 1280, 2, 2) == (1024, 640)
    # fp32 shrinks rows, not width (width drives MXU efficiency)
    assert _pick_tiles(49152, 320, 1280, 4, 4) == (512, 640)
    # fp32 at the deepest FF (c=1280, inner=5120) must shrink width to a
    # LEGAL 128-multiple (the old divisor search returned 320)
    assert _pick_tiles(3072, 1280, 5120, 4, 4) == (256, 256)


def test_geglu_untileable_inner_falls_back_unfused():
    """inner % 128 != 0 has no legal Mosaic tiling (the w blocks span half
    of w's 2*inner axis, so the full-array-dim escape never applies):
    geglu_matmul must route to the unfused reference instead of emitting a
    pallas_call that the TPU lowering rejects. interpret=False on CPU would
    crash inside pallas_call — returning correctly proves the early exit."""
    import jax

    from panacea_tpu.ops.geglu import geglu_matmul, geglu_reference

    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(ks[0], (16, 32))
    w = jax.random.normal(ks[1], (32, 2 * 120)) * 0.1
    b = jax.random.normal(ks[2], (2 * 120,)) * 0.1
    got = geglu_matmul(x, w, b, interpret=False)
    ref = geglu_reference(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_attention_smallseq_matches_xla():
    import jax
    import jax.numpy as jnp

    from panacea_tpu.ops.attention import attention_xla, attention_xla_smallseq

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (64, 8, 5, 16))
    k = jax.random.normal(ks[1], (64, 8, 5, 16))
    v = jax.random.normal(ks[2], (64, 8, 5, 16))
    np.testing.assert_allclose(
        np.asarray(attention_xla_smallseq(q, k, v)),
        np.asarray(attention_xla(q, k, v)), atol=2e-5)
    lens = jnp.asarray([8, 5] * 32, jnp.int32)
    np.testing.assert_allclose(
        np.asarray(attention_xla_smallseq(q, k, v, kv_lens=lens)),
        np.asarray(attention_xla(q, k, v, kv_lens=lens)), atol=2e-5)


def test_dispatch_policy_routes_by_shape(monkeypatch):
    """The v5e-measured dispatch policy (perf-critical): tiny Sq -> head-major
    einsum; Skv <= Sq -> XLA fused attention; Skv > Sq (inter-view neighbor
    KV) -> Pallas flash (XLA's fusion materializes the f32 scores in-model)."""
    import importlib

    # `panacea_tpu.ops.__init__` re-exports the attention FUNCTION under the
    # submodule's name — resolve the module explicitly
    A = importlib.import_module("panacea_tpu.ops.attention")

    calls = []
    real_xla = A.attention_xla
    real_small = A.attention_xla_smallseq

    monkeypatch.setattr(A, "attention_xla",
                        lambda *a, **k: calls.append("xla") or real_xla(*a, **k))
    monkeypatch.setattr(A, "attention_xla_smallseq",
                        lambda *a, **k: calls.append("small") or real_small(*a, **k))

    import panacea_tpu.ops.flash_attention as F
    real_flash = F.flash_attention
    monkeypatch.setattr(
        F, "flash_attention",
        lambda *a, **k: calls.append("flash") or real_flash(
            *a, **{**k, "interpret": True}))

    def mk(s, kv):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        return (jax.random.normal(ks[0], (2, s, 2, 16)),
                jax.random.normal(ks[1], (2, kv, 2, 16)),
                jax.random.normal(ks[2], (2, kv, 2, 16)))

    # jit would cache the traced branch; call the dispatcher's wrapped fn
    disp = A.attention.__wrapped__

    disp(*mk(8, 8), impl="pallas")          # temporal: Sq < 128
    assert calls[-1] == "small"
    disp(*mk(256, 256), impl="pallas")      # intra: Skv == Sq
    assert calls[-1] == "xla"
    disp(*mk(256, 16), impl="pallas")       # text cross: Skv << Sq
    assert calls[-1] == "xla"
    disp(*mk(256, 512), impl="pallas")      # inter-view: Skv = 2 Sq
    assert calls[-1] == "flash"
    disp(*mk(256, 512), impl="xla")         # explicit override wins
    assert calls[-1] == "xla"


def test_streamed_lax_flash_matches_xla():
    """The non-TPU 'streamed' default (chunked online-softmax in plain lax,
    flash_attention._lax_flash) must match the einsum reference — it is what
    keeps CPU-backend compiles of the production programs memory-
    representative of the TPU path (no materialized (Sq,Skv) f32 scores)."""
    import importlib

    import jax
    import numpy as np

    A = importlib.import_module("panacea_tpu.ops.attention")

    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    # Sq/Skv >= 512 engages the streamed branch; Skv not a multiple of the
    # 512 chunk exercises the pad+mask tail
    q = jax.random.normal(ks[0], (2, 512, 2, 16))
    k = jax.random.normal(ks[1], (2, 640, 2, 16))
    v = jax.random.normal(ks[2], (2, 640, 2, 16))
    want = A.attention_xla(q, k, v)
    got = A.attention.__wrapped__(q, k, v, impl="streamed")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    # ragged KV rows agree too (inter-view last-view single-neighbor quirk)
    lens = jax.numpy.asarray([640, 130])
    want = A.attention_xla(q, k, v, kv_lens=lens)
    got = A.attention.__wrapped__(q, k, v, impl="streamed", kv_lens=lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_partial_streamed_matches_partial_xla():
    """attention_partial_streamed must satisfy the same (out_un, m, den)
    merge contract as attention_partial_xla — the ring cross-view partial
    branch uses it so no backend materializes per-block f32 scores."""
    import jax
    import numpy as np

    from panacea_tpu.ops.attention import (
        attention_partial_streamed,
        attention_partial_xla,
        attention_xla,
        merge_attention_partials,
    )

    ks = jax.random.split(jax.random.PRNGKey(5), 6)
    q = jax.random.normal(ks[0], (2, 600, 2, 16))  # Skv=600: chunk tail pad
    k1 = jax.random.normal(ks[1], (2, 600, 2, 16))
    v1 = jax.random.normal(ks[2], (2, 600, 2, 16))
    k2 = jax.random.normal(ks[3], (2, 600, 2, 16))
    v2 = jax.random.normal(ks[4], (2, 600, 2, 16))

    o, m, d = attention_partial_streamed(q, k1, v1)
    ox, mx, dx = attention_partial_xla(q, k1, v1)
    np.testing.assert_allclose(np.asarray(m), np.asarray(mx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), np.asarray(dx), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ox), rtol=1e-3,
                               atol=2e-4)

    # merged two-block attention == dense attention over concat KV
    p1 = attention_partial_streamed(q, k1, v1)
    p2 = attention_partial_streamed(q, k2, v2)
    merged = merge_attention_partials(p1, p2)
    kk = jax.numpy.concatenate([k1, k2], axis=1)
    vv = jax.numpy.concatenate([v1, v2], axis=1)
    np.testing.assert_allclose(np.asarray(merged),
                               np.asarray(attention_xla(q, kk, vv)),
                               atol=2e-5)


def test_streamed_paths_gradient_parity():
    """The streamed paths are on the default CPU route for long sequences —
    including under training graphs (ring cross-view in sharded train steps,
    goldens on CPU). Their gradients must match dense attention exactly:
    _lax_flash differentiates through the scan (no stop_gradient on the
    online max), and the partial-merge path through merge contract."""
    from panacea_tpu.ops.attention import (
        attention_partial_streamed,
        merge_attention_partials,
    )
    from panacea_tpu.ops.flash_attention import _lax_flash

    b, s, h, d = 2, 520, 2, 16
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))

    def loss_ref(q, k, v):
        return (attention_xla(q, k, v) ** 2).sum()

    def loss_flash(q, k, v):
        qt = q.transpose(0, 2, 1, 3).reshape(b * h, s, d)
        kt = k.transpose(0, 2, 1, 3).reshape(b * h, s, d)
        vt = v.transpose(0, 2, 1, 3).reshape(b * h, s, d)
        out = _lax_flash(qt, kt, vt, d ** -0.5, h)
        return (out.reshape(b, h, s, d).transpose(0, 2, 1, 3) ** 2).sum()

    def loss_partial(q, k, v):
        half = s // 2
        p1 = attention_partial_streamed(q, k[:, :half], v[:, :half])
        p2 = attention_partial_streamed(q, k[:, half:], v[:, half:])
        return (merge_attention_partials(p1, p2) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for fn in (loss_flash, loss_partial):
        g = jax.grad(fn, argnums=(0, 1, 2))(q, k, v)
        for a, b_, name in zip(g_ref, g, "qkv"):
            err = float(jnp.abs(a - b_).max())
            assert err < 5e-4, (fn.__name__, name, err)
