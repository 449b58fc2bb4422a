"""Weight-converter validation for the metric/loss towers.

FID (InceptionV3), LPIPS (VGG16 + linear heads), FVD (I3D). torchvision is not
installed in this image, so:
  * LPIPS gets FULL semantic parity — the reference lpips/loss/lpips.py module
    is loaded with a torchvision stub (same Sequential layout), randomized,
    and its state dict converted; outputs must match.
  * InceptionV3 / I3D get (a) exact tree-coverage tests of the mapping against
    the flax param trees, and (b) semantic tests of the Conv+BN unit cells
    against hand-built torch cells with the checkpoint naming — together these
    pin the layout transforms; real-weight validation needs the actual
    torchvision/pytorch-i3d files offline.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import flax
import jax
import jax.numpy as jnp

from reference_loader import load_reference_lpips, randomize_, state_dict_numpy


def _cover(mapping, params, allow_missing_substr=()):
    target = set(flax.traverse_util.flatten_dict(params).keys())
    mapped = {path for path, _ in mapping.values()}
    extra = {p for p in mapped - target
             if not any(s in "/".join(p) for s in allow_missing_substr)}
    not_covered = {p for p in target - mapped
                   if not any(s in "/".join(p) for s in allow_missing_substr)}
    assert not extra, sorted(extra)[:8]
    assert not not_covered, sorted(not_covered)[:8]


def test_inception_mapping_covers_tree():
    from panacea_tpu.metrics_gen.inception import InceptionV3
    from panacea_tpu.utils.convert import build_inception_mapping

    shapes = jax.eval_shape(
        lambda k: InceptionV3().init(k, jnp.zeros((1, 128, 128, 3)))["params"],
        jax.random.PRNGKey(0))
    _cover(build_inception_mapping(), shapes)


def test_i3d_mapping_covers_tree():
    from panacea_tpu.metrics_gen.i3d import I3D
    from panacea_tpu.utils.convert import build_i3d_mapping

    shapes = jax.eval_shape(
        lambda k: I3D().init(k, jnp.zeros((1, 9, 64, 64, 3)),
                             return_logits=True)["params"],
        jax.random.PRNGKey(0))
    _cover(build_i3d_mapping(), shapes)


def test_convbn_cell_matches_torch():
    """torchvision BasicConv2d semantics: conv(no bias) + BN(eps=1e-3) + relu."""
    from panacea_tpu.metrics_gen.inception import ConvBN
    from panacea_tpu.utils.convert import _convbn2d, convert_state_dict

    cell = torch.nn.Module()
    cell.conv = torch.nn.Conv2d(8, 16, 3, stride=2, bias=False)
    cell.bn = torch.nn.BatchNorm2d(16, eps=1e-3)
    randomize_(cell, seed=0)
    with torch.no_grad():
        cell.bn.running_mean.normal_()
        cell.bn.running_var.uniform_(0.5, 2.0)
    cell.eval()
    x = np.random.RandomState(0).randn(2, 8, 17, 17).astype(np.float32)
    with torch.no_grad():
        ref = torch.relu(cell.bn(cell.conv(torch.from_numpy(x)))).numpy()

    params, missing, unexpected = convert_state_dict(
        state_dict_numpy(cell, "c"), _convbn2d("c", ()))
    unexpected = [k for k in unexpected if "num_batches_tracked" not in k]
    assert not missing and not unexpected
    out = ConvBN(16, (3, 3), strides=(2, 2)).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_unit3d_cell_matches_torch():
    """pytorch-i3d Unit3D semantics: conv3d(same pad, no bias) + BN(eps=1e-3) +
    relu; conv3d kernel layout (O,I,kt,kh,kw) -> (kt,kh,kw,I,O)."""
    from panacea_tpu.metrics_gen.i3d import Unit3D
    from panacea_tpu.utils.convert import _unit3d, convert_state_dict

    cell = torch.nn.Module()
    cell.conv3d = torch.nn.Conv3d(4, 8, (3, 3, 3), padding=(1, 1, 1), bias=False)
    cell.bn = torch.nn.BatchNorm3d(8, eps=1e-3)
    randomize_(cell, seed=1)
    with torch.no_grad():
        cell.bn.running_mean.normal_()
        cell.bn.running_var.uniform_(0.5, 2.0)
    cell.eval()
    x = np.random.RandomState(1).randn(1, 4, 5, 9, 9).astype(np.float32)
    with torch.no_grad():
        ref = torch.relu(cell.bn(cell.conv3d(torch.from_numpy(x)))).numpy()

    params, missing, unexpected = convert_state_dict(
        state_dict_numpy(cell, "u"), _unit3d("u", ()))
    unexpected = [k for k in unexpected if "num_batches_tracked" not in k]
    assert not missing and not unexpected
    out = Unit3D(8, (3, 3, 3)).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref, atol=1e-4)


def test_lpips_full_parity():
    """Full reference LPIPS (vgg taps + unit-normalize + lin heads + spatial
    mean, lpips/loss/lpips.py:46-66) vs losses/lpips.LPIPS through the
    converter."""
    from panacea_tpu.losses.lpips import LPIPS
    from panacea_tpu.utils.convert import (
        build_vgg16_lpips_mapping,
        convert_state_dict,
    )

    lpips_mod = load_reference_lpips()
    lpips_mod.LPIPS.load_from_pretrained = lambda self, name="vgg_lpips": None
    ref = lpips_mod.LPIPS(use_dropout=True)
    randomize_(ref, seed=2)
    ref.eval()

    rs = np.random.RandomState(2)
    x = rs.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    y = rs.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        d_ref = ref(torch.from_numpy(x), torch.from_numpy(y)).numpy()

    sd = state_dict_numpy(ref)
    params, missing, unexpected = convert_state_dict(
        sd, build_vgg16_lpips_mapping())
    assert not missing, missing[:8]
    unexpected = [k for k in unexpected if not k.startswith("scaling_layer.")]
    assert not unexpected, unexpected[:8]

    mod = LPIPS()
    d = mod.apply({"params": params},
                  jnp.asarray(x.transpose(0, 2, 3, 1)),
                  jnp.asarray(y.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(d).reshape(-1), d_ref.reshape(-1), atol=1e-5)


def test_fid_zero_with_converted_inception():
    """FID of a feature set against itself must be ~0 through the converted
    tower (random torch-layout weights -> flax)."""
    from panacea_tpu.metrics_gen.fid import frechet_distance
    from panacea_tpu.metrics_gen.inception import InceptionV3
    from panacea_tpu.utils.convert import build_inception_mapping, convert_state_dict

    mapping = build_inception_mapping()
    model = InceptionV3()
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 128, 128, 3)))["params"],
        jax.random.PRNGKey(0))
    flat = flax.traverse_util.flatten_dict(shapes)
    rs = np.random.RandomState(3)
    sd = {}
    for ref_key, (path, _) in mapping.items():
        shp = flat[path].shape
        if path[-1] == "kernel":
            arr = (rs.randn(*shp) * 0.1).astype(np.float32)
            sd[ref_key] = np.transpose(arr, (3, 2, 0, 1))
        elif path[-1] == "bn_var":
            sd[ref_key] = rs.uniform(0.5, 2.0, shp).astype(np.float32)
        else:
            sd[ref_key] = (rs.randn(*shp) * 0.1).astype(np.float32)
    params, missing, unexpected = convert_state_dict(sd, mapping)
    assert not missing and not unexpected

    imgs = rs.uniform(-1, 1, (4, 128, 128, 3)).astype(np.float32)
    feats = np.asarray(model.apply({"params": params}, jnp.asarray(imgs)))
    assert feats.shape == (4, 2048) and np.isfinite(feats).all()
    mu, sigma = feats.mean(0), np.cov(feats, rowvar=False)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-4
