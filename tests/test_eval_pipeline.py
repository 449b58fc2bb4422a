"""End-to-end perception eval on synthetic scenes: sliding window -> tiny
detector -> coder -> metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panacea_tpu.data.nuscenes.synthetic import make_synthetic_infos
from panacea_tpu.perception.coder import NMSFreeCoder
from panacea_tpu.perception.detector import StreamPETRWindow
from panacea_tpu.perception.eval_dataset import GenNuScenesEvalDataset
from panacea_tpu.perception.metrics import CLASS_NAMES, evaluate_detections


def tiny_loader(path):
    from panacea_tpu.data.nuscenes.synthetic import path_seed

    rs = np.random.RandomState(path_seed(path))
    return rs.uniform(0, 255, (64, 128, 3)).astype(np.float32)


@pytest.mark.slow
def test_eval_pipeline_end_to_end():
    infos = make_synthetic_infos(num_frames=4, num_boxes=4, seed=0)
    for info in infos:
        info["ego2global_rotation"] = [1.0, 0.0, 0.0, 0.0]
        info["ego2global_translation"] = [2.0 * info["frame_idx"], 0.0, 0.0]
    ds = GenNuScenesEvalDataset(
        infos=infos, queue_length=2, final_dim=(64, 128),
        image_loader=tiny_loader,
    )
    window = ds.sliding_window(1)
    assert window is not None
    assert window["imgs"].shape == (1, 2, 6, 64, 128, 3)
    assert window["prev_exists"][0, 0] == 0.0
    assert window["prev_exists"][0, 1] == 1.0

    model = StreamPETRWindow(
        embed_dims=32, num_query=12, memory_len=24, topk_proposals=8,
        num_propagated=8, num_decoder_layers=2, num_cams=6,
    )
    imgs = jnp.asarray(window["imgs"])
    data_seq = {k: jnp.asarray(v) for k, v in window.items() if k != "imgs"}
    params = model.init(jax.random.PRNGKey(0), imgs, data_seq)["params"]
    outs, _ = model.apply({"params": params}, imgs, data_seq)
    coder = NMSFreeCoder(pc_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
                         max_num=20)
    dets = coder.decode(outs)[0]

    gt = ds.gt_for(1, list(CLASS_NAMES))
    assert gt["boxes"].shape[1] == 9
    metrics = evaluate_detections(
        [{"boxes": dets["bboxes"], "labels": dets["labels"],
          "scores": dets["scores"]}],
        [gt],
    )
    assert "NDS" in metrics and np.isfinite(metrics["NDS"])
    assert 0.0 <= metrics["NDS"] <= 1.0


def test_collect_results_cpu_multirank(tmp_path):
    """Simulated 3-rank gather: shards interleave back into dataset order,
    rank>0 gets None, part files are cleaned up."""
    from panacea_tpu.perception.collect import collect_results_cpu

    noop = lambda name: None
    world = 3
    shards = {r: [(i, {"val": i}) for i in range(r, 10, world)]
              for r in range(world)}
    # ranks 1,2 write first (barrier is a no-op stand-in), rank 0 merges
    out = {}
    for r in (1, 2, 0):
        out[r] = collect_results_cpu(shards[r], str(tmp_path / "c"), r, world,
                                     barrier=noop)
    assert out[1] is None and out[2] is None
    assert [x["val"] for x in out[0]] == list(range(10))
    assert not any(p.name.startswith("part_")
                   for p in (tmp_path / "c").iterdir())
    # single-process short-circuit
    one = collect_results_cpu(shards[0], str(tmp_path / "d"), 0, 1,
                              barrier=noop)
    assert [x["val"] for x in one] == [0, 3, 6, 9]


def test_rot_scale_aug_transforms_all_pose_matrices():
    """GlobalRotScaleTrans must fold the SAME inverse scene transform into
    lidar2img AND extrinsics/ego_pose/ego_pose_inv (reference
    transform_3d.py:619-644) so temporal memory alignment sees the augmented
    frame. Recover the transform from lidar2img and check every pose matrix
    moved by it."""
    from panacea_tpu.perception.train_dataset import PerceptionTrainDataset

    infos = make_synthetic_infos(num_frames=4, num_boxes=4, seed=0)
    for info in infos:
        info["ego2global_rotation"] = [1.0, 0.0, 0.0, 0.0]
        info["ego2global_translation"] = [2.0 * info["frame_idx"], 0.0, 0.0]
    kw = dict(infos=infos, queue_length=2, final_dim=(64, 128),
              image_loader=tiny_loader, seed=3)
    ds_plain = PerceptionTrainDataset(**kw)
    ds_aug = PerceptionTrainDataset(
        rot_range=(0.2, 0.2), scale_ratio_range=(1.02, 1.02), **kw)
    w0, *_ = ds_plain.window_with_gt(1)
    wa, *_ = ds_aug.window_with_gt(1)
    # recover inv from the first camera's projection
    l2i0 = w0["lidar2img"].reshape(-1, 4, 4)
    l2ia = wa["lidar2img"].reshape(-1, 4, 4)
    inv = np.linalg.inv(l2i0[0]) @ l2ia[0]
    # same inv folded into every camera and frame
    np.testing.assert_allclose(l2ia, l2i0 @ inv, atol=1e-4)
    np.testing.assert_allclose(
        wa["extrinsics"].reshape(-1, 4, 4),
        w0["extrinsics"].reshape(-1, 4, 4) @ inv, atol=1e-4)
    np.testing.assert_allclose(
        wa["ego_pose"].reshape(-1, 4, 4),
        w0["ego_pose"].reshape(-1, 4, 4) @ inv, atol=1e-4)
    np.testing.assert_allclose(
        wa["ego_pose_inv"].reshape(-1, 4, 4),
        np.linalg.inv(inv) @ w0["ego_pose_inv"].reshape(-1, 4, 4), atol=1e-4)
    # and it is a genuine rot+scale, not identity
    assert not np.allclose(inv, np.eye(4), atol=1e-3)
