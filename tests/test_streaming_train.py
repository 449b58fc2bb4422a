"""Streaming (seq_mode) training: sequence-group flags, the per-slot
scene-continuous sampler, and the memory-threaded train step.

Reference semantics: nuscenes_dataset.py:117-153 (_set_sequence_group_flag
with seq_split_num), :424 (prev_exists = not (index == 0 or flag[index-1] !=
flag[index])), group_sampler.py:154-236 (InfiniteGroupEachSampleInBatch-
Sampler), streampetr.py forward_train + sparse_head.py:424-427 (memory
detached across iterations).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panacea_tpu.perception.train_dataset import (
    StreamingSampler,
    sequence_group_flags,
)


def test_sequence_group_flags_split():
    toks = ["a"] * 5 + ["b"] * 4 + ["c"] * 1
    f1 = sequence_group_flags(toks, 1)
    np.testing.assert_array_equal(f1, [0] * 5 + [1] * 4 + [2])
    # seq_split_num=2: ceil(5/2)=3 -> chunks 3+2; ceil(4/2)=2 -> 2+2;
    # ceil(1/2)=1 -> 1 chunk... reference asserts num_groups doubles, and
    # a length-1 scene still yields bounds [0, 1] -> one chunk of 1 + the
    # assert len(bincount(new)) == len(bincount(old)) * split would FAIL
    # upstream for odd scenes; our scenes here keep it consistent
    f2 = sequence_group_flags(["a"] * 4 + ["b"] * 2, 2)
    np.testing.assert_array_equal(f2, [0, 0, 1, 1, 2, 3])
    # 'all': every frame its own group
    np.testing.assert_array_equal(sequence_group_flags(toks, "all"),
                                  np.arange(10))


def test_sequence_group_flags_split_counts():
    rs = np.random.RandomState(0)
    toks = sum([[f"s{i}"] * rs.randint(2, 9) for i in range(6)], [])
    base = sequence_group_flags(toks, 1)
    split = sequence_group_flags(toks, 2)
    # reference invariant (nuscenes_dataset.py:152): group count doubles
    assert len(np.bincount(split)) == len(np.bincount(base)) * 2
    # chunks are contiguous and ordered
    assert (np.diff(split) >= 0).all()
    # within-scene chunk sizes: ceil then remainder
    for g in range(base.max() + 1):
        n = int((base == g).sum())
        sub = split[base == g]
        sizes = np.bincount(sub - sub.min())
        assert sizes[0] == -(-n // 2) and sizes.sum() == n


def test_streaming_sampler_scene_continuity():
    # 4 groups of different lengths; 2 slots -> each slot consumes whole
    # groups back to back, within-group order preserved
    flags = np.asarray([0, 0, 0, 1, 1, 2, 2, 2, 2, 3])
    s = StreamingSampler(flags, batch_size=2, num_replicas=1, rank=0, seed=3)
    per_slot = [[], []]
    for _ in range(12):
        b = s.next_batch()
        assert len(b) == 2
        for i, idx in enumerate(b):
            per_slot[i].append(idx)
    group_of = {i: int(flags[i]) for i in range(len(flags))}
    for seq in per_slot:
        # split into group runs; each run must be the group's full index
        # list in order
        runs, cur = [], [seq[0]]
        for idx in seq[1:]:
            if group_of[idx] == group_of[cur[-1]] and idx > cur[-1]:
                cur.append(idx)
            else:
                runs.append(cur)
                cur = [idx]
        for run in runs:  # completed runs are whole groups, in order
            g = group_of[run[0]]
            expect = np.where(flags == g)[0].tolist()
            assert run == expect, (run, expect)
    # the two slots draw DISJOINT strided positions of the group stream —
    # deterministic for a fixed seed
    s2 = StreamingSampler(flags, batch_size=2, num_replicas=1, rank=0, seed=3)
    assert [s2.next_batch() for _ in range(12)] == [
        [a, b] for a, b in zip(*per_slot)]


def test_streaming_sampler_rank_striding():
    flags = np.asarray(sum([[g] * 2 for g in range(8)], []))
    # 2 replicas x 1 slot: rank 0 takes global slot 0, rank 1 slot 1
    r0 = StreamingSampler(flags, 1, num_replicas=2, rank=0, seed=7)
    r1 = StreamingSampler(flags, 1, num_replicas=2, rank=1, seed=7)
    g0 = [flags[r0.next_batch()[0]] for _ in range(8)]
    g1 = [flags[r1.next_batch()[0]] for _ in range(8)]
    # same permutation stream, interleaved: rank0 gets positions 0,2,4...
    rs = np.random.RandomState(7)
    perm = rs.permutation(8).tolist()
    assert g0[:2] == [perm[0]] * 2 and g1[:2] == [perm[1]] * 2


def test_prev_exists_streaming_continuity():
    from panacea_tpu.data.nuscenes.synthetic import make_synthetic_infos
    from panacea_tpu.perception.train_dataset import PerceptionTrainDataset

    infos = make_synthetic_infos(num_frames=8, num_boxes=3, seed=0)

    def loader(path):
        return np.zeros((32, 64, 3), np.float32)

    ds = PerceptionTrainDataset(infos=infos, queue_length=1,
                                final_dim=(32, 64), image_loader=loader,
                                seq_split_num=2, seed=0)
    n = len(infos)
    # seq flags: one synthetic scene split in two chunks
    for i in range(n):
        item = ds.train_window(i)
        assert item is not None, i
        window, _ = item
        expect = float(i != 0 and ds.seq_flags[i - 1] == ds.seq_flags[i])
        assert float(window["prev_exists"][0, 0]) == expect, i
    # sliding-window mode (seq_split_num=0): single-frame windows always
    # reset
    ds_w = PerceptionTrainDataset(infos=infos, queue_length=1,
                                  final_dim=(32, 64), image_loader=loader,
                                  seed=0)
    w, _ = ds_w.train_window(3)
    assert float(w["prev_exists"][0, 0]) == 0.0


@pytest.mark.slow
def test_streaming_train_step_threads_memory():
    """Two streaming steps on a tiny StreamPETR: finite losses, the memory
    actually carries (prev_exists=1 step sees the previous step's memory),
    and a prev_exists=0 step resets it."""
    import optax

    from panacea_tpu.perception.detector import StreamPETR, normalize_images
    from panacea_tpu.perception.head import init_memory
    from panacea_tpu.perception.train import (
        init_detector_train,
        make_detector_train,
    )

    model = StreamPETR(num_classes=10, embed_dims=32, num_query=12,
                       memory_len=24, topk_proposals=8, num_propagated=8,
                       num_decoder_layers=2, num_levels=5, num_cams=2,
                       with_atss=False)
    b, n, h, w = 1, 2, 32, 64
    rs = np.random.RandomState(0)

    def data_for(prev):
        eye = jnp.eye(4, dtype=jnp.float32)
        return {
            "prev_exists": jnp.full((b, 1), prev, jnp.float32),
            "timestamp": jnp.full((b, 1), 0.5, jnp.float32),
            "lidar2img": jnp.broadcast_to(eye, (b, 1, n, 4, 4)),
            "intrinsics": jnp.broadcast_to(eye, (b, 1, n, 4, 4)),
            "extrinsics": jnp.broadcast_to(eye, (b, 1, n, 4, 4)),
            "ego_pose": jnp.broadcast_to(eye, (b, 1, 4, 4)),
            "ego_pose_inv": jnp.broadcast_to(eye, (b, 1, 4, 4)),
        }

    imgs_seq = normalize_images(
        jnp.asarray(rs.uniform(0, 255, (b, 1, n, h, w, 3)),
                    jnp.float32))
    params = jax.jit(
        lambda k: model.init(k, imgs_seq, data_for(1.0),
                             method=model.train_window))(
        jax.random.PRNGKey(0))["params"]

    opt = optax.adam(1e-4)
    _, train_step = make_detector_train(
        model, opt, pc_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
        use_grid_mask=False, with_dn=True, streaming=True)
    state = init_detector_train(model, opt, params)

    gt_boxes = np.zeros((1, 4, 9), np.float32)
    gt_boxes[0, :2, :3] = rs.uniform(-10, 10, (2, 3))
    gt_boxes[0, :2, 3:6] = 2.0
    gt_labels = np.full((1, 4), -1, np.int64)
    gt_labels[0, :2] = [1, 3]

    mem0 = init_memory(b, model.memory_len, model.embed_dims)
    frame = {k: v[:, 0] for k, v in data_for(0.0).items()}
    state, mem1, m1 = train_step(state, jax.random.PRNGKey(1),
                                 imgs_seq[:, 0], frame,
                                 gt_boxes, gt_labels, memory=mem0)
    assert np.isfinite(m1["loss"])
    assert float(jnp.abs(mem1.embedding).sum()) > 0  # memory populated

    # continuing step consumes the carried memory: its embedding changes
    # again, and prev_exists gating means a reset step zeroes the carry
    frame1 = {k: v[:, 0] for k, v in data_for(1.0).items()}
    state, mem2, m2 = train_step(state, jax.random.PRNGKey(2),
                                 imgs_seq[:, 0], frame1,
                                 gt_boxes, gt_labels, memory=mem1)
    assert np.isfinite(m2["loss"])
    assert float(jnp.abs(mem2.embedding - mem1.embedding).sum()) > 0

    # reset semantics: pre_update_memory zeroes the carried slots when
    # prev_exists=0 — run the SAME carried memory through a reset frame and
    # a continue frame; the head outputs must differ only via the memory
    from panacea_tpu.perception.head import MemoryState  # noqa: F401

    outs_cont, _, _ = model.apply({"params": state.params}, imgs_seq[:, 0],
                                  mem1, frame1, method=model.train_frame)
    frame0 = {k: v[:, 0] for k, v in data_for(0.0).items()}
    outs_reset, _, _ = model.apply({"params": state.params}, imgs_seq[:, 0],
                                   mem1, frame0, method=model.train_frame)
    diff = float(jnp.abs(outs_cont["all_cls_scores"]
                         - outs_reset["all_cls_scores"]).max())
    assert diff > 1e-6, "carried memory had no effect on the next frame"
