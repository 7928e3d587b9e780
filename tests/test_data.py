"""Data pipeline: preprocessing/label-masking golden behavior, transforms,
video loading, dataset + collator."""

import json
import os

import numpy as np
import pytest

from valley_tpu.constants import IGNORE_INDEX
from valley_tpu.data import transforms as T
from valley_tpu.data.dataset import (DataCollatorForSupervisedDataset,
                                     HybridDataset, preprocess_image)
from valley_tpu.data.preprocess import (add_speaker_and_signal,
                                        mask_targets, preprocess,
                                        preprocess_multimodal_multiimage)
from valley_tpu.data.video import load_video, sample_indices
from valley_tpu.tokenizer import ByteFallbackTokenizer


# -- preprocessing ------------------------------------------------------

def test_add_speaker_and_signal_golden():
    src = [{"from": "human", "value": "hi"},
           {"from": "gpt", "value": "hello"}]
    conv = add_speaker_and_signal("HDR\n\n", src)
    assert conv == ("HDR\n\n### Human: hi\n### Assistant: hello\n### ")
    # reference mutates in place
    assert src[0]["value"] == "### Human: hi\n"


def test_mask_targets_semantics():
    target = np.arange(20)
    # header 5 tokens, human turn 6 tokens, gpt turn 9 tokens
    mask_targets(target, [5, 6, 9], ["human", "gpt"],
                 only_mask_system=False)
    assert (target[:5] == IGNORE_INDEX).all()          # header masked
    # human masked from cur+2 (the reference's +2 offset, data_util.py:146)
    assert target[5] == 5 and target[6] == 6
    assert (target[7:11] == IGNORE_INDEX).all()
    assert (target[11:20] == np.arange(11, 20)).all()  # gpt supervised


def test_mask_targets_only_system():
    target = np.arange(10)
    mask_targets(target, [4, 3, 3], ["human", "gpt"], only_mask_system=True)
    assert (target[:4] == IGNORE_INDEX).all()
    assert (target[4:] == np.arange(4, 10)).all()


def test_preprocess_end_to_end():
    tk = ByteFallbackTokenizer()
    sources = [[{"from": "human", "value": "what is this"},
                {"from": "gpt", "value": "a cat"}]]
    out = preprocess(sources, tk, "v1")
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert len(ids) == len(labels)
    assert labels[0] == IGNORE_INDEX          # header masked
    assert (labels != IGNORE_INDEX).sum() > 0  # assistant supervised
    # supervised positions match input ids
    sel = labels != IGNORE_INDEX
    assert (ids[sel] == labels[sel]).all()


def test_multimodal_expansion():
    cfg = {"is_multimodal": True, "use_im_start_end": True}
    src = [[{"from": "human", "value": "look <video> ok"}]]
    out = preprocess_multimodal_multiimage(src, cfg, cur_token_len=3,
                                           num_image=2)
    v = out[0][0]["value"]
    assert v == ("look <im_start><im_patch><im_patch><im_patch><im_end>"
                 "<vi_start><vi_frame><vi_frame><vi_end> ok")


def test_multimodal_expansion_disabled():
    src = [[{"from": "human", "value": "<image>"}]]
    out = preprocess_multimodal_multiimage(
        src, {"is_multimodal": False}, 3, 2)
    assert out[0][0]["value"] == "<image>"


# -- transforms ---------------------------------------------------------

def test_hot_path_transform_shapes_and_stats():
    frames = [np.full((120, 160, 3), 128, np.uint8) for _ in range(4)]
    pipe = T.Compose([T.Resize(256), T.CenterCrop(224),
                      T.ClipToTensor(), T.Normalize()])
    out = pipe(frames)
    assert out.shape == (3, 4, 224, 224)
    expect = (128 / 255.0 - np.asarray(T.CLIP_MEAN)) / np.asarray(T.CLIP_STD)
    np.testing.assert_allclose(out[:, 0, 0, 0], expect, rtol=1e-5)


def test_resize_shorter_side():
    frames = [np.zeros((100, 200, 3), np.uint8)]
    out = T.Resize(50)(frames)
    assert out[0].shape == (50, 100, 3)


def test_center_crop_rejects_oversize():
    with pytest.raises(ValueError):
        T.CenterCrop(300)([np.zeros((100, 100, 3), np.uint8)])


def test_tensor_roundtrip():
    clip = np.random.default_rng(0).random((3, 2, 8, 8)).astype(np.float32)
    frames = T.TensorToNumpy()(clip)
    assert len(frames) == 2 and frames[0].shape == (8, 8, 3)


def test_to_tensor_passthrough():
    arr = [[1.0, 2.0], [3.0, 4.0]]
    out = T.ToTensor()(arr)
    assert isinstance(out, np.ndarray) and out.shape == (2, 2)
    same = np.ones((3, 4), np.float32)
    np.testing.assert_array_equal(T.ToTensor()(same), same)


def test_augmentations_run():
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
              for _ in range(3)]
    for t in [T.RandomHorizontalFlip(1.0, rng=rng),
              T.RandomCrop(32, rng=rng), T.CornerCrop(32, rng=rng),
              T.RandomRotation(10, rng=rng),
              T.STA_RandomRotation(10, rng=rng),
              T.Each_RandomRotation(10, rng=rng),
              T.ColorJitter(0.4, 0.4, 0.4, 0.2, rng=rng),
              T.EachColorJitter(0.4, 0.4, 0.4, 0.2, rng=rng),
              T.RandomResize(rng=rng)]:
        out = t(frames)
        assert len(out) == 3


def test_hue_jitter_matches_colorsys():
    """The hue branch (torchvision adjust_hue semantics) against the stdlib
    HSV roundtrip, and identity at shift 0."""
    import colorsys

    rng = np.random.default_rng(3)
    f = rng.uniform(0, 255, (4, 5, 3)).astype(np.float32)
    shift = 0.17
    got = T._shift_hue(f, shift)
    for i in range(4):
        for j in range(5):
            h, s, v = colorsys.rgb_to_hsv(*(f[i, j] / 255.0).tolist())
            exp = np.asarray(
                colorsys.hsv_to_rgb((h + shift) % 1.0, s, v)) * 255.0
            np.testing.assert_allclose(got[i, j], exp, atol=1e-2)
    np.testing.assert_allclose(T._shift_hue(f, 0.0), f, atol=1e-2)
    # hue=0 ColorJitter leaves frames bit-identical (uint8 path)
    u8 = [rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)]
    out = T.ColorJitter(0, 0, 0, 0, rng=rng)(u8)
    np.testing.assert_array_equal(out[0], u8[0])


# -- video --------------------------------------------------------------

def test_sample_indices_fixed_golden():
    np.testing.assert_array_equal(
        sample_indices(100, "fixed", 8),
        np.linspace(0, 99, 8).astype(np.int64))


def test_sample_indices_fps():
    idx = sample_indices(300, "fps", fps=30.0, fps_number=0.5)
    np.testing.assert_array_equal(idx, np.arange(0, 300, 60))


@pytest.fixture(scope="module")
def tiny_video(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (320, 240))
    for i in range(30):
        frame = np.full((240, 320, 3), i * 8 % 255, np.uint8)
        w.write(frame)
    w.release()
    return path


def test_load_video_file(tiny_video):
    out = load_video(tiny_video, fixed_frame_number=8)
    assert out.shape == (3, 8, 224, 224)
    assert out.dtype == np.float32


def test_load_video_frame_dir(tmp_path):
    from PIL import Image

    for i in range(5):
        Image.fromarray(np.full((60, 80, 3), i * 40, np.uint8)).save(
            tmp_path / f"f{i}.png")
    out = load_video(str(tmp_path), fixed_frame_number=4)
    assert out.shape == (3, 4, 224, 224)


def test_select_diverse_prefers_distinct_frames():
    from valley_tpu.data.video import select_diverse

    rng = np.random.default_rng(0)
    dup = rng.integers(0, 255, (30, 40, 3)).astype(np.uint8)
    distinct = [rng.integers(0, 255, (30, 40, 3)).astype(np.uint8)
                for _ in range(3)]
    # 13 near-duplicates + 3 distinct shots scattered in
    frames = [dup.copy() for _ in range(16)]
    frames[4], frames[9], frames[14] = distinct
    keep = select_diverse(frames, 4)
    assert keep == sorted(keep) and len(keep) == 4
    assert {4, 9, 14} <= set(keep)        # all distinct shots kept
    # short inputs pass through untouched
    assert select_diverse(frames[:3], 8) == [0, 1, 2]


def test_load_video_adaptive_mode(tiny_video):
    out = load_video(tiny_video, frame_mode="adaptive",
                     fixed_frame_number=6)
    assert out.shape == (3, 6, 224, 224)
    assert out.dtype == np.float32


def test_load_video_adaptive_frame_dir(tmp_path):
    from PIL import Image

    for i in range(12):
        Image.fromarray(np.full((60, 80, 3), (i % 3) * 80,
                                np.uint8)).save(tmp_path / f"f{i:02d}.png")
    out = load_video(str(tmp_path), frame_mode="adaptive",
                     fixed_frame_number=3)
    assert out.shape == (3, 3, 224, 224)


# -- dataset / collator -------------------------------------------------

def test_hybrid_dataset_and_collator(tmp_path, tiny_video):
    data = [
        {"id": "t1", "conversations": [
            {"from": "human", "value": "hello"},
            {"from": "gpt", "value": "hi"}]},
    ]
    video_dir = tmp_path / "videos" / "webvid"
    video_dir.mkdir(parents=True)
    import shutil

    shutil.copy(tiny_video, video_dir / "v1.mp4")
    vdata = [
        {"id": "v1", "video": "v1.mp4", "conversations": [
            {"from": "human", "value": "<video> what happens"},
            {"from": "gpt", "value": "colors change"}]},
        {"id": "bad", "video": "missing.mp4", "conversations": [
            {"from": "human", "value": "<video> x"},
            {"from": "gpt", "value": "y"}]},
    ]
    dpath, vpath = tmp_path / "d.json", tmp_path / "v.json"
    dpath.write_text(json.dumps(data))
    vpath.write_text(json.dumps(vdata))

    tk = ByteFallbackTokenizer()
    ds = HybridDataset(str(dpath), str(vpath), tk, dict(
        conv_mode="v1", is_multimodal=True, use_im_start_end=True,
        video_folder=str(tmp_path / "videos"), num_frames=4,
        fast_epoch=False))
    assert len(ds) == 3
    items = [ds[i] for i in range(3)]
    fails = [x for x in items if isinstance(x, tuple)]
    assert len(fails) == 1 and fails[0][0] == "fail"

    coll = DataCollatorForSupervisedDataset(pad_token_id=0,
                                            pad_to_multiple=16)
    batch = coll(items)
    b, s = batch["input_ids"].shape
    assert b == 2 and s % 16 == 0
    assert batch["labels"].shape == (b, s)
    assert batch["attention_mask"].sum(axis=1).min() > 0
    assert batch["images"].shape[0] == 2
    # video sample has 4 valid frames; text-only has 1 zero frame
    counts = sorted(batch["frame_mask"].sum(axis=1).tolist())
    assert counts == [1, 4]


def test_collator_all_failed_raises():
    coll = DataCollatorForSupervisedDataset()
    with pytest.raises(ValueError):
        coll([("fail", {}), ("fail", {})])


def test_prefetch_loader_equivalence():
    from valley_tpu.data.dataset import DataLoader, PrefetchLoader

    class DS:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            return {"input_ids": np.arange(i + 1), "labels": np.arange(i + 1)}

    coll = DataCollatorForSupervisedDataset(pad_token_id=0,
                                            pad_to_multiple=4)
    base = DataLoader(DS(), 2, coll, seed=3)
    pref = PrefetchLoader(DataLoader(DS(), 2, coll, seed=3), depth=2)
    a = list(base.epoch(0))
    b = list(pref.epoch(0))
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["input_ids"], y["input_ids"])


def test_prefetch_loader_transform_applied():
    from valley_tpu.data.dataset import DataLoader, PrefetchLoader

    class DS:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return {"input_ids": np.ones(3), "labels": np.ones(3)}

    coll = DataCollatorForSupervisedDataset(pad_token_id=0,
                                            pad_to_multiple=1)
    pref = PrefetchLoader(DataLoader(DS(), 2, coll, seed=0),
                          transform=lambda b: {**b, "tagged": True})
    out = list(pref.epoch(0))
    assert all(b["tagged"] for b in out)


def test_preprocess_image_shape():
    from PIL import Image

    img = Image.fromarray(np.zeros((100, 300, 3), np.uint8))
    out = preprocess_image(img)
    assert out.shape == (3, 224, 224)


def test_loader_substitutes_failed_samples_constant_batch():
    """A failed sample must not shrink the local batch: multi-host ranks
    must agree on the global batch shape (a shrunken shard hangs the
    collective), and a shrunken batch recompiles even single-host."""
    from valley_tpu.data.dataset import DataLoader

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 1:
                return ("fail", {"id": i})
            return {"input_ids": np.full(3, i), "labels": np.full(3, i)}

    coll = DataCollatorForSupervisedDataset(pad_token_id=0,
                                            pad_to_multiple=1)
    batches = list(DataLoader(DS(), 4, coll, shuffle=False,
                              num_workers=1).epoch(0))
    assert len(batches) == 1
    assert batches[0]["input_ids"].shape[0] == 4   # substituted, not dropped

    class AllFail:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return ("fail", {"id": i})

    with pytest.raises(RuntimeError, match="failed to load"):
        list(DataLoader(AllFail(), 2, coll, shuffle=False,
                        num_workers=1).epoch(0))


def test_collator_fixed_shape_mode_always_emits_media_keys():
    """With pad_frames_to (the multi-host fixed-shape mode) an all-text
    local batch must still produce images/frame_mask — ranks must trace
    the same batch pytree or the SPMD step deadlocks."""
    coll = DataCollatorForSupervisedDataset(pad_token_id=0,
                                            pad_to_multiple=1,
                                            pad_frames_to=4,
                                            image_size=28)
    batch = coll([{"input_ids": np.ones(3, np.int32),
                   "labels": np.ones(3, np.int32)}])
    assert batch["images"].shape == (1, 4, 3, 28, 28)
    assert batch["frame_mask"].shape == (1, 4)
    assert not batch["frame_mask"].any()


def test_collator_fixed_shape_truncates_excess_frames():
    """pad_frames_to is EXACT in fixed-shape mode: a sample with more
    frames (fps mode / long image lists) truncates rather than growing
    the frame axis — a per-rank local max would diverge the multi-host
    global shape."""
    coll = DataCollatorForSupervisedDataset(pad_token_id=0,
                                            pad_to_multiple=1,
                                            pad_frames_to=4)
    batch = coll([{"input_ids": np.ones(3, np.int32),
                   "labels": np.ones(3, np.int32),
                   "image": np.ones((7, 3, 28, 28), np.float32)}])
    assert batch["images"].shape == (1, 4, 3, 28, 28)
    assert batch["frame_mask"].all()
