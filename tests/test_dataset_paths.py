"""Dataset modality paths not covered elsewhere: multi-image lists, the
fashion set merge, fast_epoch truncation, aspect-keep images, and top-p
sampling behavior."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valley_tpu import config as C
from valley_tpu.data.dataset import HybridDataset
from valley_tpu.tokenizer import ByteFallbackTokenizer


@pytest.fixture()
def image_files(tmp_path):
    from PIL import Image

    paths = []
    for i in range(3):
        p = tmp_path / f"img{i}.png"
        Image.fromarray(np.full((60, 80, 3), 50 * i, np.uint8)).save(p)
        paths.append(str(p))
    return paths


def test_multi_image_list_sample(tmp_path, image_files):
    data = [{"id": "m1", "image": image_files, "conversations": [
        {"from": "human", "value": "<image> what are these"},
        {"from": "gpt", "value": "pictures"}]}]
    dpath = tmp_path / "d.json"
    dpath.write_text(json.dumps(data))
    ds = HybridDataset(str(dpath), None, ByteFallbackTokenizer(), dict(
        conv_mode="v1", is_multimodal=True, use_im_start_end=True,
        crop_size=28, scale_size=28, patch_size=14, fast_epoch=False))
    item = ds[0]
    assert not isinstance(item, tuple)
    assert item["image"].shape == (3, 3, 28, 28)  # 3 images as frames
    # 4 patches (28/14)^2 and 3 "frames" in the expanded prompt
    tk = ByteFallbackTokenizer()
    toks = tk.special_tokens()
    ids = list(item["input_ids"])
    assert ids.count(toks.im_patch) == 4
    assert ids.count(toks.vi_frame) == 3


def test_fashion_merge_and_fast_epoch(tmp_path, image_files):
    text = [{"id": f"t{i}", "conversations": [
        {"from": "human", "value": "q"}, {"from": "gpt", "value": "a"}]}
        for i in range(30)]
    fashion = [{"id": f"f{i}", "conversations": [
        {"from": "human", "value": "fq"}, {"from": "gpt", "value": "fa"}]}
        for i in range(5)]
    dpath, fpath = tmp_path / "d.json", tmp_path / "f.json"
    dpath.write_text(json.dumps(text))
    fpath.write_text(json.dumps(fashion))

    ds = HybridDataset(str(dpath), None, ByteFallbackTokenizer(), dict(
        conv_mode="v1", use_fashion=True, fast_epoch=True,
        is_multimodal=False), fashion_data_path=str(fpath))
    # fast_epoch truncates main sets to 10 (reference dataset.py:25-33)
    assert len(ds) == 10 + 5


def test_aspect_keep_image(tmp_path, image_files):
    data = [{"id": "a1", "image": "img0.png", "conversations": [
        {"from": "human", "value": "<image> hm"},
        {"from": "gpt", "value": "ok"}]}]
    dpath = tmp_path / "d.json"
    dpath.write_text(json.dumps(data))
    ds = HybridDataset(str(dpath), None, ByteFallbackTokenizer(), dict(
        conv_mode="v1", is_multimodal=True, use_im_start_end=True,
        image_folder=str(tmp_path), image_aspect_ratio="keep",
        crop_size=28, scale_size=28, patch_size=14, fast_epoch=False))
    item = ds[0]
    assert not isinstance(item, tuple)
    assert item["image"].ndim == 4


def test_top_p_restricts_to_greedy_when_tiny():
    from valley_tpu.inference.engine import sample_token

    logits = jnp.asarray(np.random.default_rng(0).standard_normal((2, 50)),
                         jnp.float32)
    greedy = np.asarray(jnp.argmax(logits, axis=-1))
    for seed in range(5):
        tok = sample_token(logits, jax.random.key(seed), temperature=1.0,
                           top_p=1e-6, do_sample=True)
        np.testing.assert_array_equal(np.asarray(tok), greedy)


def test_top_p_one_samples_broadly():
    from valley_tpu.inference.engine import sample_token

    logits = jnp.zeros((1, 16), jnp.float32)  # uniform
    seen = {int(sample_token(logits, jax.random.key(s), 1.0, 1.0, True)[0])
            for s in range(30)}
    assert len(seen) > 4  # many distinct tokens under uniform sampling


def test_per_row_temperature_mix():
    from valley_tpu.inference.engine import sample_token

    logits = jnp.asarray(np.random.default_rng(1).standard_normal((2, 64)),
                         jnp.float32)
    greedy = np.asarray(jnp.argmax(logits, axis=-1))
    temps = jnp.asarray([0.0, 5.0])
    toks = [np.asarray(sample_token(logits, jax.random.key(s), temps,
                                    jnp.asarray([1.0, 1.0]), True))
            for s in range(20)]
    # row 0 (temp 0) always greedy; row 1 (hot) varies
    assert all(t[0] == greedy[0] for t in toks)
    assert len({int(t[1]) for t in toks}) > 3
