"""Metrics, generate-eval, delta tools, crawler helpers, decode_img."""

import base64
import io
import json
import os

import numpy as np
import pytest

from valley_tpu.train import metrics as M


# -- metrics ------------------------------------------------------------

def test_bleu_perfect_and_zero():
    assert M.bleu(["the cat sat on the mat"],
                  ["the cat sat on the mat"]) == pytest.approx(1.0)
    assert M.bleu(["xyz"], ["completely different words here"]) < 0.1
    assert M.bleu([""], ["ref"]) == 0.0


def test_bleu_partial_ordering():
    good = M.bleu(["the cat sat on a mat"], ["the cat sat on the mat"])
    bad = M.bleu(["mat the on sat cat the"], ["the cat sat on the mat"])
    assert 0 < bad < good < 1


def test_rouge_golden():
    out = M.rouge(["the cat sat"], ["the cat sat"])
    assert out["rouge1"] == pytest.approx(1.0)
    assert out["rouge2"] == pytest.approx(1.0)
    assert out["rougeL"] == pytest.approx(1.0)
    out2 = M.rouge(["a b c d"], ["a b x y"])
    assert out2["rouge1"] == pytest.approx(0.5)
    assert out2["rougeL"] == pytest.approx(0.5)


def test_jsonl_shard_merge(tmp_path):
    path = str(tmp_path / "preds.jsonl")
    M.jsonl_write(path, 0, [{"a": 1}])
    M.jsonl_write(path, 1, [{"a": 2}, {"a": 3}])
    records = M.merge_files(path)
    assert sorted(r["a"] for r in records) == [1, 2, 3]
    assert os.path.exists(path)
    assert not any(".worker" in f for f in os.listdir(tmp_path))


# -- generate-eval ------------------------------------------------------

def test_generate_eval_end_to_end(tmp_path):
    import jax
    import jax.numpy as jnp

    from valley_tpu import config as C
    from valley_tpu.inference import Engine
    from valley_tpu.models import valley
    from valley_tpu.tokenizer import ByteFallbackTokenizer
    from valley_tpu.train.eval_loop import generate_eval

    tk = ByteFallbackTokenizer()
    cfg = C.valley_tiny().replace(tokens=tk.special_tokens())
    params = valley.init_params(cfg, jax.random.key(0), jnp.float32)
    engine = Engine(cfg, params, buckets=(256,), max_new_tokens=8,
                    cache_dtype=jnp.float32, use_flash=False)

    class DS:
        list_data_dict = [
            {"id": "a", "conversations": [
                {"from": "human", "value": "what?"},
                {"from": "gpt", "value": "something"}]},
        ]

        def __len__(self):
            return 1

        def __getitem__(self, i):
            return {"input_ids": np.zeros(4), "labels": np.zeros(4)}

    pred_file = str(tmp_path / "eval.jsonl")
    out = generate_eval(engine, tk, DS(), eval_num=1,
                        prediction_file=pred_file)
    assert "bleu" in out and "rougeL" in out
    records = [json.loads(line) for line in open(pred_file)]
    assert records[0]["reference"] == "something"


# -- delta tools --------------------------------------------------------

def test_delta_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    from valley_tpu.utils.delta import apply_delta, make_delta

    rng = np.random.default_rng(0)
    base = {"model.embed_tokens.weight": rng.standard_normal((10, 4)).astype(
        np.float32),
        "model.norm.weight": rng.standard_normal(4).astype(np.float32)}
    target = {
        # target grew 2 vocab rows (added special tokens)
        "model.embed_tokens.weight": rng.standard_normal((12, 4)).astype(
            np.float32),
        "model.norm.weight": rng.standard_normal(4).astype(np.float32),
        "model.mm_projector.weight": rng.standard_normal((4, 3)).astype(
            np.float32),
    }
    bdir, tdir, ddir, odir = (str(tmp_path / x) for x in
                              ("base", "target", "delta", "out"))
    for d, sd in ((bdir, base), (tdir, target)):
        os.makedirs(d)
        save_file(sd, os.path.join(d, "model.safetensors"))
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump({}, f)

    make_delta(bdir, tdir, ddir)
    apply_delta(bdir, ddir, odir)

    from valley_tpu.utils.hf_bridge import read_state_dict

    recovered = read_state_dict(odir)
    for k in target:
        np.testing.assert_allclose(recovered[k], target[k], atol=1e-5)


def test_delta_rejects_unknown_mismatch(tmp_path):
    from valley_tpu.utils.delta import _combine

    with pytest.raises(ValueError):
        _combine({"model.norm.weight": np.zeros((4, 4))},
                 {"model.norm.weight": np.zeros((3, 3))}, -1)
    with pytest.raises(KeyError):
        _combine({"model.unknown.weight": np.zeros(2)}, {}, -1)


# -- crawlers -----------------------------------------------------------

def test_vatex_crosscheck_and_commands(tmp_path):
    from valley_tpu.crawler.vatex import build_commands, crosscheck_videos

    vdir = tmp_path / "VATEX_videos"
    vdir.mkdir()
    (vdir / "v_abcdefghijk.mp4").touch()   # 13-char basename -> id 11
    ann = [{"videoID": "abcdefghijk_000001_000010"},
           {"videoID": "zzzzzzzzzzz_000002_000020"}]
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    missing = crosscheck_videos(str(vdir), str(ann_file))
    assert missing == ["zzzzzzzzzzz"]
    cmds = build_commands(str(vdir), missing)
    assert "youtube.com/watch?v=zzzzzzzzzzz" in cmds[0]
    assert "yt-dlp" in cmds[0]


def test_jukin_check_already(tmp_path):
    from valley_tpu.crawler.jukin import check_already

    (tmp_path / "v_123.mp4").touch()
    left = check_already(str(tmp_path), ["123", "456"])
    assert left == ["456"]


# -- decode_img ---------------------------------------------------------

def test_decode_img_extract(tmp_path):
    from PIL import Image

    from valley_tpu.utils.decode_img import extract

    buf = io.BytesIO()
    Image.new("RGB", (8, 8), (255, 0, 0)).save(buf, format="JPEG")
    frame_b64 = base64.encodebytes(buf.getvalue()).decode()
    rec = {"title": "t", "merge_ocr": "o", "gt_label": 1,
           "video_frame": [frame_b64] * 3}
    src = tmp_path / "dump.jsonl"
    src.write_text(json.dumps(rec) + "\n")
    out = tmp_path / "out"
    extract(str(src), str(out), frame_sample_rate=1.0)
    assert (out / "0.json").exists()
    assert len(list(out.glob("0_*.jpg"))) == 3


# -- profiling ----------------------------------------------------------

def test_step_timer():
    from valley_tpu.utils.profiling import StepTimer

    t = StepTimer()
    for _ in range(3):
        t.start()
        t.stop()
    s = t.summary()
    assert s["step_time_mean_s"] >= 0
    assert "steps_per_s" in s


# -- bench.py closed-form quantized perf weights -------------------------

@pytest.mark.parametrize("qmode", ["int8", "int8a8", "int4g", "int4gp",
                                   "int4ga8", "int4gpa8"])
def test_bench_perf_quant_params_matches_quantizer(qmode):
    """bench._perf_quant_params (the 13B builder that avoids the 26 GB
    bf16 transient) must be BIT-IDENTICAL to building the constant bf16
    tree and running quantize_llama_params(+pack_int4_params) on it."""
    import importlib.util

    import jax
    import jax.numpy as jnp

    from valley_tpu import config as C
    from valley_tpu.models import valley
    from valley_tpu.ops.quant import (pack_int4_params,
                                      quantize_llama_params)

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    cfg = C.valley_tiny()
    shapes = jax.eval_shape(
        lambda k: valley.init_params(cfg, k, dtype=jnp.bfloat16,
                                     fused=True), jax.random.key(0))
    ref = jax.tree.map(lambda s: jnp.full(s.shape, 0.008, s.dtype),
                       shapes)
    from valley_tpu.ops.quant import parse_quant_mode

    qm = parse_quant_mode(qmode)
    ref = quantize_llama_params(ref, bits=qm["bits"],
                                group_size=qm["group_size"],
                                act8=qm["act8"])
    if qm["packed"]:
        ref = pack_int4_params(ref)

    got = bench._perf_quant_params(cfg, fused=True, qmode=qmode)

    ref_flat = jax.tree_util.tree_flatten_with_path(ref)[0]
    got_flat = jax.tree_util.tree_flatten_with_path(got)[0]
    assert [p for p, _ in ref_flat] == [p for p, _ in got_flat]
    for (path, a), (_, b) in zip(ref_flat, got_flat):
        assert a.shape == b.shape and a.dtype == b.dtype, path
        np.testing.assert_array_equal(
            np.asarray(a, np.float32) if a.dtype != jnp.uint8
            else np.asarray(a),
            np.asarray(b, np.float32) if b.dtype != jnp.uint8
            else np.asarray(b), err_msg=str(path))
