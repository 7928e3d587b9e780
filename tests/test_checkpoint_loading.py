"""End-to-end checkpoint-directory loading: a real HF save_pretrained dir
with tokenizer -> load_valley_checkpoint -> engine generation, including
vocab growth with mean-init for the Valley special tokens."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from valley_tpu.utils import hf_bridge


def _make_word_level_tokenizer(path, vocab_size=120):
    """Minimal fast tokenizer saved as tokenizer.json."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for i in range(3, vocab_size):
        vocab[f"w{i}"] = i
    tk = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tk.pre_tokenizer = Whitespace()
    tk.save(str(path / "tokenizer.json"))
    (path / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "unk_token": "<unk>", "bos_token": "<s>", "eos_token": "</s>",
        "model_max_length": 512,
    }))


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=120, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=512)
    model = transformers.LlamaForCausalLM(cfg)
    model.save_pretrained(str(d), safe_serialization=True)
    _make_word_level_tokenizer(d)
    return str(d), model


def test_load_honors_checkpoint_vision_select_layer(checkpoint_dir):
    """A checkpoint trained with a non-default vision tap (config.json
    mm_vision_select_layer) must load with that tap, not the arg default
    (the reference reads it from model config at forward time)."""
    path, _ = checkpoint_dir
    with open(f"{path}/config.json") as f:
        hf_cfg = json.load(f)
    hf_cfg["mm_vision_select_layer"] = -1
    with open(f"{path}/config.json", "w") as f:
        json.dump(hf_cfg, f)
    try:
        cfg, _params, _tok = hf_bridge.load_valley_checkpoint(path)
        assert cfg.vision.select_layer == -1
        # explicit argument is only a fallback for configs without the key
        del hf_cfg["mm_vision_select_layer"]
        with open(f"{path}/config.json", "w") as f:
            json.dump(hf_cfg, f)
        cfg2, _p, _t = hf_bridge.load_valley_checkpoint(path,
                                                        select_layer=-3)
        assert cfg2.vision.select_layer == -3
    finally:
        hf_cfg.pop("mm_vision_select_layer", None)
        with open(f"{path}/config.json", "w") as f:
            json.dump(hf_cfg, f)


def test_load_valley_checkpoint_grows_vocab(checkpoint_dir):
    path, torch_model = checkpoint_dir
    cfg, params, tokenizer = hf_bridge.load_valley_checkpoint(path)
    # 120 base + [PAD] + 6 valley markers
    assert cfg.text.vocab_size == len(tokenizer)
    assert params["llama"]["embed"].shape[0] == len(tokenizer)
    assert params["llama"]["lm_head"].shape[1] == len(tokenizer)
    assert cfg.tokens.im_patch > 0 and cfg.tokens.vi_end > 0
    # new rows are the mean of the original ones (mean-init parity)
    e = np.asarray(jnp.asarray(params["llama"]["embed"], jnp.float32))
    base = torch_model.get_input_embeddings().weight.detach().numpy()
    np.testing.assert_allclose(e[-1], base.mean(axis=0), atol=2e-2)


def test_loaded_model_logits_match_torch_on_base_vocab(checkpoint_dir):
    path, torch_model = checkpoint_dir
    cfg, params, _tok = hf_bridge.load_valley_checkpoint(path)
    from valley_tpu.models import llama

    ids = np.random.default_rng(0).integers(3, 120, (1, 12))
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    embeds = llama.embed(params["llama"], jnp.asarray(ids))
    ours = np.asarray(llama.forward(params["llama"], cfg.text, embeds,
                                    use_flash=False))
    # bf16 storage: compare within bf16 tolerance on the original vocab
    diff = np.abs(ours[..., :120] - ref)
    assert diff.max() < 0.1, diff.max()


def test_loaded_model_generates(checkpoint_dir):
    path, _ = checkpoint_dir
    cfg, params, tokenizer = hf_bridge.load_valley_checkpoint(path)
    from valley_tpu.inference import Engine, GenerationConfig

    eng = Engine(cfg, params, buckets=(32,), max_new_tokens=4,
                 cache_dtype=jnp.float32, use_flash=False)
    ids = tokenizer("w10 w11 w12").input_ids
    toks = [int(t[0]) for t in eng.generate_tokens(
        [ids], gen=GenerationConfig(max_new_tokens=3, do_sample=False),
        eos_ids=[-1])]
    assert len(toks) == 3


def test_resize_shrink():
    import jax

    p = {"embed": jnp.ones((10, 4)), "lm_head": jnp.ones((4, 10)),
         "layers": {}, "final_norm": jnp.ones(4)}
    out, v = hf_bridge.resize_token_embeddings(p, 8)
    assert v == 8 and out["embed"].shape == (8, 4)
    assert out["lm_head"].shape == (4, 8)


@pytest.mark.parametrize("mode", ["int8", "int4gp"])
def test_quantize_on_load_matches_post_load_quant(checkpoint_dir, mode):
    """`load_valley_checkpoint(quantize=...)` (HOST-side quantization —
    the path that lets a 13B tree reach one 16 GB chip without its bf16
    form ever existing on device) produces the SAME tree as loading
    bf16 and quantizing on device, and the engine generates from it."""
    path, _ = checkpoint_dir
    from valley_tpu.ops.quant import (pack_int4_params,
                                      quantize_llama_params)

    cfg, ref, _ = hf_bridge.load_valley_checkpoint(path)
    ref = quantize_llama_params(
        ref, bits=4 if mode == "int4gp" else 8,
        group_size=16 if mode == "int4gp" else 0)
    if mode == "int4gp":
        ref = pack_int4_params(ref)

    cfg2, got, tokenizer = hf_bridge.load_valley_checkpoint(
        path, quantize=mode, quantize_group_size=16
        if mode == "int4gp" else 128)
    assert cfg2 == cfg
    lay_r, lay_g = ref["llama"]["layers"], got["llama"]["layers"]
    assert set(lay_r) == set(lay_g)
    for name, want in lay_r.items():
        have = lay_g[name]
        assert have.dtype == want.dtype, name
        a, b = np.asarray(want), np.asarray(have)
        if a.dtype.name == "bfloat16":
            a, b = a.view(np.uint16), b.view(np.uint16)
        np.testing.assert_array_equal(a, b, err_msg=name)
    np.testing.assert_array_equal(np.asarray(ref["llama"]["lm_head"]),
                                  np.asarray(got["llama"]["lm_head"]))

    from valley_tpu.inference import Engine, GenerationConfig

    eng = Engine(cfg2, got, buckets=(32,), max_new_tokens=4,
                 cache_dtype=jnp.float32, use_flash=False,
                 w4_packed=mode == "int4gp")
    toks = [int(t[0]) for t in eng.generate_tokens(
        [tokenizer("w10 w11 w12").input_ids],
        gen=GenerationConfig(max_new_tokens=3, do_sample=False),
        eos_ids=[-1])]
    assert len(toks) == 3


def test_quantize_on_load_fused(checkpoint_dir):
    """quantize-on-load composes with the fused serving layout: host
    fuse -> host quantize == device fuse -> device quantize."""
    path, _ = checkpoint_dir
    from valley_tpu.models.llama import fuse_llama_params
    from valley_tpu.ops.quant import quantize_llama_params

    cfg, ref, _ = hf_bridge.load_valley_checkpoint(path)
    ref = quantize_llama_params(fuse_llama_params(ref))
    _, got, _ = hf_bridge.load_valley_checkpoint(path, quantize="int8",
                                                 fused=True)
    lay_r, lay_g = ref["llama"]["layers"], got["llama"]["layers"]
    assert "wqkv" in lay_g and "wq" not in lay_g
    for name in ("wqkv", "w_gateup", "wqkv_scale"):
        a, b = np.asarray(lay_r[name]), np.asarray(lay_g[name])
        if a.dtype.name == "bfloat16":
            a, b = a.view(np.uint16), b.view(np.uint16)
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_worker_load_engine_uses_quantize_on_load(checkpoint_dir):
    """`model_worker.load_engine(--model-path ckpt --quantize int8)`
    routes through hf_bridge quantize-on-load (host-side) and does NOT
    re-quantize device-side — the tree arrives already int8 and the
    engine generates."""
    import argparse

    from valley_tpu.serve.model_worker import load_engine

    path, _ = checkpoint_dir
    args = argparse.Namespace(
        model_path=path, vision_tower=None, lora_path=None,
        quantize="int8", quantize_vision=None, kv_cache="bf16",
        fused=False, buckets="32", max_new_tokens=8, steps_per_call=4,
        decode_ramp="off", frame_buckets="off", num_frames=8,
        tensor_parallel=1, raw_pixels=True)
    eng, tokenizer = load_engine(args)
    lay = eng.params["llama"]["layers"]
    assert lay["wq"].dtype == jnp.int8 and "wq_scale" in lay
    from valley_tpu.inference import GenerationConfig

    toks = [int(t[0]) for t in eng.generate_tokens(
        [tokenizer("w10 w11").input_ids],
        gen=GenerationConfig(max_new_tokens=3, do_sample=False),
        eos_ids=[-1])]
    assert len(toks) == 3
