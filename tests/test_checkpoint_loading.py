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
