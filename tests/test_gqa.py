"""Grouped-query attention (num_key_value_heads < num_attention_heads):
HF logit parity and KV-cache decode correctness — needed for LLaMA-2-70B
-style checkpoints."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from valley_tpu import config as C
from valley_tpu.inference import Engine, GenerationConfig
from valley_tpu.models import llama, valley
from valley_tpu.utils import hf_bridge


@pytest.fixture(scope="module")
def gqa_pair():
    torch.manual_seed(0)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=2,
        max_position_embeddings=256, attn_implementation="eager")
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = hf_bridge.text_config_from_hf(hf_cfg.to_dict())
    params = hf_bridge.convert_llama(model.state_dict(), cfg, jnp.float32)
    return model, cfg, params


def test_gqa_logits_match_hf(gqa_pair):
    model, cfg, params = gqa_pair
    assert cfg.kv_heads == 2 and cfg.num_attention_heads == 8
    ids = np.random.default_rng(0).integers(0, 256, (2, 18))
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.numpy()
    embeds = llama.embed(params, jnp.asarray(ids))
    ours = np.asarray(llama.forward(params, cfg, embeds, use_flash=False))
    assert np.max(np.abs(ours - ref)) < 1e-3


def test_gqa_cache_decode_matches_teacher_forcing(gqa_pair):
    _model, tcfg, params = gqa_pair
    vcfg = C.ValleyConfig(text=tcfg, vision=C.VISION_TINY,
                          tokens=C.SpecialTokens(im_patch=250, im_start=251,
                                                 im_end=252, vi_frame=253,
                                                 vi_start=254, vi_end=255))
    full_params = {"llama": params,
                   "vision": {}, "projector": {}, "temporal": {}}
    # text-only engine run
    import jax.random as jr

    full_params["vision"] = valley.init_params(
        vcfg, jr.key(0), jnp.float32)["vision"]
    full_params["projector"] = {"w": jnp.zeros((32, 64)),
                                "b": jnp.zeros((64,))}
    eng = Engine(vcfg, full_params, buckets=(32,), max_new_tokens=8,
                 cache_dtype=jnp.float32, use_flash=False)
    prompt = list(range(10, 28))
    toks = [int(t[0]) for t in eng.generate_tokens(
        [prompt], gen=GenerationConfig(max_new_tokens=5, do_sample=False),
        eos_ids=[-1])]
    fullfwd = valley.forward(full_params, vcfg, jnp.asarray([prompt + toks]))
    for i, t in enumerate(toks):
        assert t == int(jnp.argmax(fullfwd[0, len(prompt) - 1 + i])), i
