"""Fused wqkv / w_gateup serving layout (llama.fuse_llama_params):
numerically identical decode, int8-quantizable, sharding rules covered."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valley_tpu import config as C
from valley_tpu.inference import Engine, GenerationConfig
from valley_tpu.models import llama, valley
from valley_tpu.ops.quant import quantize_llama_params
from valley_tpu.parallel import create_mesh, shard_params


@pytest.fixture(scope="module")
def cfg():
    return C.valley_tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return valley.init_params(cfg, jax.random.key(0), dtype=jnp.float32)


def _prompt(cfg, frames=2):
    tok = cfg.tokens
    span = [tok.im_start] + [tok.im_patch] * cfg.num_patches + \
        [tok.im_end] + [tok.vi_start] + [tok.vi_frame] * frames + \
        [tok.vi_end]
    return [1] + span + list(range(5, 40))


def _decode(cfg, params, quant=False):
    p = jax.tree.map(jnp.copy, params)
    if quant:
        p = quantize_llama_params(p)
    eng = Engine(cfg, p, buckets=(128,), max_new_tokens=12,
                 steps_per_call=4)
    imgs = np.random.default_rng(0).standard_normal(
        (1, 2, 3, cfg.vision.image_size, cfg.vision.image_size)
    ).astype(np.float32)
    gen = GenerationConfig(max_new_tokens=12, do_sample=False)
    return [int(t[0]) for t in eng.generate_tokens(
        [_prompt(cfg)], imgs, gen, eos_ids=[-1])]


def test_fused_decode_identical(cfg, params):
    ref = _decode(cfg, params)
    fused = llama.fuse_llama_params(jax.tree.map(jnp.copy, params))
    got = _decode(cfg, fused)
    assert got == ref


def test_fused_forward_matches(cfg, params):
    ids = jnp.asarray([list(range(1, 20))])
    ref = valley.forward(params, cfg, ids)
    fused = llama.fuse_llama_params(jax.tree.map(jnp.copy, params))
    got = valley.forward(fused, cfg, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_int8_decode_matches_unfused_int8(cfg, params):
    ref = _decode(cfg, params, quant=True)
    fused = llama.fuse_llama_params(jax.tree.map(jnp.copy, params))
    got = _decode(cfg, fused, quant=True)
    # per-out-channel scales are unchanged by the out-axis concat
    assert got == ref


def test_fused_init_shapes(cfg):
    p = llama.init_params(cfg.text, jax.random.key(1), jnp.float32,
                          fused=True)
    t = cfg.text
    h_sz = t.num_attention_heads * t.head_dim
    kv_sz = t.kv_heads * t.head_dim
    assert p["layers"]["wqkv"].shape == (
        t.num_hidden_layers, h_sz + 2 * kv_sz, t.hidden_size)
    assert p["layers"]["w_gateup"].shape == (
        t.num_hidden_layers, 2 * t.intermediate_size, t.hidden_size)
    assert "wq" not in p["layers"]


def test_fused_sharding_rules(cfg, params):
    fused = llama.fuse_llama_params(jax.tree.map(jnp.copy, params))
    mesh = create_mesh(data=1, fsdp=4, model=2)
    sharded = shard_params(mesh, fused)
    spec = sharded["llama"]["layers"]["wqkv"].sharding.spec
    assert spec == jax.sharding.PartitionSpec(None, "model", "fsdp")


def test_fuse_refuses_lora(cfg, params):
    from valley_tpu.train import lora as lora_lib

    p = lora_lib.add_lora(jax.tree.map(jnp.copy, params),
                          jax.random.key(2), r=2, alpha=4)
    with pytest.raises(ValueError):
        llama.fuse_llama_params(p)
