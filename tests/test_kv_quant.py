"""int8 KV-cache fidelity: quantized-cache decode must track the fp32-cache
decode closely (the serving flagship config stores K/V int8 with
per-slot-per-head absmax scales, halving decode-attention HBM traffic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valley_tpu import config as C
from valley_tpu.inference import Engine, GenerationConfig
from valley_tpu.models import llama, valley


@pytest.fixture(scope="module")
def cfg():
    return C.valley_tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return valley.init_params(cfg, jax.random.key(3), dtype=jnp.float32)


def test_quantize_roundtrip_error():
    x = jax.random.normal(jax.random.key(0), (2, 5, 4, 32), jnp.float32)
    q, scale = llama._quantize_kv(x)
    assert q.dtype == jnp.int8 and scale.shape == (2, 5, 4)
    back = q.astype(jnp.float32) * np.asarray(scale, np.float32)[..., None]
    err = np.abs(back - np.asarray(x)).max()
    amax = np.abs(np.asarray(x)).max()
    assert err <= amax / 127.0 + 1e-6      # one quantization step


def test_int8_cache_logits_close_to_fp32(cfg, params):
    """One prefill + several decode steps: per-step logits of the int8
    cache stay within ~2% relative error of the fp32-cache reference."""
    prompt = list(range(10, 42))
    gen = GenerationConfig(max_new_tokens=6, do_sample=False)

    def run(cache_dtype):
        eng = Engine(cfg, params, buckets=(64,), max_new_tokens=8,
                     cache_dtype=cache_dtype, use_flash=False)
        return [int(t[0]) for t in eng.generate_tokens(
            [prompt], gen=gen, eos_ids=[-1])]

    ref = run(jnp.float32)
    got = run(jnp.int8)
    # greedy tokens should survive int8 cache noise on a tiny model
    assert got == ref, (got, ref)


def test_int8_cache_multimodal_generates(cfg, params):
    tok = cfg.tokens
    t = 2
    span = [tok.im_start] + [tok.im_patch] * cfg.num_patches + \
        [tok.im_end] + [tok.vi_start] + [tok.vi_frame] * t + [tok.vi_end]
    prompt = [1] + span + list(range(10, 20))
    images = np.random.default_rng(0).standard_normal(
        (1, t, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(
        np.float32)
    eng = Engine(cfg, params, buckets=(64,), max_new_tokens=6,
                 cache_dtype=jnp.int8, use_flash=False)
    toks = [int(t[0]) for t in eng.generate_tokens(
        [prompt], images, GenerationConfig(max_new_tokens=6,
                                           do_sample=False), eos_ids=[-1])]
    assert len(toks) == 6


def test_int8_cache_session_extend(cfg, params):
    """Multi-turn KV reuse works with a quantized cache."""
    from valley_tpu.inference.engine import ChatSession

    eng = Engine(cfg, params, buckets=(64,), max_new_tokens=8,
                 cache_dtype=jnp.int8, use_flash=False)
    sess = ChatSession(eng, GenerationConfig(max_new_tokens=4,
                                             do_sample=False))
    out1 = list(sess.chat(list(range(10, 30)), eos_ids=[-1]))
    out2 = list(sess.chat(list(range(30, 40)), eos_ids=[-1]))
    assert len(out1) == 4 and len(out2) == 4


def test_int8_continuous_batching(cfg, params):
    from valley_tpu.inference.continuous import ContinuousEngine, _drain

    eng = Engine(cfg, params, buckets=(64,), max_new_tokens=16,
                 cache_dtype=jnp.int8, use_flash=False, steps_per_call=2)
    cont = ContinuousEngine(eng, rows=2, bucket=64, extra_slots=32,
                            steps_per_call=2)
    got = list(_drain(cont.submit(list(range(10, 30)), max_new_tokens=4,
                                  eos_id=-1)))
    assert len(got) == 4
