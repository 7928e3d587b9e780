"""Fused Pallas decode-attention kernel vs the XLA oracle (interpret mode
on the CPU mesh; the kernel compiles on real TPU but is opt-in there —
see the measured-DMA note in `models/llama.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from valley_tpu import config as C
from valley_tpu.inference import Engine, GenerationConfig
from valley_tpu.models import llama, valley
from valley_tpu.ops.attention import decode_attention
from valley_tpu.ops.decode_pallas import (decode_attention_stacked,
                                          supports_decode_kernel)


@pytest.mark.parametrize("geo", [
    (1, 96, 4, 4, 32, False),     # bf16, MHA
    (1, 96, 4, 2, 32, True),      # int8, GQA n_rep=2
    (2, 640, 8, 8, 128, True),    # int8, batch, bench-like Smax
    (1, 3000, 4, 4, 128, False),  # bf16, streamed multi-block S
])
def test_kernel_matches_xla_oracle(geo):
    b, s, h, hkv, d, quant = geo
    rng = np.random.default_rng(0)
    L, li = 3, 1
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((L, b, s, hkv, d)) * 0.5,
                    jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((L, b, s, hkv, d)) * 0.5,
                    jnp.bfloat16)
    mask = jnp.asarray(rng.random((b, s)) < 0.8).at[:, :4].set(True)
    ks = vs = None
    kq, vq = k, v
    if quant:
        kq2, ks2 = llama._quantize_kv(k.reshape(L * b, s, hkv, d))
        vq2, vs2 = llama._quantize_kv(v.reshape(L * b, s, hkv, d))
        kq = kq2.reshape(L, b, s, hkv, d)
        vq = vq2.reshape(L, b, s, hkv, d)
        ks = ks2.reshape(L, b, s, hkv)
        vs = vs2.reshape(L, b, s, hkv)
    kw = dict(k_scale=ks[li], v_scale=vs[li]) if quant else {}
    ref = decode_attention(q, kq[li], vq[li], mask, **kw)
    with pltpu.force_tpu_interpret_mode():
        got = decode_attention_stacked(q, kq, vq, li, mask,
                                       k_scale=ks, v_scale=vs)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    assert err < 2e-2, err


def test_supports_gate():
    assert supports_decode_kernel(640, 32, 128, 1)
    assert supports_decode_kernel(3072, 32, 128, 2)
    assert not supports_decode_kernel(640, 32, 64, 1)     # head_dim
    assert not supports_decode_kernel(641 * 7, 32, 128, 2)  # no divisor


def test_engine_tokens_identical_with_kernel():
    cfg = C.valley_tiny()
    params = valley.init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    tok = cfg.tokens
    span = [tok.im_start] + [tok.im_patch] * cfg.num_patches + \
        [tok.im_end] + [tok.vi_start] + [tok.vi_frame] * 2 + [tok.vi_end]
    prompt = [1] + span + list(range(5, 40))
    images = np.random.default_rng(0).standard_normal(
        (1, 2, 3, cfg.vision.image_size, cfg.vision.image_size)
    ).astype(np.float32)
    gen = GenerationConfig(max_new_tokens=12, do_sample=False)

    base = Engine(cfg, params, buckets=(128,), max_new_tokens=16,
                  steps_per_call=4)
    ref_toks = [int(t[0]) for t in base.generate_tokens(
        [prompt], images, gen, eos_ids=[-1])]

    eng = Engine(cfg, params, buckets=(128,), max_new_tokens=16,
                 steps_per_call=4, decode_kernel=True)
    with pltpu.force_tpu_interpret_mode():
        got_toks = [int(t[0]) for t in eng.generate_tokens(
            [prompt], images, gen, eos_ids=[-1])]
    assert got_toks == ref_toks


def test_supports_decode_kernel_query_head_cap():
    # m/l scratch is (h, 128)-shaped: >128 query heads is out of range
    assert supports_decode_kernel(640, 32, 128, 1, h=32)
    assert not supports_decode_kernel(640, 32, 128, 1, h=256)
