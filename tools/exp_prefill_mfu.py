"""Prefill roofline / MFU (VERDICT r2 item 6).

Decode got the full speed-of-light treatment (ROUND_NOTES r2); this
gives first-token latency the same: component timings + MFU for the
7B 8-frame-video prefill at the 512 bucket.

Components (each its own fused jit, timed with forced transfers):
  vision  — CLIP ViT-L/14 tower on T frames + projector + temporal
            pooling + splice (valley.build_inputs_embeds)
  llm     — 512-token decoder prefill over precomputed embeds
            (llama.forward_hidden with cache writes)
  full    — engine._prefill end-to-end (adds sampling + glue)

MFU = model FLOPs / (time x 197e12) — v5e bf16 MXU peak.  FLOPs counted
as 2 x weight-params x tokens for matmuls + attention terms.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/exp_prefill_mfu.py [frames] [bucket]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from valley_tpu import config as C
from valley_tpu.inference import Engine
from valley_tpu.models import llama, valley

PEAK_BF16 = 197e12


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(jax.device_get(leaf)).ravel()[:1]


def timeit(fn, *args, iters=4):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def llm_prefill_flops(tc, s):
    # matmul weights touched once per token + causal attention
    wparams = tc.num_hidden_layers * (
        4 * tc.hidden_size * tc.hidden_size
        + 3 * tc.hidden_size * tc.intermediate_size)
    attn = tc.num_hidden_layers * (s * s // 2) * tc.hidden_size * 2 * 2
    head = tc.hidden_size * tc.vocab_size  # one position sampled
    return 2 * wparams * s + attn + 2 * head


def vit_flops(vc, t):
    n = (vc.image_size // vc.patch_size) ** 2 + 1
    wparams = vc.num_hidden_layers * (
        4 * vc.hidden_size * vc.hidden_size
        + 2 * vc.hidden_size * vc.intermediate_size)
    attn = vc.num_hidden_layers * n * n * vc.hidden_size * 2 * 2
    patch = n * vc.hidden_size * 3 * vc.patch_size ** 2
    return t * (2 * wparams * n + attn + 2 * patch)


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    bucket = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    cfg = C.valley_7b().replace(tokens=C.SpecialTokens(
        im_patch=31996, im_start=31997, im_end=31998, vi_frame=31999,
        vi_start=31994, vi_end=31995))
    from valley_tpu.ops.quant import quantize_llama_params

    shapes = jax.eval_shape(
        lambda k: valley.init_params(cfg, k, dtype=jnp.bfloat16),
        jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.008, s.dtype),
                          shapes)
    jax.block_until_ready(params)
    params = quantize_llama_params(params)

    eng = Engine(cfg, params, buckets=(bucket,), max_new_tokens=8,
                 cache_dtype=jnp.int8, steps_per_call=4)

    tok = cfg.tokens
    p = cfg.num_patches
    span = [tok.im_start] + [tok.im_patch] * p + [tok.im_end] + \
        [tok.vi_start] + [tok.vi_frame] * frames + [tok.vi_end]
    rng = np.random.default_rng(0)
    prompt = [1] + span + rng.integers(
        5, 30000, size=bucket - len(span) - 40).tolist()
    ids = np.zeros((1, bucket), np.int32)
    ids[0, :len(prompt)] = prompt
    ids = jnp.asarray(ids)
    plen = jnp.asarray([len(prompt)], np.int32)
    images = jnp.asarray(rng.standard_normal(
        (1, frames, 3, cfg.vision.image_size, cfg.vision.image_size)
    ).astype(jnp.bfloat16))

    # vision path alone.  The jitted fn returns a SCALAR checksum — a
    # full (1, S, H) embeds output costs a multi-MB device->host pull
    # through the axon tunnel per timing run, which round-3 measurement
    # showed dominates the vision time (103 ms "vision" vs 90 ms for the
    # ENTIRE fused engine prefill).
    vision_fn = jax.jit(lambda pr, i, im: valley.build_inputs_embeds(
        pr, cfg, i, im))
    vision_sum = jax.jit(lambda pr, i, im: jnp.sum(
        vision_fn(pr, i, im), dtype=jnp.float32))
    t_vis = timeit(vision_sum, params, ids, images)
    f_vis = vit_flops(cfg.vision, frames)

    # llm prefill alone over fixed embeds
    embeds = vision_fn(params, ids, images)
    jax.block_until_ready(embeds)
    smax = bucket + 8

    def llm_fn(pr, emb):
        cache = llama.init_cache(cfg.text, 1, smax, jnp.int8)
        kv_valid = jnp.arange(smax)[None, :] < plen[:, None]
        hidden, cache = llama.forward_hidden(
            pr["llama"], cfg.text, emb, cache=cache, cache_index=0,
            kv_valid=kv_valid, use_flash=True)
        return jnp.sum(llama.logits_from_hidden(
            pr["llama"], hidden[:, -1:])[:, 0], dtype=jnp.float32)

    t_llm = timeit(jax.jit(llm_fn), params, embeds)
    f_llm = llm_prefill_flops(cfg.text, bucket)

    # full engine prefill
    def full_fn():
        return eng._prefill(eng.params, ids, images, plen,
                            jax.random.key(0), 1.0, 1.0, None,
                            bucket=bucket, cache_len=smax,
                            do_sample=False, has_images=True)
    t_full = timeit(full_fn)

    # per-call dispatch+sync floor through the axon tunnel (~25 ms) —
    # rides on EVERY timed call above, so subtract it for device-time
    # component numbers (that's why raw parts sum to more than 'full')
    t_null = timeit(jax.jit(lambda x: x + 1.0), jnp.float32(0))

    def row(tag, t, f):
        td = max(t - t_null, 1e-9)
        print(f"{tag}: {t*1e3:7.1f} ms raw / {td*1e3:6.1f} ms device  "
              f"({f/1e12:.2f} TFLOP, device MFU {f/td/PEAK_BF16:.2%})")

    print(f"frames={frames} bucket={bucket}  "
          f"(dispatch floor {t_null*1e3:.1f} ms)")
    row("vision+splice", t_vis, f_vis)
    row("llm prefill  ", t_llm, f_llm)
    row("engine full  ", t_full, f_vis + f_llm)
    parts = (t_vis - t_null) + (t_llm - t_null)
    print(f"device parts sum {parts*1e3:.1f} ms vs full "
          f"{(t_full-t_null)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
