"""int8 decode component ablation (VERDICT r2 item 1).

Round 2 proved the bf16 decode runs at 0.95 of measured speed-of-light
with a nohead/noattn component budget; the int8 flagship sits at
ach=0.871.  Same ablation, int8 weights + int8 KV: is the gap dequant
compute, attention/KV share (relatively larger at int8 weight bytes),
or recoverable software?

  base     — the benched int8 decode step
  nohead   — without the lm_head matmul
  noattn   — without the cache attention read
  nodequant— weights pre-converted: same GEMV chain over bf16 weights
             at bf16 bytes (isolates the dequant-convert cost vs a
             hypothetical same-bytes bf16 stream: compare ms deltas,
             not tok/s)
  kvbf16   — int8 weights with bf16 KV cache (isolates KV-read cost)

One mode per process (16 GB chip can't hold several compiled 7B decode
arenas).  Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/exp_int8_ablate.py <mode> [n_steps]
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


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(jax.device_get(leaf)).ravel()[:1]


def build_params(cfg, quantize=True, fused=False):
    from valley_tpu.ops.quant import quantize_llama_params

    shapes = jax.eval_shape(
        lambda k: valley.init_params(cfg, k, dtype=jnp.bfloat16,
                                     fused=fused),
        jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.008, s.dtype),
                          shapes)
    jax.block_until_ready(params)
    if quantize:
        params = quantize_llama_params(params)
    return params


def time_engine_decode(eng, params, n, smax=640, plen=472, iters=4):
    cache = llama.init_cache(eng.cfg.text, 1, smax, eng.cache_dtype)
    valid = jnp.arange(smax)[None] < plen
    token = jnp.zeros((1,), jnp.int32)
    seq = jnp.full((1,), plen, jnp.int32)
    key = jax.random.key(0)
    ts = []
    for _ in range(iters + 1):
        c = jax.tree.map(jnp.copy, cache)
        va = jnp.copy(valid)
        sync(c)
        t0 = time.perf_counter()
        out = eng._decode(params, c, va, token, jnp.int32(plen), seq, key,
                          1.0, 1.0, do_sample=False, n_steps=n)
        sync(out[0])
        ts.append(time.perf_counter() - t0)
    return min(ts[1:])


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "base"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    cfg = C.valley_7b().replace(tokens=C.SpecialTokens(
        im_patch=31996, im_start=31997, im_end=31998, vi_frame=31999,
        vi_start=31994, vi_end=31995))

    import valley_tpu.models.llama as L

    if mode == "nohead":
        L.logits_from_hidden = lambda p, h: (
            h[..., :1].astype(jnp.float32) *
            jnp.zeros((1, cfg.text.vocab_size), jnp.float32))
    elif mode == "noattn":
        L.decode_attention = lambda q, k, v, m, **kw: q

    quantize = mode != "nodequant"
    # mode "fused": 4 GEMVs/layer instead of 7 at int8 bytes — tests
    # whether the ~0.9 ms/step GEMV-boundary scheduling gap
    # (exp_decode_glue) shrinks with fewer kernel boundaries (bf16
    # measured null in round 2; int8's relatively larger fixed share
    # may differ).  Built directly in fused shape: a post-hoc
    # fuse_llama_params concat transiently doubles the stacks (OOM).
    params = build_params(cfg, quantize=quantize,
                          fused=(mode == "fused"))
    kv = jnp.bfloat16 if mode in ("kvbf16", "nodequant") else jnp.int8
    eng = Engine(cfg, params, buckets=(512,), max_new_tokens=n,
                 cache_dtype=kv, steps_per_call=n)
    t0 = time.perf_counter()
    t = time_engine_decode(eng, params, n)
    wbytes = sum(x.size * x.dtype.itemsize
                 for x in jax.tree.leaves(params["llama"]))
    print(f"{mode}: {t*1e3:7.1f} ms / {n} steps = {t/n*1e3:.3f} ms/tok, "
          f"{n/t:6.1f} tok/s  (llama bytes {wbytes/1e9:.2f} GB; "
          f"compile+sweep {time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
