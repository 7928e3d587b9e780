"""Time the real Engine._decode_impl at n=128 for bf16 vs int8 KV caches
(fresh donated buffers per call; dispatch amortized by the 128 steps)."""

from __future__ import annotations

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


def main():
    cfg = C.valley_7b().replace(tokens=C.SpecialTokens(
        im_patch=31996, im_start=31997, im_end=31998, vi_frame=31999,
        vi_start=31994, vi_end=31995))
    shapes = jax.eval_shape(
        lambda k: valley.init_params(cfg, k, dtype=jnp.bfloat16),
        jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.008, s.dtype),
                          shapes)
    jax.block_until_ready(params)

    n = 128
    for kv in (jnp.bfloat16, jnp.int8):
        eng = Engine(cfg, params, buckets=(512,), max_new_tokens=n,
                     cache_dtype=kv, steps_per_call=n)
        jf = jax.jit(eng._decode_impl,
                     static_argnames=("do_sample", "n_steps"),
                     donate_argnames=("cache", "valid"))
        proto = llama.init_cache(cfg.text, 1, 640, kv)
        tok = jnp.zeros((1,), jnp.int32)
        seq = jnp.full((1,), 472, jnp.int32)
        key = jax.random.key(0)
        ts = []
        for it in range(4):
            cache = jax.tree.map(jnp.copy, proto)
            valid = jnp.arange(640)[None] < 472
            sync(cache)
            t0 = time.perf_counter()
            out = jf(eng.params, cache, valid, tok, jnp.int32(472), seq,
                     key, 0.0, 1.0, do_sample=False, n_steps=n)
            sync(out[0])
            ts.append(time.perf_counter() - t0)
        t = min(ts[1:])   # skip compile iter
        name = "int8" if kv == jnp.int8 else "bf16"
        print(f"{name} cache: {t*1e3:.1f} ms/call, {t/n*1e3:.2f} ms/tok, "
              f"{n/t:.1f} tok/s")


if __name__ == "__main__":
    main()
