"""Shared-prefix caching economics on the real chip (Valley-7B).

Many users asking about the SAME video: compare per-request time of a
full prefill (system + video + question) vs PrefixCache.spawn()
(device cache copy + question-delta extend).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_prefix.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from valley_tpu import config as C
from valley_tpu.inference import ChatSession, Engine, GenerationConfig
from valley_tpu.inference.engine import PrefixCache
from valley_tpu.models import valley


def main():
    cfg = C.valley_7b().replace(
        tokens=C.SpecialTokens(im_patch=31996, im_start=31997,
                               im_end=31998, vi_frame=31999,
                               vi_start=31994, vi_end=31995))
    shapes = jax.eval_shape(
        lambda k: valley.init_params(cfg, k, dtype=jnp.bfloat16),
        jax.random.key(0))
    params = jax.tree.map(
        lambda s: jnp.full(s.shape, 0.008, s.dtype), shapes)
    jax.block_until_ready(params)
    eng = Engine(cfg, params, buckets=(512,), max_new_tokens=32,
                 cache_dtype=jnp.int8, steps_per_call=8)
    gen = GenerationConfig(max_new_tokens=16, do_sample=False)

    tok = cfg.tokens
    span = [tok.im_start] + [tok.im_patch] * cfg.num_patches + \
        [tok.im_end] + [tok.vi_start] + [tok.vi_frame] * 8 + [tok.vi_end]
    rng = np.random.default_rng(0)
    prefix = [1] + span + rng.integers(5, 30000, size=64).tolist()
    images = rng.standard_normal((1, 8, 3, 224, 224)).astype(np.float32)
    questions = [rng.integers(5, 30000, size=24).tolist()
                 for _ in range(4)]

    # warm both paths (compiles)
    ChatSession(eng, gen).chat(prefix + questions[0], images=images,
                               eos_ids=[-1])
    pc = PrefixCache(eng, prefix, images=images, gen=gen,
                     extra_slots=128)
    pc.spawn().chat(questions[0], eos_ids=[-1])

    t0 = time.perf_counter()
    for q in questions:
        full = ChatSession(eng, gen).chat(prefix + q, images=images,
                                          eos_ids=[-1])
    dt_full = (time.perf_counter() - t0) / len(questions)

    t0 = time.perf_counter()
    for q in questions:
        spawned = pc.spawn().chat(q, eos_ids=[-1])
    dt_spawn = (time.perf_counter() - t0) / len(questions)
    # identity on the last question
    assert spawned == full, (spawned, full)
    print(f"per-request (16 new tokens): full prefill "
          f"{dt_full * 1e3:.0f} ms vs prefix-cached "
          f"{dt_spawn * 1e3:.0f} ms "
          f"({dt_full / dt_spawn:.2f}x; token-identical)")


if __name__ == "__main__":
    main()
