"""Aggregate continuous-batching throughput on the real chip (Valley-7B,
bf16 weights + int8 KV cache, mixed prompt lengths).

Round-1 record: 118 tok/s aggregate (6 requests, 4 rows).
Usage: python tools/bench_continuous.py [rows] [n_requests]
(VALLEY_BENCH_QUANT=int8 for int8 weights; VALLEY_BENCH_SPEC=1 for
speculative verification rounds — constant perf weights fully accept,
so the speculative number is the extractive-text ceiling)
"""

from __future__ import annotations

import os
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from valley_tpu import config as C
from valley_tpu.inference import Engine
from valley_tpu.inference.continuous import ContinuousEngine, _drain
from valley_tpu.models import valley


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = C.valley_7b().replace(tokens=C.SpecialTokens(
        im_patch=31996, im_start=31997, im_end=31998, vi_frame=31999,
        vi_start=31994, vi_end=31995))
    shapes = jax.eval_shape(
        lambda k: valley.init_params(cfg, k, dtype=jnp.bfloat16),
        jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.008, s.dtype),
                          shapes)
    jax.block_until_ready(params)
    qmode = os.environ.get("VALLEY_BENCH_QUANT")
    if qmode in ("int8", "int4"):
        from valley_tpu.ops.quant import quantize_llama_params

        params = quantize_llama_params(params,
                                       bits=4 if qmode == "int4" else 8)
        jax.block_until_ready(params)

    spec = os.environ.get("VALLEY_BENCH_SPEC") == "1"
    eng = Engine(cfg, params, buckets=(128, 512), max_new_tokens=128,
                 cache_dtype=jnp.int8, steps_per_call=16,
                 decode_w4=qmode == "int4")
    cont = ContinuousEngine(
        eng, rows=rows, bucket=512,
        extra_slots=128 + (48 if spec else 0),
        steps_per_call=4 if spec else 16,
        speculative=spec,
        admit_batch=int(os.environ.get("VALLEY_POOL_ADMIT", "4")),
        ready_depth=(int(os.environ["VALLEY_POOL_READY"])
                     if "VALLEY_POOL_READY" in os.environ else None))
    # VALLEY_BENCH_MEDIA=T: every request carries a T-frame video (the
    # realistic Valley admission mix — prefill then includes the CLIP
    # tower, where batched admission amortizes the small-batch tower)
    frames = int(os.environ.get("VALLEY_BENCH_MEDIA", "0"))
    print("warmup (compiles prefills + pooled decode)...", flush=True)
    cont.warmup(frames=frames)

    rng = np.random.default_rng(0)
    tok = cfg.tokens
    span = []
    if frames:
        span = [tok.im_start] + [tok.im_patch] * cfg.num_patches + \
            [tok.im_end] + [tok.vi_start] + [tok.vi_frame] * frames + \
            [tok.vi_end]
    prompts, media = [], []
    for i in range(n_req):
        if frames:     # media span (~270 tok) + short question
            n = int(rng.integers(40, 100 if i % 2 == 0 else 200))
        else:          # the round-1/2 text mix, unchanged for comparability
            n = int(rng.integers(40, 100)) if i % 2 == 0 else \
                int(rng.integers(300, 480))
        prompts.append([1] + span +
                       rng.integers(5, 30000, size=n).tolist())
        media.append(rng.standard_normal(
            (1, frames, 3, cfg.vision.image_size, cfg.vision.image_size)
        ).astype(np.float32) if frames else None)
    # VALLEY_BENCH_NEW: reply length (raise with n_req == rows for a
    # pure steady-state pooled-decode number — no admission churn)
    new_tokens = int(os.environ.get("VALLEY_BENCH_NEW", "96"))

    counts = {}

    def consume(i, outq):
        got = list(_drain(outq))
        counts[i] = len(got)

    t0 = time.perf_counter()
    threads = []
    for i, p in enumerate(prompts):
        outq = cont.submit(p, images=media[i],
                           max_new_tokens=new_tokens, eos_id=-1)
        th = threading.Thread(target=consume, args=(i, outq))
        th.start()
        threads.append(th)
    for th in threads:
        th.join(timeout=600)
    dt = time.perf_counter() - t0
    total = sum(counts.values())
    mix = (f"{frames}-frame video prompts" if frames
           else "mixed prompts 40-480")
    print(f"rows={rows} requests={n_req} {mix}, "
          f"{new_tokens} new tokens each")
    print(f"total {total} tokens in {dt:.1f} s -> "
          f"{total/dt:.1f} tok/s aggregate")


if __name__ == "__main__":
    main()
