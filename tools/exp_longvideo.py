"""Long-video scaling on the real chip: frames vs first-token latency.

Valley's temporal pooling collapses T x 256 patch features into a
CONSTANT 256 pooled tokens (+ T frame-CLS tokens), so the LLM prompt
grows by just one token per extra frame; the cost of more frames is the
CLIP tower forward (T x 257-patch ViT-L/14) inside prefill.  This
measures video->first-token latency and decode throughput at
T = 8/16/32 frames on Valley-7B to back the longer-video claim with
numbers (the reference is hardcoded to 8 uniform frames,
`data_util.py:253`).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_longvideo.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from valley_tpu import config as C
from valley_tpu.inference import Engine, GenerationConfig
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

    eng = Engine(cfg, params, buckets=(512,), max_new_tokens=64,
                 steps_per_call=63)
    gen = GenerationConfig(max_new_tokens=64, do_sample=False)
    tok = cfg.tokens
    p = cfg.num_patches
    rng = np.random.default_rng(0)

    for frames_n in (8, 16, 32):
        span = [tok.im_start] + [tok.im_patch] * p + [tok.im_end] + \
            [tok.vi_start] + [tok.vi_frame] * frames_n + [tok.vi_end]
        prompt = [1] + span + rng.integers(5, 30000, size=100).tolist()
        images = rng.standard_normal(
            (1, frames_n, 3, cfg.vision.image_size,
             cfg.vision.image_size)).astype(np.float32)

        def run():
            t0 = time.perf_counter()
            t_first, n = None, 0
            for t in eng.generate_tokens([prompt], images, gen,
                                         eos_ids=[-1]):
                if t_first is None:
                    t_first = time.perf_counter() - t0
                n += 1
            return t_first, n, time.perf_counter() - t0

        run()  # compile
        best = min((run() for _ in range(3)), key=lambda r: r[0])
        t_first, n, total = best
        tps = (n - 1) / (total - t_first)
        print(f"T={frames_n:3d}: prompt {len(prompt)} tokens, "
              f"first token {t_first * 1e3:.0f} ms, "
              f"decode {tps:.1f} tok/s", flush=True)


if __name__ == "__main__":
    main()
