"""Additive decomposition of video->first-token (VERDICT r4 item 2).

The decode loop got its summing component table (exp_decode_glue); this
is the same treatment for FIRST TOKEN.  Of the bench's measured
141-160 ms (round 5: int8a8 0.141 s / int8 0.155-0.160 s), the device
program is known from exp_prefill_mfu (vision 15.4 ms + LLM prefill
44 ms bf16-int8 / ~28 ms int8a8, one executable) plus one ~27 ms
dispatch — leaving ~60-70 ms unattributed.  The text-only engine
first-token (exp_a8_engine: 55.2 ms == LLM prefill + dispatch) shows
the TEXT path has ~zero host overhead, so the unattributed cost lives
in the IMAGE path: host fp32->bf16 conversion, H2D transfer, and the
eager preamble (key/split/asarray) that the text path pipelines away.

Components measured additively on chip (each synced by a forced
transfer; ``floor`` = the bare D2H sync round trip, subtracted as
noted):

  floor       : float(jnp.sum(tiny)) — one D2H sync round trip
  preamble    : everything generate_tokens does BEFORE the prefill call
                (np padding, jax.random.key+split, _prepare_images with
                its host astype + H2D, jnp.asarray of ids/lens)
  host_astype : np fp32 -> bf16 of the (1,8,3,224,224) frames alone
  h2d_bf16    : device transfer of the bf16 frames alone
  h2d_f32     : device transfer of the fp32 frames (the skip-host-cast
                alternative: 2x bytes, zero host conversion)
  keys        : jax.random.key + split eager pair alone
  prefill     : the compiled prefill executable with PRE-STAGED device
                args, including its dispatch + first-token fetch
  engine      : the real generate_tokens first yield (the whole path)

plus candidate fixes measured end-to-end:

  engine_devcast : generate_tokens with _prepare_images transferring
                   fp32 and casting to bf16 ON DEVICE instead of on the
                   host.  MEASURED round 5: 415 ms vs 170 — fp32 doubles
                   the bytes on a ~16 MB/s link; REJECTED.
  h2d_u8 / engine_u8 : RAW uint8 frames (1 byte/pixel) with CLIP
                   normalization on device (`valley.encode_images`) —
                   the shipped fix (worker --raw-pixels default).

Round-5 measured table (chip, int8a8, best-of-12): floor 32.9 ms,
preamble 111.4, host astype 0.7, H2D bf16 178.8, H2D f32 374.0,
key+split 31.2 (~= floor, i.e. free), prefill exec 71.4, ENGINE 170.5.
Conclusion: the 2.4 MB bf16 frame transfer dominates video first-token;
host astype and the eager key/split are noise.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_first_token.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 12
S = 512
FRAMES = 8


def best(fn, n=N):
    fn()
    b = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        b = min(b, time.perf_counter() - t0)
    return b


def sync(x):
    float(jnp.sum(jnp.asarray(x).astype(jnp.float32)))


def main():
    from valley_tpu import config as C
    from valley_tpu.inference import Engine, GenerationConfig
    from valley_tpu.models import valley
    from valley_tpu.ops.quant import quantize_llama_params

    cfg = C.valley_7b().replace(tokens=C.SpecialTokens(
        im_patch=31996, im_start=31997, im_end=31998,
        vi_frame=31999, vi_start=31994, vi_end=31995))
    shapes = jax.eval_shape(
        lambda k: valley.init_params(cfg, k, dtype=jnp.bfloat16,
                                     fused=True), jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.008, s.dtype),
                          shapes)
    params = quantize_llama_params(params, act8=True)
    jax.block_until_ready(params)

    engine = Engine(cfg, params, buckets=(S,), max_new_tokens=8,
                    cache_dtype=jnp.int8, steps_per_call=7)

    tok = cfg.tokens
    p = cfg.num_patches
    span = [tok.im_start] + [tok.im_patch] * p + [tok.im_end] + \
        [tok.vi_start] + [tok.vi_frame] * FRAMES + [tok.vi_end]
    rng = np.random.default_rng(0)
    prompt = [1] + span + rng.integers(
        5, 30000, size=S - len(span) - 40).tolist()
    images_np = rng.standard_normal(
        (1, FRAMES, 3, cfg.vision.image_size,
         cfg.vision.image_size)).astype(np.float32)
    gen = GenerationConfig(max_new_tokens=8, do_sample=False)

    def first():
        t0 = time.perf_counter()
        for t in engine.generate_tokens([prompt], images_np, gen,
                                        eos_ids=[-1]):
            return time.perf_counter() - t0

    first()                                  # compile
    t_engine = best(first)

    # ---- components ----------------------------------------------------
    tiny = jnp.zeros((8,), jnp.float32)
    t_floor = best(lambda: sync(tiny))

    lens = np.array([len(prompt)], np.int32)

    def preamble():
        ids = np.zeros((1, S), np.int32)
        ids[0, :len(prompt)] = prompt
        key = jax.random.key(gen.seed)
        key, sub = jax.random.split(key)
        imgs, mask, has = engine._prepare_images(images_np, 1)
        a = jnp.asarray(ids)
        l = jnp.asarray(lens)
        sync(a[0, :4])          # force the chain

    t_preamble = best(preamble)

    arr32 = np.asarray(images_np, np.float32)
    bf16 = jnp.bfloat16
    t_host_astype = best(lambda: arr32.astype(bf16))
    arrbf = arr32.astype(bf16)
    t_h2d_bf16 = best(lambda: sync(jnp.asarray(arrbf)[0, 0, 0, 0, :4]))
    t_h2d_f32 = best(lambda: sync(jnp.asarray(arr32)[0, 0, 0, 0, :4]))

    def keys():
        key = jax.random.key(gen.seed)
        key, sub = jax.random.split(key)
        sync(jax.random.key_data(sub)[:1])

    t_keys = best(keys)

    # prefill executable with pre-staged device args
    ids = np.zeros((1, S), np.int32)
    ids[0, :len(prompt)] = prompt
    d_ids = jnp.asarray(ids)
    d_lens = jnp.asarray(lens)
    key = jax.random.key(gen.seed)
    _, sub = jax.random.split(key)
    d_imgs, d_mask, _ = engine._prepare_images(images_np, 1)
    jax.block_until_ready((d_ids, d_lens, d_imgs))
    cache_len = S + engine.max_new_tokens + engine.steps_per_call

    def prefill():
        tok_, _lg, _c, _v = engine._prefill(
            engine.params, d_ids, d_imgs, d_lens, sub, gen.temperature,
            gen.top_p, d_mask, bucket=S, cache_len=cache_len,
            do_sample=False, has_images=True)
        np.asarray(tok_)

    t_prefill = best(prefill)

    # ---- the shipped fix: RAW uint8 frames + device normalize ----------
    u8 = rng.integers(0, 256, images_np.shape).astype(np.uint8)
    t_h2d_u8 = best(lambda: sync(jnp.asarray(u8)[0, 0, 0, 0, :4]))

    def first_u8():
        t0 = time.perf_counter()
        for t in engine.generate_tokens([prompt], u8, gen,
                                        eos_ids=[-1]):
            return time.perf_counter() - t0

    first_u8()                               # compile (uint8 image arg)
    t_engine_u8 = best(first_u8)

    rows = [
        ("floor (D2H sync round trip)", t_floor),
        ("preamble (all pre-prefill host+eager work)", t_preamble),
        ("  host fp32->bf16 astype", t_host_astype),
        ("  H2D bf16 frames (2.4 MB)", t_h2d_bf16),
        ("  H2D f32 frames (4.8 MB)", t_h2d_f32),
        ("  H2D uint8 frames (1.2 MB)", t_h2d_u8),
        ("  key+split eager pair", t_keys),
        ("prefill executable (staged args, incl dispatch+fetch)",
         t_prefill),
        ("sum: preamble + prefill - floor",
         t_preamble + t_prefill - t_floor),
        ("ENGINE first token (bf16 frames)", t_engine),
        ("ENGINE first token (uint8 frames, device normalize)",
         t_engine_u8),
    ]
    print(f"backend={jax.default_backend()}  S={S}  frames={FRAMES}  "
          f"int8a8  best-of-{N}")
    for name, v in rows:
        print(f"{name:55s} {v*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
