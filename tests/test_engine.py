"""Inference engine correctness: KV-cache decode must match teacher-forced
full forward; prompt/response utilities match reference golden behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valley_tpu import config as C
from valley_tpu.inference import Engine, GenerationConfig
from valley_tpu.inference.generate import (build_prompt, media_replace_token,
                                           process_response)
from valley_tpu.models import valley
from valley_tpu.tokenizer import ByteFallbackTokenizer


@pytest.fixture(scope="module")
def cfg():
    return C.valley_tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return valley.init_params(cfg, jax.random.key(7), dtype=jnp.float32)


@pytest.fixture(scope="module")
def engine(cfg, params):
    return Engine(cfg, params, buckets=(32, 64), max_new_tokens=16,
                  cache_dtype=jnp.float32, use_flash=False)


def test_greedy_decode_matches_teacher_forcing(cfg, params, engine):
    rng = np.random.default_rng(0)
    prompt = rng.integers(5, 400, size=17).tolist()
    gen = GenerationConfig(max_new_tokens=8, do_sample=False)
    toks = [int(t[0]) for t in engine.generate_tokens([prompt], gen=gen,
                                                      eos_ids=[-1])]
    assert len(toks) == 8

    # One full forward over prompt+generated gives, at position
    # len(prompt)-1+i, logits conditioned on exactly the prefix the engine
    # saw at step i (greedy => the prefix is the generated one).
    full = valley.forward(params, cfg, jnp.asarray([prompt + toks]))
    for i, t in enumerate(toks):
        expect = int(jnp.argmax(full[0, len(prompt) - 1 + i]))
        assert t == expect, f"step {i}: cache={t} teacher={expect}"


def test_multimodal_prefill_decode(cfg, params, engine):
    tok = cfg.tokens
    p, t = cfg.num_patches, 3
    span = [tok.im_start] + [tok.im_patch] * p + [tok.im_end] + \
        [tok.vi_start] + [tok.vi_frame] * t + [tok.vi_end]
    prompt = [1] + span + list(range(10, 20))
    images = np.random.default_rng(1).standard_normal(
        (1, t, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(
        np.float32)
    gen = GenerationConfig(max_new_tokens=4, do_sample=False)
    toks = [int(x[0]) for x in engine.generate_tokens(
        [prompt], images=images, gen=gen, eos_ids=[-1])]
    assert len(toks) == 4
    # teacher-forced check with spliced images (single full forward)
    full = valley.forward(params, cfg, jnp.asarray([prompt + toks]),
                          jnp.asarray(images))
    for i, tk in enumerate(toks):
        assert tk == int(jnp.argmax(full[0, len(prompt) - 1 + i])), \
            f"step {i}"


def test_batched_variable_length_prompts(cfg, params, engine):
    rng = np.random.default_rng(3)
    prompts = [rng.integers(5, 400, size=n).tolist() for n in (9, 21)]
    gen = GenerationConfig(max_new_tokens=4, do_sample=False)
    steps = list(engine.generate_tokens(prompts, gen=gen, eos_ids=[-1]))
    assert all(s.shape == (2,) for s in steps)
    for b, prompt in enumerate(prompts):
        toks = [int(s[b]) for s in steps]
        # pad rows to a common length so each row reuses one compiled shape
        full = valley.forward(params, cfg, jnp.asarray([prompt + toks]))
        for i, t in enumerate(toks):
            assert t == int(jnp.argmax(full[0, len(prompt) - 1 + i])), \
                f"row {b} step {i}"


def test_sampling_reproducible(cfg, params, engine):
    prompt = list(range(10, 30))
    gen = GenerationConfig(max_new_tokens=5, do_sample=True,
                           temperature=0.8, top_p=0.9, seed=42)
    a = [int(t[0]) for t in engine.generate_tokens([prompt], gen=gen,
                                                   eos_ids=[-1])]
    b = [int(t[0]) for t in engine.generate_tokens([prompt], gen=gen,
                                                   eos_ids=[-1])]
    assert a == b


def test_streaming_with_keyword_stop(cfg, params, engine):
    tk = ByteFallbackTokenizer()
    prompt = tk.encode("Hello")
    gen = GenerationConfig(max_new_tokens=8, stream_interval=2)
    chunks = list(engine.generate(tk, prompt, gen=gen))
    assert chunks  # streamed at least one chunk
    assert all(isinstance(c, str) for c in chunks)


def test_no_recompiles_within_bucket(cfg, params):
    """Different prompt lengths within one bucket must reuse the same
    compiled executables (the engine's core latency property)."""
    eng = Engine(cfg, params, buckets=(64,), max_new_tokens=9,
                 cache_dtype=jnp.float32, use_flash=False,
                 steps_per_call=4)
    gen = GenerationConfig(max_new_tokens=9, do_sample=False)
    for n in (10, 33, 57):
        list(eng.generate_tokens([list(range(5, 5 + n))], gen=gen,
                                 eos_ids=[-1]))
    assert eng._prefill._cache_size() == 1
    # one full 4-step chunk + at most one residual chunk size
    assert eng._decode._cache_size() <= 2


def test_frame_buckets_one_executable_and_matching_tokens(cfg, params):
    """With frame_buckets, prompts carrying different media frame counts
    share ONE prefill executable, and outputs match the exact-shape
    engine (pad frames masked out of temporal pooling)."""
    def prompt_for(t):
        tok = cfg.tokens
        span = [tok.im_start] + [tok.im_patch] * cfg.num_patches + \
            [tok.im_end] + [tok.vi_start] + [tok.vi_frame] * t + \
            [tok.vi_end]
        return [1] + span + list(range(5, 20))

    gen = GenerationConfig(max_new_tokens=6, do_sample=False)
    rng = np.random.default_rng(0)
    imgs = {t: rng.standard_normal(
        (1, t, 3, cfg.vision.image_size, cfg.vision.image_size)
    ).astype(np.float32) for t in (2, 3)}

    exact = Engine(cfg, params, buckets=(128,), max_new_tokens=6,
                   cache_dtype=jnp.float32, use_flash=False,
                   steps_per_call=2)
    bucketed = Engine(cfg, params, buckets=(128,), max_new_tokens=6,
                      cache_dtype=jnp.float32, use_flash=False,
                      steps_per_call=2, frame_buckets=(4,))
    for t in (2, 3):
        ref = [int(x[0]) for x in exact.generate_tokens(
            [prompt_for(t)], imgs[t], gen, eos_ids=[-1])]
        got = [int(x[0]) for x in bucketed.generate_tokens(
            [prompt_for(t)], imgs[t], gen, eos_ids=[-1])]
        assert got == ref, (t, got, ref)
    assert bucketed._prefill._cache_size() == 1   # T=2 and T=3 share
    assert exact._prefill._cache_size() == 2      # per-shape without


def test_completion_speculative_matches_plain(cfg, params):
    from valley_tpu.inference.generate import completion

    tk = ByteFallbackTokenizer()
    wcfg = cfg.replace(tokens=tk.special_tokens())
    wparams = valley.init_params(wcfg, jax.random.key(0), jnp.float32)
    eng = Engine(wcfg, wparams, buckets=(512,), max_new_tokens=8,
                 cache_dtype=jnp.float32, use_flash=False)
    frames = np.zeros((2, 3, wcfg.vision.image_size,
                       wcfg.vision.image_size), np.float32)
    msgs = [{"role": "user", "content": "what happens? <video>"}]
    gen = GenerationConfig(max_new_tokens=8, do_sample=False)
    plain = completion(eng, tk, None, msgs, gen, frames=frames)
    spec = completion(eng, tk, None, msgs, gen, frames=frames,
                      speculative=True)
    assert plain == spec


def test_build_prompt_golden():
    msgs = [
        {"role": "system", "content": "SYS"},
        {"role": "user", "content": "hi <video> there"},
        {"role": "assistent", "content": "yo"},
    ]
    p = build_prompt(msgs, num_patches=2, num_frames=3)
    rep = media_replace_token(2, 3)
    assert p == ("SYS\n\n###" + " Human: hi " + rep + " there \n###"
                 + " Assistent: yo \n###")
    assert "<im_patch><im_patch><im_end>" in p
    assert "<vi_frame><vi_frame><vi_frame><vi_end>" in p


def test_build_prompt_requires_media():
    with pytest.raises(ValueError):
        build_prompt([{"role": "user", "content": "no media"}])


def test_build_prompt_accepts_both_assistant_spellings():
    msgs = [{"role": "user", "content": "<image> q"},
            {"role": "assistant", "content": "a"}]
    assert "Assistent: a" in build_prompt(msgs)


def test_process_response_golden():
    # mirrors valley_model.py:404-422 semantics
    assert process_response(["### Assistant: hello ### rest"]) == ["hello"]
    assert process_response(["  Valley: hi"]) == ["hi"]
    assert process_response(["plain answer"]) == ["plain answer"]
    assert process_response(["a ### b", "x"]) == ["a", "x"]


def test_warmup_covers_frame_buckets(cfg, params):
    """With frame_buckets, warmup() compiles one prefill per bucket so
    mixed image/video traffic never hits a cold executable (the worker
    defaults to --frame-buckets 1,4,8 and warms before registering)."""
    eng = Engine(cfg, params, buckets=(64,), max_new_tokens=4,
                 cache_dtype=jnp.float32, use_flash=False,
                 steps_per_call=2, frame_buckets=(2, 4))
    eng.warmup()
    n = eng._prefill._cache_size()
    # (frame buckets + text-only) x (greedy, sampled) — do_sample is a
    # static executable class and real traffic defaults to sampling
    assert n == 6
    # any frame count <= max bucket now reuses a warmed executable, in
    # either sampling mode
    tok = cfg.tokens
    span = [tok.im_start] + [tok.im_patch] * cfg.num_patches + \
        [tok.im_end] + [tok.vi_start] + [tok.vi_frame] * 3 + [tok.vi_end]
    imgs = np.zeros((1, 3, 3, cfg.vision.image_size,
                     cfg.vision.image_size), np.float32)
    for do_sample in (False, True):
        gen = GenerationConfig(max_new_tokens=2, do_sample=do_sample,
                               temperature=0.7 if do_sample else 0.0)
        list(eng.generate_tokens([[1] + span], imgs, gen, eos_ids=[-1]))
    assert eng._prefill._cache_size() == n


def test_load_engine_frame_bucket_defaults():
    from valley_tpu.serve.model_worker import load_engine

    class A:
        model_path = "random:tiny"
        vision_tower = None
        lora_path = None
        buckets = "128"
        max_new_tokens = 4
        quantize = None
        kv_cache = "bf16"
        num_frames = 8
        frame_buckets = "1,4,8"

    eng, _tk = load_engine(A())
    assert eng.frame_buckets == (1, 4, 8)
    A.num_frames = 16             # video frames beyond the largest bucket
    eng, _tk = load_engine(A())
    assert eng.frame_buckets == (1, 4, 8, 16)
    A.frame_buckets = "off"
    eng, _tk = load_engine(A())
    assert eng.frame_buckets is None


def test_decode_ramp_token_identical_and_schedule(cfg, params):
    """A ramped decode schedule (small first fused calls, large steady
    calls) must emit the exact greedy token stream of the unramped
    engine — the scan body is per-token, so chunk boundaries are
    invisible to greedy decode — while the per-call step counts follow
    ramp-then-steady."""
    plain = Engine(cfg, params, buckets=(32,), max_new_tokens=16,
                   cache_dtype=jnp.float32, use_flash=False,
                   steps_per_call=8)
    ramped = Engine(cfg, params, buckets=(32,), max_new_tokens=16,
                    cache_dtype=jnp.float32, use_flash=False,
                    steps_per_call=8, decode_ramp=(1, 2))
    prompt = np.random.default_rng(5).integers(5, 400, size=11).tolist()
    gen = GenerationConfig(max_new_tokens=14, do_sample=False)
    t_plain = [int(t[0]) for t in plain.generate_tokens([prompt], gen=gen,
                                                        eos_ids=[-1])]
    sizes = []
    orig = ramped._decode

    def spy(*a, **kw):
        sizes.append(kw["n_steps"])
        return orig(*a, **kw)

    ramped._decode = spy
    t_ramp = [int(t[0]) for t in ramped.generate_tokens([prompt], gen=gen,
                                                        eos_ids=[-1])]
    assert t_ramp == t_plain
    # 1 prefill token + calls of 1, 2, 8, then the 2-step remainder
    assert sizes == [1, 2, 8, 2]


def test_tail_call_pads_to_warm_size(cfg, params):
    """A reply whose remainder is smaller than the steady fused-call size
    pads UP to a warm schedule size (no one-off n_steps executable) and
    discards the surplus — the kept stream is bit-identical to the
    steps_per_call=1 engine because per-step RNG splits off the scan
    carry, not off n_steps."""
    eng = Engine(cfg, params, buckets=(32,), max_new_tokens=32,
                 cache_dtype=jnp.float32, use_flash=False,
                 steps_per_call=8)
    ref = Engine(cfg, params, buckets=(32,), max_new_tokens=32,
                 cache_dtype=jnp.float32, use_flash=False,
                 steps_per_call=1)
    prompt = np.random.default_rng(7).integers(5, 400, size=9).tolist()
    gen = GenerationConfig(max_new_tokens=12, do_sample=False)
    sizes = []
    orig = eng._decode

    def spy(*a, **kw):
        sizes.append(kw["n_steps"])
        return orig(*a, **kw)

    eng._decode = spy
    toks = [int(t[0]) for t in eng.generate_tokens([prompt], gen=gen,
                                                   eos_ids=[-1])]
    t_ref = [int(t[0]) for t in ref.generate_tokens([prompt], gen=gen,
                                                    eos_ids=[-1])]
    assert toks == t_ref and len(toks) == 12
    # 1 prefill token, one steady call of 8, then want=3 padded to 8
    assert sizes == [8, 8]


def test_tail_call_padded_even_at_engine_max(cfg, params):
    """Even when max_new_tokens hits the engine maximum, the reserved
    steps_per_call cache slack lets the tail pad to a warm schedule size
    (no one-off exact-remainder executable); surplus tokens are
    discarded."""
    eng = Engine(cfg, params, buckets=(32,), max_new_tokens=12,
                 cache_dtype=jnp.float32, use_flash=False,
                 steps_per_call=8)
    prompt = np.random.default_rng(9).integers(5, 400, size=9).tolist()
    gen = GenerationConfig(max_new_tokens=12, do_sample=False)
    sizes = []
    orig = eng._decode

    def spy(*a, **kw):
        sizes.append(kw["n_steps"])
        return orig(*a, **kw)

    eng._decode = spy
    toks = [int(t[0]) for t in eng.generate_tokens([prompt], gen=gen,
                                                   eos_ids=[-1])]
    assert len(toks) == 12
    # want after the 8-step call is 12 - 1 - 8 = 3 < 8: pads to the warm
    # 8-step executable (room is guaranteed by the reserved slack)
    assert sizes == [8, 8]
    # the exact-remainder safety net still exists for callers that size
    # their own cache tighter
    assert eng._tail_steps(3, 3) == 3


def test_decode_ramp_session_identical(cfg, params):
    """ChatSession turns follow the same ramped schedule and stay greedy
    token-identical to the unramped session."""
    from valley_tpu.inference.engine import ChatSession

    gen = GenerationConfig(max_new_tokens=10, do_sample=False, stop=())
    replies = []
    for ramp in ((), (1, 3)):
        eng = Engine(cfg, params, buckets=(32,), max_new_tokens=16,
                     cache_dtype=jnp.float32, use_flash=False,
                     steps_per_call=6, decode_ramp=ramp)
        sess = ChatSession(eng, gen)
        r1 = sess.chat(list(range(10, 22)), eos_ids=[-1])
        r2 = sess.chat(list(range(30, 36)), eos_ids=[-1])
        replies.append((r1, r2))
    assert replies[0] == replies[1]


def test_uint8_media_device_normalize_matches_host(cfg, params, engine):
    """RAW uint8 frames (device-side CLIP normalization — the serving
    default, half the H2D bytes) must produce the same generation as the
    host-normalized fp32 path: the device runs the identical fp32
    ``(x/255 - mean)/std`` before the bf16 cast."""
    from valley_tpu.data import transforms as T

    rng = np.random.default_rng(5)
    tok = cfg.tokens
    span = [tok.im_start] + [tok.im_patch] * cfg.num_patches + \
        [tok.im_end] + [tok.vi_start] + [tok.vi_frame] * 2 + [tok.vi_end]
    prompt = [1] + span + list(range(10, 22))
    u8 = rng.integers(0, 256, (1, 2, 3, cfg.vision.image_size,
                               cfg.vision.image_size)).astype(np.uint8)
    mean = np.asarray(T.CLIP_MEAN, np.float32).reshape(1, 1, 3, 1, 1)
    std = np.asarray(T.CLIP_STD, np.float32).reshape(1, 1, 3, 1, 1)
    host = (u8.astype(np.float32) / 255.0 - mean) / std

    gen = GenerationConfig(max_new_tokens=6, do_sample=False)
    got_u8 = [int(t[0]) for t in engine.generate_tokens(
        [prompt], u8, gen, eos_ids=[-1])]
    got_host = [int(t[0]) for t in engine.generate_tokens(
        [prompt], host, gen, eos_ids=[-1])]
    assert got_u8 == got_host

    # logit-level check through the jittable forward
    lg_u8 = valley.forward(params, cfg, jnp.asarray([prompt]),
                           jnp.asarray(u8))
    lg_host = valley.forward(params, cfg, jnp.asarray([prompt]),
                             jnp.asarray(host, jnp.float32))
    np.testing.assert_allclose(np.asarray(lg_u8), np.asarray(lg_host),
                               rtol=2e-2, atol=2e-2)


def test_uint8_media_frame_bucket_padding(cfg, params):
    """uint8 frames pad the frame axis with uint8 zeros under frame
    bucketing (masked out of pooling) without dtype promotion."""
    eng = Engine(cfg, params, buckets=(64,), max_new_tokens=8,
                 cache_dtype=jnp.float32, use_flash=False,
                 frame_buckets=(4,), raw_media=True)
    tok = cfg.tokens
    span = [tok.im_start] + [tok.im_patch] * cfg.num_patches + \
        [tok.im_end] + [tok.vi_start] + [tok.vi_frame] * 2 + [tok.vi_end]
    prompt = [1] + span + list(range(10, 22))
    u8 = np.random.default_rng(3).integers(
        0, 256, (1, 2, 3, cfg.vision.image_size,
                 cfg.vision.image_size)).astype(np.uint8)
    imgs, mask, has = eng._prepare_images(u8, 1)
    assert has and imgs.dtype == jnp.uint8 and imgs.shape[1] == 4
    assert mask is not None and bool(mask[0, :2].all()) \
        and not bool(mask[0, 2:].any())
    toks = [int(t[0]) for t in eng.generate_tokens(
        [prompt], u8, GenerationConfig(max_new_tokens=4, do_sample=False),
        eos_ids=[-1])]
    assert len(toks) == 4
