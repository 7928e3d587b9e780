"""Self-speculative decoding == greedy decoding, token for token."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valley_tpu import config as C
from valley_tpu.inference import Engine, GenerationConfig
from valley_tpu.inference.speculative import SpecConfig, SpecDecoder
from valley_tpu.models import valley


@pytest.fixture(scope="module")
def cfg():
    return C.valley_tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return valley.init_params(cfg, jax.random.key(0), dtype=jnp.float32)


def _prompts(cfg):
    tok = cfg.tokens
    span = [tok.im_start] + [tok.im_patch] * cfg.num_patches + \
        [tok.im_end] + [tok.vi_start] + [tok.vi_frame] * 2 + [tok.vi_end]
    rng = np.random.default_rng(3)
    return [
        [1] + span + list(range(5, 30)),                  # multimodal
        [1] + [7, 8, 9, 7, 8, 9, 7, 8, 9, 7, 8],          # repetitive
        [1] + rng.integers(5, 400, size=40).tolist(),      # random
    ]


def test_spec_matches_greedy(cfg, params):
    eng = Engine(cfg, params, buckets=(128,), max_new_tokens=24,
                 steps_per_call=4)
    dec = SpecDecoder(eng, SpecConfig(draft_len=4, rounds_per_call=3))
    gen = GenerationConfig(max_new_tokens=24, do_sample=False)
    for i, prompt in enumerate(_prompts(cfg)):
        images = None
        if i == 0:
            images = np.random.default_rng(0).standard_normal(
                (1, 2, 3, cfg.vision.image_size, cfg.vision.image_size)
            ).astype(np.float32)
        ref = [int(t[0]) for t in eng.generate_tokens(
            [prompt], images, gen, eos_ids=[-1])]
        got = list(dec.generate_tokens(prompt, images, gen,
                                       eos_ids=[-1]))
        assert got == ref, (i, got, ref)


def test_spec_full_acceptance_on_degenerate_model(cfg):
    # constant weights -> argmax is a fixed token -> after two emissions
    # the bigram lookup drafts the loop and every draft is accepted
    shapes = jax.eval_shape(
        lambda k: valley.init_params(cfg, k, dtype=jnp.float32),
        jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype),
                          shapes)
    eng = Engine(cfg, params, buckets=(128,), max_new_tokens=32,
                 steps_per_call=4)
    dec = SpecDecoder(eng, SpecConfig(draft_len=4, rounds_per_call=2))
    gen = GenerationConfig(max_new_tokens=32, do_sample=False)
    prompt = [1] + list(range(5, 20))
    ref = [int(t[0]) for t in eng.generate_tokens(
        [prompt], None, gen, eos_ids=[-1])]
    got = list(dec.generate_tokens(prompt, None, gen, eos_ids=[-1]))
    assert got == ref
    assert len(set(ref)) <= 2  # degenerate loop, as constructed


def test_spec_eos_stops(cfg, params):
    eng = Engine(cfg, params, buckets=(128,), max_new_tokens=16,
                 steps_per_call=4)
    dec = SpecDecoder(eng, SpecConfig(draft_len=4, rounds_per_call=2))
    gen = GenerationConfig(max_new_tokens=16, do_sample=False)
    prompt = [1] + list(range(5, 20))
    ref = [int(t[0]) for t in eng.generate_tokens(
        [prompt], None, gen, eos_ids=[-1])]
    eos = ref[5]  # pretend the 6th generated token is eos
    got = list(dec.generate_tokens(prompt, None, gen, eos_ids=[eos]))
    assert got == ref[:6]


def test_spec_rejects_sampling(cfg, params):
    eng = Engine(cfg, params, buckets=(128,), max_new_tokens=8)
    dec = SpecDecoder(eng)
    with pytest.raises(ValueError):
        list(dec.generate_tokens([1, 2, 3], None,
                                 GenerationConfig(do_sample=True)))


def test_draft_lookup_whitebox(cfg, params):
    eng = Engine(cfg, params, buckets=(128,), max_new_tokens=8)
    dec = SpecDecoder(eng, SpecConfig(draft_len=3, ngram=2))
    hist = jnp.asarray([5, 6, 7, 8, 0, 5, 6] + [0] * 9, jnp.int32)
    draft = np.asarray(dec._draft(hist, jnp.int32(7), 3))
    # tail (5,6) matches at index 0 -> continuation [7, 8, 0]
    np.testing.assert_array_equal(draft, [7, 8, 0])

def test_worker_speculative_stream_matches_plain(cfg):
    """A --speculative worker streams the same final text as a plain
    worker for a greedy request."""
    import valley_tpu.serve.model_worker as worker_mod
    from valley_tpu.serve.httpd import stream_chunks
    from valley_tpu.serve.model_worker import ModelWorker
    from valley_tpu.tokenizer import ByteFallbackTokenizer

    tk = ByteFallbackTokenizer()
    wcfg = cfg.replace(tokens=tk.special_tokens())
    wparams = valley.init_params(wcfg, jax.random.key(0), jnp.float32)
    eng = Engine(wcfg, wparams, buckets=(128,), max_new_tokens=16,
                 cache_dtype=jnp.float32, use_flash=False)
    req = {"prompt": "### Human: hi there\n### Assistant:",
           "temperature": 0.0, "max_new_tokens": 12, "stop": "###"}
    texts = []
    for speculative in (False, True):
        worker = ModelWorker("http://unused", "placeholder", "tiny", eng,
                             tk, no_register=True, num_frames=2,
                             speculative=speculative)
        app = worker_mod.build_app(worker)
        port = app.start()
        try:
            chunks = list(stream_chunks(
                f"http://localhost:{port}/worker_generate_stream", req))
            assert all(c["error_code"] == 0 for c in chunks)
            texts.append(chunks[-1]["text"])
        finally:
            app.shutdown()
    assert texts[0] == texts[1]
