"""Worker-level PrefixCache (VERDICT r2 item 3): `--prefix-cache N`
serves repeat media requests from a cached (media + system prompt) KV
prefix — token-identical to the plain path, LRU-evicted at capacity.
Beats the reference's per-request full re-prefill
(`valley/serve/model_worker.py:371-376`)."""

import base64
from io import BytesIO

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valley_tpu import config as C
from valley_tpu.inference import Engine
from valley_tpu.models import valley
from valley_tpu.serve.model_worker import ModelWorker
from valley_tpu.tokenizer import ByteFallbackTokenizer


@pytest.fixture(scope="module")
def engine_and_tokenizer():
    tk = ByteFallbackTokenizer()
    cfg = C.valley_tiny().replace(tokens=tk.special_tokens())
    params = valley.init_params(cfg, jax.random.key(0), jnp.float32)
    eng = Engine(cfg, params, buckets=(256,), max_new_tokens=16,
                 cache_dtype=jnp.float32, use_flash=False)
    return eng, tk


def _png_b64(color: int) -> str:
    from PIL import Image

    buf = BytesIO()
    Image.fromarray(np.full((32, 32, 3), color, np.uint8)).save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _request(color: int, question: str, max_new: int = 8) -> dict:
    return {"prompt": "You are Valley.###Human: <image> "
                      f"{question}###Assistent:",
            "images": [_png_b64(color)], "temperature": 0.0,
            "max_new_tokens": max_new, "stop": "###"}


def _final_text(worker, params: dict) -> str:
    import json

    chunks = [json.loads(c[:-1]) for c in
              worker.generate_stream_gate(dict(params))]
    assert all(c["error_code"] == 0 for c in chunks), chunks
    return chunks[-1]["text"]


def test_prefix_cached_responses_token_identical(engine_and_tokenizer):
    eng, tk = engine_and_tokenizer
    plain = ModelWorker("u", "u", "tiny", eng, tk, no_register=True)
    cached = ModelWorker("u", "u", "tiny", eng, tk, no_register=True,
                         prefix_cache=2)
    for q in ("what color is this?", "describe the mood"):
        req = _request(7, q)
        assert _final_text(cached, req) == _final_text(plain, req), q
    # same media twice -> one miss (build) then hits
    assert cached.prefix_misses == 1
    assert cached.prefix_hits == 1
    assert len(cached._prefix_caches) == 1


def test_prefix_cache_lru_eviction(engine_and_tokenizer):
    eng, tk = engine_and_tokenizer
    worker = ModelWorker("u", "u", "tiny", eng, tk, no_register=True,
                         prefix_cache=2)
    for color in (10, 20, 30):   # 3 distinct media, capacity 2
        _final_text(worker, _request(color, "hi", max_new=4))
    assert len(worker._prefix_caches) == 2
    assert worker.prefix_misses == 3
    # oldest (color 10) evicted: repeating it misses again
    _final_text(worker, _request(10, "hi", max_new=4))
    assert worker.prefix_misses == 4


def test_prefix_split_fallback_paths(engine_and_tokenizer):
    eng, tk = engine_and_tokenizer
    worker = ModelWorker("u", "u", "tiny", eng, tk, no_register=True,
                         prefix_cache=2)
    # no media end token in the prompt -> no split, plain path
    assert worker._prefix_split("just text", tk.encode("just text")) is None
    # prefix == whole prompt (no suffix question) -> fallback
    from valley_tpu.constants import DEFAULT_IM_END_TOKEN

    p = "x " + DEFAULT_IM_END_TOKEN
    assert worker._prefix_split(p, tk.encode(p)) is None


def test_prefix_cached_speculative_identical(engine_and_tokenizer):
    eng, tk = engine_and_tokenizer
    plain = ModelWorker("u", "u", "tiny", eng, tk, no_register=True)
    spec = ModelWorker("u", "u", "tiny", eng, tk, no_register=True,
                       prefix_cache=2, speculative=True)
    req = _request(3, "what is in the image?")
    assert _final_text(spec, req) == _final_text(plain, req)
    assert spec.prefix_misses == 1


def test_prefix_cache_composes_with_continuous_batching(
        engine_and_tokenizer):
    """--prefix-cache + --batch-window-ms -1: pooled admission reuses the
    cached prefix KV (only the question suffix prefills) and stays
    token-identical to the plain pooled path."""
    eng, tk = engine_and_tokenizer
    plain = ModelWorker("u", "u", "tiny", eng, tk, no_register=True,
                        batch_window_ms=-1, max_batch=2)
    cached = ModelWorker("u", "u", "tiny", eng, tk, no_register=True,
                         batch_window_ms=-1, max_batch=2, prefix_cache=2)
    req = _request(7, "what color is the image?")
    expect = _final_text(plain, req)
    assert _final_text(cached, req) == expect    # miss: builds the prefix
    assert _final_text(cached, req) == expect    # hit: admits from cache
    assert cached.prefix_misses == 1
    assert cached.prefix_hits == 1
    # a different question about the SAME media still hits
    other = _request(7, "describe it differently please")
    assert _final_text(cached, other) == _final_text(plain, other)
    assert cached.prefix_hits == 2
