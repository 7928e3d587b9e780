"""Session-id serving mode: the unchanged wire protocol (full conversation
each request) gets KV reuse when tokens prefix-match; divergence and
eviction fall back to a fresh prefill."""

import json

import jax
import jax.numpy as jnp
import pytest
import requests

from valley_tpu import config as C
from valley_tpu.inference import Engine
from valley_tpu.models import valley
from valley_tpu.serve import model_worker as worker_mod
from valley_tpu.serve.httpd import stream_chunks
from valley_tpu.serve.model_worker import ModelWorker
from valley_tpu.tokenizer import ByteFallbackTokenizer


@pytest.fixture(scope="module")
def stack():
    tk = ByteFallbackTokenizer()
    cfg = C.valley_tiny().replace(tokens=tk.special_tokens())
    params = valley.init_params(cfg, jax.random.key(0), jnp.float32)
    eng = Engine(cfg, params, buckets=(256,), max_new_tokens=16,
                 cache_dtype=jnp.float32, use_flash=False)
    worker = ModelWorker("unused", "unused", "valley-tiny", eng, tk,
                         no_register=True, max_sessions=2)
    app = worker_mod.build_app(worker)
    port = app.start()
    yield worker, f"http://localhost:{port}/worker_generate_stream", tk
    app.shutdown()


def _ask(url, prompt, session_id=None, max_new=6):
    payload = {"prompt": prompt, "temperature": 0.0,
               "max_new_tokens": max_new, "stop": "###"}
    if session_id:
        payload["session_id"] = session_id
    chunks = list(stream_chunks(url, payload, timeout=120))
    assert chunks[-1]["error_code"] == 0
    return chunks[-1]["text"][len(prompt):]


def test_session_multiturn_matches_stateless(stack):
    worker, url, tk = stack
    p1 = "### Human: tell me something\n### Assistant:"
    r1_s = _ask(url, p1, session_id="conv1")
    r1_ref = _ask(url, p1)                     # stateless baseline
    assert r1_s == r1_ref

    p2 = p1 + r1_s + " Human: and more?\n### Assistant:"
    r2_s = _ask(url, p2, session_id="conv1")   # prefix-matched delta path
    r2_ref = _ask(url, p2)                     # full stateless re-prefill
    assert r2_s == r2_ref
    assert "conv1" in worker._sessions


def test_session_divergence_resets(stack):
    worker, url, tk = stack
    _ask(url, "### Human: alpha\n### Assistant:", session_id="conv2")
    # totally different conversation under the same id -> fresh prefill
    out = _ask(url, "### Human: zebra question\n### Assistant:",
               session_id="conv2")
    ref = _ask(url, "### Human: zebra question\n### Assistant:")
    assert out == ref


def test_session_mode_streams_incrementally(stack):
    worker, url, tk = stack
    payload = {"prompt": "### Human: long story please\n### Assistant:",
               "temperature": 0.0, "max_new_tokens": 12,
               "session_id": "streamy"}
    chunks = list(stream_chunks(url, payload, timeout=120))
    assert chunks[-1]["error_code"] == 0
    assert len(chunks) > 2     # intermediate chunks, not just the final


def test_session_lru_eviction(stack):
    worker, url, tk = stack
    _ask(url, "### Human: s3\n### Assistant:", session_id="s3")
    _ask(url, "### Human: s4\n### Assistant:", session_id="s4")
    _ask(url, "### Human: s5\n### Assistant:", session_id="s5")
    assert len(worker._sessions) <= 2


def test_speculative_session_serving_matches_plain(stack):
    """A --speculative --max-sessions worker answers greedy multi-turn
    requests with the same text as the plain session worker."""
    worker, url, tk = stack
    spec_worker = ModelWorker("unused", "unused", "valley-tiny",
                              worker.engine, tk, no_register=True,
                              max_sessions=2, speculative=True)
    app = worker_mod.build_app(spec_worker)
    port = app.start()
    spec_url = f"http://localhost:{port}/worker_generate_stream"
    try:
        p1 = "### Human: repeat repeat repeat\n### Assistant:"
        r1 = _ask(spec_url, p1, session_id="sp1")
        assert r1 == _ask(url, p1)
        p2 = p1 + r1 + " Human: again again\n### Assistant:"
        r2 = _ask(spec_url, p2, session_id="sp1")   # delta path
        assert r2 == _ask(url, p2)
    finally:
        app.shutdown()
