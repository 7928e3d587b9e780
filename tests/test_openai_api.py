"""OpenAI-compatible worker API: /v1/chat/completions (+SSE) and
/v1/models map onto the native serving stack."""

import base64
import json

import jax
import jax.numpy as jnp
import numpy as np
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
    yield worker, f"http://localhost:{port}", tk
    app.shutdown()


MSGS = [{"role": "system", "content": "You are Valley."},
        {"role": "user", "content": "tell me something nice"}]


def test_models_endpoint(stack):
    _w, base, _tk = stack
    r = requests.get(f"{base}/v1/models", timeout=30)
    assert r.status_code == 200
    data = r.json()
    assert data["data"][0]["id"] == "valley-tiny"


def test_chat_completion_matches_native_route(stack):
    _w, base, _tk = stack
    r = requests.post(f"{base}/v1/chat/completions", timeout=120,
                      json={"messages": MSGS, "temperature": 0.0,
                            "max_tokens": 8})
    assert r.status_code == 200, r.text
    out = r.json()
    assert out["object"] == "chat.completion"
    content = out["choices"][0]["message"]["content"]
    assert out["choices"][0]["finish_reason"] == "stop"
    assert out["usage"]["total_tokens"] > 0

    # the native route with the equivalent template prompt agrees
    prompt = ("You are Valley.\n\n### Human: tell me something nice \n"
              "### Assistent:")
    chunks = list(stream_chunks(f"{base}/worker_generate_stream",
                                {"prompt": prompt, "temperature": 0.0,
                                 "max_new_tokens": 8, "stop": "###"},
                                timeout=120))
    native = chunks[-1]["text"][len(prompt):].strip()
    assert content == native, (content, native)


def test_chat_completion_sse_stream(stack):
    _w, base, _tk = stack
    with requests.post(f"{base}/v1/chat/completions", stream=True,
                       timeout=120,
                       json={"messages": MSGS, "temperature": 0.0,
                             "max_tokens": 8, "stream": True}) as r:
        assert r.status_code == 200
        assert r.headers["Content-Type"].startswith("text/event-stream")
        deltas, done, finish = [], False, None
        for line in r.iter_lines():
            if not line or not line.startswith(b"data: "):
                continue
            payload = line[len(b"data: "):]
            if payload == b"[DONE]":
                done = True
                break
            obj = json.loads(payload)
            choice = obj["choices"][0]
            if choice["finish_reason"]:
                finish = choice["finish_reason"]
            deltas.append(choice["delta"].get("content", ""))
    assert done and finish == "stop"
    streamed = "".join(deltas).strip()

    r2 = requests.post(f"{base}/v1/chat/completions", timeout=120,
                       json={"messages": MSGS, "temperature": 0.0,
                             "max_tokens": 8})
    assert streamed == r2.json()["choices"][0]["message"]["content"]


def test_chat_completion_image_part(stack):
    from PIL import Image
    from io import BytesIO

    _w, base, _tk = stack
    buf = BytesIO()
    Image.fromarray(np.full((40, 40, 3), 128, np.uint8)).save(buf, "JPEG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    msgs = [{"role": "user", "content": [
        {"type": "text", "text": "describe this"},
        {"type": "image_url",
         "image_url": {"url": f"data:image/jpeg;base64,{b64}"}}]}]
    r = requests.post(f"{base}/v1/chat/completions", timeout=180,
                      json={"messages": msgs, "temperature": 0.0,
                            "max_tokens": 6})
    assert r.status_code == 200, r.text
    assert r.json()["choices"][0]["message"]["content"] is not None


def test_chat_completion_bad_role_is_400(stack):
    _w, base, _tk = stack
    r = requests.post(f"{base}/v1/chat/completions", timeout=30,
                      json={"messages": [{"role": "tool",
                                          "content": "x"}]})
    assert r.status_code == 400
    assert r.json()["error"]["type"] == "invalid_request_error"


def test_chat_completion_user_field_reuses_session(stack):
    worker, base, _tk = stack
    msgs = MSGS
    r1 = requests.post(f"{base}/v1/chat/completions", timeout=120,
                       json={"messages": msgs, "temperature": 0.0,
                             "max_tokens": 6, "user": "alice"})
    assert r1.status_code == 200
    assert "alice" in worker._sessions


def test_media_part_string_and_missing_url_forms():
    """String-form payloads ({'video_url': 'data:...'}) are accepted;
    a part with no usable url raises ValueError (-> HTTP 400) instead of
    silently queueing an empty payload (ADVICE r2)."""
    from valley_tpu.serve.openai_api import _flatten_messages

    payload = base64.b64encode(b"vbytes").decode()
    msgs = [{"role": "user", "content": [
        {"type": "text", "text": "describe"},
        {"type": "video_url", "video_url": f"data:video/mp4;base64,{payload}"},
    ]}]
    prompt, videos, images = _flatten_messages(msgs)
    assert videos == [payload] and images == []
    assert "<video>" in prompt

    with pytest.raises(ValueError, match="no usable url"):
        _flatten_messages([{"role": "user", "content": [
            {"type": "image_url", "image_url": {}}]}])
