"""Serving stack: controller scheduling, worker streaming over real HTTP
sockets, controller proxy, web server endpoints (httpx/requests clients
against live localhost servers, per SURVEY §4(e))."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import requests

from valley_tpu import config as C
from valley_tpu.inference import Engine
from valley_tpu.models import valley
from valley_tpu.serve import controller as controller_mod
from valley_tpu.serve import model_worker as worker_mod
from valley_tpu.serve import web_server as web_mod
from valley_tpu.serve.controller import Controller
from valley_tpu.serve.httpd import post_json, stream_chunks
from valley_tpu.serve.model_worker import ModelWorker
from valley_tpu.tokenizer import ByteFallbackTokenizer


@pytest.fixture(scope="module")
def engine_and_tokenizer():
    tk = ByteFallbackTokenizer()
    cfg = C.valley_tiny().replace(tokens=tk.special_tokens())
    params = valley.init_params(cfg, jax.random.key(0), jnp.float32)
    eng = Engine(cfg, params, buckets=(128,), max_new_tokens=16,
                 cache_dtype=jnp.float32, use_flash=False)
    return eng, tk


@pytest.fixture(scope="module")
def stack(engine_and_tokenizer):
    """controller + registered worker + web server on live ports."""
    eng, tk = engine_and_tokenizer
    ctrl = Controller("shortest_queue")
    ctrl_app = controller_mod.build_app(ctrl)
    ctrl_port = ctrl_app.start()
    ctrl_addr = f"http://localhost:{ctrl_port}"

    worker = ModelWorker(ctrl_addr, "placeholder", "valley-tiny", eng, tk,
                         no_register=True, num_frames=2)
    w_app = worker_mod.build_app(worker)
    w_port = w_app.start()
    worker.worker_addr = f"http://localhost:{w_port}"
    worker.register_to_controller()

    web = web_mod.WebServer(ctrl_addr)
    web_app = web_mod.build_app(web)
    web_port = web_app.start()

    yield {
        "ctrl": ctrl, "ctrl_addr": ctrl_addr,
        "worker": worker, "worker_addr": worker.worker_addr,
        "web_addr": f"http://localhost:{web_port}",
    }
    ctrl_app.shutdown()
    w_app.shutdown()
    web_app.shutdown()


def test_register_and_list_models(stack):
    models = post_json(stack["ctrl_addr"] + "/list_models", {})["models"]
    assert models == ["valley-tiny"]


def test_get_worker_address(stack):
    addr = post_json(stack["ctrl_addr"] + "/get_worker_address",
                     {"model": "valley-tiny"})["address"]
    assert addr == stack["worker_addr"]
    missing = post_json(stack["ctrl_addr"] + "/get_worker_address",
                        {"model": "nope"})["address"]
    assert missing == ""


def test_worker_status_stats_counters(stack):
    """/worker_get_status carries additive serving telemetry: request and
    generated-token counters move across a generation."""
    before = post_json(stack["worker_addr"] + "/worker_get_status", {})
    s0 = before["stats"]
    with requests.post(stack["worker_addr"] + "/worker_generate_stream",
                       json={"prompt": "count me", "temperature": 0.0,
                             "max_new_tokens": 4}, stream=True) as r:
        for _ in r.iter_lines(decode_unicode=False, delimiter=b"\0"):
            pass
    after = post_json(stack["worker_addr"] + "/worker_get_status", {})
    s1 = after["stats"]
    assert s1["requests"] == s0["requests"] + 1
    assert s1["tokens_generated"] > s0["tokens_generated"]
    assert "active_sessions" in s1


def test_worker_status_endpoint(stack):
    status = post_json(stack["worker_addr"] + "/worker_get_status", {})
    assert status["model_names"] == ["valley-tiny"]
    assert status["speed"] == 1


def test_worker_text_stream(stack):
    chunks = list(stream_chunks(
        stack["worker_addr"] + "/worker_generate_stream",
        {"prompt": "### Human: hi\n### Assistant:", "temperature": 0.0,
         "max_new_tokens": 8, "stop": "###"}))
    assert chunks
    assert all(c["error_code"] == 0 for c in chunks)
    # streamed text echoes the original prompt prefix (reference behavior)
    assert chunks[-1]["text"].startswith("### Human: hi")


def test_worker_video_stream(stack, tmp_path):
    import cv2

    path = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 5, (64, 64))
    for i in range(10):
        w.write(np.full((64, 64, 3), i * 20, np.uint8))
    w.release()

    chunks = list(stream_chunks(
        stack["worker_addr"] + "/worker_generate_stream",
        {"prompt": "### Human: <video> what is this\n### Assistant:",
         "videos": [path], "temperature": 0.0, "max_new_tokens": 6,
         "stop": "###"}, timeout=180))
    assert chunks and chunks[-1]["error_code"] == 0


def test_worker_mismatched_video_count_is_error_code_1(stack):
    chunks = list(stream_chunks(
        stack["worker_addr"] + "/worker_generate_stream",
        {"prompt": "no media token here", "videos": ["/tmp/x.mp4"],
         "max_new_tokens": 4}))
    assert chunks[-1]["error_code"] == 1


def test_controller_proxy_stream(stack):
    chunks = list(stream_chunks(
        stack["ctrl_addr"] + "/worker_generate_stream",
        {"model": "valley-tiny", "prompt": "### Human: test\n### Assistant:",
         "temperature": 0.0, "max_new_tokens": 4, "stop": "###"}))
    assert chunks and chunks[-1]["error_code"] == 0


def test_controller_proxy_no_worker_is_error_code_2(stack):
    chunks = list(stream_chunks(
        stack["ctrl_addr"] + "/worker_generate_stream",
        {"model": "missing-model", "prompt": "x"}))
    assert chunks[-1]["error_code"] == 2


def test_heartbeat_updates_and_expiry():
    ctrl = Controller("shortest_queue")
    ctrl.register_worker("http://fake:1", True,
                         {"model_names": ["m"], "speed": 1,
                          "queue_length": 0})
    assert ctrl.receive_heart_beat("http://fake:1", 3)
    assert ctrl.worker_info["http://fake:1"].queue_length == 3
    assert not ctrl.receive_heart_beat("http://unknown:1", 1)
    # force expiry
    ctrl.worker_info["http://fake:1"].last_heart_beat = time.time() - 999
    ctrl.remove_stale_workers_by_expiration()
    assert "http://fake:1" not in ctrl.worker_info


def test_lottery_dispatch():
    ctrl = Controller("lottery")
    ctrl.register_worker("http://a:1", False,
                         {"model_names": ["m"], "speed": 1,
                          "queue_length": 0})
    ctrl.register_worker("http://b:1", False,
                         {"model_names": ["m"], "speed": 1,
                          "queue_length": 0})
    picks = {ctrl.get_worker_address("m") for _ in range(20)}
    assert picks <= {"http://a:1", "http://b:1"}
    assert ctrl.get_worker_address("other") == ""


def test_shortest_queue_prefers_idle():
    ctrl = Controller("shortest_queue")
    ctrl.register_worker("http://busy:1", False,
                         {"model_names": ["m"], "speed": 1,
                          "queue_length": 10})
    ctrl.register_worker("http://idle:1", False,
                         {"model_names": ["m"], "speed": 1,
                          "queue_length": 0})
    assert ctrl.get_worker_address("m") == "http://idle:1"
    # dispatch increments the chosen worker's queue
    assert ctrl.worker_info["http://idle:1"].queue_length == 1


def test_web_index_and_models(stack):
    r = requests.get(stack["web_addr"] + "/")
    assert r.status_code == 200 and b"Valley" in r.content
    # dual Video/Image tab layout (ref gradio_web_server_video.py:352-374)
    assert b"tab-video" in r.content and b"tab-image" in r.content
    assert b"procmode" in r.content
    r = requests.post(stack["web_addr"] + "/list_models")
    assert r.json()["models"] == ["valley-tiny"]


def test_web_template_auto_selection():
    """First-round template choice mirrors the reference predicate
    (gradio_web_server_video.py:193-200); the reference's own registry
    lacks "multimodal" so the image branch resolves to a template that
    exists instead of KeyErroring."""
    web = web_mod.WebServer("http://localhost:1")
    assert web.pick_template("valley-stable-7b", "video") == \
        "multimodal_video"
    picked = web.pick_template("valley-stable-7b", "image")
    assert picked in web_mod.conv_templates
    assert web.pick_template("valley-fashion", "image") == \
        "multimodal_video"
    assert web.pick_template("anything", None) == "multimodal_video"
    fixed = web_mod.WebServer("http://localhost:1", conv_mode="v1")
    assert fixed.pick_template("valley-stable-7b", "image") == "v1"


def test_web_chat_stream_roundtrip(stack):
    with requests.post(stack["web_addr"] + "/chat_stream",
                       json={"model": "valley-tiny", "text": "hello",
                             "temperature": 0.0, "max_new_tokens": 4},
                       stream=True) as r:
        chunks = [json.loads(c) for c in
                  r.iter_lines(decode_unicode=False, delimiter=b"\0") if c]
    assert chunks
    assert "text" in chunks[-1]


@pytest.mark.parametrize("mode", ["Crop", "Resize", "Pad"])
def test_web_chat_stream_image_process_modes(stack, mode):
    """image_process_mode parity: a non-square image goes through the
    conversation's Pad/Crop/Resize pipeline server-side and still yields
    a successful generation."""
    import base64
    from io import BytesIO

    from PIL import Image

    img = Image.new("RGB", (96, 48), (200, 30, 30))
    buf = BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    with requests.post(stack["web_addr"] + "/chat_stream",
                       json={"model": "valley-tiny",
                             "text": "what color?", "media": b64,
                             "media_type": "image",
                             "image_process_mode": mode,
                             "temperature": 0.0, "max_new_tokens": 4},
                       stream=True) as r:
        chunks = [json.loads(c) for c in
                  r.iter_lines(decode_unicode=False, delimiter=b"\0") if c]
    assert chunks and chunks[-1].get("error_code", 0) == 0, chunks[-1:]


def test_web_vote_logged(stack, tmp_path, monkeypatch):
    r = requests.post(stack["web_addr"] + "/vote",
                      json={"type": "upvote", "history": [["Human", "hi"]]})
    assert r.status_code == 200


def test_unknown_route_404(stack):
    r = requests.post(stack["ctrl_addr"] + "/nope", json={})
    assert r.status_code == 404


def test_proxy_to_dead_worker_is_error_code_3():
    """Failure detection: a registered worker that died mid-service maps
    to error_code 3 (`controller.py:209-215` parity)."""
    ctrl = Controller("shortest_queue")
    ctrl.register_worker("http://localhost:1", False,  # nothing listens
                         {"model_names": ["dead"], "speed": 1,
                          "queue_length": 0})
    chunks = [json.loads(c.decode().rstrip("\0")) for c in
              ctrl.worker_api_generate_stream({"model": "dead",
                                               "prompt": "x"})]
    assert chunks[-1]["error_code"] == 3


def test_controller_concurrent_stress():
    """Registry under concurrent register/heartbeat/dispatch/expiry from
    many threads (the reference has no race tooling, SURVEY §5 — this is
    the race-exercise test of our control plane)."""
    import threading

    ctrl = Controller("shortest_queue")
    errors = []

    def registrar(i):
        try:
            for k in range(50):
                ctrl.register_worker(
                    f"http://w{i}:{k % 5}", False,
                    {"model_names": ["m"], "speed": 1, "queue_length": k})
                ctrl.receive_heart_beat(f"http://w{i}:{k % 5}", k)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def dispatcher():
        try:
            for _ in range(200):
                ctrl.get_worker_address("m")
                ctrl.list_models()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def reaper():
        try:
            for _ in range(50):
                ctrl.remove_stale_workers_by_expiration()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=registrar, args=(i,))
               for i in range(4)]
    threads += [threading.Thread(target=dispatcher) for _ in range(2)]
    threads += [threading.Thread(target=reaper)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert ctrl.get_worker_address("m") != ""


def test_engine_warmup(engine_and_tokenizer):
    eng, _tk = engine_and_tokenizer
    eng.warmup(batch_sizes=(1,), frames=2)  # compiles without error


def test_load_engine_kv_cache_flag():
    """worker --kv-cache int8 builds an int8-cache engine that streams."""
    import argparse

    from valley_tpu.serve.model_worker import load_engine

    args = argparse.Namespace(model_path="random:tiny", vision_tower=None,
                              lora_path=None, buckets="128",
                              max_new_tokens=8, quantize=None,
                              kv_cache="int8")
    eng, tk = load_engine(args)
    assert eng.cache_dtype == jnp.int8
    from valley_tpu.inference.engine import GenerationConfig

    ids = tk.encode("### Human: hi\n### Assistant:")
    toks = [int(t[0]) for t in eng.generate_tokens(
        [ids], None, GenerationConfig(max_new_tokens=6, do_sample=False),
        eos_ids=[-1])]
    assert len(toks) == 6


def test_warmup_serving_paths_compiles_and_serves(stack):
    """warmup_serving_paths pre-compiles prefix/session executables and
    leaves the worker fully serviceable."""
    worker = stack["worker"]
    worker.prefix_cache_size, worker.max_sessions = 2, 2
    try:
        worker.warmup_serving_paths()
        with requests.post(
                stack["worker_addr"] + "/worker_generate_stream",
                json={"prompt": "after warm", "temperature": 0.0,
                      "max_new_tokens": 4, "session_id": "warmtest"},
                stream=True) as r:
            chunks = [json.loads(c) for c in
                      r.iter_lines(decode_unicode=False, delimiter=b"\0")
                      if c]
        assert chunks and chunks[-1]["error_code"] == 0
    finally:
        worker.prefix_cache_size, worker.max_sessions = 0, 0
        worker._sessions.clear()
        worker._prefix_caches.clear()


def test_session_cache_geometry_quantized(stack):
    """Two session requests with nearby max_new_tokens must land on the
    SAME session cache length (extra_slots rounds up to a 512 multiple)
    so the decode executable is shared instead of recompiled."""
    worker = stack["worker"]
    worker.max_sessions = 4
    try:
        lens = {}
        for sid, mnt in (("geoA", 40), ("geoB", 56)):
            with requests.post(
                    stack["worker_addr"] + "/worker_generate_stream",
                    json={"prompt": "hello", "temperature": 0.0,
                          "max_new_tokens": mnt, "session_id": sid},
                    stream=True) as r:
                for _ in r.iter_lines(decode_unicode=False,
                                      delimiter=b"\0"):
                    pass
            session, _known = worker._sessions[sid]
            cache = session._state[0]
            lens[sid] = cache.k.shape[2]
        assert lens["geoA"] == lens["geoB"], lens
    finally:
        worker.max_sessions = 0
        worker._sessions.clear()


def test_load_engine_tensor_parallel_token_identical():
    """worker --tensor-parallel 2 shards the engine over a model-axis
    mesh and generates the same greedy tokens as single-chip."""
    import argparse

    from valley_tpu.inference.engine import GenerationConfig
    from valley_tpu.serve.model_worker import load_engine

    def mk(tp):
        return argparse.Namespace(model_path="random:tiny",
                                  vision_tower=None, lora_path=None,
                                  buckets="128", max_new_tokens=8,
                                  quantize=None, kv_cache="bf16",
                                  tensor_parallel=tp)

    eng1, tk = load_engine(mk(1))
    eng2, _ = load_engine(mk(2))
    assert eng1.mesh is None and eng2.mesh is not None
    assert eng2.mesh.shape["model"] == 2
    ids = tk.encode("### Human: hi\n### Assistant:")
    gen = GenerationConfig(max_new_tokens=6, do_sample=False)
    t1 = [int(t[0]) for t in eng1.generate_tokens([ids], None, gen,
                                                  eos_ids=[-1])]
    t2 = [int(t[0]) for t in eng2.generate_tokens([ids], None, gen,
                                                  eos_ids=[-1])]
    assert t1 == t2


def test_cli_chat_loop_speculative_matches_plain(engine_and_tokenizer):
    """The CLI REPL (scripted IO) produces the same greedy replies with
    and without --speculative."""
    from valley_tpu.serve.cli import chat_loop

    _eng, tk = engine_and_tokenizer
    cfg = _eng.cfg
    eng = Engine(cfg, _eng.params, buckets=(512,), max_new_tokens=16,
                 cache_dtype=jnp.float32, use_flash=False)
    outs = []
    for spec in (False, True):
        script = iter(["hello there", "tell me more", ""])
        printed: list = []
        chat_loop(eng, tk, "v1", temperature=0.0, max_new_tokens=6,
                  video=None, num_frames=2,
                  input_fn=lambda _p: next(script),
                  print_fn=lambda *a, **k: printed.append(
                      " ".join(str(x) for x in a)),
                  speculative=spec)
        outs.append(printed)
    assert outs[0] == outs[1], outs
    assert any("exit..." in line for line in outs[0])


def test_load_engine_quantize_int4g():
    """worker --quantize int4g loads group-128 scales (falling back to
    per-tensor-size groups on tiny dims), enables the w4 decode view,
    and generates."""
    import argparse

    from valley_tpu.serve.model_worker import load_engine

    args = argparse.Namespace(model_path="random:tiny", vision_tower=None,
                              lora_path=None, buckets="128",
                              max_new_tokens=8, quantize="int4g",
                              kv_cache="bf16")
    eng, tk = load_engine(args)
    assert eng.decode_w4
    lay = eng.params["llama"]["layers"]
    assert lay["wq"].dtype == jnp.int8          # int4 magnitudes, int8 store
    from valley_tpu.inference.engine import GenerationConfig

    ids = tk.encode("### Human: hi\n### Assistant:")
    toks = [int(t[0]) for t in eng.generate_tokens(
        [ids], None, GenerationConfig(max_new_tokens=6, do_sample=False),
        eos_ids=[-1])]
    assert len(toks) == 6
