"""End-to-end serving smoke on the real chip: controller -> worker ->
Valley-7B (int8 weights + int8 KV, the benched flagship config) with a
real mp4 request through the reference wire protocol, plus the
OpenAI-compatible route.

Measures video -> first-chunk latency and decode tok/s through the FULL
HTTP stack (tokenize, video decode+preprocess, controller proxy,
streaming chunks) — the number a user actually sees, vs bench.py's
engine-only number.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/e2e_serve_7b.py
"""

import json
import time

import numpy as np


def make_video(path: str):
    import cv2

    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (480, 360))
    rng = np.random.default_rng(0)
    for i in range(30):
        w.write(rng.integers(0, 255, (360, 480, 3)).astype(np.uint8))
    w.release()


def main():
    import jax
    import jax.numpy as jnp
    import requests

    from valley_tpu import config as C
    from valley_tpu.models import valley
    from valley_tpu.inference import Engine
    from valley_tpu.ops.quant import quantize_llama_params
    from valley_tpu.serve import controller as ctrl_mod
    from valley_tpu.serve import model_worker as worker_mod
    from valley_tpu.serve.httpd import stream_chunks
    from valley_tpu.tokenizer import ByteFallbackTokenizer

    video = "/tmp/e2e_clip.mp4"
    make_video(video)

    tk = ByteFallbackTokenizer()
    cfg = C.ValleyConfig(text=C.LLAMA2_7B, tokens=tk.special_tokens())
    shapes = jax.eval_shape(
        lambda k: valley.init_params(cfg, k, dtype=jnp.bfloat16),
        jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.008, s.dtype),
                          shapes)
    params = quantize_llama_params(params)
    jax.block_until_ready(params)
    # frame buckets (1, 8): single-image and 8-frame-video requests each
    # get a warmed prefill executable (the worker's CLI default)
    # worker CLI defaults: 32-step steady decode with a (2, 6) ramp —
    # first chunk after 2 decoded tokens instead of 32 (the round-3
    # 584 ms first-chunk regression was the unramped 32-step first call)
    engine = Engine(cfg, params, buckets=(512,), max_new_tokens=128,
                    cache_dtype=jnp.int8, steps_per_call=32,
                    decode_ramp=(2, 6), frame_buckets=(1, 8))
    t0 = time.perf_counter()
    engine.warmup()   # compiles BOTH frame buckets (worker startup flow)
    print(f"warmup (frame buckets 1+8): {time.perf_counter() - t0:.0f} s",
          flush=True)

    ctrl = ctrl_mod.Controller()
    ctrl_app = ctrl_mod.build_app(ctrl)
    ctrl_port = ctrl_app.start()
    ctrl_url = f"http://localhost:{ctrl_port}"

    worker = worker_mod.ModelWorker(
        ctrl_url, "http://localhost:0", "valley-7b-int8", engine, tk,
        prefix_cache=4)
    wapp = worker_mod.build_app(worker)
    wport = wapp.start()
    worker.worker_addr = f"http://localhost:{wport}"
    worker.register_to_controller()

    models = requests.post(f"{ctrl_url}/list_models", json={},
                           timeout=10).json()["models"]
    print("controller models:", models)
    assert "valley-7b-int8" in models

    # sampled generation: constant perf weights make greedy argmax hit
    # eos immediately; temperature 0.7 exercises a full 96-token stream
    req = {"model": "valley-7b-int8",
           "prompt": "### Human: what happens in the video? <video>\n"
                     "### Assistent:",
           "videos": [video], "temperature": 0.7,
           "max_new_tokens": 96, "stop": "###"}
    # warm DIRECTLY against the worker (compiles take minutes; the
    # controller proxy enforces the reference's 60 s worker timeout).
    # Twice: with --prefix-cache the first request compiles the
    # prefix-MISS path, the second the spawn-from-cache HIT path.
    for i in range(2):
        warm = list(stream_chunks(f"http://localhost:{wport}"
                                  "/worker_generate_stream", req,
                                  timeout=900))
        assert warm and warm[-1]["error_code"] == 0, warm[-1]
        print(f"warm {i}: {len(warm)} chunks", flush=True)

    for attempt in range(5):
        t0 = time.perf_counter()
        t_first, n_chunks, final = None, 0, ""
        for c in stream_chunks(f"{ctrl_url}/worker_generate_stream", req,
                               timeout=600):
            if t_first is None:
                t_first = time.perf_counter() - t0
            n_chunks += 1
            final = c["text"]
        total = time.perf_counter() - t0
        reply = final[len(req["prompt"]):] if c["error_code"] == 0 else ""
        if c["error_code"] == 0 and reply:
            break
        # transient proxy timeout (round-2 notes) or the sampled stream
        # drawing the "###" stop in its first tokens (constant perf
        # weights -> near-uniform logits): retry on warm paths
        print(f"proxied attempt {attempt}: {c}", flush=True)
    assert c["error_code"] == 0, c
    # chunks stream every stream_interval=2 tokens
    n_tok = max(2 * (n_chunks - 1), 1)
    assert len(reply) > 0, "empty reply"
    print(f"controller-proxied video chat: first chunk "
          f"{t_first * 1e3:.0f} ms, {n_chunks} chunks, "
          f"~{n_tok / (total - t_first):.1f} tok/s decode, "
          f"{total:.2f} s total")

    # OpenAI route on the same worker
    requests.post(f"http://localhost:{wport}/v1/chat/completions",
                  timeout=600,
                  json={"messages": [{"role": "user", "content":
                                      "warm"}],
                        "temperature": 0.7, "max_tokens": 4})
    t0 = time.perf_counter()
    r = requests.post(f"http://localhost:{wport}/v1/chat/completions",
                      timeout=600,
                      json={"messages": [{"role": "user", "content":
                                          "say something"}],
                            "temperature": 0.7, "max_tokens": 32})
    r.raise_for_status()
    out = r.json()
    print(f"openai route: {time.perf_counter() - t0:.2f} s, usage "
          f"{json.dumps(out['usage'])}, finish "
          f"{out['choices'][0]['finish_reason']}")

    # prefix cache through the FULL stack (VERDICT r2 item 3): clear the
    # worker cache, send the same-video request twice — the second run
    # serves the (system prompt + media) prefill from cached KV.  Keep
    # max_new_tokens = the warmed value: a smaller one compiles a fresh
    # n_steps decode executable and the "miss" would time that compile,
    # not the prefix prefill.
    req2 = dict(req)
    with worker._prefix_lock:
        worker._prefix_caches.clear()

    def first_chunk_ms():
        for attempt in range(5):   # transient proxy timeouts (error 3)
            t0 = time.perf_counter()
            tf = None
            for c in stream_chunks(f"{ctrl_url}/worker_generate_stream",
                                   req2, timeout=600):
                if tf is None:
                    tf = time.perf_counter() - t0
            if c["error_code"] == 0:
                return tf * 1e3
            print(f"prefix attempt {attempt}: {c}", flush=True)
        raise AssertionError(c)

    miss_ms = first_chunk_ms()
    hit_ms = first_chunk_ms()
    print(f"prefix cache: miss first-chunk {miss_ms:.0f} ms -> hit "
          f"{hit_ms:.0f} ms (saved {miss_ms - hit_ms:.0f} ms); worker "
          f"hits={worker.prefix_hits} misses={worker.prefix_misses}")

    # mixed-frame traffic (weak item 4): a single-IMAGE request rides the
    # 1-frame bucket on the same warm worker — no recompile stall
    import base64
    import cv2

    rgb = np.random.default_rng(1).integers(
        0, 255, (336, 336, 3)).astype(np.uint8)
    ok, buf = cv2.imencode(".jpg", rgb)
    assert ok
    img_b64 = base64.b64encode(buf.tobytes()).decode()
    img_req = {"model": "valley-7b-int8",
               "prompt": "### Human: what is in the image? <image>\n"
                         "### Assistent:",
               "images": [img_b64], "temperature": 0.7,
               "max_new_tokens": 16, "stop": "###"}
    # warm the image-prefix path directly (see video warm above)
    warm = list(stream_chunks(f"http://localhost:{wport}"
                              "/worker_generate_stream", img_req,
                              timeout=900))
    assert warm and warm[-1]["error_code"] == 0, warm[-1]
    t0 = time.perf_counter()
    tf, last = None, None
    for c in stream_chunks(f"{ctrl_url}/worker_generate_stream",
                           img_req, timeout=600):
        if tf is None:
            tf = time.perf_counter() - t0
        last = c
    assert last["error_code"] == 0, last
    print(f"mixed-frame image request (1-frame bucket): first chunk "
          f"{tf * 1e3:.0f} ms")
    print("E2E OK")


if __name__ == "__main__":
    main()
