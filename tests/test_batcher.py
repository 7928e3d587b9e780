"""Dynamic request batching: correctness of grouped decode vs individual
runs, per-request limits, and the HTTP path under concurrent load."""

import json
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import requests

from valley_tpu import config as C
from valley_tpu.inference import Engine, GenerationConfig
from valley_tpu.models import valley
from valley_tpu.serve.batcher import DynamicBatcher
from valley_tpu.tokenizer import ByteFallbackTokenizer


@pytest.fixture(scope="module")
def engine():
    tk = ByteFallbackTokenizer()
    cfg = C.valley_tiny().replace(tokens=tk.special_tokens())
    params = valley.init_params(cfg, jax.random.key(0), jnp.float32)
    return Engine(cfg, params, buckets=(64,), max_new_tokens=16,
                  cache_dtype=jnp.float32, use_flash=False,
                  steps_per_call=4)


def _single(engine, prompt, n):
    gen = GenerationConfig(max_new_tokens=n, do_sample=False)
    return [int(t[0]) for t in engine.generate_tokens([prompt], gen=gen,
                                                      eos_ids=[-1])]


def test_batched_greedy_matches_individual(engine):
    batcher = DynamicBatcher(engine, max_batch=4, window_ms=200)
    p1 = list(range(10, 30))
    p2 = list(range(40, 55))
    expect1 = _single(engine, p1, 6)
    expect2 = _single(engine, p2, 6)

    # submit is non-blocking: both requests are enqueued before the
    # batcher's first window closes -> deterministic grouping
    qa = batcher.submit(p1, None, 0.0, 1.0, 6, eos_id=-1)
    qb = batcher.submit(p2, None, 0.0, 1.0, 6, eos_id=-1)
    got_a = list(DynamicBatcher.drain(qa))
    got_b = list(DynamicBatcher.drain(qb))
    assert got_a == expect1
    assert got_b == expect2
    assert batcher.batches_run == 1          # grouped into ONE decode
    assert batcher.requests_served == 2


def test_batcher_respects_per_request_max_new(engine):
    batcher = DynamicBatcher(engine, max_batch=4, window_ms=150)
    q_short = batcher.submit(list(range(10, 30)), None, 0.0, 1.0, 2,
                             eos_id=-1)
    q_long = batcher.submit(list(range(10, 30)), None, 0.0, 1.0, 5,
                            eos_id=-1)
    assert len(list(DynamicBatcher.drain(q_short))) == 2
    assert len(list(DynamicBatcher.drain(q_long))) == 5


def test_batcher_single_request_passthrough(engine):
    batcher = DynamicBatcher(engine, max_batch=4, window_ms=10)
    prompt = list(range(20, 40))
    outq = batcher.submit(prompt, None, 0.0, 1.0, 4, eos_id=-1)
    got = list(DynamicBatcher.drain(outq))
    assert got == _single(engine, prompt, 4)


def test_http_concurrent_requests_are_batched(engine):
    from valley_tpu.serve import model_worker as worker_mod
    from valley_tpu.serve.httpd import stream_chunks
    from valley_tpu.serve.model_worker import ModelWorker

    tk = ByteFallbackTokenizer()
    worker = ModelWorker("unused", "unused", "valley-tiny", engine, tk,
                         no_register=True, batch_window_ms=250,
                         max_batch=4)
    app = worker_mod.build_app(worker)
    port = app.start()
    url = f"http://localhost:{port}/worker_generate_stream"

    outputs = {}

    def post(name, prompt):
        chunks = list(stream_chunks(url, {
            "prompt": prompt, "temperature": 0.0, "max_new_tokens": 4,
        }, timeout=120))
        outputs[name] = chunks

    threads = [threading.Thread(target=post,
                                args=(i, f"### Human: q{i}\n### Assistant:"))
               for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    app.shutdown()
    assert len(outputs) == 3
    for chunks in outputs.values():
        assert chunks[-1]["error_code"] == 0
    assert worker.batcher.requests_served == 3
    assert worker.batcher.batches_run <= 2   # at least some grouping
