"""Serving-wide HBM budget (VERDICT r3 item 4): ONE accountant over
engine weights + pool + sessions + prefix fragments.  Over-budget fixed
configs are rejected at startup; dynamic allocations evict across caches
or degrade (prefix caching skipped, sessions refused) instead of OOMing
— vs the reference's single hardcoded 13 GiB cap
(`valley/serve/model_worker.py:57`)."""

import base64
import json
from io import BytesIO

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valley_tpu import config as C
from valley_tpu.inference import Engine
from valley_tpu.models import valley
from valley_tpu.serve import hbm
from valley_tpu.serve.model_worker import ModelWorker
from valley_tpu.tokenizer import ByteFallbackTokenizer

GiB = hbm.GiB


# -- ledger unit tests -------------------------------------------------


def test_fixed_over_budget_raises():
    b = hbm.HbmBudget(10_000)
    b.register_fixed("weights", 6_000)
    with pytest.raises(hbm.BudgetExceeded):
        b.register_fixed("pool", 5_000)


def test_reserve_release_update():
    b = hbm.HbmBudget(10_000)
    b.register_fixed("weights", 4_000)
    assert b.reserve("s:1", "sessions", 3_000)
    assert not b.reserve("s:2", "sessions", 4_000)   # 3k free only
    b.update("s:1", 1_000)   # estimate -> exact
    assert b.reserve("s:2", "sessions", 4_000)
    assert b.release("s:1") == 1_000
    assert b.free() == 2_000
    snap = b.snapshot()
    assert snap["used_bytes"] == 8_000
    assert snap["by"] == {"sessions": 4_000, "weights": 4_000}


def test_reserve_rereserve_same_key_replaces():
    b = hbm.HbmBudget(1_000)
    assert b.reserve("k", "x", 800)
    assert b.reserve("k", "x", 900)   # replace, not additive
    assert b.used() == 900


def test_reserve_calls_make_room_for_deficit():
    b = hbm.HbmBudget(1_000)
    b.reserve("old", "x", 900)
    asked = []

    def make_room(deficit):
        asked.append(deficit)
        return b.release("old")

    assert b.reserve("new", "x", 500, make_room)
    assert asked == [400]
    assert b.used() == 500


def test_kv_slot_bytes_matches_init_cache():
    from valley_tpu.models import llama

    cfg = C.valley_tiny()
    for dtype in (jnp.bfloat16, jnp.int8):
        cache = llama.init_cache(cfg.text, 1, 7, dtype)
        assert hbm.tree_bytes(cache) == 7 * hbm.kv_slot_bytes(cfg.text,
                                                              dtype)


# -- worker integration -------------------------------------------------


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


def _media_request(color: int, question: str, max_new: int = 4) -> dict:
    return {"prompt": "You are Valley.###Human: <image> "
                      f"{question}###Assistent:",
            "images": [_png_b64(color)], "temperature": 0.0,
            "max_new_tokens": max_new, "stop": "###"}


def _session_request(session_id: str, max_new: int = 4) -> dict:
    return {"prompt": f"Human: hello {session_id}###Assistent:",
            "temperature": 0.0, "max_new_tokens": max_new,
            "stop": "###", "session_id": session_id}


def _final(worker, params: dict):
    chunks = [json.loads(c[:-1]) for c in
              worker.generate_stream_gate(dict(params))]
    return chunks


def _weights_bytes(eng) -> int:
    return hbm.tree_bytes(eng.params)


def test_worker_fixed_over_budget_rejected_at_startup(engine_and_tokenizer):
    eng, tk = engine_and_tokenizer
    tiny = _weights_bytes(eng) / GiB / 2   # budget below the weights
    with pytest.raises(hbm.BudgetExceeded):
        ModelWorker("u", "u", "tiny", eng, tk, no_register=True,
                    hbm_budget_gb=tiny)


def _budget_for(eng, extra_bytes: int) -> float:
    """GiB budget = weights + plain-path inflight worst case + slack."""
    slot = hbm.kv_slot_bytes(eng.cfg.text, eng.cache_dtype)
    inflight = 5 * (eng.buckets[-1] + eng.max_new_tokens + 512
                    + eng.steps_per_call) * slot
    return (_weights_bytes(eng) + inflight + extra_bytes) / GiB


def test_prefix_cache_degrades_within_budget(engine_and_tokenizer):
    """Budget with room for ~1 prefix fragment: distinct media evict each
    other (never exceeding the ledger) and requests still answer; the
    status endpoint reports usage."""
    eng, tk = engine_and_tokenizer
    frag = hbm.prefix_fragment_bytes(eng, 200)
    worker = ModelWorker("u", "u", "tiny", eng, tk, no_register=True,
                         prefix_cache=8,
                         hbm_budget_gb=_budget_for(eng, int(1.5 * frag)))
    for color in (10, 20, 30):
        chunks = _final(worker, _media_request(color, "hi"))
        assert all(c["error_code"] == 0 for c in chunks), chunks
    # the budget (not the prefix_cache=8 cap) bounded residency to 1
    assert len(worker._prefix_caches) == 1
    assert worker.hbm.used() <= worker.hbm.total
    stats = worker.get_status()["stats"]
    assert stats["hbm"]["used_bytes"] > 0
    assert stats["hbm"]["by"]["prefix"] == frag


def test_prefix_cache_skipped_when_no_room(engine_and_tokenizer):
    """Budget with room for NO fragment: requests degrade to the plain
    uncached path (correct replies, prefix_budget_skips counted)."""
    eng, tk = engine_and_tokenizer
    plain = ModelWorker("u", "u", "tiny", eng, tk, no_register=True)
    worker = ModelWorker("u", "u", "tiny", eng, tk, no_register=True,
                         prefix_cache=8,
                         hbm_budget_gb=_budget_for(eng, 64))
    req = _media_request(11, "what is this?")
    assert _final(worker, req)[-1]["text"] == _final(plain, req)[-1]["text"]
    assert len(worker._prefix_caches) == 0
    assert worker.prefix_budget_skips >= 1


def test_sessions_evict_across_caches_and_refuse(engine_and_tokenizer):
    """Budget sized for ~1 session: a second session evicts the first
    (idle) one; with the eviction path exhausted a new session is
    REFUSED with an error_code reply, not an OOM."""
    eng, tk = engine_and_tokenizer
    sess_bytes = hbm.session_cache_bytes(eng, 512, eng.steps_per_call)
    worker = ModelWorker("u", "u", "tiny", eng, tk, no_register=True,
                         max_sessions=8,
                         hbm_budget_gb=_budget_for(eng,
                                                   int(1.5 * sess_bytes)))
    chunks = _final(worker, _session_request("a"))
    assert all(c["error_code"] == 0 for c in chunks)
    chunks = _final(worker, _session_request("b"))
    assert all(c["error_code"] == 0 for c in chunks)
    # session "a" was evicted to make room (ledger, not max_sessions=8)
    assert list(worker._sessions) == ["b"]
    assert worker.hbm.used() <= worker.hbm.total

    # shrink the ledger so nothing can ever fit a session: refusal path
    worker.hbm.total = worker.hbm.used() - hbm.tree_bytes(
        worker._sessions["b"][0]._state[0]) + 64
    worker._hbm_make_room(1 << 60)   # clears evictable caches
    chunks = _final(worker, _session_request("c"))
    assert chunks[-1]["error_code"] != 0
    assert "HBM budget" in chunks[-1]["text"]
    assert worker.session_refusals == 1
