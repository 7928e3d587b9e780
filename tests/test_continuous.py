"""Iteration-level continuous batching: rows join/leave mid-decode without
perturbing other rows (greedy determinism), row reuse, per-row limits."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valley_tpu import config as C
from valley_tpu.inference import Engine, GenerationConfig
from valley_tpu.inference.continuous import ContinuousEngine, _drain
from valley_tpu.models import valley


@pytest.fixture(scope="module")
def engine():
    cfg = C.valley_tiny()
    params = valley.init_params(cfg, jax.random.key(0), jnp.float32)
    return Engine(cfg, params, buckets=(64,), max_new_tokens=32,
                  cache_dtype=jnp.float32, use_flash=False,
                  steps_per_call=2)


@pytest.fixture(scope="module")
def cont(engine):
    return ContinuousEngine(engine, rows=3, bucket=64, extra_slots=64,
                            steps_per_call=2)


def _solo(engine, prompt, n):
    gen = GenerationConfig(max_new_tokens=n, do_sample=False)
    return [int(t[0]) for t in engine.generate_tokens([prompt], gen=gen,
                                                      eos_ids=[-1])]


def _collect(outq, timeout=120):
    out = []
    deadline = time.time() + timeout
    gen = _drain(outq)
    while True:
        try:
            out.append(next(gen))
        except StopIteration:
            return out
        assert time.time() < deadline, "continuous decode timed out"


def test_single_request_matches_engine(engine, cont):
    prompt = list(range(10, 40))
    expect = _solo(engine, prompt, 6)
    outq = cont.submit(prompt, max_new_tokens=6, eos_id=-1)
    assert _collect(outq) == expect


def test_mid_flight_join_does_not_perturb(engine, cont):
    """The crux of continuous batching: a request joining mid-decode must
    not change another row's tokens."""
    a = list(range(10, 40))
    b = list(range(45, 60))
    expect_a = _solo(engine, a, 20)
    expect_b = _solo(engine, b, 6)

    qa = cont.submit(a, max_new_tokens=20, eos_id=-1)
    # let A decode a few chunks before B joins
    got_a = [qa.get()]
    time.sleep(0.5)
    qb = cont.submit(b, max_new_tokens=6, eos_id=-1)
    got_b = _collect(qb)
    got_a += _collect(qa)

    assert got_a == expect_a, (got_a, expect_a)
    assert got_b == expect_b, (got_b, expect_b)


def test_row_reuse_after_finish(engine, cont):
    p1 = list(range(20, 35))
    p2 = list(range(36, 50))
    e1 = _solo(engine, p1, 4)
    e2 = _solo(engine, p2, 5)
    assert _collect(cont.submit(p1, max_new_tokens=4, eos_id=-1)) == e1
    assert _collect(cont.submit(p2, max_new_tokens=5, eos_id=-1)) == e2


def test_more_requests_than_rows(engine, cont):
    prompts = [list(range(10 + i, 30 + i)) for i in range(5)]
    expects = [_solo(engine, p, 4) for p in prompts]
    queues = [cont.submit(p, max_new_tokens=4, eos_id=-1) for p in prompts]
    results = [_collect(q) for q in queues]
    assert results == expects


def test_http_worker_continuous_mode(engine):
    import threading

    from valley_tpu.serve import model_worker as worker_mod
    from valley_tpu.serve.httpd import stream_chunks
    from valley_tpu.serve.model_worker import ModelWorker
    from valley_tpu.tokenizer import ByteFallbackTokenizer

    tk = ByteFallbackTokenizer()
    worker = ModelWorker("unused", "unused", "valley-tiny", engine, tk,
                         no_register=True, batch_window_ms=-1, max_batch=3)
    app = worker_mod.build_app(worker)
    port = app.start()
    url = f"http://localhost:{port}/worker_generate_stream"
    outputs = {}

    def post(name):
        outputs[name] = list(stream_chunks(url, {
            "prompt": f"### Human: hello {name}\n### Assistant:",
            "temperature": 0.0, "max_new_tokens": 5}, timeout=120))

    threads = [threading.Thread(target=post, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    app.shutdown()
    assert len(outputs) == 3
    for chunks in outputs.values():
        assert chunks and chunks[-1]["error_code"] == 0


def test_pool_over_tensor_parallel_engine_token_identical(engine, cont):
    """Continuous batching composes with a model-axis TP engine (the 13B
    multi-chip pooled-serving config): same greedy tokens as the plain
    pool, pool KV sharded over the mesh."""
    from valley_tpu import config as C
    from valley_tpu.parallel.mesh import create_mesh

    cfg = C.valley_tiny()
    params = valley.init_params(cfg, jax.random.key(0), jnp.float32)
    mesh = create_mesh(data=1, fsdp=1, model=2)
    tp_eng = Engine(cfg, params, buckets=(64,), max_new_tokens=32,
                    cache_dtype=jnp.float32, use_flash=False,
                    steps_per_call=2, mesh=mesh)
    tp_pool = ContinuousEngine(tp_eng, rows=2, bucket=64, extra_slots=64,
                               steps_per_call=2)
    prompt = list(range(10, 40))
    expect = _collect(cont.submit(prompt, max_new_tokens=6, eos_id=-1))
    got = _collect(tp_pool.submit(prompt, max_new_tokens=6, eos_id=-1))
    assert got == expect
    from valley_tpu.parallel.sharding import kv_cache_sharding

    want = kv_cache_sharding(mesh, 2, cfg.text.kv_heads,
                             ndim=tp_pool._cache.k.ndim)
    assert tp_pool._cache.k.sharding.is_equivalent_to(want,
                                                      tp_pool._cache.k.ndim)


def test_prefix_admission_token_identical(engine, cont):
    """Admitting from a PrefixCache (shared system-prompt KV copied,
    only the suffix prefilled) must stream the same greedy tokens as a
    plain full-prompt admission."""
    from valley_tpu.inference.engine import PrefixCache

    prefix = list(range(10, 34))
    pc = PrefixCache(engine, prefix)
    for suffix in ([40, 41, 42], [50, 51, 52, 53, 54]):
        full = prefix + suffix
        plain = _collect(cont.submit(full, max_new_tokens=6, eos_id=-1))
        via_prefix = _collect(cont.submit(full, max_new_tokens=6,
                                          eos_id=-1, prefix=pc))
        assert plain == via_prefix


def test_prefix_admission_rejects_bad_inputs(engine, cont):
    from valley_tpu.inference.engine import PrefixCache

    pc = PrefixCache(engine, list(range(10, 20)))
    outq = cont.submit([99, 98, 97], max_new_tokens=3, eos_id=-1,
                       prefix=pc)
    with pytest.raises(ValueError):
        list(_drain(outq))   # prefix mismatch delivered to the caller
    with pytest.raises(ValueError):
        cont.submit(list(range(10, 22)), images=np.zeros((1, 1, 3, 28, 28)),
                    prefix=pc)


def test_spec_prefix_admission_token_identical(engine, spec_cont):
    """Prefix admission composes with speculative pooled decode."""
    from valley_tpu.inference.engine import PrefixCache

    prefix = list(range(60, 80))
    pc = PrefixCache(engine, prefix)
    full = prefix + [30, 31, 32, 30, 31, 32]
    plain = _collect(spec_cont.submit(full, max_new_tokens=8, eos_id=-1))
    via_prefix = _collect(spec_cont.submit(full, max_new_tokens=8,
                                           eos_id=-1, prefix=pc))
    assert plain == via_prefix


def test_continuous_warmup(engine):
    c2 = ContinuousEngine(engine, rows=2, bucket=64, extra_slots=32,
                          steps_per_call=2)
    c2.warmup()  # compiles without error
    got = _collect(c2.submit(list(range(10, 20)), max_new_tokens=3,
                             eos_id=-1))
    assert len(got) == 3


def test_mixed_bucket_admission_token_identical(engine):
    """A short prompt admitted through a SMALL prefill bucket mid-decode
    must produce the same tokens as a solo engine run, without perturbing
    the long-running row (non-blocking admission + per-request buckets)."""
    cfg = engine.cfg
    import valley_tpu.models.valley as valley_mod

    multi = Engine(cfg, engine.params, buckets=(16, 64), max_new_tokens=32,
                   cache_dtype=jnp.float32, use_flash=False,
                   steps_per_call=2)
    c = ContinuousEngine(multi, rows=2, bucket=64, extra_slots=64,
                         steps_per_call=2)
    assert c._admission_buckets == (16, 64)

    long_p = list(range(10, 50))        # bucket 64
    short_p = list(range(50, 62))       # 12 tokens -> bucket 16
    expect_long = _solo(multi, long_p, 16)
    expect_short = _solo(multi, short_p, 5)

    qa = c.submit(long_p, max_new_tokens=16, eos_id=-1)
    got_long = [qa.get()]
    time.sleep(0.4)                     # long row is mid-decode
    qb = c.submit(short_p, max_new_tokens=5, eos_id=-1)
    got_short = _collect(qb)
    got_long += _collect(qa)
    assert got_long == expect_long, (got_long, expect_long)
    assert got_short == expect_short, (got_short, expect_short)


def test_batched_admission_token_identical(engine):
    """A burst of compatible requests admits through ONE batched prefill
    call (pow2 group sizes) and every request's stream stays identical
    to its solo engine run."""
    c = ContinuousEngine(engine, rows=6, bucket=64, extra_slots=64,
                         steps_per_call=2, admit_batch=4)
    calls = []
    orig = engine._prefill

    def spy(params, ids, *a, **kw):
        calls.append(int(ids.shape[0]))
        return orig(params, ids, *a, **kw)

    engine._prefill = spy
    try:
        prompts = [list(range(10 + i, 30 + i)) for i in range(6)]
        expects = [_solo(engine, p, 5) for p in prompts]
        calls.clear()
        queues = [c.submit(p, max_new_tokens=5, eos_id=-1)
                  for p in prompts]
        results = [_collect(q) for q in queues]
    finally:
        engine._prefill = orig
    assert results == expects
    # the burst of 6 must have used at least one multi-row prefill
    assert max(calls) > 1, calls
    assert sum(calls) == 6
    assert all(c in (1, 2, 4) for c in calls), calls


def test_batched_admission_respects_incompatible_groups(engine):
    """Sampled and greedy requests never share a batched prefill (the
    do_sample executable is static), but both still complete."""
    c = ContinuousEngine(engine, rows=4, bucket=64, extra_slots=64,
                         steps_per_call=2, admit_batch=4)
    greedy = [list(range(10 + i, 30 + i)) for i in range(2)]
    sampled = [list(range(40 + i, 60 + i)) for i in range(2)]
    expects = [_solo(engine, p, 4) for p in greedy]
    qs = [c.submit(p, max_new_tokens=4, eos_id=-1) for p in greedy]
    qs += [c.submit(p, max_new_tokens=4, eos_id=-1, temperature=0.8)
           for p in sampled]
    results = [_collect(q) for q in qs]
    assert results[:2] == expects          # greedy exact
    assert all(len(r) == 4 for r in results)


def test_prompt_pad_compaction_extends_budget(engine):
    """Decode slots start at len(prompt), so a row supports smax - len new
    tokens — more than the old bucket-aligned budget."""
    c = ContinuousEngine(engine, rows=1, bucket=64, extra_slots=8,
                         steps_per_call=2)   # smax = 72
    p = list(range(10, 20))                  # len 10
    # old scheme capped at extra_slots=8 past the bucket; now 72-10=62
    outq = c.submit(p, max_new_tokens=40, eos_id=-1)
    got = _collect(outq)
    assert len(got) == 40
    expect = _solo(engine, p, 20)
    assert got[:20] == expect


def test_pooled_decode_ramp_token_identical_and_schedule(engine):
    """A ramped pool must (a) emit the exact greedy token stream of the
    unramped pool, and (b) decode in ramp-size chunks while any active
    row is young — small chunks right after admission (bounding pooled
    first-chunk latency), steady-state ``steps`` once every row matured,
    and back to ramp sizes when a new request joins mid-flight."""
    c = ContinuousEngine(engine, rows=2, bucket=64, extra_slots=64,
                         steps_per_call=4, decode_ramp=(1, 2))
    sizes = []
    orig = c._decode

    def spy(*a, n_steps, **kw):
        sizes.append(n_steps)
        return orig(*a, n_steps=n_steps, **kw)

    c._decode = spy
    a = list(range(10, 40))
    expect_a = _solo(engine, a, 16)
    got = _collect(c.submit(a, max_new_tokens=16, eos_id=-1))
    assert got == expect_a
    # schedule: ramp prefix (clipped to observed order) then steady 4s
    assert sizes[0] == 1 and sizes[1] == 2
    assert set(sizes) <= {1, 2, 4} and sizes[-1] == 4

    # a mid-flight join drops the pool back to ramp-size chunks
    sizes.clear()
    b = list(range(45, 60))
    expect_b = _solo(engine, b, 6)
    qa = c.submit(a, max_new_tokens=24, eos_id=-1)
    got_a = [qa.get()]
    while not sizes or sizes[-1] != 4:   # wait until A reaches steady state
        time.sleep(0.05)
    qb = c.submit(b, max_new_tokens=6, eos_id=-1)
    got_b = _collect(qb)
    got_a += _collect(qa)
    assert got_a == _solo(engine, a, 24)
    assert got_b == expect_b
    steady_idx = sizes.index(4)
    assert 1 in sizes[steady_idx:], \
        "join did not re-enter the ramp"


def test_bad_request_fails_without_killing_scheduler(engine, cont):
    """A prompt longer than the prefill bucket must error on its own queue
    (not hang) and leave the scheduler serving later requests."""
    too_long = list(range(5, 5 + 200))         # bucket is 64
    outq = cont.submit(too_long, max_new_tokens=4, eos_id=-1)
    with pytest.raises(ValueError):
        _collect(outq)
    # scheduler thread survived: a normal request still completes
    p = list(range(12, 44))
    expect = _solo(engine, p, 4)
    assert _collect(cont.submit(p, max_new_tokens=4, eos_id=-1)) == expect


def test_eos_ends_row_early(engine, cont):
    prompt = list(range(10, 40))
    probe = _solo(engine, prompt, 8)
    eos = probe[2]
    outq = cont.submit(prompt, max_new_tokens=8, eos_id=eos)
    got = _collect(outq)
    assert got == probe[:3]          # stops at (and includes) the eos


# -- speculative continuous batching ------------------------------------


@pytest.fixture(scope="module")
def spec_cont(engine):
    from valley_tpu.inference.speculative import SpecConfig

    return ContinuousEngine(engine, rows=3, bucket=64, extra_slots=64,
                            steps_per_call=2, speculative=True,
                            spec=SpecConfig(draft_len=4))


def test_spec_continuous_greedy_matches_engine(engine, spec_cont):
    prompt = [7, 8, 9, 7, 8, 9, 7, 8] + list(range(10, 30))
    expect = _solo(engine, prompt, 8)
    got = _collect(spec_cont.submit(prompt, max_new_tokens=8, eos_id=-1))
    assert got == expect, (got, expect)


def test_spec_pool_over_tp_int8_token_identical(engine):
    """The full shipped multi-chip serving config composed in one test:
    int8-quantized weights + speculative continuous batching + a
    model-axis TP mesh must emit the same greedy tokens as the plain
    single-device engine (worker `--tensor-parallel 2 --speculative
    --quantize int8 --batch-window-ms -1`)."""
    from valley_tpu.inference.speculative import SpecConfig
    from valley_tpu.ops.quant import quantize_llama_params
    from valley_tpu.parallel.mesh import create_mesh

    cfg = C.valley_tiny()
    qparams = quantize_llama_params(
        {k: jax.tree.map(jnp.copy, v) for k, v in valley.init_params(
            cfg, jax.random.key(0), jnp.float32).items()})
    base = Engine(cfg, jax.tree.map(jnp.copy, qparams), buckets=(64,),
                  max_new_tokens=32, cache_dtype=jnp.float32,
                  use_flash=False, steps_per_call=2)
    mesh = create_mesh(data=1, fsdp=2, model=2)
    tp_eng = Engine(cfg, qparams, buckets=(64,), max_new_tokens=32,
                    cache_dtype=jnp.float32, use_flash=False,
                    steps_per_call=2, mesh=mesh)
    pool = ContinuousEngine(tp_eng, rows=2, bucket=64, extra_slots=64,
                            steps_per_call=2, speculative=True,
                            spec=SpecConfig(draft_len=4))
    prompt = [7, 8, 9, 7, 8, 9, 7, 8] + list(range(10, 30))
    expect = _solo(base, prompt, 8)
    got = _collect(pool.submit(prompt, max_new_tokens=8, eos_id=-1))
    assert got == expect, (got, expect)


def test_spec_continuous_join_does_not_perturb(engine, spec_cont):
    """Per-row speculative rounds: a row joining mid-decode must not
    change another row's greedy tokens even though rows advance their
    cache slots at different per-round accept counts."""
    a = list(range(10, 40))
    b = [5, 6, 7, 5, 6, 7, 5, 6]
    expect_a = _solo(engine, a, 16)
    expect_b = _solo(engine, b, 6)
    qa = spec_cont.submit(a, max_new_tokens=16, eos_id=-1)
    got_a = [qa.get()]
    time.sleep(0.5)
    qb = spec_cont.submit(b, max_new_tokens=6, eos_id=-1)
    got_b = _collect(qb)
    got_a += _collect(qa)
    assert got_a == expect_a, (got_a, expect_a)
    assert got_b == expect_b, (got_b, expect_b)


def test_spec_continuous_mixed_sampling_pool(engine, spec_cont):
    """Greedy and sampled rows coexist in one speculative pool (one
    executable): the greedy row stays token-identical, sampled rows
    emit in-vocab tokens."""
    g = list(range(10, 40))
    s = list(range(45, 60))
    expect_g = _solo(engine, g, 8)
    qg = spec_cont.submit(g, max_new_tokens=8, eos_id=-1)
    qs = spec_cont.submit(s, temperature=1.3, top_p=0.9,
                          max_new_tokens=8, eos_id=-1)
    got_s = _collect(qs)
    got_g = _collect(qg)
    assert got_g == expect_g, (got_g, expect_g)
    assert len(got_s) == 8
    v = engine.cfg.text.vocab_size
    assert all(0 <= t < v for t in got_s)


def test_spec_continuous_eos_and_reuse(engine, spec_cont):
    prompt = list(range(10, 40))
    probe = _solo(engine, prompt, 8)
    eos = probe[2]
    got = _collect(spec_cont.submit(prompt, max_new_tokens=8, eos_id=eos))
    assert got == probe[:3]
    # row is reusable afterwards
    p2 = list(range(36, 50))
    e2 = _solo(engine, p2, 5)
    assert _collect(spec_cont.submit(p2, max_new_tokens=5,
                                     eos_id=-1)) == e2
