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


def test_spec_sampling_temp0_is_greedy(cfg, params):
    """do_sample=True with temperature < 1e-4 follows the worker's
    argmax rule, so it must equal the greedy speculative stream."""
    eng = Engine(cfg, params, buckets=(128,), max_new_tokens=16,
                 steps_per_call=4)
    dec = SpecDecoder(eng, SpecConfig(draft_len=4, rounds_per_call=2))
    prompt = [1] + list(range(5, 20))
    ref = list(dec.generate_tokens(
        prompt, None, GenerationConfig(max_new_tokens=16,
                                       do_sample=False), eos_ids=[-1]))
    got = list(dec.generate_tokens(
        prompt, None, GenerationConfig(max_new_tokens=16, do_sample=True,
                                       temperature=0.0), eos_ids=[-1]))
    assert got == ref


def test_spec_sampling_runs_and_draws_vary(cfg, params):
    eng = Engine(cfg, params, buckets=(128,), max_new_tokens=16,
                 steps_per_call=4)
    dec = SpecDecoder(eng, SpecConfig(draft_len=4, rounds_per_call=2))
    outs = []
    for seed in (0, 1):
        gen = GenerationConfig(max_new_tokens=16, do_sample=True,
                               temperature=1.3, top_p=0.9, seed=seed)
        toks = list(dec.generate_tokens([1, 7, 8, 9, 7, 8, 9, 7], None,
                                        gen, eos_ids=[-1]))
        assert len(toks) == 16
        assert all(0 <= t < cfg.text.vocab_size for t in toks)
        outs.append(toks)
    assert outs[0] != outs[1]  # different seeds -> different draws


def test_spec_sample_round_distribution():
    """Monte-carlo the rejection round against the exact sequential-
    sampling chain law: P(emit=(a,))=p0(a) for a!=x0,
    P(emit=(x0,b))=p0(x0)p1(b) for b!=x1,
    P(emit=(x0,x1,c))=p0(x0)p1(x1)p2(c)."""
    from valley_tpu.inference.speculative import _spec_sample_round

    v = 5
    rng = np.random.default_rng(0)
    probs = rng.dirichlet(np.ones(v), size=3).astype(np.float32)
    probs_j = jnp.asarray(probs)
    draft = jnp.asarray([2, 4], jnp.int32)
    n = 6000
    keys = jax.random.split(jax.random.key(0), n)
    emit, m = jax.vmap(lambda k: _spec_sample_round(probs_j, draft, k))(
        keys)
    emit = np.asarray(emit)
    m = np.asarray(m)
    counts = {}
    for i in range(n):
        seqt = tuple(emit[i, :m[i] + 1])
        counts[seqt] = counts.get(seqt, 0) + 1
    # exact chain probabilities
    x0, x1 = 2, 4
    exact = {}
    for a in range(v):
        if a != x0:
            exact[(a,)] = probs[0, a]
    for b in range(v):
        if b != x1:
            exact[(x0, b)] = probs[0, x0] * probs[1, b]
    for c in range(v):
        exact[(x0, x1, c)] = probs[0, x0] * probs[1, x1] * probs[2, c]
    assert abs(sum(exact.values()) - 1.0) < 1e-5
    for seqt, p in exact.items():
        got = counts.get(seqt, 0) / n
        assert abs(got - p) < 0.025 + 0.3 * p, (seqt, p, got)
    # no impossible sequences emitted
    assert set(counts) <= set(exact)


def test_draft_lookup_whitebox(cfg, params):
    eng = Engine(cfg, params, buckets=(128,), max_new_tokens=8)
    dec = SpecDecoder(eng, SpecConfig(draft_len=3, ngram=2))
    hist = jnp.asarray([5, 6, 7, 8, 0, 5, 6] + [0] * 9, jnp.int32)
    draft = np.asarray(dec._draft(hist, jnp.int32(7), 3))
    # tail (5,6) matches at index 0 -> continuation [7, 8, 0]
    np.testing.assert_array_equal(draft, [7, 8, 0])

def test_spec_chat_session_matches_plain(cfg, params):
    """SpecChatSession == ChatSession token-for-token across turns,
    including first-turn media and multi-turn KV reuse."""
    from valley_tpu.inference import ChatSession, SpecChatSession

    gen = GenerationConfig(max_new_tokens=12, do_sample=False)
    turns = [
        [7, 8, 9, 7, 8, 9, 7, 8],
        list(range(30, 42)),
        [7, 8, 9, 7, 8],
    ]
    images = np.random.default_rng(0).standard_normal(
        (1, 2, 3, cfg.vision.image_size, cfg.vision.image_size)
    ).astype(np.float32)
    tok = cfg.tokens
    span = [tok.im_start] + [tok.im_patch] * cfg.num_patches + \
        [tok.im_end] + [tok.vi_start] + [tok.vi_frame] * 2 + [tok.vi_end]
    first = [1] + span + turns[0]

    outs = []
    for cls in (ChatSession, SpecChatSession):
        eng = Engine(cfg, params, buckets=(128,), max_new_tokens=12,
                     steps_per_call=4)
        kw = {"spec": SpecConfig(draft_len=4, rounds_per_call=3)} \
            if cls is SpecChatSession else {}
        sess = cls(eng, gen, **kw)
        replies = [sess.chat(first, images=images, eos_ids=[-1])]
        for t in turns[1:]:
            replies.append(sess.chat(t, eos_ids=[-1]))
        outs.append(replies)
    assert outs[0] == outs[1], outs


def test_spec_chat_session_eos_mid_round(cfg, params):
    from valley_tpu.inference import ChatSession, SpecChatSession

    gen = GenerationConfig(max_new_tokens=16, do_sample=False)
    prompt = [1] + list(range(5, 20))
    eng = Engine(cfg, params, buckets=(128,), max_new_tokens=16,
                 steps_per_call=4)
    ref = ChatSession(eng, gen).chat(prompt, eos_ids=[-1])
    eos = ref[5]
    conts = []
    for cls in (ChatSession, SpecChatSession):
        sess = cls(eng, gen)
        got = sess.chat(prompt, eos_ids=[eos])
        assert got == ref[:6], (cls.__name__, got)
        # the session stays usable after an eos stop
        conts.append(sess.chat(list(range(40, 50)), eos_ids=[-1]))
    assert conts[0] == conts[1], conts


def test_spec_chat_session_sampling_smoke(cfg, params):
    from valley_tpu.inference import SpecChatSession

    eng = Engine(cfg, params, buckets=(128,), max_new_tokens=12,
                 steps_per_call=4)
    gen = GenerationConfig(max_new_tokens=12, do_sample=True,
                           temperature=1.2, top_p=0.9)
    sess = SpecChatSession(eng, gen)
    r1 = sess.chat([1] + list(range(5, 20)), eos_ids=[-1])
    r2 = sess.chat(list(range(30, 40)), eos_ids=[-1])
    for r in (r1, r2):
        assert 0 < len(r) <= 12
        assert all(0 <= t < cfg.text.vocab_size for t in r)


def test_spec_composes_with_int8_weights_and_kv(cfg):
    """The serving flagship combo: --speculative --quantize int8
    --kv-cache int8 — speculative greedy must equal plain greedy under
    the same quantization."""
    import jax.numpy as jnp

    from valley_tpu.ops.quant import quantize_llama_params

    params = valley.init_params(cfg, jax.random.key(1), jnp.float32)
    qparams = quantize_llama_params(params)
    eng = Engine(cfg, qparams, buckets=(128,), max_new_tokens=16,
                 cache_dtype=jnp.int8, use_flash=False, steps_per_call=4)
    dec = SpecDecoder(eng, SpecConfig(draft_len=4, rounds_per_call=2))
    gen = GenerationConfig(max_new_tokens=16, do_sample=False)
    prompt = [7, 8, 9, 7, 8, 9, 7, 8] + list(range(10, 24))
    ref = [int(t[0]) for t in eng.generate_tokens([prompt], None, gen,
                                                  eos_ids=[-1])]
    got = list(dec.generate_tokens(prompt, None, gen, eos_ids=[-1]))
    assert got == ref, (got, ref)


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


def test_draft_lookup_prefers_longest_match(cfg, params):
    import jax.numpy as jnp

    from valley_tpu.inference.speculative import ngram_draft

    # tail is (5, 6, 7).  A LATER 2-gram match (6, 7) continues with 99;
    # an earlier full 3-gram match (5, 6, 7) continues with 42.
    hist = jnp.asarray([5, 6, 7, 42, 43, 0, 6, 7, 99, 98, 5, 6, 7]
                       + [0] * 3, jnp.int32)
    n = jnp.int32(13)
    # depth-2 lookup: latest (6,7) wins -> 99
    np.testing.assert_array_equal(
        np.asarray(ngram_draft(hist, n, 2, ngram=2)), [99, 98])
    # depth-3 lookup prefers the full (5,6,7) context -> 42
    np.testing.assert_array_equal(
        np.asarray(ngram_draft(hist, n, 2, ngram=3)), [42, 43])


def test_spec_decoders_share_executable_and_telemetry(cfg, params):
    """Sessions and prefix spawns create a SpecDecoder per reply — they
    must share ONE jitted rounds executable per (engine, config), not
    re-trace per request, and their acceptance counters aggregate so
    worker telemetry sees session/prefix traffic."""
    from valley_tpu.inference import Engine

    engine = Engine(cfg, params, buckets=(64,), max_new_tokens=16,
                    cache_dtype=jnp.float32, use_flash=False)
    d1 = SpecDecoder(engine)
    d2 = SpecDecoder(engine)
    assert d1._rounds is d2._rounds
    d1.total_rounds += 3
    d2.total_emitted += 5
    assert d2.total_rounds == 3 and d1.total_emitted == 5
    # a different config gets its own executable + counters
    d3 = SpecDecoder(engine, SpecConfig(draft_len=4))
    assert d3._rounds is not d1._rounds
    assert d3.total_rounds == 0


# -- acceptance-adaptive control (VERDICT r3 item 3) ---------------------


def test_adaptive_forced_disable_token_identical(cfg, params):
    """A reply whose acceptance trips the disable threshold finishes on
    the plain fused decode — output must stay token-identical to plain
    greedy, and the disable is counted in shared telemetry."""
    eng = Engine(cfg, params, buckets=(128,), max_new_tokens=24,
                 steps_per_call=4)
    # disable_below=10 makes every probe fail its acceptance check
    sp = SpecConfig(draft_len=4, rounds_per_call=3, probe_rounds=1,
                    adaptive=True, disable_below=10.0)
    dec = SpecDecoder(eng, sp)
    gen = GenerationConfig(max_new_tokens=24, do_sample=False)
    base = dec._shared["disabled"]
    for prompt in _prompts(cfg):
        ref = [int(t[0]) for t in eng.generate_tokens(
            [prompt], None, gen, eos_ids=[-1])]
        got = list(dec.generate_tokens(prompt, None, gen, eos_ids=[-1]))
        assert got == ref, (got, ref)
    assert dec._shared["disabled"] - base == len(_prompts(cfg))


def test_adaptive_never_disables_when_threshold_zero(cfg, params):
    """disable_below=0 keeps speculation on for the whole reply."""
    eng = Engine(cfg, params, buckets=(128,), max_new_tokens=16,
                 steps_per_call=4)
    sp = SpecConfig(draft_len=4, rounds_per_call=3, probe_rounds=1,
                    adaptive=True, disable_below=0.0)
    dec = SpecDecoder(eng, sp)
    gen = GenerationConfig(max_new_tokens=16, do_sample=False)
    base = dec._shared["disabled"]
    got = list(dec.generate_tokens(_prompts(cfg)[2], None, gen,
                                   eos_ids=[-1]))
    assert len(got) == 16
    assert dec._shared["disabled"] == base


def test_adaptive_session_fallback_token_identical(cfg, params):
    """SpecChatSession turns that disable mid-turn splice onto the base
    plain loop with KV-slot continuity: multi-turn replies equal the
    plain ChatSession's, and the stream callback sees each token once."""
    from valley_tpu.inference import ChatSession, SpecChatSession

    gen = GenerationConfig(max_new_tokens=12, do_sample=False)
    turns = [[7, 8, 9, 7, 8, 9, 7, 8], list(range(30, 42)), [7, 8, 9]]
    outs, streams = [], []
    for cls in (ChatSession, SpecChatSession):
        eng = Engine(cfg, params, buckets=(128,), max_new_tokens=12,
                     steps_per_call=4)
        kw = {}
        if cls is SpecChatSession:
            kw["spec"] = SpecConfig(draft_len=4, rounds_per_call=3,
                                    probe_rounds=1, adaptive=True,
                                    disable_below=10.0)
        sess = cls(eng, gen, **kw)
        replies, seen = [], []
        for t in turns:
            replies.append(sess.chat(t, eos_ids=[-1],
                                     on_token=seen.append))
        outs.append(replies)
        streams.append(seen)
    assert outs[0] == outs[1], outs
    # every token streamed exactly once across the spec->plain splice
    assert streams[0] == streams[1]


def test_adaptive_sampled_reply_runs(cfg, params):
    """Sampled replies switch paths too (distribution-exact on both
    sides); smoke: correct count, plausible tokens."""
    eng = Engine(cfg, params, buckets=(128,), max_new_tokens=16,
                 steps_per_call=4)
    sp = SpecConfig(draft_len=4, rounds_per_call=3, probe_rounds=1,
                    adaptive=True, disable_below=10.0)
    dec = SpecDecoder(eng, sp)
    gen = GenerationConfig(max_new_tokens=16, do_sample=True,
                           temperature=0.8, seed=5)
    got = list(dec.generate_tokens(_prompts(cfg)[2], None, gen,
                                   eos_ids=[-1]))
    assert len(got) == 16
    assert all(0 <= t < cfg.text.vocab_size for t in got)


def test_adaptive_pool_pauses_and_reprobes(cfg, params):
    """ContinuousEngine(speculative=True) pauses pool-wide when the
    acceptance EMA is below break-even, keeps emitting token-identical
    output through plain chunks, and re-probes after reprobe_chunks."""
    from valley_tpu.inference.continuous import ContinuousEngine, _drain

    eng = Engine(cfg, params, buckets=(64,), max_new_tokens=16,
                 cache_dtype=jnp.float32, use_flash=False,
                 steps_per_call=4)
    sp = SpecConfig(draft_len=2, rounds_per_call=2, adaptive=True,
                    disable_below=10.0, reprobe_chunks=2)
    pool = ContinuousEngine(eng, rows=2, speculative=True, spec=sp,
                            decode_ramp=())
    gen = GenerationConfig(max_new_tokens=12, do_sample=False)
    prompts = [_prompts(cfg)[1][:24], _prompts(cfg)[2][:24]]
    refs = [[int(t[0]) for t in eng.generate_tokens([p], None, gen,
                                                    eos_ids=[-1])]
            for p in prompts]
    outs = [list(_drain(pool.submit(p, max_new_tokens=12, eos_id=-1)))
            for p in prompts]
    assert outs == refs, (outs, refs)
    assert pool.spec_disables >= 1
    assert pool.spec_rounds > 0
    # after enough plain chunks the controller re-probes (spec_live was
    # reset by the countdown at least once during the run, or is paused
    # right now awaiting one)
    assert pool._plain_left <= sp.reprobe_chunks


def test_spec_tp_mesh_token_identical(cfg, params):
    """Speculation composes with tensor parallelism: SpecDecoder over a
    (1, 2, 2) mesh-sharded engine — int8-quantized, as the TP=2 13B
    worker config serves — emits exactly the single-device engine's
    greedy tokens (the verification windows and KV writes shard over
    the model axis without changing the accept/reject math)."""
    from valley_tpu.ops.quant import quantize_llama_params
    from valley_tpu.parallel import create_mesh

    qparams = quantize_llama_params(jax.tree.map(jnp.copy, params))
    base = Engine(cfg, jax.tree.map(jnp.copy, qparams), buckets=(128,),
                  max_new_tokens=24, steps_per_call=4,
                  cache_dtype=jnp.float32, use_flash=False)
    sharded = Engine(cfg, qparams, buckets=(128,), max_new_tokens=24,
                     steps_per_call=4, cache_dtype=jnp.float32,
                     use_flash=False, mesh=create_mesh(1, 2, 2))
    gen = GenerationConfig(max_new_tokens=24, do_sample=False)
    dec = SpecDecoder(sharded, SpecConfig(draft_len=4, rounds_per_call=3))
    for i, prompt in enumerate(_prompts(cfg)):
        images = None
        if i == 0:
            images = np.random.default_rng(0).standard_normal(
                (1, 2, 3, cfg.vision.image_size, cfg.vision.image_size)
            ).astype(np.float32)
        ref = [int(t[0]) for t in base.generate_tokens(
            [prompt], images, gen, eos_ids=[-1])]
        got = list(dec.generate_tokens(prompt, images, gen,
                                       eos_ids=[-1]))
        assert got == ref, (i, got, ref)


def test_spec_pool_tp_mesh_matches_plain(cfg, params):
    """Pooled (continuous-batching) SPECULATIVE decode over a TP mesh
    matches the single-device plain engine row for row — the full
    shipped serving composition (speculation default-on + --tensor-
    parallel) in one case."""
    import time

    from valley_tpu.inference.continuous import ContinuousEngine, _drain
    from valley_tpu.ops.quant import quantize_llama_params
    from valley_tpu.parallel import create_mesh

    qparams = quantize_llama_params(jax.tree.map(jnp.copy, params))
    base = Engine(cfg, jax.tree.map(jnp.copy, qparams), buckets=(64,),
                  max_new_tokens=32, steps_per_call=2,
                  cache_dtype=jnp.float32, use_flash=False)
    gen = GenerationConfig(max_new_tokens=8, do_sample=False)
    prompts = [list(range(10, 40)), [1, 7, 8, 9, 7, 8, 9, 7, 8]]
    plain = [[int(t[0]) for t in base.generate_tokens(
        [p], None, gen, eos_ids=[-1])] for p in prompts]

    eng = Engine(cfg, qparams, buckets=(64,), max_new_tokens=32,
                 steps_per_call=2, cache_dtype=jnp.float32,
                 use_flash=False, mesh=create_mesh(1, 2, 2))
    pool = ContinuousEngine(eng, rows=2, bucket=64, extra_slots=64,
                            steps_per_call=2, speculative=True,
                            spec=SpecConfig(draft_len=4,
                                            rounds_per_call=2))
    queues = [pool.submit(p, max_new_tokens=8, eos_id=-1)
              for p in prompts]
    deadline = time.time() + 300
    for want, outq in zip(plain, queues):
        got = []
        for item in _drain(outq):
            got.append(int(item))
            assert time.time() < deadline, "pooled spec decode timed out"
        assert got == want, (got, want)


def test_disable_below_resolves_per_weight_mode(cfg):
    """disable_below=None resolves at READ time from the engine's
    weight mode: 4-bit decode engines pay 2.6-3.0x a plain step per
    verification round (tools/exp_spec_7b.py, round 5) vs int8's
    1.44x, so their default threshold must be the higher break-even —
    a 7B-calibrated 0.40 would keep speculation on while running well
    below plain decode speed on a 13B int4gp worker."""
    from valley_tpu.inference.speculative import (DISABLE_BELOW_DEFAULT,
                                                  DISABLE_BELOW_W4,
                                                  resolved_disable_below)
    from valley_tpu.ops.quant import quantize_llama_params

    params = valley.init_params(cfg, jax.random.key(1), jnp.float32)
    q8 = quantize_llama_params(
        jax.tree.map(jnp.copy, params))
    eng8 = Engine(cfg, q8, buckets=(64,), max_new_tokens=8,
                  cache_dtype=jnp.int8, use_flash=False)
    q4 = quantize_llama_params(
        jax.tree.map(jnp.copy, params), bits=4, group_size=8)
    eng4 = Engine(cfg, q4, buckets=(64,), max_new_tokens=8,
                  cache_dtype=jnp.int8, use_flash=False, decode_w4=True)

    default = SpecConfig()
    assert default.disable_below is None
    assert resolved_disable_below(default, eng8) == DISABLE_BELOW_DEFAULT
    assert resolved_disable_below(default, eng4) == DISABLE_BELOW_W4
    assert DISABLE_BELOW_W4 > DISABLE_BELOW_DEFAULT

    # explicit values always win (worker warmup sets 10.0 to force the
    # plain-fallback executable to compile; tests set 0.0 to pin spec on)
    forced = SpecConfig(disable_below=10.0)
    assert resolved_disable_below(forced, eng4) == 10.0
    # and the warmup MUTATION pattern keeps working: the threshold is
    # read per check, never cached at decoder init
    dec = SpecDecoder(eng4, SpecConfig(draft_len=2, rounds_per_call=2))
    assert resolved_disable_below(dec.spec, dec.engine) == DISABLE_BELOW_W4
    dec.spec.disable_below = 10.0
    assert resolved_disable_below(dec.spec, dec.engine) == 10.0
    dec.spec.disable_below = None
    assert resolved_disable_below(dec.spec, dec.engine) == DISABLE_BELOW_W4
