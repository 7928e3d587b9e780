"""Multi-turn ChatSession (KV-prefix reuse) must match full re-prefill
generation token-for-token."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valley_tpu import config as C
from valley_tpu.inference import Engine, GenerationConfig
from valley_tpu.inference.engine import ChatSession
from valley_tpu.models import valley


@pytest.fixture(scope="module")
def cfg():
    return C.valley_tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return valley.init_params(cfg, jax.random.key(21), dtype=jnp.float32)


@pytest.fixture(scope="module")
def engine(cfg, params):
    return Engine(cfg, params, buckets=(64,), max_new_tokens=8,
                  cache_dtype=jnp.float32, use_flash=False,
                  steps_per_call=3)


def _full_generation(engine, conversation, images=None, n=6):
    gen = GenerationConfig(max_new_tokens=n, do_sample=False)
    return [int(t[0]) for t in engine.generate_tokens(
        [conversation], images, gen, eos_ids=[-1])]


def test_session_single_turn_matches_generate(cfg, engine):
    prompt = list(range(10, 40))
    expect = _full_generation(engine, prompt, n=6)
    sess = ChatSession(engine, GenerationConfig(max_new_tokens=6,
                                                do_sample=False))
    got = sess.chat(prompt, eos_ids=[-1])
    assert got == expect


def test_session_second_turn_matches_full_reprefill(cfg, engine):
    prompt = list(range(10, 40))
    turn2 = list(range(50, 62))
    gen = GenerationConfig(max_new_tokens=5, do_sample=False)

    sess = ChatSession(engine, gen)
    reply1 = sess.chat(prompt, eos_ids=[-1])
    reply2 = sess.chat(turn2, eos_ids=[-1])

    # reference: re-prefill the whole conversation
    conversation = prompt + reply1 + turn2
    expect2 = _full_generation(engine, conversation, n=5)
    assert reply2 == expect2, (reply2, expect2)


def test_session_three_turns(cfg, engine):
    gen = GenerationConfig(max_new_tokens=4, do_sample=False)
    sess = ChatSession(engine, gen, extra_slots=128)
    convo = list(range(10, 30))
    r1 = sess.chat(convo, eos_ids=[-1])
    convo += r1
    t2 = [77, 78, 79]
    r2 = sess.chat(t2, eos_ids=[-1])
    convo += t2 + r2
    t3 = [90, 91]
    r3 = sess.chat(t3, eos_ids=[-1])
    expect3 = _full_generation(engine, convo + t3, n=4)
    assert r3 == expect3


def test_session_multimodal_first_turn(cfg, engine):
    tok = cfg.tokens
    p, t = cfg.num_patches, 2
    span = [tok.im_start] + [tok.im_patch] * p + [tok.im_end] + \
        [tok.vi_start] + [tok.vi_frame] * t + [tok.vi_end]
    prompt = [1] + span + list(range(10, 20))
    images = np.random.default_rng(3).standard_normal(
        (1, t, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(
        np.float32)
    gen = GenerationConfig(max_new_tokens=4, do_sample=False)
    sess = ChatSession(engine, gen)
    r1 = sess.chat(prompt, images=images, eos_ids=[-1])
    t2 = [60, 61, 62]
    r2 = sess.chat(t2, eos_ids=[-1])
    expect2 = _full_generation(engine, prompt + r1 + t2, images, n=4)
    assert r2 == expect2


def test_session_eos_trims_overshoot(cfg, engine):
    """Stopping mid-chunk: post-stop tokens must not contaminate turn 2."""
    prompt = list(range(10, 40))
    gen = GenerationConfig(max_new_tokens=6, do_sample=False)
    # find what greedy produces, then declare token[1] the eos
    probe = _full_generation(engine, prompt, n=6)
    eos = probe[1]

    sess = ChatSession(engine, gen)
    r1 = sess.chat(prompt, eos_ids=[eos])
    assert r1 == probe[:2]          # stop token kept, others trimmed

    t2 = [70, 71, 72]
    r2 = sess.chat(t2, eos_ids=[-1])
    expect2 = _full_generation(engine, prompt + r1 + t2, n=6)
    assert r2 == expect2, (r2, expect2)


def test_session_media_rejected_on_later_turn(cfg, engine):
    sess = ChatSession(engine, GenerationConfig(max_new_tokens=2,
                                                do_sample=False))
    sess.chat(list(range(10, 20)), eos_ids=[-1])
    with pytest.raises(ValueError):
        sess.chat([5, 6], images=np.zeros(
            (1, 1, 3, cfg.vision.image_size, cfg.vision.image_size),
            np.float32))


def test_session_compaction_extends_capacity(cfg, params):
    """When slots run out, the session compacts live tokens to the front
    (reclaiming pow2 chunk padding + trimmed slots) instead of dying —
    and stays token-identical to a full re-prefill."""
    eng = Engine(cfg, params, buckets=(32,), max_new_tokens=4,
                 cache_dtype=jnp.float32, use_flash=False)
    gen = GenerationConfig(max_new_tokens=3, do_sample=False)
    # cache_len = 32 + 4 + 24 = 60 slots; turn 2 consumes a 16-slot pow2
    # chunk + 3 replies, so turn 3 would have slot 32+16+3+16+3 > 60
    # without compaction
    sess = ChatSession(eng, gen, extra_slots=24)
    convo = list(range(10, 20))                      # 10 live after turn 1
    r1 = sess.chat(convo, eos_ids=[-1])
    convo += r1
    t2 = [40, 41, 42]
    r2 = sess.chat(t2, eos_ids=[-1])
    convo += t2 + r2
    t3 = [50, 51]
    r3 = sess.chat(t3, eos_ids=[-1])                 # compacts here
    expect3 = _full_generation(eng, convo + t3, n=3)
    assert r3 == expect3, (r3, expect3)
    convo += t3 + r3
    t4 = [60, 61]
    r4 = sess.chat(t4, eos_ids=[-1])                 # and again
    expect4 = _full_generation(eng, convo + t4, n=3)
    assert r4 == expect4, (r4, expect4)


def test_spec_session_compaction_matches_plain(cfg, params):
    """Cache compaction under speculative rounds: the spec session's
    commit/trim slots line up with the plain session's, so a compacting
    multi-turn conversation stays token-identical."""
    from valley_tpu.inference import SpecChatSession
    from valley_tpu.inference.speculative import SpecConfig

    eng = Engine(cfg, params, buckets=(32,), max_new_tokens=4,
                 cache_dtype=jnp.float32, use_flash=False)
    gen = GenerationConfig(max_new_tokens=3, do_sample=False)
    turns = [list(range(10, 20)), [40, 41, 42], [50, 51], [60, 61]]
    outs = []
    for cls, kw in ((ChatSession, {}),
                    (SpecChatSession,
                     {"spec": SpecConfig(draft_len=3,
                                         rounds_per_call=2)})):
        sess = cls(eng, gen, extra_slots=24, **kw)
        outs.append([sess.chat(t, eos_ids=[-1]) for t in turns])
    assert outs[0] == outs[1], outs


def test_session_cache_exhaustion_raises(cfg, params):
    eng = Engine(cfg, params, buckets=(64,), max_new_tokens=4,
                 cache_dtype=jnp.float32, use_flash=False)
    sess = ChatSession(eng, GenerationConfig(max_new_tokens=4,
                                             do_sample=False),
                       extra_slots=8)
    sess.chat(list(range(10, 20)), eos_ids=[-1])
    with pytest.raises(RuntimeError):
        for _ in range(20):
            sess.chat(list(range(30, 40)), eos_ids=[-1])


# -- shared-prefix caching ----------------------------------------------

def test_prefix_cache_spawn_matches_full_session(cfg, params):
    """PrefixCache: prefill the shared prefix once; a spawned session
    answering a question must match a plain ChatSession given the
    full prefix+question conversation."""
    from valley_tpu.inference import PrefixCache

    eng = Engine(cfg, params, buckets=(64,), max_new_tokens=6,
                 cache_dtype=jnp.float32, use_flash=False)
    gen = GenerationConfig(max_new_tokens=5, do_sample=False)
    prefix = list(range(10, 30))
    pc = PrefixCache(eng, prefix, gen=gen)

    for q in ([40, 41, 42], [50, 51]):
        full = ChatSession(eng, gen)
        r1 = full.chat(prefix + q, eos_ids=[-1])
        sess = pc.spawn()
        r2 = sess.chat(q, eos_ids=[-1])
        assert r1 == r2, (q, r1, r2)
        # spawned sessions keep working multi-turn
        cont_full = full.chat([60, 61], eos_ids=[-1])
        cont_spawn = sess.chat([60, 61], eos_ids=[-1])
        assert cont_full == cont_spawn


def test_prefix_cache_spawns_are_independent(cfg, params):
    from valley_tpu.inference import PrefixCache

    eng = Engine(cfg, params, buckets=(64,), max_new_tokens=6,
                 cache_dtype=jnp.float32, use_flash=False)
    gen = GenerationConfig(max_new_tokens=4, do_sample=False)
    pc = PrefixCache(eng, list(range(10, 30)), gen=gen)
    a, b = pc.spawn(), pc.spawn()
    ra1 = a.chat([40, 41], eos_ids=[-1])
    rb1 = b.chat([50, 51, 52], eos_ids=[-1])   # different question
    # a's second turn unaffected by b's activity
    ra2 = a.chat([60], eos_ids=[-1])
    full = ChatSession(eng, gen)
    full.chat(list(range(10, 30)) + [40, 41], eos_ids=[-1])
    expect = full.chat([60], eos_ids=[-1])
    assert ra2 == expect
    assert len(rb1) == 4 and len(ra1) == 4


def test_prefix_cache_multimodal_and_speculative(cfg, params):
    from valley_tpu.inference import PrefixCache

    eng = Engine(cfg, params, buckets=(128,), max_new_tokens=8,
                 cache_dtype=jnp.float32, use_flash=False,
                 steps_per_call=4)
    gen = GenerationConfig(max_new_tokens=6, do_sample=False)
    tok = cfg.tokens
    span = [tok.im_start] + [tok.im_patch] * cfg.num_patches + \
        [tok.im_end] + [tok.vi_start] + [tok.vi_frame] * 2 + [tok.vi_end]
    prefix = [1] + span + list(range(10, 18))
    images = np.random.default_rng(0).standard_normal(
        (1, 2, 3, cfg.vision.image_size, cfg.vision.image_size)
    ).astype(np.float32)
    pc = PrefixCache(eng, prefix, images=images, gen=gen)
    q = [7, 8, 9, 7, 8]

    full = ChatSession(eng, gen)
    expect = full.chat(prefix + q, images=images, eos_ids=[-1])
    assert pc.spawn().chat(q, eos_ids=[-1]) == expect
    assert pc.spawn(speculative=True).chat(q, eos_ids=[-1]) == expect


def test_find_stop_index_matches_full_prefix_scan():
    """The rolling-window stop search must agree with the naive
    decode-every-prefix implementation it replaced (O(n^2) host fix)."""
    from valley_tpu.inference.engine import find_stop_index
    from valley_tpu.tokenizer import ByteFallbackTokenizer

    tk = ByteFallbackTokenizer()
    for text in ("a nice reply ### Human: next",
                 "no stop anywhere in this text",
                 "#1 then # # then ### end",
                 "###"):
        toks = tk.encode(text)
        got = find_stop_index(toks, ("###",), tk)
        naive = None
        for i in range(1, len(toks) + 1):
            if "###" in tk.decode(toks[:i], skip_special_tokens=True):
                naive = i
                break
        assert got == naive, (text, got, naive)
