"""Self-speculative decoding: n-gram lookup drafts + fused verification.

Single-stream decode is HBM-bandwidth-bound — every token streams all
13+ GB of decoder weights (ROUND_NOTES.md speed-of-light analysis), so
the only way PAST the one-token roofline is to verify several tokens per
weight pass.  This decoder drafts D tokens by matching the last
``ngram`` generated tokens against the prompt+history, deepest match
first (prompt-lookup decoding — no draft model, no extra weights), and
verifies the draft with ONE (D+1)-wide
forward through the cache: the weight traffic of a single decode step,
amortized over every accepted token.

* **Greedy** (``do_sample=False``): a draft token survives only if it
  equals the model's own argmax at its position, and the first
  disagreement is replaced by that argmax — token-identical to plain
  greedy decode up to the numerics of the (D+1)-wide verify matmul
  (whose bf16 tiling/reduction order can in principle flip an exact
  argmax tie vs the width-1 step; exact on every tested config —
  tests/test_speculative.py asserts token-for-token equality).
* **Sampling** (``do_sample=True``): standard speculative-sampling
  rejection against a point-mass draft distribution — draft token x at
  position i is accepted with probability p_i(x) under the SAME
  temperature/top-p-filtered distribution `engine.sample_token` uses;
  the first rejection resamples from the residual p_i with x removed,
  and full acceptance earns a free bonus sample from p_D.  The emitted
  sequence is distributed EXACTLY as sequential sampling
  (`_spec_sample_round`; distribution test in tests/test_speculative.py).

Rounds run fused on device (`lax.scan`, mirroring Engine.steps_per_call)
so the ~25 ms dispatch amortizes; the host slices each round's accepted
tokens off a fixed (R, D+1) buffer.

The reference's equivalent loop is the manual one-token-at-a-time decode
in `valley/serve/model_worker.py:371-423`; speculation has no reference
counterpart (beyond-parity).
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from valley_tpu.inference.engine import (ChatSession, Engine,
                                         GenerationConfig, filter_logits)
from valley_tpu.models import llama

# guards the per-engine shared jit/telemetry records (decoders are
# constructed and counted from concurrent serve request threads)
_SHARED_LOCK = threading.Lock()


def ngram_draft(hist: jnp.ndarray, hist_len, draft_len: int,
                ngram: int = 2) -> jnp.ndarray:
    """Longest-match-first n-gram lookup over the token history.

    hist: (Hmax,) int32; returns (draft_len,) proposed continuation
    (garbage when no match — verification rejects it, costing
    nothing: every round still emits >= 1 correct token).

    Match lengths ``ngram .. 2`` are tried deepest-first (a longer
    matched context predicts the continuation better — standard
    prompt-lookup practice); within a length, the LATEST occurrence
    wins."""
    hmax = hist.shape[0]
    idx = jnp.arange(hmax)
    start = jnp.int32(0)
    found = jnp.bool_(False)
    for g in range(max(2, ngram), 1, -1):
        # ok[i] marks a match of hist[i : i+g] against the last g tokens
        ok = jnp.ones((hmax,), bool)
        for j in range(g):
            tail = jax.lax.dynamic_index_in_dim(
                hist, hist_len - g + j, keepdims=False)
            ok = jnp.logical_and(ok, jnp.roll(hist, -j) == tail)
        # candidate start must leave room and precede the tail itself
        ok = jnp.logical_and(ok, idx + g <= hist_len - g)
        j_star = jnp.argmax(jnp.where(ok, idx, -1))   # latest match
        has = jnp.any(ok)
        start = jnp.where(jnp.logical_and(has, ~found), j_star + g,
                          start)
        found = jnp.logical_or(found, has)
    return jax.lax.dynamic_slice(hist, (start,), (draft_len,))


def _spec_sample_round(probs: jnp.ndarray, draft: jnp.ndarray,
                       key: jax.Array):
    """One speculative-sampling rejection round against a point-mass
    draft.  probs: (D+1, V) target distributions (position i conditions
    on draft[:i] accepted); draft: (D,) proposals.  Returns
    (emit: (D+1,), m) — ``emit[:m+1]`` are this round's tokens: the m
    accepted drafts plus one correction (residual resample at the first
    rejection, or a free bonus sample from probs[D] on full acceptance).

    With a point-mass proposal q = delta(draft_i), the standard
    accept-with-min(1, p/q) rule reduces to accept w.p. p_i(draft_i) and
    the residual max(0, p - q)/Z reduces to p_i with draft_i zeroed —
    so the emitted sequence is distributed exactly as sequential
    sampling from probs (Leviathan et al. 2023 / Chen et al. 2023
    correctness argument, unchanged)."""
    d = draft.shape[0]
    v = probs.shape[1]
    ku, kc = jax.random.split(key)
    u = jax.random.uniform(ku, (d,))
    p_draft = jnp.take_along_axis(probs[:d], draft[:, None], axis=1)[:, 0]
    accept = jnp.cumprod((u < p_draft).astype(jnp.int32))
    m = jnp.sum(accept)                       # accepted draft tokens
    p_m = jax.lax.dynamic_index_in_dim(probs, m, keepdims=False)   # (V,)
    draft_at_m = jax.lax.dynamic_index_in_dim(
        jnp.concatenate([draft, jnp.full((1,), -1, draft.dtype)]), m,
        keepdims=False)
    # residual zeroes the rejected draft token; on full acceptance
    # (m == d) draft_at_m is -1 so nothing is zeroed
    p_corr = jnp.where(jnp.arange(v) == draft_at_m, 0.0, p_m)
    corr = jax.random.categorical(
        kc, jnp.where(p_corr > 0, jnp.log(p_corr), -1e9)).astype(
        draft.dtype)
    emit = jnp.where(jnp.arange(d + 1) < m,
                     jnp.concatenate([draft, jnp.zeros((1,), draft.dtype)]),
                     corr)
    return emit, m


@dataclasses.dataclass
class SpecConfig:
    """Defaults tuned from measured acceptance on real text
    (tools/exp_accept.py replay, ROUND_NOTES round 3): ngram=4 / D=8 is
    the best worst-case config — extractive replies accept ~6.1
    drafts/round (257 tok/s projected at 7B), qa-mix ~1.7 (97), 2nd-turn
    ~1.9 (105), fully-novel text ~0.30 (47 — i.e. ~10% BELOW plain
    decode; disable speculation for workloads that never quote their
    context)."""

    draft_len: int = 8        # drafted tokens per round (D)
    ngram: int = 4            # MAX match length (tried deepest-first)
    rounds_per_call: int = 16  # fused rounds per device call

    # Acceptance-adaptive control: each reply starts with one short
    # ``probe_rounds`` call; afterwards, whenever the reply's cumulative
    # acceptance drops below the disable threshold the decoder falls
    # back to plain fused decode for the REST of the reply (greedy
    # output is token-identical either way; sampling is
    # distribution-exact either way, so switching is free).  Worst-case
    # novel-text overhead drops from ~10% to the probe cost (~2% of a
    # 96-token reply).  Sessions re-probe each turn (conversation
    # acceptance patterns change turn to turn).
    #
    # The break-even acceptance is HOW MUCH a verification round costs
    # relative to a plain decode step, and that ratio depends on the
    # weight mode (tools/exp_spec_7b.py, D=8 full-accept rounds): int8/
    # bf16 GEMVs widen to D+1 rows nearly free (round ~1.44x a step ->
    # break-even ~0.44 accepted/round), but 4-bit decode modes pay the
    # grouped-einsum path for the widened verification GEMMs (b*g >=
    # one MXU tile, llama._proj) — measured round 5 at D=8: rounds
    # cost 2.82x / 2.94x / 2.95x a plain step (7B int4g / 7B int4gp /
    # 13B int4gp), break-even 1.82-1.95 accepted/round.
    # ``disable_below=None`` (default) resolves per engine at READ
    # time via `resolved_disable_below` (read-time so warmup's
    # temporary mutation keeps working): 0.40 for int8/bf16 engines,
    # 1.70 for decode_w4/w4_packed engines.  Pass an explicit float to
    # override.
    adaptive: bool = True
    disable_below: Optional[float] = None  # accepted drafts/round
    probe_rounds: int = 4         # first-call round count per reply
    reprobe_chunks: int = 32      # pool: plain chunks between re-probes


# measured break-evens minus ~10% margin (biased to keep speculation on:
# acceptance estimates over a few rounds are noisy) — ROUND_NOTES round
# 4 (int8: 0.44 -> 0.40) and round 5 (4-bit: 1.82-1.95 at D=8 -> 1.70)
DISABLE_BELOW_DEFAULT = 0.40
DISABLE_BELOW_W4 = 1.70


def resolved_disable_below(spec: "SpecConfig", engine) -> float:
    """The adaptive disable threshold for this engine's weight mode
    (see SpecConfig.disable_below).  Called at every acceptance check,
    not cached at decoder init — worker warmup temporarily mutates
    ``spec.disable_below`` to force the plain-fallback executable to
    compile, and a cached value would ignore that."""
    if spec.disable_below is not None:
        return spec.disable_below
    if getattr(engine, "w4_packed", False) or \
            getattr(engine, "decode_w4", False):
        return DISABLE_BELOW_W4
    return DISABLE_BELOW_DEFAULT


class SpecDecoder:
    """Wraps an Engine with speculative generation (B=1; greedy is
    token-identical to plain decode, sampling is distribution-exact —
    see the module docstring).  Composes with int8/int4 weights, int8
    KV caches and tensor-parallel engines (tests)."""

    def __init__(self, engine: Engine, spec: Optional[SpecConfig] = None):
        self.engine = engine
        self.spec = spec or SpecConfig()
        # Share ONE jitted rounds executable and ONE telemetry record
        # across every SpecDecoder on the same engine+config: sessions
        # and prefix-cache spawns create a decoder per reply, and a
        # per-instance jax.jit would re-trace (and re-compile, tens of
        # seconds at 7B) on every request; shared counters also make
        # session/prefix speculative traffic visible in the worker's
        # /worker_get_status stats.
        with _SHARED_LOCK:   # concurrent spawns race the first build
            shared = engine.__dict__.setdefault("_spec_shared", {})
            key = (self.spec.draft_len, self.spec.ngram)
            st = shared.get(key)
            if st is None:
                st = shared[key] = {
                    "rounds": 0, "emitted": 0, "disabled": 0,
                    "jit": jax.jit(
                        self._rounds_impl,
                        static_argnames=("n_rounds", "do_sample"),
                        donate_argnames=("cache", "valid", "hist")),
                }
            st.setdefault("disabled", 0)   # records from older configs
        self._shared = st
        self._rounds = st["jit"]

    def _count(self, rounds: int = 0, emitted: int = 0,
               disabled: int = 0) -> None:
        """Lock-protected telemetry increment (request threads race the
        read-modify-write otherwise)."""
        with _SHARED_LOCK:
            self._shared["rounds"] += rounds
            self._shared["emitted"] += emitted
            self._shared["disabled"] += disabled

    # monotonic acceptance telemetry (across all decoders on this
    # engine+config): emitted = accepted drafts + 1 correction per
    # round, so accepted/round = emitted/rounds - 1.
    @property
    def total_rounds(self) -> int:
        return self._shared["rounds"]

    @total_rounds.setter
    def total_rounds(self, v: int) -> None:
        self._shared["rounds"] = v

    @property
    def total_emitted(self) -> int:
        return self._shared["emitted"]

    @total_emitted.setter
    def total_emitted(self, v: int) -> None:
        self._shared["emitted"] = v

    # -- device side -------------------------------------------------------

    def _draft(self, hist, hist_len, draft_len: int):
        return ngram_draft(hist, hist_len, draft_len, self.spec.ngram)

    def _rounds_impl(self, params, cache, valid, hist, hist_len, tok,
                     seq, slot, key, temperature, top_p, *,
                     n_rounds: int, do_sample: bool = False):
        eng = self.engine
        cfg = eng.cfg
        d_len = self.spec.draft_len
        if getattr(eng, "w4_packed", False):
            from valley_tpu.ops.quant import unpack_int4_view

            params = unpack_int4_view(params)
        elif getattr(eng, "decode_w4", False):
            from valley_tpu.ops.quant import int4_decode_view

            params = int4_decode_view(params)

        def round_(carry, _):
            cache, valid, hist, hist_len, tok, seq, slot, key = carry
            draft = self._draft(hist, hist_len, d_len)
            chunk = jnp.concatenate([tok, draft])[None]        # (1, D+1)
            positions = (seq + jnp.arange(d_len + 1))[None]
            embeds = llama.embed(params["llama"], chunk)
            hidden, cache = llama.forward_hidden(
                params["llama"], cfg.text, embeds, positions=positions,
                cache=cache, cache_index=slot, cross_valid=valid,
                use_flash=False)
            logits = llama.logits_from_hidden(params["llama"], hidden)
            if do_sample:
                key, sub = jax.random.split(key)
                probs = jax.nn.softmax(
                    filter_logits(logits[0].astype(jnp.float32),
                                  temperature, top_p), axis=-1)
                emit, m = _spec_sample_round(
                    probs, draft.astype(jnp.int32), sub)
            else:
                emit = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
                # accepted = longest prefix where draft[i] == argmax[i]
                agree = jnp.cumprod(
                    (draft == emit[:d_len]).astype(jnp.int32))
                m = jnp.sum(agree)               # accepted draft tokens
            n_emit = m + 1                       # plus the correction
            # KV kept for the inputs that are confirmed conversation
            # tokens: tok itself + the m accepted draft tokens
            slots = jnp.arange(valid.shape[1])[None, :]
            valid = jnp.logical_or(
                valid, jnp.logical_and(slots >= slot,
                                       slots < slot + 1 + m))
            hist = jax.lax.dynamic_update_slice(hist, emit, (hist_len,))
            hist_len = hist_len + n_emit
            tok = jax.lax.dynamic_index_in_dim(emit, m, keepdims=False)
            carry = (cache, valid, hist, hist_len, tok[None],
                     seq + n_emit, slot + 1 + m, key)
            return carry, (emit, n_emit)

        (cache, valid, hist, hist_len, tok, seq, slot, _), \
            (toks, counts) = jax.lax.scan(
                round_, (cache, valid, hist, hist_len, tok, seq, slot,
                         key),
                None, length=n_rounds)
        return cache, valid, hist, hist_len, tok, seq, slot, toks, counts

    # -- host side -----------------------------------------------------

    def generate_tokens(self, input_ids: Sequence[int],
                        images: Optional[np.ndarray] = None,
                        gen: Optional[GenerationConfig] = None,
                        eos_ids: Sequence[int] = (2,),
                        ) -> Iterator[int]:
        """Yield generated token ids one by one.  Greedy output is
        token-identical to Engine.generate_tokens with do_sample=False;
        sampled output follows the exact sample_token distribution (the
        draws differ from Engine's — speculation consumes randomness per
        accepted prefix, not per token)."""
        eng, spec = self.engine, self.spec
        gen = gen or GenerationConfig()
        # worker rule: temperature < 1e-4 means greedy even when sampling
        # is requested (engine.sample_token:49-51)
        do_sample = bool(gen.do_sample) and gen.temperature >= 1e-4
        prompt = list(input_ids)
        bucket = eng.pick_bucket(len(prompt))
        key = jax.random.key(gen.seed)
        images, frame_mask, has_images = eng._prepare_images(images, 1)
        ids = np.zeros((1, bucket), np.int32)
        ids[0, :len(prompt)] = prompt
        max_new = min(gen.max_new_tokens, eng.max_new_tokens)
        cache_len = bucket + max_new + spec.rounds_per_call * \
            (spec.draft_len + 1)
        key, sub = jax.random.split(key)
        tok, _logits, cache, valid = eng._prefill(
            eng.params, jnp.asarray(ids), images,
            jnp.asarray([len(prompt)], np.int32), sub, gen.temperature,
            gen.top_p, frame_mask, bucket=bucket, cache_len=cache_len,
            do_sample=do_sample, has_images=has_images)

        hmax = bucket + cache_len
        hist = np.zeros((hmax,), np.int32)
        hist[:len(prompt)] = prompt
        hist = jnp.asarray(hist)
        hist_len = jnp.int32(len(prompt))
        seq = jnp.int32(len(prompt))
        slot = jnp.int32(bucket)

        first = int(np.asarray(tok)[0])
        yield first
        emitted = 1
        hist = jax.lax.dynamic_update_slice(
            hist, jnp.asarray([first], jnp.int32), (hist_len,))
        hist_len = hist_len + 1
        eos = set(int(e) for e in eos_ids)
        if first in eos or emitted >= max_new:
            return
        tok_dev = tok

        spec_on = True
        tot_rounds = tot_accept = 0
        while emitted < max_new:
            if not spec_on:
                # acceptance fell below break-even: plain fused decode
                # for the rest of the reply (greedy token-identical,
                # sampling distribution-exact — switching is free).
                # Always the steady steps_per_call class (ONE executable;
                # surplus steps past max_new are discarded) — the spec
                # cache's rounds*(D+1) slack covers the overshoot, except
                # on deliberately tiny test configs where it clamps.
                n_steps = max(1, min(eng.steps_per_call,
                                     cache_len - slot_h))
                key, sub = jax.random.split(key)
                toks, cache, valid, seq_arr = eng._decode(
                    eng.params, cache, valid, tok_dev, jnp.int32(slot_h),
                    seq_arr, sub, gen.temperature, gen.top_p,
                    do_sample=do_sample, n_steps=n_steps)
                slot_h += n_steps
                tok_dev = toks[-1]
                for t in np.asarray(toks)[:, 0]:
                    yield int(t)
                    emitted += 1
                    if int(t) in eos or emitted >= max_new:
                        return
                continue
            # fixed {probe, steady} round classes — ``n_rounds`` is a
            # static executable arg, so remainder-sized calls would each
            # compile a one-off executable mid-traffic; instead the
            # final call may overshoot (cache/hist slack covers a full
            # call) and surplus emissions simply aren't yielded
            n_rounds = min(spec.probe_rounds, spec.rounds_per_call) \
                if tot_rounds == 0 else spec.rounds_per_call
            key, sub = jax.random.split(key)
            cache, valid, hist, hist_len, tok_dev, seq, slot, toks, \
                counts = self._rounds(
                    eng.params, cache, valid, hist, hist_len, tok_dev,
                    seq, slot, sub, gen.temperature, gen.top_p,
                    n_rounds=n_rounds, do_sample=do_sample)
            toks_np = np.asarray(toks)          # (R, D+1)
            counts_np = np.asarray(counts)      # (R,)
            for r in range(toks_np.shape[0]):
                self._count(rounds=1, emitted=int(counts_np[r]))
                tot_rounds += 1
                tot_accept += int(counts_np[r]) - 1
                for t in toks_np[r, :counts_np[r]]:
                    yield int(t)
                    emitted += 1
                    if int(t) in eos or emitted >= max_new:
                        return
            if spec.adaptive and \
                    tot_accept / max(1, tot_rounds) \
                    < resolved_disable_below(spec, eng):
                spec_on = False
                self._count(disabled=1)
                slot_h = int(np.asarray(slot))
                seq_arr = jnp.reshape(seq, (1,))


    def generate(self, tokenizer, input_ids: Sequence[int],
                 images: Optional[np.ndarray] = None,
                 gen: Optional[GenerationConfig] = None):
        """Streaming text chunks — SpecDecoder drop-in for
        Engine.generate (same stream_interval/keyword-stop behavior)."""
        from valley_tpu.inference.engine import stream_text

        gen = gen or GenerationConfig()
        eos = [getattr(tokenizer, "eos_token_id", 2) or 2]
        yield from stream_text(
            self.generate_tokens(list(input_ids), images, gen,
                                 eos_ids=eos),
            tokenizer, gen)


class SpecChatSession(ChatSession):
    """ChatSession whose decode loop runs self-speculative rounds
    (B=1).  Multi-turn chat is where prompt-lookup drafting shines:
    the draft table is the WHOLE conversation so far, and assistant
    replies tend to reuse earlier phrasing.  Greedy mode is
    token-identical to a plain ChatSession with do_sample=False
    (tests/test_speculative.py); sampling mode follows the exact
    sample_token distribution via speculative-sampling rejection.
    The KV-commit/trim bookkeeping is unchanged because speculative
    rounds write accepted tokens at the same contiguous slots the
    plain loop would.
    """

    def __init__(self, engine: Engine,
                 gen: Optional[GenerationConfig] = None,
                 extra_slots: Optional[int] = None,
                 spec: Optional[SpecConfig] = None):
        gen = gen or GenerationConfig(do_sample=False)
        super().__init__(engine, gen, extra_slots)
        self._decoder = SpecDecoder(engine, spec)
        self._hist: list = []   # full conversation ids (lookup table)
        # Rounds write (draft_len+1)-wide KV windows and the final call
        # may run up to rounds_per_call rounds past the kept tokens, so
        # the session must keep this many slots free beyond max_new
        # (mirrors SpecDecoder's stateless cache_len slack).  chat()'s
        # capacity check + compaction use it via the base class.
        sp = self._decoder.spec
        self._decode_slack = (sp.rounds_per_call + 1) * (sp.draft_len + 1)

    def chat(self, new_ids, images=None, tokenizer=None, eos_ids=(2,),
             on_token=None) -> list:
        base = len(self._hist)
        self._hist.extend(int(t) for t in new_ids)
        tokens = super().chat(new_ids, images=images, tokenizer=tokenizer,
                              eos_ids=eos_ids, on_token=on_token)
        # history keeps only kept reply tokens (post-stop emissions from
        # the fused rounds would poison later lookups)
        del self._hist[base + len(new_ids):]
        self._hist.extend(tokens)
        return tokens

    def _decode_loop(self, cache, valid, tok, seq_host: int, slot: int,
                     max_new: int, eos_arr, tokenizer, on_token):
        eng, gen = self.engine, self.gen
        spec = self._decoder.spec
        tokens: list = []
        t0 = int(np.asarray(tok)[0])
        tokens.append(t0)
        if on_token:
            on_token(t0)
        stopped = t0 in eos_arr

        # device-side lookup history: conversation so far + this reply.
        # pow2-padded so the jitted rounds recompile only on log growth;
        # slack covers device-side emission overshoot (the final call
        # runs its full round count even after max_new kept tokens).
        n0 = len(self._hist)
        d1 = spec.draft_len + 1
        need = n0 + 1 + max_new + (spec.rounds_per_call + 1) * d1
        hmax = 1 << max(8, (need - 1).bit_length())
        hist = np.zeros((hmax,), np.int32)
        hist[:n0] = self._hist
        hist[n0] = t0
        hist_dev = jnp.asarray(hist)
        hist_len = jnp.int32(n0 + 1)
        tok_dev = tok
        seq = jnp.int32(seq_host)
        slot_dev = jnp.int32(slot)
        do_sample = bool(gen.do_sample) and gen.temperature >= 1e-4
        tot_rounds = tot_accept = 0
        while len(tokens) < max_new and not stopped:
            # {probe, steady} round classes per turn (n_rounds is a
            # static executable arg — remainder-sized calls would
            # compile one-off executables; the slack sized above covers
            # a full overshooting final call)
            n_rounds = min(spec.probe_rounds, spec.rounds_per_call) \
                if tot_rounds == 0 else spec.rounds_per_call
            self._key, sub = jax.random.split(self._key)
            (cache, valid, hist_dev, hist_len, tok_dev, seq, slot_dev,
             toks, counts) = self._decoder._rounds(
                eng.params, cache, valid, hist_dev, hist_len, tok_dev,
                seq, slot_dev, sub, gen.temperature, gen.top_p,
                n_rounds=n_rounds, do_sample=do_sample)
            toks_np = np.asarray(toks)
            counts_np = np.asarray(counts)
            for r in range(toks_np.shape[0]):
                self._decoder._count(rounds=1,
                                     emitted=int(counts_np[r]))
                tot_rounds += 1
                tot_accept += int(counts_np[r]) - 1
                for t in toks_np[r, :counts_np[r]]:
                    tokens.append(int(t))
                    if on_token:
                        on_token(int(t))
                    if int(t) in eos_arr:
                        stopped = True
                        break
                if stopped or len(tokens) >= max_new:
                    del tokens[max_new:]
                    break
            if spec.adaptive and not stopped and len(tokens) < max_new \
                    and tot_accept / max(1, tot_rounds) \
                    < resolved_disable_below(spec, self.engine):
                # this turn's acceptance is below break-even: finish the
                # turn with the base class's plain fused decode (token-
                # identical greedy / distribution-exact sampled).  The
                # base loop treats its ``tok`` as the first emitted
                # token, so hand it the pending token and splice: its
                # tokens[0] duplicates our tokens[-1] (skip re-streaming
                # it), and KV-slot contiguity is preserved because the
                # pending token's slot is written when fed back either
                # way.
                self._decoder._count(disabled=1)
                skip_first = [True]

                def tail_cb(t):
                    if skip_first[0]:
                        skip_first[0] = False
                    elif on_token:
                        on_token(t)

                sub_toks, cache, valid, end_slot = \
                    ChatSession._decode_loop(
                        self, cache, valid, tok_dev,
                        int(np.asarray(seq)), int(np.asarray(slot_dev)),
                        max_new - len(tokens) + 1, eos_arr, tokenizer,
                        tail_cb)
                return (tokens[:-1] + sub_toks, cache, valid, end_slot)
            if not stopped and tokenizer is not None and gen.stop:
                # windowed: decode this call's emissions plus a straddle
                # overlap, not the whole reply (see engine.find_stop_index)
                from valley_tpu.inference.engine import _STOP_WINDOW
                span = n_rounds * d1 + _STOP_WINDOW
                text = tokenizer.decode(tokens[-span:],
                                        skip_special_tokens=True)
                if any(s in text for s in gen.stop):
                    stopped = True
        return tokens, cache, valid, int(np.asarray(slot_dev))
