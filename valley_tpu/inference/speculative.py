"""Self-speculative decoding: n-gram lookup drafts + fused verification.

Single-stream decode is HBM-bandwidth-bound — every token streams all
13+ GB of decoder weights (ROUND_NOTES.md speed-of-light analysis), so
the only way PAST the one-token roofline is to verify several tokens per
weight pass.  This decoder drafts D tokens by matching the last two
generated tokens against the prompt+history (prompt-lookup decoding — no
draft model, no extra weights) and verifies the draft with ONE (D+1)-wide
forward through the cache: the weight traffic of a single decode step,
amortized over every accepted token.  Output is PROVABLY identical to
greedy decode — a draft token survives only if it equals the model's own
argmax at its position, and the first disagreement is replaced by that
argmax (tests/test_speculative.py asserts token-for-token equality).

Rounds run fused on device (`lax.scan`, mirroring Engine.steps_per_call)
so the ~25 ms dispatch amortizes; the host slices each round's accepted
tokens off a fixed (R, D+1) buffer.

The reference's equivalent loop is the manual one-token-at-a-time decode
in `valley/serve/model_worker.py:371-423`; speculation has no reference
counterpart (beyond-parity, greedy only).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from valley_tpu.inference.engine import Engine, GenerationConfig
from valley_tpu.models import llama


@dataclasses.dataclass
class SpecConfig:
    draft_len: int = 8        # drafted tokens per round (D)
    ngram: int = 2            # match length for the history lookup
    rounds_per_call: int = 16  # fused rounds per device call


class SpecDecoder:
    """Wraps an Engine with speculative generation (B=1, greedy)."""

    def __init__(self, engine: Engine, spec: Optional[SpecConfig] = None):
        self.engine = engine
        self.spec = spec or SpecConfig()
        self._rounds = jax.jit(
            self._rounds_impl,
            static_argnames=("n_rounds",),
            donate_argnames=("cache", "valid", "hist"))

    # -- device side -------------------------------------------------------

    def _draft(self, hist, hist_len, draft_len: int):
        """Latest-match n-gram lookup over the token history.

        hist: (Hmax,) int32; returns (draft_len,) proposed continuation
        (garbage when no match — verification rejects it, costing
        nothing: every round still emits >= 1 correct token)."""
        g = self.spec.ngram
        hmax = hist.shape[0]
        idx = jnp.arange(hmax)
        # gram[i] marks a match of hist[i : i+g] against the last g tokens
        ok = jnp.ones((hmax,), bool)
        for j in range(g):
            tail = jax.lax.dynamic_index_in_dim(
                hist, hist_len - g + j, keepdims=False)
            ok = jnp.logical_and(
                ok, jnp.roll(hist, -j) == tail)
        # candidate start must leave room and precede the tail itself
        ok = jnp.logical_and(ok, idx + g <= hist_len - g)
        j_star = jnp.argmax(jnp.where(ok, idx, -1))       # latest match
        has = jnp.any(ok)
        start = jnp.where(has, j_star + g, 0)
        return jax.lax.dynamic_slice(hist, (start,), (draft_len,))

    def _rounds_impl(self, params, cache, valid, hist, hist_len, tok,
                     seq, slot, *, n_rounds: int):
        eng = self.engine
        cfg = eng.cfg
        d_len = self.spec.draft_len

        def round_(carry, _):
            cache, valid, hist, hist_len, tok, seq, slot = carry
            draft = self._draft(hist, hist_len, d_len)
            chunk = jnp.concatenate([tok, draft])[None]        # (1, D+1)
            positions = (seq + jnp.arange(d_len + 1))[None]
            embeds = llama.embed(params["llama"], chunk)
            hidden, cache = llama.forward_hidden(
                params["llama"], cfg.text, embeds, positions=positions,
                cache=cache, cache_index=slot, cross_valid=valid,
                use_flash=False)
            logits = llama.logits_from_hidden(params["llama"], hidden)
            preds = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
            # accepted = longest prefix where draft[i] == preds[i]
            agree = jnp.cumprod(
                (draft == preds[:d_len]).astype(jnp.int32))
            m = jnp.sum(agree)                   # accepted draft tokens
            n_emit = m + 1                       # plus the correction
            # KV kept for the inputs that are confirmed conversation
            # tokens: tok itself + the m accepted draft tokens
            slots = jnp.arange(valid.shape[1])[None, :]
            valid = jnp.logical_or(
                valid, jnp.logical_and(slots >= slot,
                                       slots < slot + 1 + m))
            hist = jax.lax.dynamic_update_slice(hist, preds, (hist_len,))
            hist_len = hist_len + n_emit
            tok = jax.lax.dynamic_index_in_dim(preds, m, keepdims=False)
            carry = (cache, valid, hist, hist_len, tok[None],
                     seq + n_emit, slot + 1 + m)
            return carry, (preds, n_emit)

        (cache, valid, hist, hist_len, tok, seq, slot), \
            (toks, counts) = jax.lax.scan(
                round_, (cache, valid, hist, hist_len, tok, seq, slot),
                None, length=n_rounds)
        return cache, valid, hist, hist_len, tok, seq, slot, toks, counts

    # -- host side -----------------------------------------------------

    def generate_tokens(self, input_ids: Sequence[int],
                        images: Optional[np.ndarray] = None,
                        gen: Optional[GenerationConfig] = None,
                        eos_ids: Sequence[int] = (2,),
                        ) -> Iterator[int]:
        """Yield generated token ids one by one (greedy; identical to
        Engine.generate_tokens with do_sample=False)."""
        eng, spec = self.engine, self.spec
        gen = gen or GenerationConfig()
        if gen.do_sample:
            raise ValueError("speculative decoding is greedy-only")
        prompt = list(input_ids)
        bucket = eng.pick_bucket(len(prompt))
        key = jax.random.key(gen.seed)
        has_images = images is not None
        if has_images:
            images = jnp.asarray(np.asarray(images, np.float32).astype(
                jnp.bfloat16))
        else:
            v = eng.cfg.vision
            images = jnp.zeros((1, 1, 3, v.image_size, v.image_size),
                               jnp.bfloat16)
        ids = np.zeros((1, bucket), np.int32)
        ids[0, :len(prompt)] = prompt
        max_new = min(gen.max_new_tokens, eng.max_new_tokens)
        cache_len = bucket + max_new + spec.rounds_per_call * \
            (spec.draft_len + 1)
        tok, _logits, cache, valid = eng._prefill(
            eng.params, jnp.asarray(ids), images,
            jnp.asarray([len(prompt)], np.int32), key, 1.0, 1.0,
            bucket=bucket, cache_len=cache_len, do_sample=False,
            has_images=has_images)

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

        while emitted < max_new:
            # worst case one token per round
            n_rounds = min(spec.rounds_per_call, max_new - emitted)
            cache, valid, hist, hist_len, tok_dev, seq, slot, toks, \
                counts = self._rounds(
                    eng.params, cache, valid, hist, hist_len, tok_dev,
                    seq, slot, n_rounds=n_rounds)
            toks_np = np.asarray(toks)          # (R, D+1)
            counts_np = np.asarray(counts)      # (R,)
            for r in range(toks_np.shape[0]):
                for t in toks_np[r, :counts_np[r]]:
                    yield int(t)
                    emitted += 1
                    if int(t) in eos or emitted >= max_new:
                        return
