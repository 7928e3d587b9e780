"""Jit-compiled streaming inference engine.

Replaces the reference's manual token-by-token decode loops with explicit
`past_key_values` (`valley/serve/model_worker.py:243-295,371-423`,
`valley/serve/cli.py:14-72`) with a TPU-native engine:

* **static shapes everywhere** — prompts are right-padded into a small set
  of length buckets; the KV cache is a fixed (bucket + max_new) buffer, so
  each (bucket, frames) pair compiles exactly once and every later request
  reuses the compiled executable;
* prefill computes vision features + splice + full-sequence attention in
  one jit; decode is a single-token jit with on-device sampling
  (temperature / top-p / greedy) so only one int32 crosses the host
  boundary per generated token;
* keyword stopping ('###') and incremental detokenization run host-side,
  exactly mirroring `KeywordsStoppingCriteria` (`data_util.py:40-56`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from valley_tpu.config import ValleyConfig
from valley_tpu.models import llama, valley
from valley_tpu.models.llama import KVCache


@dataclasses.dataclass
class GenerationConfig:
    max_new_tokens: int = 1024
    temperature: float = 1.0
    top_p: float = 1.0
    do_sample: bool = False
    stop: Sequence[str] = ("###",)
    seed: int = 0
    stream_interval: int = 2


def filter_logits(logits: jnp.ndarray, temperature, top_p) -> jnp.ndarray:
    """Temperature-scale + nucleus-filter logits ((..., V) -> same shape).
    ``softmax(filter_logits(l, t, p))`` IS the sampling distribution of
    ``sample_token`` — the speculative sampler relies on that equivalence
    to accept drafts against the exact same distribution."""
    temperature = jnp.asarray(temperature, jnp.float32)
    top_p = jnp.asarray(top_p, jnp.float32)
    t_col = temperature[..., None] if temperature.ndim else temperature
    p_col = top_p[..., None] if top_p.ndim else top_p
    scaled = logits / jnp.maximum(t_col, 1e-4)
    sorted_logits = jnp.sort(scaled, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # Keep tokens whose exclusive cumulative prob is < top_p (top_p >= 1
    # keeps everything).
    cutoff_idx = jnp.sum(cum - probs < p_col, axis=-1) - 1
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[..., None],
                                 axis=-1)
    return jnp.where(scaled < cutoff, -1e9, scaled)


def sample_token(logits: jnp.ndarray, key: jax.Array, temperature,
                 top_p, do_sample: bool) -> jnp.ndarray:
    """On-device sampling: greedy / temperature / nucleus.  logits: (B, V).

    Mirrors the worker's `temperature < 1e-4 -> argmax` rule
    (`model_worker.py:261-266`) plus standard top-p.  ``temperature`` /
    ``top_p`` may be scalars or per-row (B,) arrays (dynamic batching of
    requests with different sampling settings).
    """
    greedy = jnp.argmax(logits, axis=-1)
    if not do_sample:
        return greedy
    # temperature/top_p stay traced so one executable serves every request
    # (no recompile when the user moves the UI sliders).
    temperature = jnp.asarray(temperature, jnp.float32)
    filtered = filter_logits(logits, temperature, top_p)
    sampled = jax.random.categorical(key, filtered, axis=-1)
    return jnp.where(temperature < 1e-4, greedy, sampled)


def _check_int4_range(params) -> None:
    """Validate int8-stored weights actually hold int4-range values before
    enabling ``decode_w4``: nothing in the tree records the quantization
    bit width, and `ops.quant.int4_decode_view` casts on dtype alone — a
    bits=8 tree (values in [-127, 127]) would silently truncate to
    garbage.  One host-side max-reduction per tensor at engine
    construction; exact criterion (the int4 cast is lossless iff every
    value is in [-7, 7])."""
    from valley_tpu.ops.quant import QUANT_TARGETS

    llama_p = params.get("llama", {})
    tensors = {n: llama_p["layers"][n] for n in QUANT_TARGETS
               if n in llama_p.get("layers", {})}
    if llama_p.get("lm_head") is not None:
        tensors["lm_head"] = llama_p["lm_head"]
    bad = [n for n, w in tensors.items()
           if w.dtype == jnp.int8 and int(jnp.max(jnp.abs(w))) > 7]
    if bad:
        raise ValueError(
            f"decode_w4=True but {bad} hold values outside [-7, 7] — "
            "these were quantized with bits=8, not bits=4; the int4 "
            "decode view would silently truncate them. Re-quantize with "
            "quantize_llama_params(bits=4).")


class Engine:
    """Holds params on device and the per-bucket compiled step functions."""

    def __init__(self, cfg: ValleyConfig, params,
                 buckets: Sequence[int] = (128, 256, 512, 1024, 2048),
                 max_new_tokens: int = 1024,
                 cache_dtype=jnp.bfloat16,
                 use_flash: Optional[bool] = None,
                 steps_per_call: int = 4,
                 decode_ramp: Sequence[int] = (),
                 mesh=None,
                 decode_unroll: int = 1,
                 decode_kernel: Optional[bool] = None,
                 frame_buckets: Optional[Sequence[int]] = None,
                 decode_w4: bool = False,
                 raw_media: bool = False,
                 w4_packed: bool = False):
        self.cfg = cfg
        # Serving media dtype: True = requests carry RAW uint8 frames
        # (device-side CLIP normalization, half the H2D bytes — see
        # _prepare_images).  Only warmup consults this (it must compile
        # the executable class real traffic will hit); the serving path
        # itself dispatches on the actual array dtype.
        self.raw_media = raw_media
        self.mesh = mesh
        # Frame-count bucketing: pad the media frame axis up to the
        # smallest bucket that fits and pass a frame mask through the
        # (mask-aware) temporal pooling, so requests with different
        # image/frame counts share one prefill executable per bucket
        # instead of compiling per shape.  None = exact shapes (default).
        self.frame_buckets = tuple(sorted(frame_buckets)) \
            if frame_buckets else None
        if mesh is not None:
            # Multi-chip serving: params shard per the (data, fsdp, model)
            # rules (TP for latency, fsdp for fitting 13B across chips);
            # the reference's equivalent is `device_map="auto"` layer
            # spreading (`model_worker.py:55-58`) — here XLA emits the
            # collectives instead.
            from valley_tpu.parallel.sharding import shard_params

            params = shard_params(mesh, params)
        self.params = params
        self.buckets = tuple(sorted(buckets))
        self.max_new_tokens = max_new_tokens
        self.cache_dtype = cache_dtype
        # Fused decode: run K steps per jit call (lax.scan) so host->device
        # dispatch latency amortizes; K tokens return per call.  Keyword/EOS
        # stopping happens every K tokens (the reference streams every 2
        # anyway, `model_worker.py:496`).
        self.steps_per_call = max(1, steps_per_call)
        # Ramped fused-decode schedule: the first calls of a reply run
        # fewer steps (e.g. (2, 6)), later calls the full steps_per_call.
        # A large steps_per_call amortizes dispatch for high steady-state
        # throughput, but the first stream chunk can only be emitted once
        # the first fused call returns — at steps_per_call=32 that is
        # ~330 ms of decode on top of prefill (measured round 3,
        # tools/e2e_serve_7b.py).  The ramp bounds first-chunk latency to
        # a few steps while keeping the steady-state amortization; greedy
        # output is chunk-boundary-invariant (the scan body is per-token),
        # sampled output draws per-call RNG keys so boundaries shift the
        # sample stream (same distribution).
        self.decode_ramp = tuple(int(s) for s in decode_ramp if int(s) > 0)
        # Warm fused-call sizes: every distinct n_steps is its own XLA
        # executable, so decode loops only ever dispatch these sizes
        # (short tails pad up via _tail_steps and discard the surplus).
        self._sched_sizes = tuple(
            sorted(set(self.decode_ramp) | {self.steps_per_call}))
        # Layer-scan unroll factor for the single-stream decode step
        # (numerically identical; measured SLOWER on v5e — see
        # llama.forward_hidden — so the default stays 1).
        self.decode_unroll = max(1, decode_unroll)
        # Fused Pallas decode attention (ops/decode_pallas.py); None =
        # OFF — the kernel is numerically validated but measured slower
        # than the XLA decode path on v5e (Mosaic DMA ceiling, see
        # llama.forward_hidden), so auto never enables it.  Pass True to
        # force it on (tests force True under interpret mode).
        self.decode_kernel = decode_kernel
        # With bits=4-quantized params (ops/quant.py), convert the int8-
        # stored weights to REAL int4 once inside each fused decode call:
        # the scan's steps then stream int4 bytes — 2.2x faster weight
        # reads than int8 (tools/exp_int4b.py).  int4 buffers cannot
        # cross jit boundaries on this toolchain (tools/exp_int4.py), so
        # the conversion lives inside the executable, amortized over
        # steps_per_call.
        self.decode_w4 = decode_w4
        # Nibble-packed int4 weights (ops/quant.pack_int4_params):
        # resident tree at 0.5 B/weight — EVERY executable (prefill /
        # extend / decode / speculative rounds) expands to real int4
        # once per call via unpack_int4_view.  This is how 13B serves
        # from one 16 GB chip (worker --quantize int4gp).
        self.w4_packed = w4_packed
        if w4_packed:
            if decode_w4:
                raise ValueError("w4_packed subsumes decode_w4 — the "
                                 "unpacked view is already int4")
            from valley_tpu.ops.quant import QUANT_TARGETS

            lay = params.get("llama", {}).get("layers", {})
            bad = [n for n in QUANT_TARGETS
                   if n in lay and lay[n].dtype != jnp.uint8]
            if bad:
                raise ValueError(
                    f"w4_packed=True but {bad} are not nibble-packed "
                    "uint8 — run ops.quant.pack_int4_params after "
                    "quantize_llama_params(bits=4)")
        if decode_w4:
            _check_int4_range(params)
        if use_flash is None:
            use_flash = jax.default_backend() == "tpu"
        self.use_flash = use_flash

        self._prefill = jax.jit(
            self._prefill_impl,
            static_argnames=("bucket", "cache_len", "do_sample",
                             "has_images"))
        self._decode = jax.jit(
            self._decode_impl,
            static_argnames=("do_sample", "n_steps"),
            donate_argnames=("cache", "valid"))
        self._extend = jax.jit(
            self._extend_impl,
            static_argnames=("do_sample",),
            donate_argnames=("cache", "valid"))

    # -- jitted bodies ---------------------------------------------------

    def _weights_view(self, params, decode: bool = False):
        """Per-executable weight view, applied INSIDE every jitted body.

        ``w4_packed``: nibble-packed uint8 weights expand to real int4
        once per call (resident tree stays 0.5 B/weight; the packed AND
        unpacked copies coexist only for the call's duration).
        ``decode_w4`` (unpacked int4-in-int8 storage): the int4 cast
        applies to DECODE only — prefill/extend GEMMs read the int8
        storage directly, exactly as before (the cast is value-exact
        either way; only the streamed byte width differs)."""
        if self.w4_packed:
            from valley_tpu.ops.quant import unpack_int4_view

            return unpack_int4_view(params)
        if decode and self.decode_w4:
            from valley_tpu.ops.quant import int4_decode_view

            return int4_decode_view(params)
        return params

    def _prefill_impl(self, params, input_ids, images, prompt_len, key,
                      temperature, top_p, frame_mask=None, *, bucket: int,
                      cache_len: int, do_sample: bool, has_images: bool):
        cfg = self.cfg
        params = self._weights_view(params)
        b = input_ids.shape[0]
        embeds = valley.build_inputs_embeds(
            params, cfg, input_ids, images if has_images else None,
            frame_mask=frame_mask)
        cache = llama.init_cache(cfg.text, b, cache_len, self.cache_dtype)
        if self.mesh is not None:
            from valley_tpu.parallel.sharding import kv_cache_sharding

            cache = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, kv_cache_sharding(self.mesh, b, cfg.text.kv_heads,
                                         ndim=x.ndim)), cache)
        smax = cache.max_len
        kv_valid = (jnp.arange(smax)[None, :]
                    < prompt_len[:, None])               # (B, Smax)
        hidden, cache = llama.forward_hidden(
            params["llama"], cfg.text, embeds,
            cache=cache, cache_index=0, kv_valid=kv_valid,
            use_flash=self.use_flash)
        last = jnp.take_along_axis(
            hidden, (prompt_len - 1)[:, None, None], axis=1)  # (B, 1, H)
        logits = llama.logits_from_hidden(params["llama"], last)[:, 0]
        tok = sample_token(logits, key, temperature, top_p, do_sample)
        valid = kv_valid  # slots [0, prompt_len) hold the prompt
        return tok, logits, cache, valid

    def _decode_impl(self, params, cache: KVCache, valid, token, slot0,
                     seq_len, key, temperature, top_p, *,
                     do_sample: bool, n_steps: int):
        """Fused decode carrying explicit cache state: ``valid`` (B, Smax)
        marks attendable slots, ``seq_len`` (B,) is the rotary position of
        the incoming token, ``slot0`` the next free cache slot."""
        cfg = self.cfg
        b = token.shape[0]
        params = self._weights_view(params, decode=True)

        def body(carry, _):
            token, cache, valid, seq_len, slot, key = carry
            key, sub = jax.random.split(key)
            embeds = llama.embed(params["llama"], token[:, None])
            valid = jax.lax.dynamic_update_slice(
                valid, jnp.ones((b, 1), valid.dtype), (0, slot))
            hidden, cache = llama.forward_hidden(
                params["llama"], cfg.text, embeds,
                positions=seq_len[:, None], cache=cache, cache_index=slot,
                kv_valid=valid, use_flash=False,
                unroll=self.decode_unroll if b == 1 else 1,
                decode_kernel=self.decode_kernel if b == 1 else False)
            logits = llama.logits_from_hidden(params["llama"], hidden)[:, 0]
            tok = sample_token(logits, sub, temperature, top_p, do_sample)
            return (tok, cache, valid, seq_len + 1, slot + 1, key), tok

        (tok, cache, valid, seq_len, _, _), toks = jax.lax.scan(
            body, (token, cache, valid, seq_len, slot0, key), None,
            length=n_steps)
        return toks, cache, valid, seq_len  # toks: (n_steps, B)

    def _extend_impl(self, params, cache: KVCache, valid, input_ids,
                     new_len, seq_len, slot0, key, temperature, top_p, *,
                     do_sample: bool):
        """Append a right-padded (B, C) chunk of new conversation tokens to
        an existing session cache (multi-turn KV reuse) and sample the
        next token.  The chunk attends all previously valid slots plus
        itself causally; pad slots stay invalid."""
        cfg = self.cfg
        params = self._weights_view(params)
        b, c = input_ids.shape
        embeds = llama.embed(params["llama"], input_ids)
        positions = seq_len[:, None] + jnp.arange(c)[None, :]
        hidden, cache = llama.forward_hidden(
            params["llama"], cfg.text, embeds, positions=positions,
            cache=cache, cache_index=slot0, cross_valid=valid,
            use_flash=False)
        slots = jnp.arange(cache.max_len)[None, :]
        valid = jnp.logical_or(
            valid, jnp.logical_and(slots >= slot0,
                                   slots < slot0 + new_len[:, None]))
        last = jnp.take_along_axis(hidden, (new_len - 1)[:, None, None],
                                   axis=1)
        logits = llama.logits_from_hidden(params["llama"], last)[:, 0]
        tok = sample_token(logits, key, temperature, top_p, do_sample)
        return tok, cache, valid, seq_len + new_len

    # -- host-side loop --------------------------------------------------

    def _ramp_iter(self) -> Iterator[int]:
        """Per-call fused step counts: the ramp prefix once, then
        ``steps_per_call`` forever.  Callers pad the final (short) call
        back up to a schedule size via ``_tail_steps``."""
        yield from self.decode_ramp
        while True:
            yield self.steps_per_call

    def _tail_steps(self, want: int, room: int) -> int:
        """Fused-call size when fewer than a full scheduled call's tokens
        remain.  Prefer a warm schedule size (ramp sizes/steps_per_call,
        all pre-compiled by ``warmup``) over the exact remainder: each
        distinct ``n_steps`` is its own XLA executable (~20 s cold at 7B,
        and requests pick arbitrary ``max_new_tokens`` so exact tails
        would keep compiling), while a padded call's surplus steps cost
        ~10 ms each and only on the reply's final call.  Callers discard
        tokens past ``max_new`` — the kept prefix is bit-identical to an
        exact-size call because per-step RNG keys split off the scan
        carry, not off ``n_steps``.  Every caller reserves
        ``steps_per_call`` spare cache slots beyond ``max_new`` (stateless
        ``generate`` in its ``cache_slots``, sessions via
        ``_decode_slack``), so the exact-remainder fallback below is
        unreachable in normal operation — it remains only as a safety
        net for callers that size their own cache tighter."""
        for s in self._sched_sizes:
            if want <= s <= room:
                return s
        return max(1, min(want, room))

    def warmup(self, batch_sizes: Sequence[int] = (1,),
               frames: Optional[int] = None,
               with_images: bool = True,
               sampled: bool = True) -> None:
        """Pre-compile every (bucket, batch) executable so the first real
        request hits a warm cache (the reference pays its compile/alloc
        cost on the first request too, but here a cold compile is tens of
        seconds — serve workers call this at startup)."""
        # run the whole decode schedule (every ramp size + one steady
        # call) so each distinct n_steps executable compiles here, not on
        # the first request.  ``do_sample`` is a STATIC executable class
        # and serving traffic defaults to temperature > 0 (worker default
        # 1.0; reference UI 0.7) — warm BOTH modes or the first sampled
        # request stalls on a cold compile despite --warmup.
        new = min(1 + sum(self.decode_ramp) + self.steps_per_call,
                  self.max_new_tokens)
        gens = [GenerationConfig(max_new_tokens=new, do_sample=False)]
        if sampled:
            gens.append(GenerationConfig(max_new_tokens=new,
                                         do_sample=True, temperature=0.7))
        # with frame bucketing, warm EVERY frame bucket (mixed image/video
        # traffic then never hits a cold prefill executable).  Text-only
        # requests compile a separate (has_images=False) prefill — warm
        # it too so e.g. the OpenAI chat route's first text request
        # doesn't stall (~12 s observed cold at 7B).
        frame_counts = self.frame_buckets if (with_images
                                              and self.frame_buckets) \
            else (frames or 1,)
        v = self.cfg.vision
        media_dt = np.uint8 if self.raw_media else np.float32
        for b in batch_sizes:
            for bucket in self.buckets:
                prompt = [[1] * (bucket // 2) for _ in range(b)]
                media_passes = ([None] if not with_images else
                                [np.zeros((b, t, 3, v.image_size,
                                           v.image_size), media_dt)
                                 for t in frame_counts] + [None])
                for images in media_passes:
                    for gen in gens:
                        for _ in self.generate_tokens(prompt, images, gen,
                                                      eos_ids=[-1]):
                            pass

    def _prepare_images(self, images, batch: int):
        """Host media -> (device images, frame_mask | None, has_images).

        ``uint8`` frames transfer AS uint8 (1 byte/pixel) and
        CLIP-normalize on device (`valley.encode_images`) — the tunnel
        H2D is the dominant video first-token cost (~16 MB/s,
        tools/exp_first_token.py), so halving the bytes halves it.
        Normalized float frames transfer as bf16 (half the fp32 bytes);
        with ``frame_buckets`` the frame axis pads to the smallest bucket
        that fits (frames past the true count masked out of pooling)."""
        if images is None:
            v = self.cfg.vision
            return (jnp.zeros((batch, 1, 3, v.image_size, v.image_size),
                              jnp.bfloat16), None, False)
        arr = np.asarray(images)
        raw = arr.dtype == np.uint8
        if not raw:
            arr = np.asarray(arr, np.float32)
        mask = None
        if self.frame_buckets:
            t = arr.shape[1]
            tb = next((fb for fb in self.frame_buckets if t <= fb), t)
            if tb != t:
                pad = np.zeros(arr.shape[:1] + (tb - t,) + arr.shape[2:],
                               arr.dtype)
                arr = np.concatenate([arr, pad], axis=1)
            mask = np.zeros((arr.shape[0], tb), bool)
            mask[:, :t] = True
            mask = jnp.asarray(mask)
        if raw:
            return jnp.asarray(arr), mask, True
        return jnp.asarray(arr.astype(jnp.bfloat16)), mask, True

    def pick_bucket(self, length: int) -> int:
        for b in self.buckets:
            if length <= b:
                return b
        raise ValueError(
            f"prompt length {length} exceeds largest bucket "
            f"{self.buckets[-1]}")

    def generate_tokens(self, input_ids: Sequence[Sequence[int]],
                        images: Optional[np.ndarray] = None,
                        gen: Optional[GenerationConfig] = None,
                        eos_ids: Sequence[int] = (2,),
                        ) -> Iterator[np.ndarray]:
        """Yield one (B,) int32 token array per generated step."""
        gen = gen or GenerationConfig()
        if not input_ids or any(len(x) == 0 for x in input_ids):
            raise ValueError("every prompt must contain at least one token")
        lens = np.array([len(x) for x in input_ids], np.int32)
        bucket = self.pick_bucket(int(lens.max()))
        ids = np.zeros((len(input_ids), bucket), np.int32)
        for i, row in enumerate(input_ids):
            ids[i, :len(row)] = row

        key = jax.random.key(gen.seed)
        key, sub = jax.random.split(key)
        images, frame_mask, has_images = self._prepare_images(
            images, len(input_ids))

        tok, _logits, cache, valid = self._prefill(
            self.params, jnp.asarray(ids), images, jnp.asarray(lens), sub,
            gen.temperature, gen.top_p, frame_mask, bucket=bucket,
            cache_len=bucket + self.max_new_tokens + self.steps_per_call,
            do_sample=gen.do_sample, has_images=has_images)
        seq_len = jnp.asarray(lens)
        slot = bucket  # prompt chunk occupied slots [0, bucket)

        max_new = min(gen.max_new_tokens, self.max_new_tokens)
        if max_new <= 0:
            return
        alive = np.ones(len(input_ids), bool)
        eos_arr = np.asarray(eos_ids)
        tok_np = np.asarray(tok)
        yield tok_np
        alive &= ~np.isin(tok_np, eos_arr)
        step = 1
        sched = self._ramp_iter()
        # steps_per_call spare slots guarantee the final (short) call can
        # always pad up to a warm schedule size, even at the engine's
        # max_new_tokens — without them, any max_new within steps_per_call
        # of the engine maximum hit the exact-remainder fallback below
        # (a one-off ~20 s cold compile mid-traffic)
        cache_slots = bucket + self.max_new_tokens + self.steps_per_call
        while step < max_new and alive.any():
            want = max_new - step
            n_steps = next(sched)
            if n_steps > want:   # final call: pad to a warm size
                n_steps = self._tail_steps(want, cache_slots - slot)
            key, sub = jax.random.split(key)
            toks, cache, valid, seq_len = self._decode(
                self.params, cache, valid, tok, jnp.int32(slot), seq_len,
                sub, gen.temperature, gen.top_p,
                do_sample=gen.do_sample, n_steps=n_steps)
            slot += n_steps
            toks_np = np.asarray(toks)            # (n_steps, B)
            tok = toks[-1]
            for i in range(min(n_steps, want)):
                if not alive.any():
                    return
                yield toks_np[i]
                alive &= ~np.isin(toks_np[i], eos_arr)
                step += 1

    def generate(self, tokenizer, input_ids: Sequence[int],
                 images: Optional[np.ndarray] = None,
                 gen: Optional[GenerationConfig] = None,
                 ) -> Iterator[str]:
        """Single-prompt streaming generation: yields the accumulated text
        after every `stream_interval` tokens and at the end, with keyword
        stopping (reference streams `{"text": ...}` chunks every 2 tokens,
        `model_worker.py:406-419`)."""
        gen = gen or GenerationConfig()
        eos = [getattr(tokenizer, "eos_token_id", 2) or 2]
        yield from stream_text(
            (int(t[0]) for t in self.generate_tokens(
                [list(input_ids)], images, gen, eos_ids=eos)),
            tokenizer, gen)


def stream_text(token_iter, tokenizer, gen: GenerationConfig
                ) -> Iterator[str]:
    """Token-id stream -> accumulated-text chunks every stream_interval
    tokens, with keyword stopping (shared by Engine.generate and
    SpecDecoder.generate)."""
    out_tokens: list[int] = []
    text = ""
    for step, tok in enumerate(token_iter):
        out_tokens.append(int(tok))
        if (step + 1) % gen.stream_interval == 0:
            text = tokenizer.decode(out_tokens, skip_special_tokens=True)
            stopped, text = _apply_stops(text, gen.stop)
            yield text
            if stopped:
                return
    text = tokenizer.decode(out_tokens, skip_special_tokens=True)
    _, text = _apply_stops(text, gen.stop)
    yield text


@functools.partial(jax.jit, static_argnames=("total_len",))
def _grow_cache(cache: KVCache, valid, total_len: int):
    """Fresh session-size cache buffers holding a prefix fragment at the
    front (slot axis = 2).  The pad allocates NEW buffers, so spawned
    sessions (whose decode donates its cache) never alias the stored
    fragment."""
    pad = total_len - cache.max_len

    def grow(x):
        widths = [(0, 0)] * x.ndim
        widths[2] = (0, pad)
        return jnp.pad(x, widths)

    return (jax.tree.map(grow, cache),
            jnp.pad(valid, ((0, 0), (0, pad))))


class PrefixCache:
    """Prefill a shared prompt prefix ONCE and spawn sessions from it.

    The common serving pattern this serves: many requests share the same
    system prompt + media (e.g. different users asking about the same
    video).  The reference re-runs the full prefill per request
    (`model_worker.py:371-376`); here the prefix's vision encode + LLM
    prefill happen once, and each ``spawn()`` hands a `ChatSession`
    whose KV already contains the prefix — per-request work is just the
    question's delta extend + decode.

    Only the ``bucket``-slot prefix *fragment* is stored (the full
    session cache would be ~GBs per entry at 7B); each spawn pads the
    fragment into fresh session-size buffers on device — milliseconds vs
    the 150-400 ms prefix prefill it replaces.
    """

    def __init__(self, engine: Engine, prefix_ids: Sequence[int],
                 images=None, gen: Optional[GenerationConfig] = None,
                 extra_slots: Optional[int] = None):
        self.engine = engine
        self.gen = gen or GenerationConfig()
        self.prefix_ids = [int(t) for t in prefix_ids]
        self.extra_slots = extra_slots
        eng = engine
        n = len(self.prefix_ids)
        bucket = eng.pick_bucket(n)
        ids = np.zeros((1, bucket), np.int32)
        ids[0, :n] = self.prefix_ids
        imgs, frame_mask, has_images = eng._prepare_images(images, 1)
        extra = extra_slots if extra_slots is not None \
            else 4 * (eng.max_new_tokens + 64)
        # prefill only — the sampled next-token is discarded (each
        # spawned session continues with its own delta tokens).
        # cache_len matches ChatSession._first_turn's (which adds its
        # steps_per_call tail-padding slack) so the prefill executable is
        # shared with plain first turns at the same extra_slots class.
        _tok, _lg, cache, valid = eng._prefill(
            eng.params, jnp.asarray(ids), imgs, jnp.asarray([n], np.int32),
            jax.random.key(self.gen.seed), self.gen.temperature,
            self.gen.top_p, frame_mask, bucket=bucket,
            cache_len=bucket + eng.max_new_tokens + extra
            + eng.steps_per_call,
            do_sample=False, has_images=has_images)
        # keep only the prefix fragment (prompt slots [0, bucket))
        self._frag = jax.tree.map(lambda x: x[:, :, :bucket], cache)
        self._valid = valid[:, :bucket]
        jax.block_until_ready(self._frag.k)
        self._extra = extra
        self._seq = n
        self._slot = bucket

    def spawn(self, gen: Optional[GenerationConfig] = None,
              speculative: bool = False, seed: Optional[int] = None
              ) -> "ChatSession":
        """A fresh session pre-loaded with the prefix KV.  Pass only the
        NEW tokens (the user's question, framed with the conversation
        separators) to its ``chat()``."""
        gen = gen or self.gen
        if speculative:
            from valley_tpu.inference.speculative import SpecChatSession

            sess: ChatSession = SpecChatSession(self.engine, gen)
            sess._hist = list(self.prefix_ids)
        else:
            sess = ChatSession(self.engine, gen)
        if seed is not None:
            sess._key = jax.random.key(seed)
        total = (self._slot + self.engine.max_new_tokens + self._extra
                 + sess._decode_slack)
        cache, valid = _grow_cache(self._frag, self._valid, total)
        sess._state = (cache, valid, self._seq, self._slot, None)
        return sess


# Rolling-window size (tokens) for incremental keyword-stop detection: a
# stop string ('###') spans a handful of tokens; the window bounds the
# longest detectable straddle while keeping per-token host work O(window).
_STOP_WINDOW = 48


def find_stop_index(tokens: Sequence[int], stops: Sequence[str],
                    tokenizer, window: int = _STOP_WINDOW) -> Optional[int]:
    """Smallest count ``i`` such that decoding ``tokens[:i]`` surfaces a
    keyword stop — searched with a rolling decode window of the trailing
    ``window`` tokens, so host work per token stays O(window) instead of
    O(i) (decoding every full prefix made long replies O(n^2) host
    time).  Returns None when no stop appears."""
    for i in range(1, len(tokens) + 1):
        text = tokenizer.decode(tokens[max(0, i - window):i],
                                skip_special_tokens=True)
        if any(s in text for s in stops):
            return i
    return None


def _apply_stops(text: str, stops: Sequence[str]) -> tuple[bool, str]:
    for s in stops:
        idx = text.find(s)
        if idx >= 0:
            return True, text[:idx]
    return False, text


@jax.jit
def _trim_valid(valid, keep_below, drop_until):
    """Invalidate cache slots in [keep_below, drop_until) — tokens decoded
    past the stopping point must not haunt later turns."""
    slots = jnp.arange(valid.shape[1])[None, :]
    drop = jnp.logical_and(slots >= keep_below, slots < drop_until)
    return jnp.logical_and(valid, jnp.logical_not(drop))


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _compact_cache(cache, valid):
    """Pack valid cache slots to the front, reclaiming pow2 chunk padding
    and post-stop trimmed slots.  Decode attention is slot-order-agnostic
    (rotary positions live in the stored K values; validity is an explicit
    mask), so a stable permutation of slots is invisible to the model.
    Returns (cache, valid, n_valid) with n_valid (B,) live slots."""
    invalid = jnp.logical_not(valid)                       # (B, S)
    order = jnp.argsort(invalid, axis=1, stable=True)      # valid first

    def gather(x):
        idx = order[None, :, :, None] if x.ndim == 4 else \
            order[None, :, :, None, None]
        return jnp.take_along_axis(x, idx, axis=2)

    cache = jax.tree.map(gather, cache)
    n_valid = jnp.sum(valid, axis=1).astype(jnp.int32)
    new_valid = jnp.arange(valid.shape[1])[None, :] < n_valid[:, None]
    return cache, new_valid, n_valid


class ChatSession:
    """Multi-turn generation with KV-prefix reuse (B=1).

    The reference re-runs the full conversation prefill every turn
    (`model_worker.py:371-376` takes the whole prompt each request); a
    ChatSession keeps the KV cache across turns, so turn N only prefills
    its *new* tokens (`engine._extend`) — O(new tokens) instead of
    O(conversation).  Pass only the NEW token ids per turn, framed
    consistently (e.g. the '###' separators) since deltas are tokenized
    independently.  Tokens decoded past the eos/keyword stop are trimmed
    from the cache so they never leak into later turns.
    """

    def __init__(self, engine: Engine, gen: Optional[GenerationConfig] = None,
                 extra_slots: Optional[int] = None):
        self.engine = engine
        self.gen = gen or GenerationConfig()
        self._key = jax.random.key(self.gen.seed)
        self._state = None  # (cache, valid, seq_host: int, slot: int)
        self.extra_slots = extra_slots
        # extra cache slots a decode loop may touch beyond max_new:
        # steps_per_call spare slots let the turn's final (short) fused
        # call pad up to a warm schedule size instead of compiling a
        # one-off exact-remainder executable (speculative rounds write
        # draft-wide windows on top of this; see SpecChatSession)
        self._decode_slack = engine.steps_per_call

    @property
    def started(self) -> bool:
        return self._state is not None

    def chat(self, new_ids: Sequence[int],
             images: Optional[np.ndarray] = None,
             tokenizer=None,
             eos_ids: Sequence[int] = (2,),
             on_token=None) -> list:
        """Run one turn; returns the kept reply token ids (stop token and
        anything after it removed).  ``on_token(tok_id)`` streams tokens as
        they arrive (may include a few post-stop tokens from the fused
        decode, like the reference's every-2-tokens stream).  With a
        ``tokenizer``, keyword stops from ``gen.stop`` apply."""
        eng, gen = self.engine, self.gen
        self._key, sub = jax.random.split(self._key)

        if self._state is None:
            tok, cache, valid, seq_host, slot = self._first_turn(
                new_ids, images, sub)
        else:
            if images is not None:
                raise ValueError("media is only supported on the first turn")
            cache, valid, seq_host, slot, pending = self._state
            # ``pending`` is the last reply token of the previous turn —
            # sampled but never fed back, so its KV was never written;
            # prepend it to this turn's chunk (position seq_host - 1).
            chunk = ([pending] if pending is not None else []) + \
                list(new_ids)
            start_pos = seq_host - (1 if pending is not None else 0)
            c = len(chunk)
            cb = 1 << max(4, (max(c, 2) - 1).bit_length())  # pow2 >= 16
            budget = gen.max_new_tokens + self._decode_slack
            if slot + cb + budget > cache.max_len:
                # compact: pack live slots to the front, reclaiming pow2
                # chunk padding and post-stop trimmed slots (one cache
                # rewrite ~ milliseconds, vs the reference re-prefilling
                # the whole conversation)
                cache, valid, n_valid = _compact_cache(cache, valid)
                slot = int(np.asarray(n_valid)[0])
            if slot + cb + budget > cache.max_len:
                raise RuntimeError(
                    f"session cache exhausted (slot={slot} live tokens, "
                    f"need {cb + gen.max_new_tokens}, "
                    f"max={cache.max_len}); start a new ChatSession")
            ids = np.zeros((1, cb), np.int32)
            ids[0, :c] = chunk
            tok, cache, valid, _seq = eng._extend(
                eng.params, cache, valid, jnp.asarray(ids),
                jnp.asarray([c], np.int32), jnp.asarray([start_pos]),
                jnp.int32(slot), sub, gen.temperature, gen.top_p,
                do_sample=gen.do_sample)
            seq_host = start_pos + c
            slot += cb

        decode_start = slot
        max_new = min(gen.max_new_tokens, eng.max_new_tokens)
        eos_arr = np.asarray(eos_ids)
        tokens, cache, valid, slot = self._decode_loop(
            cache, valid, tok, seq_host, slot, max_new, eos_arr,
            tokenizer, on_token)

        kept = self._kept_count(tokens, eos_arr, tokenizer)
        pending = tokens[kept - 1] if kept == len(tokens) else None
        tokens = tokens[:kept]
        # The decode loop wrote KV for tokens[0..n_inputs-1] at
        # decode_start+i (each token is written when fed back as input).
        # Keep the slots belonging to kept conversation tokens; when the
        # final kept token was never fed back (pending), its slot doesn't
        # exist yet — the next turn writes it.
        written_kept = kept - (1 if pending is not None else 0)
        commit_slot = decode_start + written_kept
        valid = _trim_valid(valid, jnp.int32(commit_slot), jnp.int32(slot))
        self._state = (cache, valid, seq_host + kept, commit_slot, pending)
        return tokens

    def _decode_loop(self, cache, valid, tok, seq_host: int, slot: int,
                     max_new: int, eos_arr, tokenizer, on_token):
        """Fused-chunk decode until eos/stop/max_new.  Returns
        (tokens, cache, valid, final_slot); every emitted token except a
        trailing never-fed-back one has its KV at contiguous slots from
        the entry ``slot`` (the commit logic in ``chat`` relies on this).
        Overridden by ``SpecChatSession`` with speculative rounds."""
        eng, gen = self.engine, self.gen
        tokens: list[int] = []
        t0 = int(np.asarray(tok)[0])
        tokens.append(t0)
        if on_token:
            on_token(t0)
        stopped = t0 in eos_arr
        sched = eng._ramp_iter()
        while len(tokens) < max_new and not stopped:
            want = max_new - len(tokens)
            n_steps = next(sched)
            if n_steps > want:   # final call: pad to a warm size
                n_steps = eng._tail_steps(want, cache.max_len - slot)
            self._key, sub = jax.random.split(self._key)
            # the pending input token is tokens[-1], at conversation
            # position seq_host + (len(tokens) - 1)
            toks, cache, valid, _seq = eng._decode(
                eng.params, cache, valid, tok, jnp.int32(slot),
                jnp.asarray([seq_host + len(tokens) - 1]), sub,
                gen.temperature, gen.top_p, do_sample=gen.do_sample,
                n_steps=n_steps)
            slot += n_steps
            toks_np = np.asarray(toks)[:want, 0]
            tok = toks[-1]
            for t in toks_np:
                tokens.append(int(t))
                if on_token:
                    on_token(int(t))
                if int(t) in eos_arr:
                    stopped = True
                    break
            if not stopped and tokenizer is not None and gen.stop:
                # windowed check: decode only this chunk plus a small
                # straddle overlap, not the whole reply (O(n) per chunk
                # made long replies O(n^2) host time)
                text = tokenizer.decode(tokens[-(n_steps + _STOP_WINDOW):],
                                        skip_special_tokens=True)
                if any(s in text for s in gen.stop):
                    stopped = True
        return tokens, cache, valid, slot

    def _kept_count(self, tokens, eos_arr, tokenizer) -> int:
        kept = len(tokens)
        for i, t in enumerate(tokens):
            if t in eos_arr:
                kept = i + 1  # keep the eos itself as turn terminator
                break
        if tokenizer is not None and self.gen.stop:
            i = find_stop_index(tokens[:kept], self.gen.stop, tokenizer)
            if i is not None:
                kept = min(kept, i)
        return kept

    def _first_turn(self, new_ids, images, sub):
        eng, gen = self.engine, self.gen
        lens = np.asarray([len(new_ids)], np.int32)
        bucket = eng.pick_bucket(int(lens[0]))
        ids = np.zeros((1, bucket), np.int32)
        ids[0, :lens[0]] = new_ids
        images, frame_mask, has_images = eng._prepare_images(images, 1)
        # session caches need headroom beyond one turn: each later turn
        # consumes a pow2-padded chunk plus its reply slots
        extra = self.extra_slots
        if extra is None:
            extra = 4 * (eng.max_new_tokens + 64)
        extra += self._decode_slack
        tok, _logits, cache, valid = eng._prefill(
            eng.params, jnp.asarray(ids), images, jnp.asarray(lens),
            sub, gen.temperature, gen.top_p, frame_mask, bucket=bucket,
            cache_len=bucket + eng.max_new_tokens + extra,
            do_sample=gen.do_sample, has_images=has_images)
        return tok, cache, valid, int(lens[0]), bucket
