"""Iteration-level continuous batching.

A fixed pool of B cache rows decodes in lockstep; requests join a free row
at any decode-chunk boundary (prefilled into their own row of the shared
cache) and leave the moment they finish — unlike window batching
(`serve/batcher.py`), a long-running generation never blocks new arrivals,
and throughput stays at batch-B decode whenever there is load.

Design notes:
* cache *slots* are decoupled from token *positions*: every row writes its
  step-i KV at its own ``write_slot[row]`` with rotary position
  ``seq_len[row]`` (per-row offsets via the per-row cache update in
  `llama._attn_cached`), so rows that joined at different times coexist in
  one (L, B, Smax, H, D) buffer;
* inactive rows decode garbage into their last slot with everything
  masked; their output is discarded host-side and their state is fully
  rewritten on insert;
* per-row temperature/top_p ride as (B,) traced arrays — one compiled
  executable regardless of the request mix;
* **non-blocking admission**: a dedicated prefill thread pulls requests,
  prefills them at their OWN prompt bucket (smallest engine bucket that
  fits — a short prompt never pays the big-bucket prefill), and parks the
  ready row state on a bounded queue; the decode loop only splices ready
  rows in at chunk boundaries, so admission never stalls active rows on
  host-side prefill work;
* **batched admission**: compatible waiting requests (same admission
  bucket / media geometry / sampling mode) prefill as ONE batched call
  (pow2 group sizes up to ``admit_batch``) — a burst pays one prefill
  dispatch instead of N serial ones, and the park depth scales with the
  pool so a large pool refills in one chunk boundary;
* **prompt-pad compaction**: decode writes start at slot ``len(prompt)``
  (not at the prefill bucket), so prompt padding slots are reused by
  generated tokens and a row supports ``smax - len`` new tokens.
"""

from __future__ import annotations

import dataclasses
import logging
import queue
import threading
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from valley_tpu.inference.engine import Engine, GenerationConfig, sample_token
from valley_tpu.models import llama

logger = logging.getLogger(__name__)

_DONE = object()


@dataclasses.dataclass
class _Request:
    input_ids: list
    images: Optional[np.ndarray]
    temperature: float
    top_p: float
    max_new_tokens: int
    eos_id: int
    # PrefixCache whose KV seeds the row (input_ids must start with its
    # prefix_ids; only the suffix is prefilled at admission)
    prefix: Optional[Any] = None
    out: "queue.Queue[Any]" = dataclasses.field(
        default_factory=lambda: queue.Queue(maxsize=4096))
    emitted: int = 0


class ContinuousEngine:
    def __init__(self, engine: Engine, rows: int = 4,
                 bucket: Optional[int] = None,
                 extra_slots: Optional[int] = None,
                 steps_per_call: Optional[int] = None,
                 decode_ramp: Optional[Any] = None,
                 seed: int = 0,
                 speculative: bool = False,
                 spec: Optional["SpecConfig"] = None,
                 admit_batch: int = 4,
                 ready_depth: Optional[int] = None):
        self.engine = engine
        self.rows = rows
        self.bucket = bucket or engine.buckets[-1]
        extra = extra_slots if extra_slots is not None \
            else engine.max_new_tokens
        self.smax = self.bucket + extra
        self.steps = steps_per_call or engine.steps_per_call
        # Pooled decode ramp (mirrors Engine.decode_ramp): while any
        # active row has emitted fewer tokens than the ramp covers, the
        # pool decodes in the row's next ramp-size chunk instead of the
        # full ``steps`` — a newly admitted request streams its first
        # tokens after a few steps instead of waiting out a whole
        # steady-state chunk (~330 ms at steps=32 on 7B int8).  Mature
        # rows pay a couple of extra dispatches while a newcomer ramps;
        # greedy output is chunk-boundary-invariant.
        self.ramp = tuple(int(s) for s in decode_ramp) \
            if decode_ramp is not None else engine.decode_ramp
        self._key = jax.random.key(seed)
        self._key_lock = threading.Lock()  # split from 2 threads

        # speculative mode: each decode "step" is an n-gram-draft
        # verification round emitting 1..draft_len+1 tokens per row
        # (per-row accept counts — rows advance their slots at their own
        # pace; greedy rows verify against argmax via a one-hot target
        # distribution, sampled rows via speculative-sampling rejection,
        # in the SAME executable)
        self._spec = None
        if speculative:
            from valley_tpu.inference.speculative import SpecConfig

            self._spec = spec or SpecConfig()
            self.hist_max = self.smax + self._spec.draft_len + 1
        # Pool-wide acceptance-adaptive control (SpecConfig.adaptive):
        # verification rounds cost ~1.44x a plain step, so when the
        # pool's acceptance EMA falls below break-even the loop decodes
        # plain chunks instead, re-probing with one speculative chunk
        # every ``reprobe_chunks`` (traffic mixes change).  Plain chunks
        # keep each row's draft history appended so a re-probe measures
        # honest acceptance.  Greedy rows stay token-identical and
        # sampled rows distribution-exact across switches.
        self._spec_live = True
        self._plain_left = 0
        self._acc_ema: Optional[float] = None
        self._warming = False
        self.spec_rounds = 0       # pool telemetry (worker status)
        self.spec_emitted = 0
        self.spec_disables = 0

        self._active: List[Optional[_Request]] = [None] * rows
        # warmup-only escape hatch: sizes queued here override the ramp
        # schedule for the next pooled calls (see warmup's spec pass)
        self._force_chunks: List[int] = []
        self._reset_pool()

        self._decode = jax.jit(self._decode_impl,
                               static_argnames=("n_steps",),
                               donate_argnames=("cache", "valid"))
        self._spec_decode = jax.jit(
            self._spec_decode_impl, static_argnames=("n_steps",),
            donate_argnames=("cache", "valid", "hist"))
        self._insert = jax.jit(self._insert_impl,
                               donate_argnames=("cache", "valid"))
        self._insert_hist = jax.jit(self._insert_hist_impl,
                                    donate_argnames=("hist",))
        self._append_hist = jax.jit(self._append_hist_impl,
                                    donate_argnames=("hist",))

        # admission buckets: engine prefill buckets that fit in the pool —
        # a request is prefilled at the smallest one that holds its prompt
        self._admission_buckets = tuple(
            b for b in engine.buckets if b <= self.bucket) or (self.bucket,)
        if self.bucket not in self._admission_buckets:
            self._admission_buckets = self._admission_buckets + (
                self.bucket,)

        # Batched admission: compatible waiting requests (same admission
        # bucket / media geometry / sampling mode) prefill as ONE batched
        # call — a burst of B requests pays ~1 prefill dispatch and a
        # higher-MXU-utilization executable instead of B serial ones.
        # Group sizes are powers of two so the executable set stays
        # bounded (warmup compiles each size).
        self.admit_batch = max(1, int(admit_batch))
        self._admit_sizes = tuple(
            1 << i for i in range(self.admit_batch.bit_length())
            if (1 << i) <= self.admit_batch)
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        # bounded parked-KV: each ready item references one row of a
        # prefilled cache on device, so cap how many ROWS can pile up
        # ahead of free rows.  The default refills up to 8 freed rows
        # per chunk boundary (measured +14% aggregate at 16 rows vs the
        # old depth-2 park; pass ready_depth=rows to guarantee a full
        # single-boundary refill of larger pools at proportionally more
        # parked HBM) while bounding parked memory; a partially consumed
        # batch keeps its whole batch cache alive, so worst case is
        # ready_depth + admit_batch - 1 rows
        if ready_depth is None:
            ready_depth = min(8, max(2, rows))
        if ready_depth < 1:
            raise ValueError("ready_depth must be >= 1")
        self.ready_depth = ready_depth
        self._ready: "queue.Queue[tuple]" = queue.Queue(maxsize=ready_depth)
        self._wake = threading.Event()
        self._prefill_thread = threading.Thread(target=self._prefill_loop,
                                                daemon=True)
        self._prefill_thread.start()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _reset_pool(self):
        """(Re)build the device-side pool state. Also the recovery path
        after a failed decode chunk (donated buffers may be invalid)."""
        cfg, rows = self.engine.cfg, self.rows
        self._cache = llama.init_cache(cfg.text, rows, self.smax,
                                       self.engine.cache_dtype)
        if self.engine.mesh is not None:
            # tensor-parallel pooled serving (e.g. 13B over 2 chips with
            # --batch-window-ms -1): shard the pool KV over the mesh like
            # the engine's own cache instead of replicating GBs per chip
            from valley_tpu.parallel.sharding import kv_cache_sharding

            self._cache = jax.tree.map(
                lambda x: jax.device_put(
                    x, kv_cache_sharding(self.engine.mesh, rows,
                                         cfg.text.kv_heads,
                                         ndim=x.ndim)), self._cache)
        self._valid = jnp.zeros((rows, self.smax), bool)
        self._seq = jnp.zeros((rows,), jnp.int32)
        self._slot = jnp.full((rows,), self.smax - 1, jnp.int32)
        self._token = jnp.zeros((rows,), jnp.int32)
        self._temps = np.zeros((rows,), np.float32)
        self._top_ps = np.ones((rows,), np.float32)
        if self._spec is not None:
            self._hist = jnp.zeros((rows, self.hist_max), jnp.int32)
            self._hist_len = jnp.zeros((rows,), jnp.int32)

    # -- jitted state transforms ------------------------------------------

    def _decode_impl(self, params, cache, valid, token, slot, seq, key,
                     temps, top_ps, *, n_steps: int):
        cfg = self.engine.cfg
        b = token.shape[0]
        if getattr(self.engine, "w4_packed", False):
            from valley_tpu.ops.quant import unpack_int4_view

            params = unpack_int4_view(params)
        elif getattr(self.engine, "decode_w4", False):
            from valley_tpu.ops.quant import int4_decode_view

            params = int4_decode_view(params)

        def mark(vrow, i):
            return jax.lax.dynamic_update_slice(
                vrow, jnp.ones((1,), vrow.dtype), (i,))

        def body(carry, _):
            token, cache, valid, seq, slot, key = carry
            key, sub = jax.random.split(key)
            embeds = llama.embed(params["llama"], token[:, None])
            valid = jax.vmap(mark)(valid, slot)
            hidden, cache = llama.forward_hidden(
                params["llama"], cfg.text, embeds, positions=seq[:, None],
                cache=cache, cache_index=slot, kv_valid=valid,
                use_flash=False)
            logits = llama.logits_from_hidden(params["llama"], hidden)[:, 0]
            tok = sample_token(logits, sub, temps, top_ps, do_sample=True)
            return (tok, cache, valid, seq + 1, slot + 1, key), tok

        (token, cache, valid, seq, slot, _), toks = jax.lax.scan(
            body, (token, cache, valid, seq, slot, key), None,
            length=n_steps)
        return toks, cache, valid, token, slot, seq

    def _insert_impl(self, cache, valid, token, slot, seq, row_cache,
                     row_valid, row_tok, row_len, src, b):
        # copy row ``src`` of a prefilled batch cache (values + any int8
        # scales) into pool row ``b``.  Batched admissions park the WHOLE
        # batch result and insert straight from it — no intermediate
        # per-row copy (each would move a full row cache through HBM and
        # pay a dispatch on the way)
        def put(c, rc):
            row = jax.lax.dynamic_slice_in_dim(rc, src, 1, axis=1)
            return jax.lax.dynamic_update_slice(
                c, row, (0, b) + (0,) * (c.ndim - 2))

        cache = jax.tree.map(put, cache, row_cache)
        row_valid = row_valid.astype(valid.dtype)
        valid = jax.lax.dynamic_update_slice(
            valid, jax.lax.dynamic_slice_in_dim(row_valid, src, 1, axis=0),
            (b, 0))
        token = jax.lax.dynamic_update_slice(
            token, jax.lax.dynamic_slice_in_dim(row_tok, src, 1, axis=0),
            (b,))
        # decode writes start right after the prompt (NOT at the prefill
        # bucket): prompt-pad slots get reused by generated tokens
        slot = jax.lax.dynamic_update_slice(slot, row_len[None], (b,))
        seq = jax.lax.dynamic_update_slice(seq, row_len[None], (b,))
        return cache, valid, token, slot, seq

    def _spec_decode_impl(self, params, cache, valid, token, slot, seq,
                          hist, hist_len, key, temps, top_ps, *,
                          n_steps: int):
        """``n_steps`` speculative verification rounds over the pool.
        Each round drafts per-row from the row's own history, verifies
        the (B, D+1) chunk in one forward, and advances each row by its
        own 1 + m_b accepted tokens.  Greedy rows (temp < 1e-4) verify
        against a one-hot argmax distribution — the rejection rule then
        reduces exactly to longest-matching-prefix + argmax correction,
        so one executable serves any greedy/sampled request mix."""
        from valley_tpu.inference.engine import filter_logits
        from valley_tpu.inference.speculative import (_spec_sample_round,
                                                      ngram_draft)

        cfg = self.engine.cfg
        d_len = self._spec.draft_len
        g = self._spec.ngram
        b = token.shape[0]
        if getattr(self.engine, "w4_packed", False):
            from valley_tpu.ops.quant import unpack_int4_view

            params = unpack_int4_view(params)
        elif getattr(self.engine, "decode_w4", False):
            from valley_tpu.ops.quant import int4_decode_view

            params = int4_decode_view(params)

        def body(carry, _):
            token, cache, valid, seq, slot, hist, hist_len, key = carry
            key, sub = jax.random.split(key)
            draft = jax.vmap(
                lambda h, hl: ngram_draft(h, hl, d_len, g))(hist, hist_len)
            chunk = jnp.concatenate([token[:, None], draft], axis=1)
            positions = seq[:, None] + jnp.arange(d_len + 1)[None, :]
            embeds = llama.embed(params["llama"], chunk)
            hidden, cache = llama.forward_hidden(
                params["llama"], cfg.text, embeds, positions=positions,
                cache=cache, cache_index=slot, cross_valid=valid,
                use_flash=False)
            logits = llama.logits_from_hidden(
                params["llama"], hidden).astype(jnp.float32)  # (B,D+1,V)
            greedy_probs = jax.nn.one_hot(jnp.argmax(logits, -1),
                                          logits.shape[-1])
            samp_probs = jax.nn.softmax(
                filter_logits(logits, temps[:, None], top_ps[:, None]),
                axis=-1)
            probs = jnp.where((temps < 1e-4)[:, None, None],
                              greedy_probs, samp_probs)
            emit, m = jax.vmap(_spec_sample_round)(
                probs, draft, jax.random.split(sub, b))
            n_emit = m + 1
            slots_ = jnp.arange(valid.shape[1])[None, :]
            valid = jnp.logical_or(
                valid, jnp.logical_and(slots_ >= slot[:, None],
                                       slots_ < (slot + n_emit)[:, None]))
            hist = jax.vmap(
                lambda h, e, hl: jax.lax.dynamic_update_slice(
                    h, e, (hl,)))(hist, emit, hist_len)
            hist_len = hist_len + n_emit
            token = jnp.take_along_axis(emit, m[:, None], axis=1)[:, 0]
            carry = (token, cache, valid, seq + n_emit, slot + n_emit,
                     hist, hist_len, key)
            return carry, (emit, n_emit)

        (token, cache, valid, seq, slot, hist, hist_len, _), \
            (toks, counts) = jax.lax.scan(
                body, (token, cache, valid, seq, slot, hist, hist_len,
                       key), None, length=n_steps)
        return (toks, counts, cache, valid, token, slot, seq, hist,
                hist_len)

    def _insert_hist_impl(self, hist, hist_len, row_hist, tok, src,
                          row_len, b):
        """Seed pool row ``b``'s lookup history: prompt + the
        prefill-sampled first token (row ``src`` of the admission
        batch's tokens)."""
        row_tok = jax.lax.dynamic_slice_in_dim(tok, src, 1, axis=0)
        row_hist = jax.lax.dynamic_update_slice(
            row_hist, row_tok, (row_len,))
        hist = jax.lax.dynamic_update_slice(hist, row_hist[None], (b, 0))
        hist_len = jax.lax.dynamic_update_slice(
            hist_len, (row_len + 1)[None], (b,))
        return hist, hist_len

    def _append_hist_impl(self, hist, hist_len, toks):
        """Append a plain-decoded chunk's tokens (``toks``: (steps,
        rows)) to every row's draft history — adaptive plain mode keeps
        the lookup table fresh so a speculative re-probe measures honest
        acceptance.  Rows that finished mid-chunk are overwritten at
        their next admission (`_insert_hist`); near the very end of a
        row's capacity the update clamps (drafting quality only — every
        draft is verified)."""
        def row(h, hl, t):
            return jax.lax.dynamic_update_slice(h, t, (hl,))

        hist = jax.vmap(row)(hist, hist_len, toks.T.astype(jnp.int32))
        return hist, hist_len + jnp.int32(toks.shape[0])

    # -- public API --------------------------------------------------------

    def submit(self, input_ids, images=None, temperature: float = 0.0,
               top_p: float = 1.0, max_new_tokens: int = 256,
               eos_id: int = 2, prefix=None) -> "queue.Queue[Any]":
        """Queue a request.  With ``prefix`` (an `engine.PrefixCache`),
        ``input_ids`` must start with the prefix's tokens and admission
        only prefills the suffix — the shared (system prompt + media)
        KV is copied from the cache instead of recomputed, so pooled
        serving of many questions about the SAME media skips the
        dominant per-request prefill cost.  Pass ``images=None`` then
        (the media lives in the prefix)."""
        if prefix is not None and images is not None:
            raise ValueError("pass media via the prefix, not images")
        req = _Request(list(input_ids), images, float(temperature),
                       float(top_p), int(max_new_tokens), int(eos_id),
                       prefix=prefix)
        self._queue.put(req)
        self._wake.set()
        return req.out

    drain = staticmethod(lambda outq: _drain(outq))

    def warmup(self, frames=0) -> None:
        """Compile every admission-bucket prefill (at every batched
        admission size, greedy AND sampled — ``do_sample`` is a static
        executable class and serving traffic defaults to temperature > 0)
        + every pooled decode chunk size (each ramp entry and the
        steady-state ``steps`` are distinct ``n_steps`` executables).

        ``frames`` may be an int or a sequence of frame counts — media
        admission prefills are per-frame-geometry executables, so a
        worker serving mixed image/video traffic through the pool warms
        every frame bucket (pass ``engine.frame_buckets``)."""
        self._warming = True   # adaptive controller must not flip modes
        try:
            self._warmup_body(frames)
        finally:
            self._warming = False
            self._spec_live = True
            self._plain_left = 0
            self._acc_ema = None
            self.spec_rounds = self.spec_emitted = 0
            self.spec_disables = 0

    def _warmup_body(self, frames) -> None:
        frame_list = ((frames,) if isinstance(frames, int) else
                      tuple(frames)) or (0,)
        if 0 not in frame_list:
            # text-only admission (has_images=False) is its own prefill
            # executable — the OpenAI route's text requests go through
            # the pool too; always warm it
            frame_list = frame_list + (0,)
        v = self.engine.cfg.vision
        media_dt = (np.uint8 if getattr(self.engine, "raw_media", False)
                    else np.float32)
        media = [np.zeros((1, t, 3, v.image_size, v.image_size),
                          media_dt) if t else None
                 for t in frame_list]
        # batched admission executables, compiled deterministically
        # (grouping via the queue depends on arrival timing): run each
        # (bucket, size) group through prefill AND pool insertion — the
        # multi-row _insert executable is per batch size and a cold
        # compile mid-traffic would stall the decode loop
        # a media prompt always carries the num_patches-token span plus
        # frame/marker tokens; admission buckets too small to ever hold
        # one would compile unreachable executables
        def feasible(bucket, images):
            if images is None:
                return True
            span = self.engine.cfg.num_patches + images.shape[1] + 4
            return bucket >= span

        for images in media:
            for bucket in self._admission_buckets:
                if not feasible(bucket, images):
                    continue
                for size in self._admit_sizes:
                    if size == 1:
                        continue   # covered by the submits below
                    for temp in (0.0, 0.7):
                        group = [_Request(list(range(2, 2 + bucket)),
                                          images, temp, 1.0, 1, -1)
                                 for _ in range(size)]
                        items = self._prefill_group(group)
                        for item in items:
                            self._ready.put(item)  # loop admits + frees
                            self._wake.set()
                        for r in group:
                            for _ in _drain(r.out):
                                pass
        new = 1 + sum(self.ramp) + self.steps
        # a length-b prompt lands exactly in admission bucket b; warm the
        # single-admission prefill in both sampling modes
        queues = [self.submit(list(range(2, 2 + b)), images=images,
                              max_new_tokens=new, eos_id=-1,
                              temperature=temp)
                  for images in media
                  for b in self._admission_buckets
                  if feasible(b, images)
                  for temp in (0.0, 0.7)]
        for outq in queues:
            for _ in _drain(outq):
                pass
        if self._spec is not None:
            # Speculative chunks are verification ROUNDS, each emitting
            # 1..draft_len+1 tokens per row, so the token-counted ramp
            # above visits the _spec_decode n_steps executables
            # acceptance-dependently — a high-acceptance warmup could
            # skip a size that a later request then compiles cold,
            # stalling the decode loop.  Force one pooled call at every
            # scheduled size; the driven request's budget exceeds the
            # max tokens those calls can emit, so it stays active until
            # every size has compiled.
            sizes = sorted(set(self.ramp) | {self.steps})
            budget = sum(sizes) * (self._spec.draft_len + 1) + 2
            self._force_chunks = list(sizes)
            outq = self.submit(list(range(2, 2 + self._admission_buckets[0])),
                               max_new_tokens=budget, eos_id=-1,
                               temperature=0.0)
            for _ in _drain(outq):
                pass
            # compile the adaptive controller's PLAIN fallback too (the
            # pool's _decode at every scheduled size + the hist-append)
            # so the first low-acceptance pause doesn't stall cold
            self._spec_live = False
            self._plain_left = 1 << 30
            self._force_chunks = list(sizes)
            outq = self.submit(list(range(2, 2 + self._admission_buckets[0])),
                               max_new_tokens=sum(sizes) + 2, eos_id=-1,
                               temperature=0.0)
            for _ in _drain(outq):
                pass
            self._force_chunks = []   # safety: resume the ramp schedule

    # -- prefill worker (admission never blocks the decode loop) ----------

    def _admit_key(self, req: _Request):
        """Requests sharing this key can prefill as one batched call
        (same prefill executable: admission bucket, media geometry,
        sampling mode)."""
        n = len(req.input_ids)
        bucket = next((b for b in self._admission_buckets if n <= b),
                      None)
        frames = None
        if req.images is not None:
            shape = np.asarray(req.images).shape
            frames = shape[1] if len(shape) >= 2 else None
        return (bucket, frames, req.temperature >= 1e-4)

    def _prefill_loop(self):
        pending: List[_Request] = []
        while True:
            if not pending:
                pending.append(self._queue.get())
            # opportunistically grab whatever else is already waiting so
            # a burst admits as batched prefills
            while len(pending) < 4 * self.admit_batch:
                try:
                    pending.append(self._queue.get_nowait())
                except queue.Empty:
                    break
            head = pending.pop(0)
            group = [head]
            if head.prefix is None and self.admit_batch > 1:
                key0 = self._admit_key(head)
                i = 0
                while i < len(pending) and len(group) < self.admit_batch:
                    r = pending[i]
                    if r.prefix is None and self._admit_key(r) == key0:
                        group.append(pending.pop(i))
                    else:
                        i += 1
                # pow2 group sizes only (bounded executable set); the
                # overflow returns to the queue front in order
                size = max(s for s in self._admit_sizes
                           if s <= len(group))
                pending[:0] = group[size:]
                group = group[:size]
            try:
                items = (self._prefill_group(group) if len(group) > 1
                         else [self._prefill_one(group[0])])
            except Exception as e:  # noqa: BLE001 — deliver, don't die
                logger.exception("prefill failed for request(s)")
                for r in group:
                    r.out.put(e)
                    r.out.put(_DONE)
                continue
            for item in items:
                self._ready.put(item)   # blocks when the park is full
                self._wake.set()

    def _prefill_from_prefix(self, req: _Request):
        """Admission via a PrefixCache: pad the cached (system prompt +
        media) KV fragment into a pool-size row, extend with the
        request's suffix tokens, then compact — the compacted row has
        slot == seq == live tokens, exactly the shape a plain prefilled
        row has, so insert/decode need no changes."""
        from valley_tpu.inference.engine import _compact_cache, _grow_cache

        eng = self.engine
        pc = req.prefix
        pre = list(pc.prefix_ids)
        ids_full = list(req.input_ids)
        if ids_full[:len(pre)] != pre:
            raise ValueError("input_ids do not start with the prefix")
        suffix = ids_full[len(pre):]
        c = len(suffix)
        if c == 0:
            raise ValueError("no suffix tokens after the prefix")
        cb = 1 << max(4, (c - 1).bit_length())   # pow2 chunk >= 16
        with self._key_lock:
            self._key, sub = jax.random.split(self._key)
        # the fragment spans its full prefix BUCKET; extend in a buffer
        # big enough for (bucket + chunk), compact the padding away,
        # then slice down to the pool row size
        tmp_len = max(self.smax, pc._slot + cb)
        cache, valid = _grow_cache(pc._frag, pc._valid, tmp_len)
        ids = np.zeros((1, cb), np.int32)
        ids[0, :c] = suffix
        tok, cache, valid, _seq = eng._extend(
            eng.params, cache, valid, jnp.asarray(ids),
            jnp.asarray([c], np.int32),
            jnp.asarray([pc._seq], np.int32), jnp.int32(pc._slot), sub,
            req.temperature, req.top_p,
            do_sample=req.temperature >= 1e-4)
        cache, valid, n_valid = _compact_cache(cache, valid)
        n = int(np.asarray(n_valid)[0])
        if n >= self.smax:
            raise ValueError(
                f"prompt of {n} tokens leaves no decode slots "
                f"(pool smax={self.smax})")
        if tmp_len > self.smax:
            cache = jax.tree.map(lambda x: x[:, :, :self.smax], cache)
            valid = valid[:, :self.smax]
        row_hist = None
        if self._spec is not None:
            row_hist = np.zeros((self.hist_max,), np.int32)
            row_hist[:len(ids_full)] = ids_full
        return req, tok, cache, valid, n, row_hist, 0

    def _prefill_group(self, group: List[_Request]):
        """One batched prefill call for ``len(group)`` compatible
        requests; returns one ready item per request (each row sliced
        out of the batch, shaped exactly like a `_prefill_one` result).
        Greedy output is identical to per-request prefills (the model
        rows are independent); sampled requests draw from the same
        per-call key they would get anyway."""
        eng = self.engine
        b = len(group)
        lens = np.asarray([len(r.input_ids) for r in group], np.int32)
        n_max = int(lens.max())
        if n_max > self.bucket:
            raise ValueError(
                f"prompt of {n_max} tokens exceeds the "
                f"{self.bucket}-token admission bucket")
        if n_max >= self.smax:
            raise ValueError(
                f"prompt of {n_max} tokens leaves no decode slots "
                f"(pool smax={self.smax})")
        bucket = next(bk for bk in self._admission_buckets
                      if n_max <= bk)
        ids = np.zeros((b, bucket), np.int32)
        for i, r in enumerate(group):
            ids[i, :lens[i]] = r.input_ids
        images = None
        if group[0].images is not None:
            # uint8 frames stay uint8 (device-side CLIP normalization,
            # half the H2D bytes); anything else normalizes to fp32 so a
            # mixed group can't silently upcast into a cold executable
            arrs = [np.asarray(r.images) for r in group]
            if any(a.dtype != np.uint8 for a in arrs):
                arrs = [np.asarray(a, np.float32) for a in arrs]
            images = np.concatenate(arrs, axis=0)
        images, frame_mask, has_images = eng._prepare_images(images, b)
        temps = np.asarray([r.temperature for r in group], np.float32)
        top_ps = np.asarray([r.top_p for r in group], np.float32)
        with self._key_lock:
            self._key, sub = jax.random.split(self._key)
        tok, _lg, cache, valid = eng._prefill(
            eng.params, jnp.asarray(ids), images, jnp.asarray(lens),
            sub, jnp.asarray(temps), jnp.asarray(top_ps), frame_mask,
            bucket=bucket, cache_len=self.smax,
            do_sample=bool(temps[0] >= 1e-4), has_images=has_images)
        # park the WHOLE batch result; each item inserts its own row
        # straight from it (src index) — no per-row copies or dispatches
        items = []
        for i, r in enumerate(group):
            row_hist = None
            if self._spec is not None:
                row_hist = np.zeros((self.hist_max,), np.int32)
                row_hist[:lens[i]] = r.input_ids
            items.append((r, tok, cache, valid, int(lens[i]), row_hist,
                          i))
        return items

    def _prefill_one(self, req: _Request):
        if req.prefix is not None:
            return self._prefill_from_prefix(req)
        eng = self.engine
        n = len(req.input_ids)
        if n > self.bucket:
            raise ValueError(
                f"prompt of {n} tokens exceeds the "
                f"{self.bucket}-token admission bucket")
        if n >= self.smax:
            raise ValueError(
                f"prompt of {n} tokens leaves no decode slots "
                f"(pool smax={self.smax})")
        # smallest engine bucket that fits: short prompts prefill cheap
        bucket = next(b for b in self._admission_buckets if n <= b)
        with self._key_lock:
            self._key, sub = jax.random.split(self._key)
        lens = np.asarray([n], np.int32)
        ids = np.zeros((1, bucket), np.int32)
        ids[0, :n] = req.input_ids
        images, frame_mask, has_images = eng._prepare_images(
            req.images, 1)
        tok, _lg, row_cache, row_valid = eng._prefill(
            eng.params, jnp.asarray(ids), images, jnp.asarray(lens),
            sub, req.temperature, req.top_p, frame_mask, bucket=bucket,
            cache_len=self.smax, do_sample=req.temperature >= 1e-4,
            has_images=has_images)
        row_hist = None
        if self._spec is not None:
            row_hist = np.zeros((self.hist_max,), np.int32)
            row_hist[:n] = req.input_ids
        return req, tok, row_cache, row_valid, n, row_hist, 0

    # -- scheduler loop ----------------------------------------------------

    def _next_chunk(self) -> int:
        """Fused step count for the next pooled decode call: the smallest
        next-scheduled size over active rows — a ramp entry while any row
        is still inside the ramp, ``steps`` once every row has matured.
        Only values from ``ramp`` ∪ {steps} ever occur, so warmup covers
        every executable."""
        if self._force_chunks:
            # warmup drains these to visit every scheduled size exactly
            # once regardless of speculative acceptance (list is only
            # ever populated by warmup, consumed by this loop thread)
            return self._force_chunks.pop(0)
        if not self.ramp:
            return self.steps
        best = self.steps
        for req in self._active:
            if req is None:
                continue
            done = req.emitted - 1   # tokens from pooled decode so far
            acc = 0
            for r in self.ramp:
                acc += r
                if done < acc:
                    best = min(best, r)
                    break
        return best

    def _admit(self):
        # Phase 1: dispatch every insert (async) so the device work for
        # k admissions pipelines; phase 2: transfer the first tokens and
        # emit.  A per-row sync between inserts would pay the ~25 ms
        # dispatch round trip k times at every chunk boundary.
        admitted = []
        for b in range(self.rows):
            if self._active[b] is not None:
                continue
            try:
                (req, tok, row_cache, row_valid, n,
                 row_hist, src) = self._ready.get_nowait()
            except queue.Empty:
                break
            try:
                self._insert_row(req, tok, row_cache, row_valid, n,
                                 row_hist, src, b)
            except Exception as e:  # noqa: BLE001 — deliver, don't die
                logger.exception("row insert failed")
                req.out.put(e)
                req.out.put(_DONE)
                # donated pool buffers may be invalid now
                for r in range(self.rows):
                    other = self._active[r]
                    if other is not None:
                        other.out.put(RuntimeError("pool reset"))
                        other.out.put(_DONE)
                        self._active[r] = None
                self._reset_pool()
                return
            admitted.append((b, req, tok, src))
        if not admitted:
            return
        # one transfer for ALL admitted first-tokens (a per-row
        # np.asarray would pay the ~25 ms device round trip k times)
        toks_np = jax.device_get([tok for _, _, tok, _ in admitted])
        for (b, req, _, src), tnp in zip(admitted, toks_np):
            t = int(tnp[src])
            req.out.put(t)
            req.emitted = 1
            self._finish_if_done(b, t)

    def _insert_row(self, req, tok, row_cache, row_valid, n, row_hist,
                    src: int, b: int):
        (self._cache, self._valid, self._token, self._slot,
         self._seq) = self._insert(
            self._cache, self._valid, self._token, self._slot,
            self._seq, row_cache, row_valid, tok,
            jnp.asarray(np.int32(n)), jnp.int32(src), jnp.int32(b))
        self._active[b] = req
        self._temps[b] = req.temperature
        self._top_ps[b] = req.top_p
        # cap generation to the slots actually available after the
        # (compacted) prompt
        if self._spec is None:
            req.max_new_tokens = min(req.max_new_tokens, self.smax - n)
        else:
            # speculative rounds write draft_len+1 wide: keep the
            # whole verification window in-bounds for active rows
            req.max_new_tokens = min(
                req.max_new_tokens,
                self.smax - n - (self._spec.draft_len + 1))
            self._hist, self._hist_len = self._insert_hist(
                self._hist, self._hist_len, jnp.asarray(row_hist),
                tok, jnp.int32(src), jnp.asarray(np.int32(n)),
                jnp.int32(b))
        # the prefill-sampled token is the first output token; the
        # caller (_admit) transfers and emits it after ALL inserts of
        # this boundary have dispatched

    def _finish_if_done(self, b: int, tok: int):
        req = self._active[b]
        if req is None:
            return
        if tok == req.eos_id or req.emitted >= req.max_new_tokens:
            req.out.put(_DONE)
            self._active[b] = None
            self._temps[b] = 0.0

    def _loop(self):
        while True:
            if all(r is None for r in self._active) and \
                    self._ready.empty():
                self._wake.wait(timeout=1.0)
                self._wake.clear()
                continue
            self._admit()
            if all(r is None for r in self._active):
                continue
            with self._key_lock:
                self._key, sub = jax.random.split(self._key)
            counts_np = None
            n_steps = self._next_chunk()
            use_spec = self._spec is not None
            if use_spec and not self._spec_live:
                # adaptive plain mode: decode plain chunks until the
                # re-probe countdown expires (the re-probe itself is the
                # next chunk's speculative call)
                use_spec = False
                self._plain_left -= 1
                if self._plain_left <= 0:
                    self._spec_live = True
            active_mask = [self._active[b] is not None
                           for b in range(self.rows)]
            try:
                if not use_spec:
                    toks, self._cache, self._valid, self._token, \
                        self._slot, self._seq = self._decode(
                            self.engine.params, self._cache, self._valid,
                            self._token, self._slot, self._seq, sub,
                            jnp.asarray(self._temps),
                            jnp.asarray(self._top_ps),
                            n_steps=n_steps)
                    if self._spec is not None:
                        # keep draft histories fresh for the re-probe
                        self._hist, self._hist_len = self._append_hist(
                            self._hist, self._hist_len, toks)
                else:
                    (toks, counts, self._cache, self._valid, self._token,
                     self._slot, self._seq, self._hist,
                     self._hist_len) = self._spec_decode(
                        self.engine.params, self._cache, self._valid,
                        self._token, self._slot, self._seq, self._hist,
                        self._hist_len, sub, jnp.asarray(self._temps),
                        jnp.asarray(self._top_ps), n_steps=n_steps)
                    counts_np = np.asarray(counts)   # (steps, rows)
            except Exception as e:  # noqa: BLE001 — deliver, don't die
                logger.exception("decode chunk failed")
                for b in range(self.rows):
                    req = self._active[b]
                    if req is not None:
                        req.out.put(e)
                        req.out.put(_DONE)
                        self._active[b] = None
                # donated cache/valid buffers may be invalid now
                self._reset_pool()
                continue
            if counts_np is not None:
                # pool acceptance telemetry + adaptive decision, over
                # rows that were active when the chunk launched
                act = [b for b in range(self.rows) if active_mask[b]]
                if act:
                    acc = float(np.mean(counts_np[:, act] - 1))
                    self.spec_rounds += counts_np.shape[0] * len(act)
                    self.spec_emitted += int(counts_np[:, act].sum())
                    if self._acc_ema is None:
                        self._acc_ema = acc
                    else:
                        self._acc_ema += 0.2 * (acc - self._acc_ema)
                    from valley_tpu.inference.speculative import \
                        resolved_disable_below

                    threshold = resolved_disable_below(self._spec,
                                                       self.engine)
                    if self._spec.adaptive and not self._warming and \
                            self._acc_ema < threshold:
                        self._spec_live = False
                        self._plain_left = self._spec.reprobe_chunks
                        self.spec_disables += 1
                        logger.info(
                            "pool speculation paused (acceptance EMA "
                            "%.2f < %.2f); re-probe in %d chunks",
                            self._acc_ema, threshold,
                            self._plain_left)
                        # the probe chunk must re-measure fresh traffic,
                        # not inherit the low EMA that paused it
                        self._acc_ema = None
            toks_np = np.asarray(toks)   # (steps, rows) | (steps, rows, D+1)
            for step in range(toks_np.shape[0]):
                for b in range(self.rows):
                    req = self._active[b]
                    if req is None:
                        continue
                    # ignore tokens decoded after this row finished within
                    # the chunk (they stay masked-off for the next request)
                    if counts_np is None:
                        row_toks = (int(toks_np[step, b]),)
                    else:
                        row_toks = [int(t) for t in
                                    toks_np[step, b, :counts_np[step, b]]]
                    for t in row_toks:
                        req.out.put(t)
                        req.emitted += 1
                        self._finish_if_done(b, t)
                        if self._active[b] is None:
                            break


def _drain(outq):
    while True:
        item = outq.get()
        if item is _DONE:
            return
        if isinstance(item, Exception):
            raise item
        yield item
