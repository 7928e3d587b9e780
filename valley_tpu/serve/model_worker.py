"""Model worker: serves a jit-compiled Valley engine over HTTP.

Behavioral parity with `valley/serve/model_worker.py`: registration +
15s heartbeat with re-register on forgotten (`:123-160`), status payload
(`:169-174`), `/worker_generate_stream` accepting
``{prompt, images|videos, temperature, max_new_tokens, stop}`` where the
prompt carries `<image>`/`<video>` placeholders expanded server-side
(`:176-241,320-341`), streaming ``{"text": ori_prompt + generated,
"error_code": 0}\\0`` chunks every ``stream_interval`` tokens
(`:278-291`), concurrency limiting (`:461-474`), and the error gate
mapping exceptions to error_code 1 (`:428-449`).

The decode loop itself is the TPU engine — bucketed prefill + fused
multi-step decode — instead of the reference's per-token python loop.
"""

from __future__ import annotations

import argparse
import base64
import json
import logging
import threading
import time
import uuid
from io import BytesIO
from typing import Optional

import numpy as np

from valley_tpu.constants import (DEFAULT_IM_END_TOKEN,
                                  DEFAULT_IM_START_TOKEN,
                                  DEFAULT_IMAGE_PATCH_TOKEN,
                                  DEFAULT_IMAGE_TOKEN,
                                  DEFAULT_VI_END_TOKEN,
                                  DEFAULT_VI_START_TOKEN,
                                  DEFAULT_VIDEO_FRAME_TOKEN,
                                  DEFAULT_VIDEO_TOKEN,
                                  WORKER_HEART_BEAT_INTERVAL)
from valley_tpu.serve import hbm
from valley_tpu.serve.httpd import JsonHttpServer, post_json
from valley_tpu.utils.logging import server_error_msg

logger = logging.getLogger("model_worker")

# extra_slots for PrefixCache entries built by the worker: stateless
# prefix requests are single-turn, so the multi-turn default
# (4*(max_new+64) slots — ~1.1 GB of transient spawn cache per in-flight
# request at 7B int8) is replaced by the 512-slot class the session path
# already warms (~0.53 GB total spawn cache).  Caps the question suffix
# at 512 tokens; longer suffixes fall back to the plain path.
_PREFIX_SPAWN_EXTRA = 512


class ModelWorker:
    def __init__(self, controller_addr: str, worker_addr: str,
                 model_name: str, engine, tokenizer,
                 limit_model_concurrency: int = 5,
                 stream_interval: int = 2,
                 no_register: bool = False,
                 num_frames: int = 8,
                 batch_window_ms: float = 0.0,
                 max_batch: int = 4,
                 max_sessions: int = 0,
                 speculative: bool = False,
                 frame_mode: str = "fixed",
                 prefix_cache: int = 0,
                 admit_batch: int = 4,
                 hbm_budget_gb: Optional[float] = None,
                 context_len: Optional[int] = None,
                 raw_pixels: bool = True):
        self.controller_addr = controller_addr
        self.worker_addr = worker_addr
        self.worker_id = str(uuid.uuid4())[:6]
        self.model_name = model_name
        self.engine = engine
        self.tokenizer = tokenizer
        self.num_frames = num_frames
        self.frame_mode = frame_mode
        # Media loaders emit RAW uint8 frames; CLIP normalization runs on
        # device (`valley.encode_images`).  Halves the host->device
        # transfer — the dominant video first-token cost on a ~16 MB/s
        # link (tools/exp_first_token.py).  --no-raw-pixels restores
        # host-side fp32 normalization + bf16 transfer.
        self.raw_pixels = raw_pixels
        self.stream_interval = stream_interval
        # prompt clamp (reference parity: `model_worker.py:92` caps at the
        # model's 2048).  --context-len overrides for long-context
        # engines (a 4096 bucket + rope_scaling / a 4096-native LLaMA-2)
        self.context_len = context_len or getattr(
            tokenizer, "model_max_length", 2048)
        self._semaphore = threading.Semaphore(limit_model_concurrency)
        self._limit = limit_model_concurrency
        self._active = 0
        self._active_lock = threading.Lock()  # mutated from handler threads
        self.batcher = None
        self.continuous = None
        if batch_window_ms > 0:
            from valley_tpu.serve.batcher import DynamicBatcher

            self.batcher = DynamicBatcher(engine, max_batch=max_batch,
                                          window_ms=batch_window_ms)
        elif batch_window_ms < 0:
            # negative window => iteration-level continuous batching
            # (--speculative composes: per-row n-gram verification rounds)
            from valley_tpu.inference.continuous import ContinuousEngine

            self.continuous = ContinuousEngine(engine, rows=max_batch,
                                               speculative=speculative,
                                               admit_batch=admit_batch)
        # session-id mode: multi-turn KV reuse behind the UNCHANGED wire
        # protocol (client still sends the full conversation; the worker
        # prefix-matches tokens and extends the session with the delta)
        self.max_sessions = max_sessions
        self._sessions: "dict[str, tuple]" = {}
        self._session_lock = threading.Lock()
        # --prefix-cache N: keep the KV of up to N (media + system-prompt)
        # prefixes; repeat requests about the same video skip the whole
        # prefix prefill (the reference re-prefills per request,
        # `model_worker.py:371-376`).  LRU; hit/miss counters for tests
        # and ops visibility.
        self.prefix_cache_size = prefix_cache
        self._prefix_caches: "dict[str, object]" = {}
        self._prefix_lock = threading.Lock()
        # key -> Event: dedups concurrent misses on the SAME key (the
        # second request waits on the first build instead of running a
        # duplicate prefill; see _prefix_lookup)
        self._prefix_inflight: "dict[str, threading.Event]" = {}
        self.prefix_hits = 0
        self.prefix_misses = 0
        # serving telemetry, surfaced under "stats" in /worker_get_status
        # (additive to the reference's status wire format)
        self._stats_lock = threading.Lock()
        self.stats_requests = 0
        self.stats_tokens = 0
        # --speculative: stateless requests decode via n-gram
        # self-speculation (greedy: token-identical; sampled: exact
        # sample_token distribution; inference/speculative.py)
        self._speculative = speculative
        self.spec_decoder = None
        if speculative and self.continuous is None and self.batcher is None:
            from valley_tpu.inference.speculative import SpecDecoder

            self.spec_decoder = SpecDecoder(engine)
        # --hbm-budget: ONE accountant over everything resident on the
        # chip (weights, pool incl. parked worst case, sessions, prefix
        # fragments, stateless in-flight worst case).  Fixed allocations
        # over budget are rejected HERE (startup), dynamic ones evict
        # across caches or degrade instead of OOMing mid-traffic.  The
        # reference's crude equivalent is a hardcoded 13 GiB/GPU cap
        # (`model_worker.py:57`).  None = auto (device-reported HBM minus
        # headroom; disabled when the backend doesn't report, e.g. CPU
        # test meshes); <= 0 = disabled.
        self.hbm = None
        self.session_refusals = 0
        self.prefix_budget_skips = 0
        self._hbm_shards = 1
        total = None
        if hbm_budget_gb is None:
            cap = hbm.device_hbm_bytes()
            if cap:
                # headroom for XLA temps/output buffers (the 13B AOT
                # table measured <=1.5 GB temps for pooled decode) and
                # host->device staging
                total = cap - max(2 * hbm.GiB, int(0.10 * cap))
        elif hbm_budget_gb > 0:
            total = int(hbm_budget_gb * hbm.GiB)
        if total:
            mesh = getattr(engine, "mesh", None)
            self._hbm_shards = mesh.size if mesh is not None else 1
            self.hbm = hbm.HbmBudget(total)
            self.hbm.register_fixed(
                "weights", hbm.tree_bytes(engine.params) // self._hbm_shards)
            if getattr(engine, "w4_packed", False):
                # nibble-packed weights expand to real int4 INSIDE every
                # executable (ops/quant.unpack_int4_view) — an XLA temp
                # the size of the packed tensors themselves, live for
                # the whole fused call.  Invisible to allocation-based
                # accounting, so register it as fixed: a config that
                # fits resident bytes but OOMs mid-decode must be
                # rejected at startup like any other over-budget config.
                from valley_tpu.ops.quant import QUANT_TARGETS

                lay = engine.params["llama"]["layers"]
                unpack = sum(lay[k].nbytes for k in QUANT_TARGETS
                             if k in lay
                             and lay[k].dtype == np.uint8)
                head = engine.params["llama"].get("lm_head")
                if head is not None and head.dtype == np.uint8:
                    unpack += head.nbytes
                self.hbm.register_fixed(
                    "w4_unpack_temp", unpack // self._hbm_shards)
            slot = hbm.kv_slot_bytes(engine.cfg.text, engine.cache_dtype)
            if self.continuous is not None:
                pool = hbm.tree_bytes(self.continuous._cache)
                pool += hbm.tree_bytes(getattr(self.continuous, "_hist",
                                               None) or ())
                parked = (self.continuous.ready_depth
                          + self.continuous.admit_batch - 1)
                pool += parked * self.continuous.smax * slot
                self.hbm.register_fixed("pool", pool // self._hbm_shards)
            elif self.batcher is not None:
                rows = max_batch * (engine.buckets[-1]
                                    + engine.max_new_tokens
                                    + engine.steps_per_call) * slot
                self.hbm.register_fixed("batcher",
                                        rows // self._hbm_shards)
            else:
                # plain-path worst case: every concurrency slot running a
                # stateless generate / prefix spawn at the largest bucket
                # (prefix spawns use the 512-slot extra class, the larger
                # of the two transient shapes)
                slots = (engine.buckets[-1] + engine.max_new_tokens
                         + 512 + engine.steps_per_call)
                self.hbm.register_fixed(
                    "inflight",
                    limit_model_concurrency * slots * slot
                    // self._hbm_shards)
            logger.info("hbm budget: %s", self.hbm.snapshot())
        if not no_register:
            try:
                self.register_to_controller()
            except Exception as e:
                # controller not up yet — the heartbeat loop keeps
                # retrying registration (reference workers also
                # re-register when forgotten, `model_worker.py:158-160`)
                logger.warning("initial registration failed (%s); will "
                               "retry from the heartbeat loop", e)
            self._hb = threading.Thread(target=self._heartbeat_loop,
                                        daemon=True)
            self._hb.start()

    # -- control plane ---------------------------------------------------

    def register_to_controller(self):
        logger.info("Register to controller")
        post_json(self.controller_addr + "/register_worker", {
            "worker_name": self.worker_addr,
            "check_heart_beat": True,
            "worker_status": self.get_status(),
        })

    def _heartbeat_loop(self):
        while True:
            time.sleep(WORKER_HEART_BEAT_INTERVAL)
            self.send_heart_beat()

    def send_heart_beat(self):
        try:
            exist = post_json(self.controller_addr + "/receive_heart_beat", {
                "worker_name": self.worker_addr,
                "queue_length": self.get_queue_length(),
            }, timeout=5).get("exist", False)
            if not exist:
                self.register_to_controller()
        except Exception as e:
            logger.error("heart beat error: %s", e)

    def get_queue_length(self) -> int:
        return max(0, self._active)

    def warmup_serving_paths(self) -> None:
        """Pre-compile the prefix-cache / session executables that
        ``engine.warmup()`` (stateless prefill+decode) does not cover —
        a cold compile on the first real request stalls behind the
        controller's 60 s proxy timeout.  Covers every engine frame
        bucket; session warm uses the 512-quantized extra_slots class
        that requests with max_new_tokens <= 128 share."""
        eng = self.engine
        if self.prefix_cache_size <= 0 and self.max_sessions <= 0 \
                and self.spec_decoder is None:
            return
        from valley_tpu.inference.engine import (ChatSession,
                                                 GenerationConfig,
                                                 PrefixCache)

        tok = eng.cfg.tokens
        p = eng.cfg.num_patches
        v = eng.cfg.vision
        # warm BOTH sampling modes: do_sample is a static executable
        # class on the extend/decode jits and real traffic defaults to
        # temperature > 0 (worker default 1.0)
        gens = (GenerationConfig(max_new_tokens=2, do_sample=False),
                GenerationConfig(max_new_tokens=2, do_sample=True,
                                 temperature=0.7))
        if self.prefix_cache_size > 0:
            for t in (eng.frame_buckets or (self.num_frames,)):
                span = ([tok.im_start] + [tok.im_patch] * p
                        + [tok.im_end] + [tok.vi_start]
                        + [tok.vi_frame] * t + [tok.vi_end])
                images = np.zeros((1, t, 3, v.image_size, v.image_size),
                                  np.uint8 if self.raw_pixels
                                  else np.float32)
                pc = PrefixCache(eng, [1] + span, images,
                                 extra_slots=_PREFIX_SPAWN_EXTRA)
                for gen in gens:
                    sess = pc.spawn(gen=gen,
                                    speculative=self._speculative)
                    sess.chat([5, 6], tokenizer=self.tokenizer,
                              eos_ids=[-1])
                logger.info("warmed prefix path (%d frames)", t)
            if self.continuous is not None:
                # prefix admission INTO the pool compiles its own
                # executables (_grow_cache / pool-geometry _extend /
                # _compact_cache + insert) — warm them or the first
                # prefix request on a pooled worker stalls cold.  The
                # _extend executable is keyed on the pow2 suffix-chunk
                # width, so warm the common question-length classes
                # (16 / 32 / 64 tokens); these are frame-bucket-
                # independent (one pass with the last prefix suffices).
                from valley_tpu.inference.continuous import _drain
                for suffix_len in (2, 17, 33):
                    for temp in (0.0, 0.7):
                        outq = self.continuous.submit(
                            list(pc.prefix_ids)
                            + list(range(5, 5 + suffix_len)), prefix=pc,
                            max_new_tokens=1, eos_id=-1,
                            temperature=temp)
                        for _ in _drain(outq):
                            pass
                logger.info("warmed pooled prefix admission")
        if self.max_sessions > 0:
            for gen in gens:
                sess = ChatSession(eng, gen, extra_slots=512)
                sess.chat([5, 6], tokenizer=self.tokenizer, eos_ids=[-1])
                sess.chat([7, 8], tokenizer=self.tokenizer, eos_ids=[-1])
            logger.info("warmed session path")
        if self.max_sessions > 0 and self._speculative:
            # the acceptance-adaptive controller finishes low-acceptance
            # turns on the PLAIN session loop — compile it at the
            # spec-session cache shapes by forcing a probe-then-disable
            # turn (disable_below=10 guarantees the switch)
            from valley_tpu.inference.speculative import (SpecChatSession,
                                                          SpecConfig)

            sp = SpecConfig(disable_below=10.0)
            long_gens = tuple(
                GenerationConfig(max_new_tokens=48,
                                 do_sample=g.do_sample,
                                 temperature=g.temperature) for g in gens)
            for gen in long_gens:
                sess = SpecChatSession(eng, gen, extra_slots=512, spec=sp)
                sess.chat([5, 6], tokenizer=self.tokenizer, eos_ids=[-1])
            logger.info("warmed adaptive session fallback")
        if self.spec_decoder is not None:
            # stateless speculative path: compile the probe + steady
            # round executables (adaptive off so high acceptance can't
            # skip steady) and the plain fallback (forced disable), in
            # both sampling modes
            sd = self.spec_decoder
            saved = (sd.spec.adaptive, sd.spec.disable_below)
            budget = 4 * (sd.spec.draft_len + 1) + 8
            try:
                for do_sample, temp in ((False, 0.0), (True, 0.7)):
                    g = GenerationConfig(max_new_tokens=budget,
                                         do_sample=do_sample,
                                         temperature=temp)
                    sd.spec.adaptive = False
                    for _ in sd.generate_tokens(
                            [5, 6], gen=g, eos_ids=[-1]):
                        pass
                    sd.spec.adaptive, sd.spec.disable_below = True, 10.0
                    for _ in sd.generate_tokens(
                            [5, 6], gen=g, eos_ids=[-1]):
                        pass
            finally:
                sd.spec.adaptive, sd.spec.disable_below = saved
            logger.info("warmed stateless speculative paths")

    def _hbm_make_room(self, deficit: int) -> int:
        """Budget eviction across caches: prefix fragments first (pure
        optimization — a future request re-prefills), then idle sessions
        (the client's next turn falls back to a full-conversation
        prefill, correctness preserved).  Returns bytes freed."""
        if self.hbm is None:
            return 0
        freed = 0
        with self._prefix_lock:
            while self._prefix_caches and freed < deficit:
                k = next(iter(self._prefix_caches))
                self._prefix_caches.pop(k)
                freed += self.hbm.release(f"prefix:{k}")
                logger.info("hbm: evicted prefix %s", k)
        if freed >= deficit:
            return freed
        with self._session_lock:
            while self._sessions and freed < deficit:
                sid = next(iter(self._sessions))
                self._sessions.pop(sid)
                freed += self.hbm.release(f"session:{sid}")
                logger.info("hbm: evicted idle session %s", sid)
        return freed

    def _count(self, tokens: int = 0, requests: int = 0) -> None:
        with self._stats_lock:
            self.stats_requests += requests
            self.stats_tokens += tokens

    def get_status(self) -> dict:
        stats = {"requests": self.stats_requests,
                 "tokens_generated": self.stats_tokens,
                 "active_sessions": len(self._sessions)}
        if self.prefix_cache_size > 0:
            stats["prefix_hits"] = self.prefix_hits
            stats["prefix_misses"] = self.prefix_misses
        sd = self.spec_decoder
        if sd is not None and sd.total_rounds:
            stats["spec_rounds"] = sd.total_rounds
            stats["spec_accept_per_round"] = round(
                sd.total_emitted / sd.total_rounds, 3)
            stats["spec_disables"] = sd._shared.get("disabled", 0)
        ce = self.continuous
        if ce is not None and getattr(ce, "spec_rounds", 0):
            stats["spec_rounds"] = ce.spec_rounds
            stats["spec_accept_per_round"] = round(
                ce.spec_emitted / ce.spec_rounds, 3)
            stats["spec_pool_paused"] = not ce._spec_live
            stats["spec_disables"] = ce.spec_disables
        if self.hbm is not None:
            stats["hbm"] = self.hbm.snapshot()
            if self.session_refusals:
                stats["session_refusals"] = self.session_refusals
            if self.prefix_budget_skips:
                stats["prefix_budget_skips"] = self.prefix_budget_skips
        return {"model_names": [self.model_name], "speed": 1,
                "queue_length": self.get_queue_length(), "stats": stats}

    # -- media -----------------------------------------------------------

    def _media_replace_token(self, num_frames: int) -> str:
        return (DEFAULT_IM_START_TOKEN
                + DEFAULT_IMAGE_PATCH_TOKEN * self.engine.cfg.num_patches
                + DEFAULT_IM_END_TOKEN + DEFAULT_VI_START_TOKEN
                + DEFAULT_VIDEO_FRAME_TOKEN * num_frames
                + DEFAULT_VI_END_TOKEN)

    def _prepare_images(self, prompt: str, images_b64: list):
        """b64 JPEG/PNG list -> (expanded prompt, (1, T, 3, H, W) frames).
        Each image becomes one 'frame' (`model_worker.py:186-218`)."""
        from PIL import Image

        from valley_tpu.data.dataset import preprocess_image

        if prompt.count(DEFAULT_IMAGE_TOKEN) != len(images_b64):
            raise ValueError("Number of images does not match number of "
                             "<image> tokens in prompt")
        size = self.engine.cfg.vision.image_size
        frames = [preprocess_image(
            Image.open(BytesIO(base64.b64decode(img))).convert("RGB"),
            crop_size=size, scale_size=size,
            raw_pixels=self.raw_pixels) for img in images_b64]
        arr = np.stack(frames)[None]  # (1, T, 3, H, W)
        prompt = prompt.replace(DEFAULT_IMAGE_TOKEN,
                                self._media_replace_token(len(frames)))
        return prompt, arr

    def _prepare_videos(self, prompt: str, videos: list):
        """Video paths (or b64 mp4) -> (expanded prompt, frames)."""
        from valley_tpu.data.video import load_video

        if prompt.count(DEFAULT_VIDEO_TOKEN) != len(videos):
            raise ValueError("Number of video does not match number of "
                             "<video> tokens in prompt")
        if len(videos) != 1:
            raise ValueError("Only one video per request is supported")
        video = videos[0]
        if not isinstance(video, str) or len(video) > 4096:
            import tempfile

            with tempfile.NamedTemporaryFile(suffix=".mp4",
                                             delete=False) as f:
                f.write(base64.b64decode(video))
                video = f.name
        size = self.engine.cfg.vision.image_size
        clip = load_video(video, frame_mode=self.frame_mode,
                          fixed_frame_number=self.num_frames,
                          crop_size=size,
                          scale_size=max(size * 256 // 224, size),
                          raw_pixels=self.raw_pixels)
        frames = np.transpose(clip, (1, 0, 2, 3))[None]  # (1, T, 3, H, W)
        prompt = prompt.replace(
            DEFAULT_VIDEO_TOKEN, self._media_replace_token(frames.shape[1]))
        return prompt, frames

    # -- generation ------------------------------------------------------

    def generate_stream(self, params: dict):
        from valley_tpu.inference.engine import GenerationConfig

        self._count(requests=1)
        prompt = params["prompt"]
        ori_prompt = prompt
        images = None
        if params.get("videos"):
            prompt, images = self._prepare_videos(prompt, params["videos"])
        elif params.get("images"):
            prompt, images = self._prepare_images(prompt, params["images"])

        temperature = float(params.get("temperature", 1.0))
        max_new_tokens = min(int(params.get("max_new_tokens", 256)), 1024)
        stop_str = params.get("stop", None)

        input_ids = self.tokenizer.encode(prompt)
        # clamp to context (reference `model_worker.py:241`) AND to the
        # engine's largest compiled bucket
        max_src_len = min(self.context_len - max_new_tokens - 8,
                          self.engine.buckets[-1])
        input_ids = input_ids[-max_src_len:]

        gen = GenerationConfig(
            max_new_tokens=max_new_tokens, temperature=temperature,
            do_sample=temperature >= 1e-4,
            stop=(stop_str,) if stop_str else (),
            stream_interval=self.stream_interval,
            seed=int(params.get("seed", np.random.randint(1 << 31))))

        eos_id = getattr(self.tokenizer, "eos_token_id", 2) or 2
        session_id = params.get("session_id")
        if session_id and self.max_sessions > 0:
            yield from self._session_stream(
                session_id, input_ids, images, gen, stop_str, ori_prompt,
                eos_id)
            return
        if (self.prefix_cache_size > 0 and images is not None
                and self.continuous is None and self.batcher is None):
            stream = self._prefix_stream(params, prompt, images, input_ids,
                                         gen, stop_str, ori_prompt, eos_id)
            if stream is not None:
                yield from stream
                return
        if self.continuous is not None:
            # --prefix-cache composes with continuous batching: repeat
            # same-media requests admit from the cached prefix KV (only
            # the question's suffix prefills)
            pc = None
            if self.prefix_cache_size > 0 and images is not None:
                found = self._prefix_lookup(params, prompt, images,
                                            input_ids)
                if found is not None:
                    pc = found[0]
            outq = self.continuous.submit(
                input_ids, None if pc is not None else images,
                temperature, gen.top_p, max_new_tokens, eos_id, prefix=pc)
            from valley_tpu.inference.continuous import _drain

            token_iter = ((t,) for t in _drain(outq))
        elif self.batcher is not None:
            outq = self.batcher.submit(input_ids, images, temperature,
                                       gen.top_p, max_new_tokens, eos_id)
            token_iter = ((t,) for t in self.batcher.drain(outq))
        elif self.spec_decoder is not None:
            # greedy: token-identical; sampled: exact sample_token
            # distribution via speculative-sampling rejection
            token_iter = ((t,) for t in self.spec_decoder.generate_tokens(
                input_ids, images, gen, eos_ids=[eos_id]))
        else:
            token_iter = self.engine.generate_tokens(
                [input_ids], images, gen, eos_ids=[eos_id])
        pred_ids: list[int] = []
        stopped = False
        emitted = 0
        for i, tok in enumerate(token_iter):
            pred_ids.append(int(tok[0]))
            stopped = pred_ids[-1] == eos_id
            if i % self.stream_interval == 0 or stopped or \
                    i == max_new_tokens - 1:
                cur_out = self.tokenizer.decode(pred_ids,
                                                skip_special_tokens=True)
                if stop_str:
                    pos = cur_out.rfind(stop_str)
                    if pos != -1:
                        cur_out = cur_out[:pos]
                        stopped = True
                emitted += 1
                yield json.dumps({"text": ori_prompt + cur_out,
                                  "error_code": 0}).encode() + b"\0"
            if stopped:
                break
        self._count(tokens=len(pred_ids))
        if not emitted:
            yield json.dumps({"text": ori_prompt,
                              "error_code": 0}).encode() + b"\0"

    def _session_stream(self, session_id: str, input_ids, images, gen,
                        stop_str, ori_prompt: str, eos_id: int):
        """Multi-turn request with KV reuse.  The client sends the full
        conversation (reference protocol); if its tokens extend the
        session's known prefix, only the delta is prefilled.  With
        --speculative, sessions decode via SpecChatSession (n-gram
        rounds over the whole conversation history)."""
        if self._speculative:
            from valley_tpu.inference.speculative import \
                SpecChatSession as ChatSession
        else:
            from valley_tpu.inference.engine import ChatSession

        with self._session_lock:
            entry = self._sessions.pop(session_id, None)
            if entry is None and len(self._sessions) >= self.max_sessions:
                # LRU eviction: drop the stalest session
                oldest = next(iter(self._sessions))
                self._sessions.pop(oldest)
                if self.hbm is not None:
                    self.hbm.release(f"session:{oldest}")
                logger.info("evicted session %s", oldest)

        # extra_slots quantized UP to a 512 multiple: the session cache
        # length is part of the decode executable's shape, so a raw
        # 2*max_new+256 would recompile for every distinct client
        # max_new_tokens value
        extra = -(-(2 * gen.max_new_tokens + 256) // 512) * 512

        def new_session():
            sess = ChatSession(self.engine, gen, extra_slots=extra)
            if self.hbm is not None and not self.hbm.reserve(
                    f"session:{session_id}", "sessions",
                    hbm.session_cache_bytes(self.engine, extra,
                                            sess._decode_slack)
                    // self._hbm_shards,
                    self._hbm_make_room):
                # no room even after cross-cache eviction: refuse the
                # session instead of OOMing the chip (the error gate
                # maps this to an error_code reply)
                with self._stats_lock:
                    self.session_refusals += 1
                raise RuntimeError(
                    "HBM budget exhausted: cannot admit a new session "
                    "(retry later, or raise --hbm-budget / lower "
                    "--max-sessions)")
            return sess

        session, known = entry if entry else (None, [])
        delta = None
        if session is not None and session.started and \
                list(input_ids[:len(known)]) == known and \
                len(input_ids) > len(known):
            delta = list(input_ids[len(known):])
            session.gen = gen  # per-request sampling settings
        if delta is None:
            session = new_session()
            delta = list(input_ids)
            first_images = images
        else:
            first_images = None
        import queue as queue_mod

        stream_q: "queue_mod.Queue" = queue_mod.Queue()

        def run_chat():
            nonlocal session, delta
            try:
                try:
                    reply = session.chat(delta, images=first_images,
                                         tokenizer=self.tokenizer,
                                         eos_ids=[eos_id],
                                         on_token=stream_q.put)
                except RuntimeError as e:  # cache exhausted -> fresh
                    logger.info("session %s reset: %s", session_id, e)
                    fresh = new_session()
                    reply = fresh.chat(list(input_ids), images=images,
                                       tokenizer=self.tokenizer,
                                       eos_ids=[eos_id],
                                       on_token=stream_q.put)
                    session = fresh
                    delta = list(input_ids)
                stream_q.put(("done", reply))
            except Exception as e:  # pragma: no cover
                stream_q.put(("error", e))

        t = threading.Thread(target=run_chat, daemon=True)
        t.start()

        streamed: list = []
        reply = None
        while True:
            item = stream_q.get()
            if isinstance(item, tuple):
                kind, payload = item
                if kind == "error":
                    if self.hbm is not None:
                        # the session won't be stored back; drop its
                        # budget reservation
                        self.hbm.release(f"session:{session_id}")
                    raise payload
                reply = payload
                break
            streamed.append(int(item))
            if len(streamed) % self.stream_interval == 0:
                cur = self.tokenizer.decode(streamed,
                                            skip_special_tokens=True)
                if stop_str:
                    pos = cur.rfind(stop_str)
                    if pos != -1:
                        cur = cur[:pos]
                yield json.dumps({"text": ori_prompt + cur,
                                  "error_code": 0}).encode() + b"\0"

        self._count(tokens=len(reply))
        cur_out = self.tokenizer.decode(reply, skip_special_tokens=True)
        if stop_str:
            pos = cur_out.rfind(stop_str)
            if pos != -1:
                cur_out = cur_out[:pos]
        with self._session_lock:
            self._sessions[session_id] = (session,
                                          list(input_ids) + list(reply))
        if self.hbm is not None and session._state is not None:
            # correct the worst-case estimate to the exact resident bytes
            self.hbm.update(f"session:{session_id}",
                            hbm.tree_bytes(session._state[0])
                            // self._hbm_shards)
        yield json.dumps({"text": ori_prompt + cur_out,
                          "error_code": 0}).encode() + b"\0"

    def _prefix_split(self, prompt: str, input_ids):
        """(prefix_ids, suffix_ids) split at the end of the LAST media
        span — the shared part across requests about the same media is
        everything up to `</vi_end>`/`</im_end>`.  Token-exact by
        construction: the prefix must re-tokenize to a prefix of the full
        ids (the boundary is a special token, so real tokenizers never
        merge across it); returns None when it doesn't (or the context
        clamp trimmed into the prefix) and the caller falls back to the
        plain un-cached path."""
        idx = -1
        for end_tok in (DEFAULT_VI_END_TOKEN, DEFAULT_IM_END_TOKEN):
            pos = prompt.rfind(end_tok)
            if pos >= 0:
                idx = max(idx, pos + len(end_tok))
        if idx < 0:
            return None
        prefix_ids = self.tokenizer.encode(prompt[:idx])
        n = len(prefix_ids)
        if n == 0 or n >= len(input_ids) or \
                list(input_ids[:n]) != list(prefix_ids):
            return None
        return list(prefix_ids), list(input_ids[n:])

    def _prefix_stream(self, params: dict, prompt: str, images, input_ids,
                       gen, stop_str, ori_prompt: str, eos_id: int):
        """Serve a stateless media request through the PrefixCache: the
        (media + system prompt) prefill runs once per distinct media and
        is reused across requests — each request only extends with its
        question and decodes.  Token-identical to the plain path
        (tests/test_prefix_serving.py)."""
        found = self._prefix_lookup(params, prompt, images, input_ids)
        if found is None:
            return None
        pc, suffix_ids = found
        session = pc.spawn(gen=gen, speculative=self._speculative,
                           seed=gen.seed)
        return self._chat_stream(session, suffix_ids, stop_str,
                                 ori_prompt, eos_id)

    def _prefix_lookup(self, params: dict, prompt: str, images, input_ids):
        """(PrefixCache, suffix_ids) for a stateless media request, or
        None when the prompt can't be split token-exactly.  md5-keyed
        over (media, prefix tokens, frame geometry); LRU eviction."""
        import hashlib

        split = self._prefix_split(prompt, input_ids)
        if split is None:
            return None
        prefix_ids, suffix_ids = split
        if len(suffix_ids) > _PREFIX_SPAWN_EXTRA:
            return None   # suffix exceeds the spawn cache's extra class
        h = hashlib.md5()
        for m in (params.get("videos") or params.get("images") or []):
            h.update(m if isinstance(m, bytes) else str(m).encode())
        h.update(np.asarray(prefix_ids, np.int32).tobytes())
        h.update(f"{self.num_frames}/{self.frame_mode}".encode())
        key = h.hexdigest()

        from valley_tpu.inference.engine import PrefixCache

        while True:
            with self._prefix_lock:
                pc = self._prefix_caches.pop(key, None)
                if pc is not None:
                    self.prefix_hits += 1
                    self._prefix_caches[key] = pc   # MRU reinsert
                    return pc, suffix_ids
                building = self._prefix_inflight.get(key)
                if building is None:
                    # we own the build for this key
                    self.prefix_misses += 1
                    self._prefix_inflight[key] = threading.Event()
                    break
            # another request is already prefilling this exact key: wait
            # for its build instead of duplicating hundreds of ms of
            # device work (plus transient double HBM for the fragment),
            # then re-check the cache.  Bounded wait: if the builder died
            # without signalling, loop re-checks and may take over.
            building.wait(timeout=120.0)
        # build OUTSIDE the lock: the prefix prefill is hundreds of ms
        # of device work (tens of seconds cold) and a concurrent cache
        # HIT on a DIFFERENT key must not wait behind it
        try:
            if self.hbm is not None and not self.hbm.reserve(
                    f"prefix:{key}", "prefix",
                    hbm.prefix_fragment_bytes(self.engine, len(prefix_ids))
                    // self._hbm_shards,
                    self._hbm_make_room):
                # budget short even after cross-cache eviction: degrade
                # to the plain un-cached path instead of allocating
                with self._stats_lock:
                    self.prefix_budget_skips += 1
                logger.info("hbm: budget short, skipping prefix cache")
                return None
            pc = PrefixCache(self.engine, prefix_ids, images,
                             extra_slots=_PREFIX_SPAWN_EXTRA)
            with self._prefix_lock:
                if len(self._prefix_caches) >= self.prefix_cache_size:
                    evicted = next(iter(self._prefix_caches))
                    self._prefix_caches.pop(evicted)
                    self.hbm and self.hbm.release(f"prefix:{evicted}")
                    logger.info("evicted prefix %s", evicted)
                self._prefix_caches[key] = pc   # MRU insert
        finally:
            with self._prefix_lock:
                ev = self._prefix_inflight.pop(key, None)
            if ev is not None:
                ev.set()   # wake waiters (they re-check the cache)
        return pc, suffix_ids

    def _chat_stream(self, session, delta_ids, stop_str, ori_prompt: str,
                     eos_id: int):
        """Stream one ChatSession turn as reference wire chunks."""
        import queue as queue_mod

        stream_q: "queue_mod.Queue" = queue_mod.Queue()

        def run_chat():
            try:
                reply = session.chat(delta_ids, tokenizer=self.tokenizer,
                                     eos_ids=[eos_id],
                                     on_token=stream_q.put)
                stream_q.put(("done", reply))
            except Exception as e:  # pragma: no cover
                stream_q.put(("error", e))

        threading.Thread(target=run_chat, daemon=True).start()

        def _cut(text: str) -> str:
            if stop_str:
                pos = text.rfind(stop_str)
                if pos != -1:
                    return text[:pos]
            return text

        streamed: list = []
        while True:
            item = stream_q.get()
            if isinstance(item, tuple):
                kind, payload = item
                if kind == "error":
                    raise payload
                self._count(tokens=len(payload))
                cur = _cut(self.tokenizer.decode(
                    payload, skip_special_tokens=True))
                yield json.dumps({"text": ori_prompt + cur,
                                  "error_code": 0}).encode() + b"\0"
                return
            streamed.append(int(item))
            if len(streamed) % self.stream_interval == 0:
                cur = _cut(self.tokenizer.decode(
                    streamed, skip_special_tokens=True))
                yield json.dumps({"text": ori_prompt + cur,
                                  "error_code": 0}).encode() + b"\0"

    def generate_stream_gate(self, params: dict):
        with self._active_lock:
            self._active += 1
        try:
            with self._semaphore:
                yield from self.generate_stream(params)
        except ValueError as e:
            yield json.dumps({"text": f"{server_error_msg} ({e})",
                              "error_code": 1}).encode() + b"\0"
        except Exception as e:  # parity: error gate maps crashes to code 1
            logger.exception("generate failed")
            yield json.dumps({"text": f"{server_error_msg} ({e})",
                              "error_code": 1}).encode() + b"\0"
        finally:
            with self._active_lock:
                self._active -= 1


def build_app(worker: ModelWorker) -> JsonHttpServer:
    app = JsonHttpServer()

    @app.post("/worker_generate_stream")
    def worker_generate_stream(data):
        return worker.generate_stream_gate(data)

    @app.post("/worker_get_status")
    def worker_get_status(_data):
        return worker.get_status()

    # OpenAI-compatible /v1/chat/completions + /v1/models (beyond parity)
    from valley_tpu.serve.openai_api import register_openai_routes

    register_openai_routes(app, worker)
    return app


def load_engine(args):
    """Build the engine from a checkpoint dir or a random config."""
    import jax
    import jax.numpy as jnp

    from valley_tpu import config as C
    from valley_tpu.inference.engine import Engine
    from valley_tpu.models import valley

    load_quant = None   # set when quantize-on-load handled --quantize
    if args.model_path and args.model_path.startswith("random:") and \
            args.model_path != "random:tiny":
        # random-weight full-size models (perf validation without weights)
        size = args.model_path.split(":", 1)[1]
        from valley_tpu.tokenizer import ByteFallbackTokenizer

        tokenizer = ByteFallbackTokenizer()
        base = C.LLAMA2_13B if "13" in size else C.LLAMA2_7B
        cfg = C.ValleyConfig(text=base, tokens=tokenizer.special_tokens())
        shapes = jax.eval_shape(
            lambda k: valley.init_params(cfg, k, dtype=jnp.bfloat16),
            jax.random.key(0))
        params = jax.tree.map(lambda s: jnp.full(s.shape, 0.008, s.dtype),
                              shapes)
    elif args.model_path and args.model_path != "random:tiny":
        from valley_tpu.utils import hf_bridge

        # QUANTIZE-ON-LOAD (no LoRA: adapters need the bf16 base): the
        # decoder fuses/quantizes/packs on the HOST and only the final
        # quantized tree reaches the device — the path that serves a
        # 13B checkpoint from one 16 GB chip, whose bf16 tree (~26 GB)
        # can never transiently exist on it (hf_bridge; host math is
        # bit-identical to the device quantizer, tests/test_quant.py)
        load_quant = getattr(args, "quantize", None) \
            if not args.lora_path else None
        cfg, params, tokenizer = hf_bridge.load_valley_checkpoint(
            args.model_path, vision_tower=args.vision_tower,
            quantize=load_quant,
            fused=bool(getattr(args, "fused", False)) and bool(load_quant))
        if args.lora_path:
            from valley_tpu.train import lora as lora_lib
            from valley_tpu.utils import checkpoint as ckpt_lib

            adapter = ckpt_lib.restore_pytree(args.lora_path)
            params = lora_lib.merge_lora(
                lora_lib.load_lora(params, adapter))
    else:
        from valley_tpu.tokenizer import ByteFallbackTokenizer

        tokenizer = ByteFallbackTokenizer()
        cfg = C.valley_tiny().replace(tokens=tokenizer.special_tokens())
        params = valley.init_params(cfg, jax.random.key(0), jnp.float32)
    loaded_quantized = load_quant is not None
    if getattr(args, "fused", False) and not loaded_quantized:
        # 4 GEMVs/layer serving layout: +1.3 tok/s on the int8 7B
        # flagship (round 4).  After any LoRA merge, before quantize.
        from valley_tpu.models.llama import fuse_llama_params

        params = fuse_llama_params(params)
    if not loaded_quantized and getattr(args, "quantize", None):
        from valley_tpu.ops.quant import (pack_int4_params,
                                          parse_quant_mode,
                                          quantize_llama_params)

        # mode -> knobs (ops/quant.QUANT_MODES): int4g(p) = one scale per
        # 128 inputs (4x lower reconstruction error than per-channel at
        # the same decode speed — the block-diagonal GEMV formulation,
        # models/llama._proj); *a8 = W8A8/W4A8 prefill on the int8 MXU —
        # decode stays bit-identical to the non-a8 mode (llama._proj
        # sequence-length gate); *p = nibble-packed storage, resident
        # weights at 0.5 B/weight (how 13B serves from ONE 16 GB chip).
        qm = parse_quant_mode(args.quantize)
        params = quantize_llama_params(params, bits=qm["bits"],
                                       group_size=qm["group_size"],
                                       act8=qm["act8"])
        if qm["packed"]:
            params = pack_int4_params(params)
    if getattr(args, "quantize_vision", None) in ("int8", "int8a8"):
        # the frozen CLIP tower only runs prefill-shaped matmuls, so
        # int8a8 rides the int8 MXU on every tower call (clip_vit._dot)
        from valley_tpu.ops.quant import quantize_vision_params

        params = quantize_vision_params(
            params, act8=args.quantize_vision == "int8a8")
    cache_dtype = jnp.int8 if getattr(args, "kv_cache", "bf16") == "int8" \
        else jnp.bfloat16
    fb = getattr(args, "frame_buckets", "") or ""
    if fb.strip().lower() == "off":
        fb = ""
    fbt = tuple(int(b) for b in fb.split(",")) if fb else None
    if fbt and getattr(args, "num_frames", 8) > max(fbt):
        # make sure the configured video frame count has a bucket, so
        # warmup covers it and videos never hit a cold prefill
        fbt = fbt + (int(args.num_frames),)
    mesh = None
    tp = int(getattr(args, "tensor_parallel", 1) or 1)
    if tp > 1:
        # multi-chip tensor-parallel serving (the 13B-per-worker config:
        # int8 13B needs 2 chips — see tools/exp_13b_aot.py's per-shard
        # HBM proof; the reference spreads layers over GPUs via
        # device_map, `model_worker.py:55-58`)
        from valley_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(data=1, fsdp=1, model=tp)
    ramp = getattr(args, "decode_ramp", "") or ""
    if ramp.strip().lower() == "off":
        ramp = ""
    engine = Engine(cfg, params,
                    buckets=tuple(int(b) for b in args.buckets.split(",")),
                    max_new_tokens=args.max_new_tokens,
                    cache_dtype=cache_dtype,
                    steps_per_call=int(getattr(args, "steps_per_call", 32)
                                       or 32),
                    decode_ramp=tuple(int(s) for s in ramp.split(","))
                    if ramp else (),
                    decode_w4=getattr(args, "quantize", None) in
                    ("int4", "int4g", "int4ga8"),
                    w4_packed=getattr(args, "quantize", None) in
                    ("int4gp", "int4gpa8"),
                    frame_buckets=fbt, mesh=mesh,
                    raw_media=bool(getattr(args, "raw_pixels", True)))
    return engine, tokenizer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=21002)
    parser.add_argument("--worker-address", type=str,
                        default="http://localhost:21002")
    parser.add_argument("--controller-address", type=str,
                        default="http://localhost:21001")
    parser.add_argument("--model-path", type=str, default="random:tiny")
    parser.add_argument("--model-name", type=str, default="valley")
    parser.add_argument("--vision-tower", type=str, default=None)
    parser.add_argument("--lora-path", type=str, default=None)
    parser.add_argument("--buckets", type=str, default="256,512,1024,2048")
    parser.add_argument("--max-new-tokens", type=int, default=1024)
    parser.add_argument("--limit-model-concurrency", type=int, default=5)
    parser.add_argument("--stream-interval", type=int, default=2)
    parser.add_argument("--no-register", action="store_true")
    parser.add_argument("--num-frames", type=int, default=8)
    parser.add_argument("--frame-mode", type=str, default="fixed",
                        choices=["fixed", "adaptive"],
                        help="'adaptive' keeps the most visually "
                             "distinct frames from a 4x candidate pool "
                             "(long/repetitive videos)")
    parser.add_argument("--frame-buckets", type=str, default="1,4,8",
                        help="comma list: pad the media frame axis to "
                             "the smallest bucket so mixed image/frame "
                             "counts share one prefill executable "
                             "(mask-aware pooling).  Default '1,4,8' "
                             "covers single-image, multi-image and "
                             "8-frame video without recompiles; pass "
                             "'off' for exact shapes")
    parser.add_argument("--no-raw-pixels", dest="raw_pixels",
                        action="store_false", default=True,
                        help="load media as host-normalized bf16 frames "
                             "instead of the default RAW uint8 + "
                             "device-side CLIP normalization (uint8 "
                             "halves the host->device transfer — the "
                             "dominant video first-token cost; the "
                             "normalization math is identical fp32 "
                             "either way)")
    parser.add_argument("--warmup", action="store_true",
                        help="pre-compile every bucket before registering")
    parser.add_argument("--steps-per-call", type=int, default=32,
                        help="fused decode steps per device call; large "
                             "values amortize per-dispatch latency "
                             "(~25 ms on this fabric) into high steady "
                             "throughput.  Also the admission "
                             "granularity of continuous batching")
    parser.add_argument("--decode-ramp", type=str, default="2,6",
                        help="comma list of fused step counts for the "
                             "FIRST decode calls of each reply (then "
                             "--steps-per-call thereafter): bounds "
                             "first-chunk latency to a few tokens while "
                             "keeping steady-state throughput; 'off' "
                             "disables")
    parser.add_argument("--quantize", type=str, default=None,
                        choices=["int8", "int8a8", "int4", "int4g",
                                 "int4gp", "int4ga8", "int4gpa8"],
                        help="weight-only decoder quantization: int8 "
                             "(~1.8x decode), int8a8 (int8 decode + "
                             "W8A8 prefill on the int8 MXU — measured "
                             "same-window video first-token 0.141 s vs "
                             "int8's 0.155-0.160 s at identical decode "
                             "tok/s, round 5; prefill logits and "
                             "prefilled KV carry activation-quant "
                             "error — gate with tools/quant_report.py), "
                             "int4g (group-128 "
                             "scales — the recommended 4-bit mode: same "
                             "decode speed as per-channel at 4x lower "
                             "reconstruction error), int4gp (int4g "
                             "values NIBBLE-PACKED to 0.5 B/weight "
                             "resident — serves 13B from one 16 GB "
                             "chip), int4ga8/int4gpa8 (int4g/int4gp "
                             "decode + grouped W4A8 prefill on the int8 "
                             "MXU; same activation-quant caveat as "
                             "int8a8.  Measured round 5: int4ga8 wins "
                             "at 7B — video first-token 0.196 s vs "
                             "int4g's 0.204 same-window; int4gpa8 at "
                             "13B REGRESSES — 0.414 s vs int4gp's "
                             "0.379, the nibble unpack feeding the int8 "
                             "dot eats the MXU gain (tools/"
                             "exp_w4a8_aot.py) — keep int4gp for 13B), "
                             "or int4 "
                             "(per-channel scales, fastest by ~1.5%%). "
                             "With --model-path, quantization runs "
                             "ON LOAD (host-side, bit-identical): the "
                             "bf16 tree never reaches the device — "
                             "required for 13B checkpoints on one chip")
    parser.add_argument("--quantize-vision", type=str, default=None,
                        choices=["int8", "int8a8"],
                        help="quantize the frozen CLIP tower's encoder "
                             "GEMMs: int8 (weight-only) or int8a8 (W8A8 "
                             "on the int8 MXU).  Measured round 5: NO "
                             "end-to-end first-token win (0.114 -> "
                             "0.121 s back-to-back best-of-8 video "
                             "bench — the tower is ~13 ms of the path "
                             "and per-call activation quant offsets the "
                             "MXU gain); use it for the ~0.3 GB HBM "
                             "saving, not latency; gate with "
                             "tools/quant_report.py --vision-quant")
    parser.add_argument("--kv-cache", type=str, default="bf16",
                        choices=["bf16", "int8"],
                        help="KV-cache dtype: int8 halves cache HBM "
                             "(longer sessions / more batch rows) at "
                             "zero measured throughput cost")
    parser.add_argument("--batch-window-ms", type=float, default=0.0,
                        help="dynamic batching: >0 groups requests "
                             "arriving within this window; <0 enables "
                             "iteration-level continuous batching over "
                             "--max-batch rows; 0 disables")
    parser.add_argument("--max-batch", type=int, default=4)
    parser.add_argument("--admit-batch", type=int, default=4,
                        help="continuous batching: prefill up to N "
                             "compatible waiting requests as one "
                             "batched admission call (pow2 groups; "
                             "1 disables)")
    parser.add_argument("--prefix-cache", type=int, default=0,
                        help="keep the prefilled KV of up to N "
                             "(media + system prompt) prefixes; repeat "
                             "requests about the same video skip the "
                             "prefix prefill entirely (token-identical; "
                             "LRU eviction)")
    parser.add_argument("--max-sessions", type=int, default=0,
                        help="enable session-id multi-turn KV reuse, "
                             "keeping up to N sessions (LRU)")
    parser.add_argument("--tensor-parallel", type=int, default=1,
                        help="shard the engine over N chips (model-axis "
                             "tensor parallelism; token-identical to "
                             "single-chip).  13B int8 needs 2 chips — "
                             "per-shard HBM proof in "
                             "tools/exp_13b_aot.py")
    parser.add_argument("--speculative", action="store_true",
                        default=True,
                        help="n-gram self-speculation (greedy "
                             "token-identical, sampling "
                             "distribution-exact).  DEFAULT-ON since the "
                             "served-path measurement "
                             "(tools/e2e_spec_accept.py): the "
                             "acceptance-adaptive controller holds "
                             "worst-case novel traffic at 1.03x plain "
                             "decode while extractive replies reach "
                             "3.7x.  --no-speculative restores plain "
                             "decode")
    parser.add_argument("--no-speculative", dest="speculative",
                        action="store_false")
    parser.add_argument("--fused", action="store_true",
                        help="fused wqkv/w_gateup weight layout (4 "
                             "GEMVs/layer instead of 7): +1.3 tok/s "
                             "single-stream on the int8 7B flagship; "
                             "token-identical (tests/test_fused.py). "
                             "Incompatible with --lora-path only if "
                             "adapters were exported against fused "
                             "names (they never are)")
    parser.add_argument("--context-len", type=int, default=None,
                        help="prompt-clamp override for long-context "
                             "serving (e.g. 4096 with --buckets "
                             "...,4096; pair with config rope_scaling "
                             "for 2048-trained checkpoints)")
    parser.add_argument("--hbm-budget", type=float, default=None,
                        help="serving-wide HBM budget in GiB governing "
                             "weights + pool + sessions + prefix caches "
                             "as ONE ledger (over-budget configs are "
                             "rejected at startup; dynamic allocations "
                             "evict across caches or degrade instead of "
                             "OOMing).  Default: device HBM minus "
                             "headroom when the backend reports it; "
                             "<= 0 disables")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    engine, tokenizer = load_engine(args)
    if args.warmup:
        logger.info("warming up %s buckets...", engine.buckets)
        engine.warmup(frames=args.num_frames)
        logger.info("warmup done")
    worker = ModelWorker(args.controller_address, args.worker_address,
                         args.model_name, engine, tokenizer,
                         args.limit_model_concurrency,
                         args.stream_interval, args.no_register,
                         args.num_frames,
                         batch_window_ms=args.batch_window_ms,
                         max_batch=args.max_batch,
                         max_sessions=args.max_sessions,
                         speculative=args.speculative,
                         frame_mode=args.frame_mode,
                         prefix_cache=args.prefix_cache,
                         admit_batch=args.admit_batch,
                         hbm_budget_gb=args.hbm_budget,
                         context_len=args.context_len,
                         raw_pixels=args.raw_pixels)
    if args.warmup and worker.continuous is not None:
        # warm EVERY frame bucket through the pool: media admission
        # prefills are per-frame-geometry executables, and mixed
        # image/video traffic otherwise stalls the pool on a cold
        # compile mid-traffic
        worker.continuous.warmup(
            frames=engine.frame_buckets or args.num_frames)
        logger.info("continuous-batching warmup done")
    if args.warmup:
        worker.warmup_serving_paths()
    app = build_app(worker)
    app.host, app._port = args.host, args.port
    app.serve_forever()


if __name__ == "__main__":
    main()
