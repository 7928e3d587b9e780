"""Functional LLaMA decoder (7B/13B, LLaMA-1/2, Vicuna).

TPU-native re-design of the decoder the reference inherits from HF
`LlamaModel` (`valley/model/valley_model.py:21,249-254`):

* params are an explicit pytree with **stacked layer weights** (leading axis
  = layer) so the whole decoder is one `lax.scan` — O(1) compile time and a
  single sharding rule per weight kind;
* prefill and single-token decode share the block code; the KV cache is a
  fixed-size (L, B, Smax, Hkv, D) buffer updated with
  `dynamic_update_slice` — static shapes end to end, no recompiles across
  requests;
* RMSNorm/rotary/softmax run in fp32 for logit fidelity with the torch
  reference; matmuls take bf16 inputs on the MXU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from valley_tpu.config import TextConfig
from valley_tpu.ops.attention import mha_attention, decode_attention
from valley_tpu.ops.rope import apply_rope, rope_cos_sin


class KVCache(NamedTuple):
    """Stacked KV cache.  With ``dtype=int8`` (serving quantization) the
    K/V values are stored int8 with per-(layer, row, slot, head) absmax
    scales — halves the per-token cache HBM traffic of decode attention;
    weights stay bf16.  ``k_scale``/``v_scale`` are None for float caches.
    """
    k: jnp.ndarray                          # (L, B, Smax, Hkv, D)
    v: jnp.ndarray                          # (L, B, Smax, Hkv, D)
    k_scale: Optional[jnp.ndarray] = None   # (L, B, Smax, Hkv) bf16
    v_scale: Optional[jnp.ndarray] = None

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def init_cache(cfg: TextConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.num_hidden_layers, batch, max_len, cfg.kv_heads,
             cfg.head_dim)
    k = jnp.zeros(shape, dtype)
    v = jnp.zeros(shape, dtype)
    if dtype == jnp.int8:
        # two distinct buffers — a shared one breaks donation (same buffer
        # donated twice in one call)
        return KVCache(k, v, jnp.zeros(shape[:-1], jnp.bfloat16),
                       jnp.zeros(shape[:-1], jnp.bfloat16))
    return KVCache(k, v)


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------

def init_params(cfg: TextConfig, key: jax.Array, dtype=jnp.bfloat16,
                fused: bool = False):
    keys = iter(jax.random.split(key, 16))

    def dense(k, fan_in, shape):
        return (jax.random.normal(k, shape, jnp.float32)
                * (fan_in ** -0.5)).astype(dtype)

    h, f = cfg.hidden_size, cfg.intermediate_size
    kv = cfg.kv_heads * cfg.head_dim
    L = cfg.num_hidden_layers
    # Layer projections are stored (L, out, in) — the torch nn.Linear
    # layout.  XLA's layout assignment prefers contracting-dim-minor
    # weights for batched (B > 1) decode GEMMs; storing (in, out) made it
    # materialize ~1 GB transposed copies of wq/wk/wv per executable,
    # which OOM'd a 16 GB chip on Valley-7B batched serving.
    embed = dense(next(keys), h, (cfg.vocab_size, h))
    if fused:
        # serving layout: q/k/v and gate/up concatenated on the out axis
        # (fewer, larger decode GEMVs) — see fuse_llama_params
        proj = {
            "wqkv": dense(next(keys), h, (L, h + 2 * kv, h)),
            "wo": dense(next(keys), h, (L, h, h)),
            "w_gateup": dense(next(keys), h, (L, 2 * f, h)),
        }
    else:
        proj = {
            "wq": dense(next(keys), h, (L, h, h)),
            "wk": dense(next(keys), h, (L, kv, h)),
            "wv": dense(next(keys), h, (L, kv, h)),
            "wo": dense(next(keys), h, (L, h, h)),
            "w_gate": dense(next(keys), h, (L, f, h)),
            "w_up": dense(next(keys), h, (L, f, h)),
        }
    return {
        "embed": embed,
        "layers": {
            "attn_norm": jnp.ones((L, h), dtype),
            **proj,
            "mlp_norm": jnp.ones((L, h), dtype),
            "w_down": dense(next(keys), f, (L, h, f)),
        },
        "final_norm": jnp.ones((h,), dtype),
        "lm_head": dense(next(keys), h, (h, cfg.vocab_size)),
    }


def fuse_llama_params(params):
    """Concatenate wq/wk/wv -> wqkv and w_gate/w_up -> w_gateup along the
    out axis of the (L, out, in) storage: the decode step then runs 4
    GEMVs per layer instead of 7 — fewer kernel boundaries on the
    critical single-stream path.  Numerically identical (each output
    row's dot is unchanged).  Measured +1.3 tok/s on the int8 7B
    flagship (10.25 vs 10.41 ms/tok same-window, round 4 — the recovered
    time is GEMV-boundary scheduling gap, see tools/exp_decode_glue.py;
    at bf16 bytes the gap is a smaller share and measured null, round 2).

    Serving-only: do this BEFORE `add_lora` (adapters target the unfused
    names) and before int8 quantization (per-out-channel scales survive
    the concat unchanged).  Mutates and returns ``params``.

    The concat is staged through HOST memory: a device-side concatenate
    holds originals and result simultaneously (+6.4 GB at 7B bf16 —
    OOMs a 16 GB chip already holding the full tree); staging frees each
    device original as its host copy lands, then uploads the fused
    stack (one-time load-path cost, seconds).
    """
    import numpy as np

    layers = params["llama"]["layers"]
    if "wqkv" in layers:
        return params
    if any(k.endswith("_lora_a") for k in layers):
        raise ValueError("fuse before adding LoRA adapters")

    # Host trees (the quantize-on-load path, hf_bridge) stay host: the
    # fused result must not land on device before quantization.
    on_device = isinstance(layers["wq"], jax.Array)

    def fuse(names, out):
        host = [np.asarray(jax.device_get(layers.pop(n)))
                for n in names]   # device original freed per-iteration
        cat = np.concatenate(host, axis=1)
        layers[out] = jnp.asarray(cat) if on_device else cat

    fuse(("wq", "wk", "wv"), "wqkv")
    fuse(("w_gate", "w_up"), "w_gateup")
    return params


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return normed * weight


# stable per-projection ids for LoRA-dropout rng folding
_PROJ_IDS = {"wq": 0, "wk": 1, "wv": 2, "wo": 3,
             "w_gate": 4, "w_up": 5, "w_down": 6}

# W8A8 applies only to chunks whose SEQUENCE axis is at least this long:
# prefill buckets are >= 128 while decode steps and speculative
# verification windows are <= 64 wide — those stay on the w8a16
# dequant-dot, so DECODE EXECUTABLES are bit-equivalent to plain int8
# given the same cache state (the W8A8 prefill's cache contents differ:
# KV written by a >= 128-wide chunk carries activation-quant error).
# ChatSession extension chunks pad to pow2 (engine.py), so a turn with
# > 64 new tokens produces a >= 128-wide _extend that also takes the
# W8A8 path — by design: those chunks are prefill-shaped and get the
# same int8-MXU speedup (see _proj / ops/quant.quantize_llama_params).
_A8_MIN_SEQ = 128


def _w8a8_dot(x: jnp.ndarray, w: jnp.ndarray,
              scale: jnp.ndarray) -> jnp.ndarray:
    """quant(x) @ int8 w -> int32 accumulate, fp32 rescale (W8A8).

    Activations quantize symmetrically per token (row absmax / 127), the
    dot runs on the v5e int8 MXU path (int32 accumulate — exact for int8
    operands), and the result rescales by (token scale x out-channel
    weight scale).  ``w`` is (out, in) — contracting dim 1 of both
    operands compiles to natural layouts (no transposed int8 copies;
    measured w8a8oi == w8a8 in tools/exp_w8a8_prefill.py)."""
    t = 1
    for d in x.shape[:-1]:
        t *= d
    k = x.shape[-1]
    o = w.shape[-2]
    xf = x.reshape(t, k).astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6)
    ascale = amax / 127.0
    xq = jnp.round(xf / ascale).astype(jnp.int8)
    if w.dtype != jnp.int8:
        w = w.astype(jnp.int8)   # int4 storage (w4_packed view): exact
    y = jax.lax.dot_general(xq, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * ascale \
        * scale[None, :].astype(jnp.float32)
    return out.reshape(x.shape[:-1] + (o,)).astype(x.dtype)


def _w4a8_group_dot(x: jnp.ndarray, w: jnp.ndarray,
                    scale: jnp.ndarray) -> jnp.ndarray:
    """Grouped W4A8: per-token int8 activation quant + one batched int8
    dot per group on the int8 MXU (the int4g/int4gp analogue of
    `_w8a8_dot`).

    int4 values expand to int8 EXACTLY, so the only added error vs the
    bf16 grouped einsum is the activation rounding — the same per-token
    granularity `_w8a8_dot` uses.  (Per-(token, group) activation scales
    were measured and REJECTED: the grouped quant lowers to 0.64x the
    bf16 einsum on v5e, while per-token scales reach 1.14x at 7B /
    1.25x at 13B prefill GEMM shapes — tools/exp_w4a8_prefill.py.)
    ``w`` is (out, in) int8/int4-range, ``scale`` (out, K/group) — the
    dot batches over groups, accumulates int32 (exact), rescales by the
    weight group scale in fp32, reduces over groups, then applies the
    token scale."""
    o, k = w.shape[-2:]
    g = scale.shape[-1]
    gs = k // g
    t = 1
    for d in x.shape[:-1]:
        t *= d
    xf = x.reshape(t, k).astype(jnp.float32)
    a = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                    1e-6) / 127.0                              # (t, 1)
    xq = jnp.round(xf / a).astype(jnp.int8).reshape(t, g, gs)
    wq = w.reshape(o, g, gs)
    if wq.dtype != jnp.int8:
        wq = wq.astype(jnp.int8)     # int4 storage (w4_packed view): exact
    part = jnp.einsum("tgi,ogi->tog", xq, wq,
                      preferred_element_type=jnp.int32)
    y = jnp.sum(part.astype(jnp.float32)
                * scale[None].astype(jnp.float32), axis=-1) * a
    return y.reshape(x.shape[:-1] + (o,)).astype(x.dtype)


def _proj(lp, name: str, x: jnp.ndarray, lora_rng=None,
          lora_dropout: float = 0.0) -> jnp.ndarray:
    """x @ W plus the LoRA low-rank delta when adapter factors are present
    (frozen base + trainable A/B — the param-tree-surgery equivalent of
    peft's target_modules, reference `train.py:153-161`).  With
    ``lora_rng`` set, dropout is applied to the adapter-branch input during
    training (peft ``lora_dropout=0.05``, reference `train.py:156`).  int8
    weights (serving quantization, `ops/quant.py`) dequantize into the
    matmul.  ``W`` is stored (out, in) — torch nn.Linear layout, see
    init_params."""
    w = lp[name]
    if w.dtype == jnp.uint8:
        raise TypeError(
            f"{name} is nibble-packed (uint8): apply "
            "ops.quant.unpack_int4_view INSIDE the executable before the "
            "forward (Engine(w4_packed=True) does this) — a packed "
            "tensor must never reach the matmul directly")
    if w.dtype in (jnp.int8, jnp.int4):
        # per-out-channel scale (out,); XLA's fused int dequant-dot beats
        # the Pallas tile-streaming matvec (78 vs 58 tok/s measured), so
        # there is no kernel dispatch here.  int4 operands appear only
        # inside fused decode executables (ops/quant.int4_decode_view).
        a8_scale = lp.get(name + "_scale_a8")
        scale = lp[name + "_scale"] if a8_scale is None else a8_scale
        if scale.ndim == w.ndim:
            # group-wise scales (out, K/group): per-group partial sums
            # scaled in fp32 then reduced (quant.py `group_size`)
            o, k = w.shape[-2:]
            g = scale.shape[-1]
            gs = k // g
            b = 1
            for d in x.shape[:-1]:
                b *= d
            if a8_scale is not None and x.ndim >= 2 \
                    and x.shape[-2] >= _A8_MIN_SEQ:
                # Grouped W4A8 (quantize_llama_params act8 + group_size;
                # worker --quantize int4ga8/int4gpa8): >= 128-wide chunks
                # (prefill buckets, long session extensions) ride the
                # int8 MXU — same gate semantics as the per-channel W8A8
                # path below, same caveat (prefill logits and written KV
                # carry activation-quant error; decode/speculative
                # executables stay bit-equivalent to int4g/int4gp).
                out = _w4a8_group_dot(x, w, scale)
            elif b * g < 128:
                # decode-shape fast path: ONE dense pass against a
                # block-diagonal expansion of x.  The MXU computes up to
                # 128 output columns per weight pass, so the b*g partial
                # columns ride the SAME weight stream a plain GEMV pays;
                # group scales become a tiny (o, b, g) elementwise+reduce
                # instead of g separate dots.  Measured on v5e
                # (tools/exp_int4_group.py): 827 GB/s int4-byte rate at
                # b=1 vs 19 GB/s for the einsum below; the einsum wins
                # from one full 128-wide MXU tile up — including exactly
                # b*g == 128 (K=4096 b=4: einsum 0.406 vs 0.813 ms
                # same-window, --batch-sweep), so the gate is strict.
                x2 = (x.reshape(b, g, gs, 1)
                      * jnp.eye(g, dtype=x.dtype)[None, :, None, :])
                x2 = jnp.moveaxis(x2.reshape(b, k, g), 0, 1)
                p = jax.lax.dot_general(
                    w.astype(x.dtype), x2.reshape(k, b * g),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).reshape(o, b, g)
                y = jnp.sum(p * scale[:, None, :].astype(jnp.float32),
                            axis=-1)                       # (o, b)
                out = y.T.reshape(x.shape[:-1] + (o,)).astype(x.dtype)
            else:
                wg = w.reshape(o, g, gs).astype(x.dtype)
                xg = x.reshape(x.shape[:-1] + (g, gs))
                part = jnp.einsum("...gi,ogi->...og", xg, wg,
                                  preferred_element_type=jnp.float32)
                out = jnp.sum(part * scale.astype(jnp.float32),
                              axis=-1).astype(x.dtype)
        elif a8_scale is not None and x.ndim >= 2 \
                and x.shape[-2] >= _A8_MIN_SEQ:
            # W8A8 prefill path (ops/quant.quantize_llama_params act8):
            # dynamic per-token int8 activation quant + int8 MXU dot —
            # 1.48x mean / 1.71x on the big GEMMs vs the bf16 dequant-dot
            # at the 512 bucket (v5e int8 MXU: 394 TOPS vs 197 bf16
            # TFLOP/s; tools/exp_w8a8_prefill.py).  The static
            # sequence-length gate keeps decode / speculative-
            # verification executables (<= 64-wide) on the exact
            # dequant-dot below; >= 128-wide chunks (prefill buckets
            # AND ChatSession extension chunks padded past 64) take
            # this path, so their logits and written KV carry
            # activation-quant error — see _A8_MIN_SEQ.
            out = _w8a8_dot(x, w, scale)
        else:
            out = jnp.einsum("...i,oi->...o", x, w.astype(x.dtype),
                             preferred_element_type=jnp.float32)
            out = (out * scale.astype(jnp.float32)).astype(x.dtype)
    else:
        out = jnp.einsum("...i,oi->...o", x, w)
    a = lp.get(name + "_lora_a")
    if a is not None:
        xl = x
        if lora_rng is not None and lora_dropout > 0.0:
            keep = 1.0 - lora_dropout
            mask = jax.random.bernoulli(
                jax.random.fold_in(lora_rng, _PROJ_IDS[name]), keep, x.shape)
            xl = jnp.where(mask, x / keep, 0).astype(x.dtype)
        delta = (xl @ a) @ lp[name + "_lora_b"]
        out = out + delta * lp["lora_scale"][0, 0]
    return out


def _qkv(lp, x, cfg: TextConfig, cos, sin, proj):
    b, s, _ = x.shape
    if "wqkv" in lp:
        # fused serving layout (see fuse_llama_params): one GEMV, then
        # exact slices — XLA fuses the slices into the consumers
        h_sz = cfg.num_attention_heads * cfg.head_dim
        kv_sz = cfg.kv_heads * cfg.head_dim
        qkv = proj(lp, "wqkv", x)
        q = qkv[..., :h_sz]
        k = qkv[..., h_sz:h_sz + kv_sz]
        v = qkv[..., h_sz + kv_sz:]
    else:
        q = proj(lp, "wq", x)
        k = proj(lp, "wk", x)
        v = proj(lp, "wv", x)
    q = q.reshape(b, s, cfg.num_attention_heads, cfg.head_dim)
    k = k.reshape(b, s, cfg.kv_heads, cfg.head_dim)
    v = v.reshape(b, s, cfg.kv_heads, cfg.head_dim)
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin), v


def _attn(lp, x, cfg: TextConfig, cos, sin, *, attn_mask=None,
          use_flash=None, lora_rng=None, lora_dropout: float = 0.0):
    """Cacheless self-attention for one layer: causal attention over the
    block (training / parity eval)."""
    b, s, h = x.shape
    proj = functools.partial(_proj, lora_rng=lora_rng,
                             lora_dropout=lora_dropout)
    q, k, v = _qkv(lp, x, cfg, cos, sin, proj)
    bias = None
    if attn_mask is not None:
        bias = jnp.where(attn_mask[:, None, None, :] > 0, 0.0, -1e9)
    out = mha_attention(q, k, v, bias, causal=True, use_flash=use_flash)
    return proj(lp, "wo", out.reshape(b, s, h))


def _quantize_kv(x):
    """(B, S, H, D) -> int8 values + per-(row, slot, head) absmax scale."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-6) / 127.0
    q = jnp.round(xf / scale[..., None]).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


def _cache_write(arr, val, li, cache_index):
    """Write (B, S, ...) ``val`` into the stacked (L, B, Smax, ...) ``arr``
    at layer ``li``, slot ``cache_index`` (scalar or per-row vector)."""
    tail = (0,) * (arr.ndim - 3)
    if getattr(cache_index, "ndim", 0) == 1:
        for r in range(val.shape[0]):   # static batch; per-row slots
            arr = jax.lax.dynamic_update_slice(
                arr, val[r:r + 1][None], (li, r, cache_index[r]) + tail)
        return arr
    return jax.lax.dynamic_update_slice(
        arr, val[None], (li, 0, cache_index) + tail)


def _cache_layer(kc: KVCache, li, dtype):
    """Read (and dequantize) layer ``li``'s (B, Smax, Hkv, D) K/V."""
    ck = jax.lax.dynamic_index_in_dim(kc.k, li, keepdims=False)
    cv = jax.lax.dynamic_index_in_dim(kc.v, li, keepdims=False)
    if kc.k_scale is not None:
        ks = jax.lax.dynamic_index_in_dim(kc.k_scale, li, keepdims=False)
        vs = jax.lax.dynamic_index_in_dim(kc.v_scale, li, keepdims=False)
        ck = ck.astype(dtype) * ks[..., None].astype(dtype)
        cv = cv.astype(dtype) * vs[..., None].astype(dtype)
    return ck, cv


def _attn_cached(lp, x, cfg: TextConfig, cos, sin, kc: KVCache, li, *,
                 cache_index, kv_valid=None, cross_valid=None,
                 use_flash=None, lora_rng=None, lora_dropout: float = 0.0,
                 decode_kernel: bool = False):
    """Cached self-attention: write this chunk's K/V into the FULL stacked
    cache (L, B, Smax, Hkv, D) at layer ``li`` / slot ``cache_index`` and
    attend.  The cache rides the layer-scan *carry*, so the write is a tiny
    in-place dynamic_update_slice — carrying it as scan xs/ys instead would
    re-stream the entire cache through HBM once per decode step (measured
    ~2 ms/token on Valley-7B, ~10% of the decode budget).  int8 caches
    quantize at write and dequantize at read (per-slot-per-head scales).

    ``cache_index``: scalar next-slot, or a (B,) vector of per-row slots
    (continuous batching — rows joined at different times).
    Returns (out, kc).
    """
    b, s, h = x.shape
    proj = functools.partial(_proj, lora_rng=lora_rng,
                             lora_dropout=lora_dropout)
    q, k, v = _qkv(lp, x, cfg, cos, sin, proj)
    if kc.k_scale is not None:
        kq, ks = _quantize_kv(k)
        vq, vs = _quantize_kv(v)
        kc = kc._replace(
            k_scale=_cache_write(kc.k_scale, ks, li, cache_index),
            v_scale=_cache_write(kc.v_scale, vs, li, cache_index))
    else:
        kq = k.astype(kc.k.dtype)
        vq = v.astype(kc.v.dtype)
    kc = kc._replace(k=_cache_write(kc.k, kq, li, cache_index),
                     v=_cache_write(kc.v, vq, li, cache_index))

    if s == 1 and decode_kernel:
        # Fused Pallas decode attention over the FULL stacked cache
        # (layer picked by scalar prefetch): one kernel instead of ~8
        # small XLA kernels per layer — see ops/decode_pallas.py.
        from valley_tpu.ops.decode_pallas import decode_attention_stacked

        out = decode_attention_stacked(q, kc.k, kc.v, li, kv_valid,
                                       k_scale=kc.k_scale,
                                       v_scale=kc.v_scale)
    elif s == 1:
        ck = jax.lax.dynamic_index_in_dim(kc.k, li, keepdims=False)
        cv = jax.lax.dynamic_index_in_dim(kc.v, li, keepdims=False)
        if kc.k_scale is not None:
            # int8 cache: dequantize on the logits/probs side, not the
            # (B, Smax, H, D) values — see decode_attention
            out = decode_attention(
                q, ck, cv, kv_valid,
                k_scale=jax.lax.dynamic_index_in_dim(kc.k_scale, li,
                                                     keepdims=False),
                v_scale=jax.lax.dynamic_index_in_dim(kc.v_scale, li,
                                                     keepdims=False))
        else:
            out = decode_attention(q, ck, cv, kv_valid)
    elif cross_valid is not None:
        # Session extension / speculative verification: a C-token chunk
        # written at ``cache_index`` attends all previously-valid cache
        # slots plus itself causally (multi-turn KV reuse — the
        # reference re-prefills the whole conversation every turn
        # instead).  ``cache_index`` may be per-row (batched speculative
        # rounds in continuous batching).
        ck, cv = _cache_layer(kc, li, q.dtype)
        smax = ck.shape[1]
        slots = jnp.arange(smax)
        ci = jnp.broadcast_to(jnp.asarray(cache_index), (b,))
        in_chunk = jnp.logical_and(
            slots[None, :] >= ci[:, None],
            slots[None, :] < ci[:, None] + s)            # (B, Smax)
        chunk_causal = (slots[None, None, :] - ci[:, None, None]
                        <= jnp.arange(s)[None, :, None])  # (B, S, Smax)
        mask = jnp.logical_or(
            cross_valid[:, None, :],
            jnp.logical_and(in_chunk[:, None, :], chunk_causal))
        bias = jnp.where(mask[:, None], 0.0, -1e9)       # (B,1,S,Smax)
        out = mha_attention(q, ck, cv, bias, use_flash=False)
    else:
        # Prefill: the cache beyond this chunk is empty (engine prefills
        # at cache_index=0), so attention runs within the chunk only —
        # causal + the chunk part of the validity mask.  This keeps the
        # logits S x S (flash-eligible) instead of S x Smax, and never
        # reads the cache back.
        chunk_valid = kv_valid[:, :s] if kv_valid is not None else None
        bias = None
        if chunk_valid is not None:
            bias = jnp.where(chunk_valid[:, None, None, :], 0.0, -1e9)
        out = mha_attention(q, k, v, bias, causal=True, use_flash=use_flash)

    out = proj(lp, "wo", out.reshape(b, s, h))
    return out, kc


def _mlp(lp, x, lora_rng=None, lora_dropout: float = 0.0):
    proj = functools.partial(_proj, lora_rng=lora_rng,
                             lora_dropout=lora_dropout)
    if "w_gateup" in lp:
        gu = proj(lp, "w_gateup", x)
        f = gu.shape[-1] // 2
        gate = jax.nn.silu(gu[..., :f].astype(jnp.float32))
        up = gu[..., f:].astype(jnp.float32)
    else:
        gate = jax.nn.silu(proj(lp, "w_gate", x).astype(jnp.float32))
        up = proj(lp, "w_up", x).astype(jnp.float32)
    return proj(lp, "w_down", (gate * up).astype(x.dtype))


def _layer(lp, x, cfg, cos, sin, attn_mask, use_flash, lora_rng=None,
           lora_dropout=0.0):
    attn_out = _attn(lp, rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps),
                     cfg, cos, sin, attn_mask=attn_mask,
                     use_flash=use_flash, lora_rng=lora_rng,
                     lora_dropout=lora_dropout)
    x = x + attn_out
    x = x + _mlp(lp, rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps),
                 lora_rng=lora_rng, lora_dropout=lora_dropout)
    return x


def _attn_cached_sliced(lp, x, cfg: TextConfig, cos, sin, ck, cv, ks, vs, *,
                        cache_index, kv_valid=None, cross_valid=None,
                        use_flash=None, lora_rng=None,
                        lora_dropout: float = 0.0):
    """Cached attention on per-layer cache slices (B, Smax, Hkv, D) carried
    as scan xs/ys — the batched (B > 1) formulation.  The carry-style
    full-cache path (`_attn_cached`) makes XLA materialize ~1 GB transposed
    copies of wq/wk/wv when B > 1 (layout assignment flips for batched
    GEMMs), which OOMs a 16 GB chip on Valley-7B; the xs/ys form costs one
    extra cache write-back per step but compiles to the natural layouts.
    ``ks``/``vs`` are the (B, Smax, Hkv) int8 scales or None.
    Returns (out, ck, cv, ks, vs)."""
    b, s, h = x.shape
    proj = functools.partial(_proj, lora_rng=lora_rng,
                             lora_dropout=lora_dropout)
    q, k, v = _qkv(lp, x, cfg, cos, sin, proj)
    if ks is not None:
        kq, k_sc = _quantize_kv(k)
        vq, v_sc = _quantize_kv(v)
    else:
        kq, vq = k.astype(ck.dtype), v.astype(cv.dtype)
        k_sc = v_sc = None

    if getattr(cache_index, "ndim", 0) == 1:
        # per-row write offsets (continuous batching: rows joined the
        # batch at different times, so their next free slot differs)
        def vwrite(c, new, idx):
            def one(cr, nr, i):
                return jax.lax.dynamic_update_slice(
                    cr, nr, (i,) + (0,) * (cr.ndim - 1))
            return jax.vmap(one)(c, new, idx)

        ck = vwrite(ck, kq, cache_index)
        cv = vwrite(cv, vq, cache_index)
        if ks is not None:
            ks = vwrite(ks, k_sc, cache_index)
            vs = vwrite(vs, v_sc, cache_index)
    else:
        ck = jax.lax.dynamic_update_slice(ck, kq, (0, cache_index, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, vq, (0, cache_index, 0, 0))
        if ks is not None:
            ks = jax.lax.dynamic_update_slice(ks, k_sc,
                                              (0, cache_index, 0))
            vs = jax.lax.dynamic_update_slice(vs, v_sc,
                                              (0, cache_index, 0))

    if s == 1:
        out = decode_attention(q, ck, cv, kv_valid, k_scale=ks, v_scale=vs)
    elif cross_valid is not None:
        # Session extension / speculative verification (see _attn_cached;
        # ``cache_index`` may be per-row)
        ckd, cvd = ck, cv
        if ks is not None:
            ckd = ck.astype(q.dtype) * ks[..., None].astype(q.dtype)
            cvd = cv.astype(q.dtype) * vs[..., None].astype(q.dtype)
        smax = ck.shape[1]
        slots = jnp.arange(smax)
        ci = jnp.broadcast_to(jnp.asarray(cache_index), (b,))
        in_chunk = jnp.logical_and(
            slots[None, :] >= ci[:, None],
            slots[None, :] < ci[:, None] + s)            # (B, Smax)
        chunk_causal = (slots[None, None, :] - ci[:, None, None]
                        <= jnp.arange(s)[None, :, None])  # (B, S, Smax)
        mask = jnp.logical_or(
            cross_valid[:, None, :],
            jnp.logical_and(in_chunk[:, None, :], chunk_causal))
        bias = jnp.where(mask[:, None], 0.0, -1e9)
        out = mha_attention(q, ckd, cvd, bias, use_flash=False)
    else:
        # Prefill: attention runs within the chunk only (see _attn_cached)
        chunk_valid = kv_valid[:, :s] if kv_valid is not None else None
        bias = None
        if chunk_valid is not None:
            bias = jnp.where(chunk_valid[:, None, None, :], 0.0, -1e9)
        out = mha_attention(q, k, v, bias, causal=True, use_flash=use_flash)

    out = proj(lp, "wo", out.reshape(b, s, h))
    return out, ck, cv, ks, vs


def _layer_cached(lp, x, kc, li, cfg, cos, sin, cache_index,
                  kv_valid, cross_valid, use_flash, lora_rng=None,
                  lora_dropout=0.0, decode_kernel=False):
    attn_out, kc = _attn_cached(
        lp, rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps), cfg, cos, sin,
        kc, li, cache_index=cache_index, kv_valid=kv_valid,
        cross_valid=cross_valid, use_flash=use_flash, lora_rng=lora_rng,
        lora_dropout=lora_dropout, decode_kernel=decode_kernel)
    x = x + attn_out
    x = x + _mlp(lp, rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps),
                 lora_rng=lora_rng, lora_dropout=lora_dropout)
    return x, kc


# ---------------------------------------------------------------------------
# Full decoder
# ---------------------------------------------------------------------------

def embed(params, input_ids: jnp.ndarray) -> jnp.ndarray:
    return params["embed"][input_ids]


def _remat_policy(remat):
    """Map the ``remat`` knob to a jax.checkpoint policy.

    True / "full"  — save nothing, recompute the whole layer forward in
                     the backward pass (minimum memory; the backward
                     re-pays one forward of FLOPs).
    "dots"         — save matmul (MXU) outputs, recompute only the cheap
                     elementwise/norm glue: no matmul recompute at the
                     cost of ~(6h + 3f) activation floats per token per
                     layer (see tools/exp_train_mfu.py for the measured
                     step-time trade on 7B).
    """
    if remat in (True, "full"):
        return jax.checkpoint_policies.nothing_saveable
    if remat == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f"unknown remat policy {remat!r} "
                     "(use True/'full', 'dots', or False)")


def forward_hidden(params, cfg: TextConfig, inputs_embeds: jnp.ndarray,
                   attn_mask: Optional[jnp.ndarray] = None,
                   positions: Optional[jnp.ndarray] = None,
                   cache: Optional[KVCache] = None,
                   cache_index=0,
                   kv_valid: Optional[jnp.ndarray] = None,
                   cross_valid: Optional[jnp.ndarray] = None,
                   remat: bool = False,
                   use_flash: Optional[bool] = None,
                   lora_rng=None, lora_dropout: float = 0.0,
                   unroll: int = 1,
                   decode_kernel: Optional[bool] = None):
    """Run the decoder stack.  Returns (hidden, new_cache_or_None).

    inputs_embeds: (B, S, H).  attn_mask: (B, S) padding mask for the
    cacheless path.  positions: (B, S) rotary positions (defaults to
    arange, or cache_index + arange when a cache is used).
    ``lora_rng``: training-time dropout key for the LoRA adapter branch
    (split per layer; None = inference/eval, no dropout).
    """
    b, s, _ = inputs_embeds.shape
    if positions is None:
        base = jnp.arange(s)
        if cache is not None:
            base = base + cache_index
        positions = jnp.broadcast_to(base, (b, s))
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta,
                            getattr(cfg, "rope_scaling", 1.0))

    use_lora_rng = lora_rng is not None and lora_dropout > 0.0
    xs = {"lp": params["layers"]}
    if use_lora_rng:
        xs["lora_key"] = jax.random.split(lora_rng, cfg.num_hidden_layers)

    if cache is None:
        def scan_body(x, layer_inputs):
            x = _layer(layer_inputs["lp"], x, cfg, cos, sin, attn_mask,
                       use_flash, lora_rng=layer_inputs.get("lora_key"),
                       lora_dropout=lora_dropout)
            return x, None

        if remat:
            scan_body = jax.checkpoint(scan_body,
                                       policy=_remat_policy(remat))
        hidden, _ = jax.lax.scan(scan_body, inputs_embeds, xs)
        new_cache = None
    elif b == 1:
        # Single-stream inference: the full stacked KV cache rides the
        # scan CARRY and is updated in place per layer — carrying it as
        # scan xs/ys would re-stream the entire cache through HBM once
        # per decode step (measured ~2 ms/token on Valley-7B).
        if decode_kernel is None:
            # The fused Pallas decode-attention kernel is numerically
            # validated but measured SLOWER than the XLA path on v5e:
            # Mosaic's block DMA moves these (Smax, Hkv*D) cache blocks
            # at ~27-40 GB/s (pure-DMA ablation, tools/
            # exp_kernel_ablate.py stage 0) vs ~300 GB/s for XLA's own
            # attention reads — so it stays opt-in (Engine
            # decode_kernel=True) until the toolchain's DMA improves.
            decode_kernel = False

        def scan_body(carry, layer_inputs):
            x, kc, li = carry
            x, kc = _layer_cached(
                layer_inputs["lp"], x, kc, li, cfg, cos, sin,
                cache_index, kv_valid, cross_valid, use_flash,
                lora_rng=layer_inputs.get("lora_key"),
                lora_dropout=lora_dropout, decode_kernel=decode_kernel)
            return (x, kc, li + 1), None

        # ``unroll`` > 1 replicates the layer body (numerically identical).
        # Measured on v5e Valley-7B (tools/exp_decode_unroll.py): unroll=2
        # is 3x SLOWER — XLA materializes the dynamic-sliced layer weights
        # as copies once the body is replicated.  Keep 1 on v5e; the knob
        # stays for other topologies.
        (hidden, new_cache, _), _ = jax.lax.scan(
            scan_body, (inputs_embeds, cache, jnp.int32(0)), xs,
            unroll=unroll)
    else:
        # Batched inference (engine batch > 1 / continuous-batching rows):
        # per-layer cache slices as scan xs/ys — see _attn_cached_sliced
        # for why the carry form can't be used here.
        quant = cache.k_scale is not None
        xs = dict(xs, ck=cache.k, cv=cache.v)
        if quant:
            xs["ks"], xs["vs"] = cache.k_scale, cache.v_scale

        def scan_body(x, layer_inputs):
            ao, ck, cv, ks, vs = _attn_cached_sliced(
                layer_inputs["lp"],
                rms_norm(x, layer_inputs["lp"]["attn_norm"],
                         cfg.rms_norm_eps),
                cfg, cos, sin, layer_inputs["ck"], layer_inputs["cv"],
                layer_inputs.get("ks"), layer_inputs.get("vs"),
                cache_index=cache_index, kv_valid=kv_valid,
                cross_valid=cross_valid, use_flash=use_flash,
                lora_rng=layer_inputs.get("lora_key"),
                lora_dropout=lora_dropout)
            x = x + ao
            x = x + _mlp(layer_inputs["lp"],
                         rms_norm(x, layer_inputs["lp"]["mlp_norm"],
                                  cfg.rms_norm_eps),
                         lora_rng=layer_inputs.get("lora_key"),
                         lora_dropout=lora_dropout)
            ys = {"ck": ck, "cv": cv}
            if ks is not None:
                ys["ks"], ys["vs"] = ks, vs
            return x, ys

        hidden, ys = jax.lax.scan(scan_body, inputs_embeds, xs)
        new_cache = KVCache(ys["ck"], ys["cv"], ys.get("ks"),
                            ys.get("vs"))

    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    return hidden, new_cache


def logits_from_hidden(params, hidden: jnp.ndarray) -> jnp.ndarray:
    w = params["lm_head"]
    if w.dtype == jnp.uint8:
        raise TypeError(
            "lm_head is nibble-packed (uint8): apply "
            "ops.quant.unpack_int4_view inside the executable first")
    if w.dtype in (jnp.int8, jnp.int4):
        y = jnp.einsum("...i,io->...o", hidden, w.astype(hidden.dtype),
                       preferred_element_type=jnp.float32)
        return y * params["lm_head_scale"].astype(jnp.float32)
    return (hidden @ w).astype(jnp.float32)


def forward(params, cfg: TextConfig, inputs_embeds, attn_mask=None,
            remat: bool = False, use_flash=None, lora_rng=None,
            lora_dropout: float = 0.0):
    """Training/parity forward: (B, S, H) -> fp32 logits (B, S, V)."""
    hidden, _ = forward_hidden(params, cfg, inputs_embeds, attn_mask,
                               remat=remat, use_flash=use_flash,
                               lora_rng=lora_rng, lora_dropout=lora_dropout)
    return logits_from_hidden(params, hidden)
