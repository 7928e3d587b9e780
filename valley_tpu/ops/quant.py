"""Weight-only int8 / int4 quantization for serving.

Symmetric per-output-channel quantization on the decoder's large
matmuls + lm_head: halves (int8) the HBM bytes read per decoded token,
which is the decode roofline (single-stream decode reads every weight
once per token).  The dequant (int -> bf16 * scale) fuses into the
matmul operand load under XLA; activations and the KV cache stay
bf16/int8.

``bits=4`` quantizes to the int4 range but STORES int8 (device-resident
S4 buffers crash this toolchain's jit-boundary transfer —
tools/exp_int4.py); the decode executable converts to real int4 ONCE
per fused multi-step call (`int4_decode_view`), so the scan's steps
stream int4 bytes (measured 2.2x faster weight reads than the same
dequant-dot over int8, tools/exp_int4b.py).

Usage: ``params = quantize_llama_params(params)`` before building the
Engine (``bits=4`` + ``Engine(decode_w4=True)`` for the int4 decode
path).  `llama._proj` / `logits_from_hidden` detect quantized weights
via dtype and apply the stored ``<name>_scale``.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

QUANT_TARGETS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
                 "wqkv", "w_gateup")   # last two: fused serving layout

# Serving quantization modes (worker --quantize, bench VALLEY_BENCH_QUANT,
# hf_bridge quantize-on-load, quant_report) -> quantizer knobs.  One table
# so a new mode is one row, parsed identically everywhere.
QUANT_MODES = {
    #            bits  group  act8   packed
    "int8":     dict(bits=8, group_size=0,   act8=False, packed=False),
    "int8a8":   dict(bits=8, group_size=0,   act8=True,  packed=False),
    "int4":     dict(bits=4, group_size=0,   act8=False, packed=False),
    "int4g":    dict(bits=4, group_size=128, act8=False, packed=False),
    "int4gp":   dict(bits=4, group_size=128, act8=False, packed=True),
    "int4ga8":  dict(bits=4, group_size=128, act8=True,  packed=False),
    "int4gpa8": dict(bits=4, group_size=128, act8=True,  packed=True),
}


def parse_quant_mode(mode: str) -> dict:
    """Mode string -> dict(bits, group_size, act8, packed).

    ``act8`` selects W8A8/W4A8 on >= `llama._A8_MIN_SEQ`-wide chunks
    (prefill + long session extensions) — decode executables stay
    bit-equivalent to the non-a8 mode either way; ``packed`` nibble-packs
    the int4-range tree to 0.5 B/weight (`pack_int4_params`)."""
    try:
        return dict(QUANT_MODES[mode])
    except KeyError:
        raise ValueError(f"unknown quantization mode {mode!r} "
                         f"(one of {sorted(QUANT_MODES)})") from None


def _quantize_one(w: jnp.ndarray, contract_axis: int = -1,
                  bits: int = 8, group_size: int = 0):
    """Symmetric per-out-channel quantization over the contraction axis.

    Layer weights are stored (out, in) (see `llama.init_params`), so the
    contraction axis is -1 and the scale is (out,); the lm_head stays
    (in, out), contraction axis -2, scale (1, out).  ``bits=4`` clips to
    [-7, 7] (int8 storage; see module docstring).  ``group_size`` > 0
    (contract_axis -1 only) uses one scale per ``group_size`` input
    channels — scale (out, K/group) — the standard int4 quality fix
    (~4x lower reconstruction error than per-channel; `llama._proj`
    detects the 2-D scale).  At decode shapes `_proj` runs the grouped
    dequant as ONE block-diagonal GEMV (same weight-stream rate as
    per-channel: 121.9 vs 123.8 tok/s on the 7B flagship, same window;
    tools/exp_int4_group.py); batched shapes (b*groups > one MXU tile)
    use the grouped einsum, which XLA handles well at batch >= 16."""
    qmax = 127.0 if bits == 8 else 7.0
    if group_size and contract_axis == -1 and             w.shape[-1] % group_size == 0:
        g = w.shape[-1] // group_size
        wg = w.reshape(w.shape[:-1] + (g, group_size))
        amax = jnp.max(jnp.abs(wg), axis=-1,
                       keepdims=True).astype(jnp.float32)
        scale = jnp.where(amax > 0, amax / qmax, 1.0).astype(w.dtype)
        q = jnp.clip(jnp.round(wg / scale), -qmax, qmax).astype(jnp.int8)
        return (q.reshape(w.shape),
                scale[..., 0].astype(jnp.bfloat16))   # (..., out, G)
    # bf16 math: int magnitudes are exactly representable, no fp32 copy
    amax = jnp.max(jnp.abs(w), axis=contract_axis,
                   keepdims=True).astype(jnp.float32)
    scale = jnp.where(amax > 0, amax / qmax, 1.0).astype(w.dtype)
    q = jnp.clip(jnp.round(w / scale), -qmax, qmax).astype(jnp.int8)
    if contract_axis == -1:
        scale = scale[..., 0]            # (out,)
    return q, scale.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("bits", "group_size"))
def _quantize_stacked(w: jnp.ndarray, bits: int = 8,
                      group_size: int = 0):
    """(L, out, in) quantized one layer at a time (lax.map) so the
    transient is one layer, not the whole 2.9-6 GB stack."""
    return jax.lax.map(lambda x: _quantize_one(x, -1, bits, group_size),
                       w)


def quantize_tensor(w: jnp.ndarray, contract_axis: int = -1,
                    bits: int = 8, group_size: int = 0):
    """Symmetric int8/int4-range over the contraction axis (default:
    (out, in) layout, scale (out,) — or (out, K/group) with
    ``group_size``)."""
    if w.ndim == 3 and contract_axis == -1:
        return _quantize_stacked(w, bits, group_size)
    return _quantize_one(w, contract_axis, bits, group_size)


def quantize_llama_params(params, targets: Sequence[str] = QUANT_TARGETS,
                          quantize_lm_head: bool = True, bits: int = 8,
                          group_size: int = 0, act8: bool = False):
    """Quantize the decoder weights to int8 (or the int4 range, bits=4).

    CONSUMES the input tree: original bf16 arrays are dropped tensor by
    tensor so peak device memory stays ~(full model + one layer) — a 7B
    bf16 tree plus a second fp32/bf16 copy would not fit a 16 GB chip.

    ``act8=True`` (W8A8, worker ``--quantize int8a8``) additionally opts
    matmuls whose sequence axis is >= `llama._A8_MIN_SEQ` (128) into
    dynamic per-token int8 activation quantization on the v5e int8 MXU
    path (394 int8 TOPS vs 197 bf16 TFLOP/s — measured 1.48x mean /
    1.71x on the big GEMMs at the 512 bucket,
    tools/exp_w8a8_prefill.py).  The opt-in is encoded in the params
    tree itself — scales stored under ``<name>_scale_a8`` — so W8A8 and
    plain-int8 engines get distinct jit cache entries.

    What the sequence gate does and does NOT guarantee:

    - Decode steps and speculative verification windows (<= 64 wide)
      take the IDENTICAL w8a16 dequant-dot an ``int8`` tree does — the
      decode executables are bit-equivalent given the same cache state
      (tests/test_quant.py).
    - Prefill (buckets >= 128) runs W8A8, so prefill logits AND the
      KV values the prefill writes carry per-token activation-quant
      error — the greedy continuation after a W8A8 prefill can differ
      from plain int8's (the decode math is exact, its cache input is
      not).  A whole generation is bit-identical to int8 only when
      every chunk stays below the gate (buckets < 128).
    - ChatSession extension chunks pad to a pow2 width
      (engine.py ChatSession.chat), so any turn with > 64 new tokens
      produces a >= 128-wide ``_extend`` call that ALSO takes the W8A8
      path; short turns (<= 64 new tokens) stay on the exact dequant-dot.

    Gate a checkpoint's end-to-end drift (prefill + a long multi-turn
    extension chunk) with tools/quant_report.py ``int8a8``.

    ``act8=True`` composes with ``bits=4`` + ``group_size`` (W4A8, worker
    ``--quantize int4ga8``/``int4gpa8``): int4 values expand to int8
    exactly, so >= 128-wide chunks run per-(token, group) int8 activation
    quant + a batched int8-MXU dot (`llama._w4a8_group_dot`) instead of
    the bf16 grouped einsum — the int4-mode analogue of int8a8's prefill
    speedup.  Per-channel int4 (no groups) cannot take the a8 path.
    """
    if act8 and bits == 4 and not group_size:
        raise ValueError("act8 with bits=4 requires group_size scales "
                         "(use int4ga8/int4gpa8 — per-channel int4 has "
                         "no W4A8 path)")
    if act8 and bits == 8 and group_size:
        raise ValueError("act8 with bits=8 uses per-channel scales "
                         "(group_size=0)")
    scale_key = "_scale_a8" if act8 else "_scale"
    llama_p = params["llama"]            # mutated in place, see docstring
    layers = llama_p["layers"]
    for name in targets:
        if name not in layers or layers[name].dtype == jnp.int8:
            continue
        q, scale = quantize_tensor(layers[name], bits=bits,
                                   group_size=group_size)
        jax.block_until_ready(q)
        layers[name] = q                 # drop the bf16 stack before the
        layers[name + scale_key] = scale  # next tensor quantizes
    if quantize_lm_head and llama_p["lm_head"].dtype != jnp.int8:
        q, scale = quantize_tensor(llama_p["lm_head"], contract_axis=-2,
                                   bits=bits)
        jax.block_until_ready(q)
        llama_p["lm_head"] = q
        llama_p["lm_head_scale"] = scale
    return params


VISION_QUANT_TARGETS = ("wq", "wk", "wv", "wo", "fc1", "fc2")


def quantize_vision_params(params, act8: bool = False):
    """Quantize the frozen CLIP tower's encoder GEMMs to int8.

    Vision weights are stored ``(L, in, out)`` (``x @ w``,
    `clip_vit.init_params`), so quantization contracts over axis -2 and
    the scale is ``(L, 1, out)``.  The tower runs ONLY prefill-shaped
    matmuls (257 tokens/frame — there is no vision decode), so
    ``act8=True`` (W8A8 on the v5e int8 MXU, ~2x the bf16 GEMM rate —
    tools/exp_w8a8_prefill.py) applies to every tower call;
    ``act8=False`` is weight-only int8 (halves tower weight reads,
    activations stay bf16).  Embeddings / layernorms / biases stay bf16.
    Serving opt-in: worker ``--quantize-vision int8|int8a8``; gate a
    checkpoint's video-prompt drift with tools/quant_report.py
    ``--vision-quant``.  Like `quantize_llama_params`, CONSUMES the
    input tree (originals dropped tensor by tensor).
    """
    scale_key = "_scale_a8" if act8 else "_scale"
    layers = params["vision"]["layers"]
    for name in VISION_QUANT_TARGETS:
        if name not in layers or layers[name].dtype == jnp.int8:
            continue
        q, scale = quantize_tensor(layers[name], contract_axis=-2)
        jax.block_until_ready(q)
        layers[name] = q
        layers[name + scale_key] = scale
    return params


def int4_decode_view(params):
    """int8-stored 4-bit weights -> real int4 arrays, for use INSIDE a
    fused decode executable (int4 buffers cannot cross jit boundaries on
    this toolchain — tools/exp_int4.py).  The cast is numerically exact
    ONLY for values already in [-7, 7] (``quantize_llama_params(bits=4)``)
    — a bits=8 tree would silently truncate, so ``Engine(decode_w4=True)``
    validates the range host-side at construction
    (`engine._check_int4_range`);
    the one-time conversion amortizes over the multi-step decode scan,
    whose steps then stream int4 bytes from HBM (tools/exp_int4b.py:
    2.2x faster weight reads than int8)."""
    params = dict(params)
    llama_p = dict(params["llama"])
    layers = dict(llama_p["layers"])
    for name in QUANT_TARGETS:
        if name in layers and layers[name].dtype == jnp.int8:
            layers[name] = layers[name].astype(jnp.int4)
    llama_p["layers"] = layers
    if llama_p.get("lm_head") is not None and             llama_p["lm_head"].dtype == jnp.int8:
        llama_p["lm_head"] = llama_p["lm_head"].astype(jnp.int4)
    params["llama"] = llama_p
    return params


# ---------------------------------------------------------------------------
# HOST-side (numpy) quantization — the quantize-on-load path.
#
# A 13B bf16 tree is ~26 GB: it fits host RAM but NOT a 16 GB chip, so
# quantization must happen BEFORE the device ever sees the weights.
# These mirror `_quantize_one` / `_pack_nibbles` bit-for-bit (numpy bf16
# via ml_dtypes uses the same round-to-nearest-even the device does;
# equality is asserted by tests/test_quant.py::test_host_quantizer_
# matches_device).  Used by `hf_bridge.load_valley_checkpoint(
# quantize=...)` — the worker's 13B-on-one-chip load path.
# ---------------------------------------------------------------------------



def _quantize_one_host(w, contract_axis: int = -1, bits: int = 8,
                       group_size: int = 0):
    """Numpy mirror of `_quantize_one` (same math, same dtypes)."""
    bf16 = jnp.bfloat16  # ml_dtypes.bfloat16 — a real numpy dtype
    qmax = 127.0 if bits == 8 else 7.0
    w = np.asarray(w)
    if group_size and contract_axis == -1 and \
            w.shape[-1] % group_size == 0:
        g = w.shape[-1] // group_size
        wg = w.reshape(w.shape[:-1] + (g, group_size))
        amax = np.max(np.abs(wg), axis=-1,
                      keepdims=True).astype(np.float32)
        scale = np.where(amax > 0, amax / qmax, 1.0).astype(w.dtype)
        q = np.clip(np.round(wg / scale), -qmax, qmax).astype(np.int8)
        return q.reshape(w.shape), scale[..., 0].astype(bf16)
    amax = np.max(np.abs(w), axis=contract_axis,
                  keepdims=True).astype(np.float32)
    scale = np.where(amax > 0, amax / qmax, 1.0).astype(w.dtype)
    q = np.clip(np.round(w / scale), -qmax, qmax).astype(np.int8)
    if contract_axis == -1:
        scale = scale[..., 0]
    return q, scale.astype(bf16)


def quantize_llama_params_host(params,
                               targets: Sequence[str] = QUANT_TARGETS,
                               quantize_lm_head: bool = True,
                               bits: int = 8, group_size: int = 0,
                               act8: bool = False):
    """Numpy mirror of `quantize_llama_params` for HOST trees (see
    section comment).  Consumes the input tree tensor by tensor so host
    RAM peaks at ~(tree + one tensor)."""
    if act8 and bits == 4 and not group_size:
        raise ValueError("act8 with bits=4 requires group_size scales "
                         "(use int4ga8/int4gpa8 — per-channel int4 has "
                         "no W4A8 path)")
    if act8 and bits == 8 and group_size:
        raise ValueError("act8 with bits=8 uses per-channel scales "
                         "(group_size=0)")
    scale_key = "_scale_a8" if act8 else "_scale"
    llama_p = params["llama"]
    layers = llama_p["layers"]
    for name in targets:
        if name not in layers or layers[name].dtype == np.int8:
            continue
        q, scale = _quantize_one_host(layers[name], -1, bits, group_size)
        layers[name] = q
        layers[name + scale_key] = scale
    if quantize_lm_head and llama_p["lm_head"].dtype != np.int8:
        q, scale = _quantize_one_host(llama_p["lm_head"],
                                      contract_axis=-2, bits=bits)
        llama_p["lm_head"] = q
        llama_p["lm_head_scale"] = scale
    return params


def _pack_nibbles_host(w: np.ndarray, axis: int) -> np.ndarray:
    """Numpy mirror of `_pack_nibbles`."""
    w = np.asarray(w)
    if w.shape[axis] % 2:
        raise ValueError(f"pack axis {axis} has odd length {w.shape[axis]}")
    if axis in (-1, w.ndim - 1):
        lo, hi = w[..., 0::2], w[..., 1::2]
    elif axis in (-2, w.ndim - 2) and w.ndim == 2:
        lo, hi = w[0::2, :], w[1::2, :]
    else:
        raise ValueError(f"unsupported pack axis {axis} for ndim {w.ndim}")
    return ((lo & 0xF).astype(np.uint8)
            | ((hi & 0xF).astype(np.uint8) << 4))


def pack_int4_params_host(params):
    """Numpy mirror of `pack_int4_params` for HOST trees: nibble-packs
    an int4-range tree to 0.5 B/weight BEFORE the device transfer —
    the only way a 13B 4-bit tree ever reaches one 16 GB chip."""
    llama_p = params["llama"]
    layers = llama_p["layers"]
    for name in QUANT_TARGETS:
        if name in layers and layers[name].dtype == np.int8:
            w = layers[name]
            if int(w.max()) > 7 or int(w.min()) < -7:
                raise ValueError(
                    f"pack_int4_params_host: {name} out of int4 range — "
                    "quantize with bits=4 first")
            layers[name] = _pack_nibbles_host(w, axis=-1)
    head = llama_p.get("lm_head")
    if head is not None and head.dtype == np.int8:
        if int(head.max()) > 7 or int(head.min()) < -7:
            raise ValueError("pack_int4_params_host: lm_head out of "
                             "int4 range")
        llama_p["lm_head"] = _pack_nibbles_host(head, axis=-2)
    return params


def _pack_nibbles(w: jnp.ndarray, axis: int) -> jnp.ndarray:
    """int8 values in [-7, 7] -> uint8 nibble pairs along ``axis``
    (which must have even length): out[k] = lo(2k) | hi(2k+1) << 4."""
    if w.shape[axis] % 2:
        raise ValueError(f"pack axis {axis} has odd length {w.shape[axis]}")
    if axis in (-1, w.ndim - 1):
        lo, hi = w[..., 0::2], w[..., 1::2]
    elif axis in (-2, w.ndim - 2) and w.ndim == 2:
        lo, hi = w[0::2, :], w[1::2, :]
    else:
        raise ValueError(f"unsupported pack axis {axis} for ndim {w.ndim}")
    lo_u = (lo & 0xF).astype(jnp.uint8)
    hi_u = (hi & 0xF).astype(jnp.uint8)
    return lo_u | (hi_u << 4)


def _unpack_nibbles(p: jnp.ndarray, axis: int) -> jnp.ndarray:
    """uint8 nibble pairs -> REAL int4 along ``axis`` (inverse of
    `_pack_nibbles`; runs INSIDE executables — int4 cannot cross jit
    boundaries on this toolchain, tools/exp_int4.py)."""
    lo = (p & 0xF).astype(jnp.int8)
    hi = (p >> 4).astype(jnp.int8)
    # sign-extend the low 4 bits: ((n ^ 8) - 8) maps [0,15] -> [-8,7]
    lo = (lo ^ 8) - 8
    hi = (hi ^ 8) - 8
    if axis in (-1, p.ndim - 1):
        w = jnp.stack([lo, hi], axis=-1).reshape(p.shape[:-1]
                                                 + (2 * p.shape[-1],))
    else:  # axis -2, 2-D (lm_head)
        w = jnp.stack([lo, hi], axis=1).reshape(2 * p.shape[0], p.shape[1])
    return w.astype(jnp.int4)


def pack_int4_params(params):
    """int8-stored 4-bit weights -> nibble-packed uint8 (2 values/byte).

    Halves the device RESIDENCY of an int4-quantized tree: device-native
    S4 buffers crash this toolchain's jit-boundary transfer layer
    (tools/exp_int4.py), so 4-bit weights are otherwise forced to int8
    storage — 1 byte/weight.  Packed, a 13B int4g tree drops from
    ~12.7 GB to ~6.4 GB: the difference between OOM and serving 13B
    from ONE 16 GB v5e where the reference needs >= 30 GB of VRAM
    (`/root/reference/README.md:91`, `valley/serve/model_worker.py:55-58`).

    Executables expand with `unpack_int4_view` (inside the jit) to real
    int4 once per fused call; the multi-step decode scan then streams
    int4 bytes exactly like `int4_decode_view`.  Packing runs along each
    tensor's contraction axis (last for the (out, in) layers, first for
    the (in, out) lm_head — both even for every LLaMA geometry).  Values
    must already be int4-range (``quantize_llama_params(bits=4)``);
    validated here since a packed tree can no longer be range-checked.

    Serving opt-in: worker ``--quantize int4gp`` (group-128 scales +
    packed storage + `Engine(w4_packed=True)`).
    """
    params = dict(params)
    llama_p = dict(params["llama"])
    layers = dict(llama_p["layers"])
    for name in QUANT_TARGETS:
        if name in layers and layers[name].dtype == jnp.int8:
            w = layers[name]
            hi = int(jnp.max(w))
            lo = int(jnp.min(w))
            if hi > 7 or lo < -7:
                raise ValueError(
                    f"pack_int4_params: {name} holds values in "
                    f"[{lo}, {hi}] — quantize with bits=4 first")
            layers[name] = jax.jit(_pack_nibbles,
                                   static_argnames=("axis",))(w, axis=-1)
    llama_p["layers"] = layers
    head = llama_p.get("lm_head")
    if head is not None and head.dtype == jnp.int8:
        if int(jnp.max(head)) > 7 or int(jnp.min(head)) < -7:
            raise ValueError("pack_int4_params: lm_head out of int4 range")
        llama_p["lm_head"] = jax.jit(
            _pack_nibbles, static_argnames=("axis",))(head, axis=-2)
    params["llama"] = llama_p
    jax.block_until_ready(params["llama"])
    return params


def unpack_int4_view(params):
    """Nibble-packed uint8 weights -> real int4 arrays, for use INSIDE
    an executable (prefill, extend, decode, speculative rounds): the
    one-time expansion amortizes over the fused call, and the decode
    scan's steps stream int4 bytes (2.2x faster weight reads than int8,
    tools/exp_int4b.py) while the RESIDENT tree stays at 0.5 B/weight."""
    params = dict(params)
    llama_p = dict(params["llama"])
    layers = dict(llama_p["layers"])
    for name in QUANT_TARGETS:
        if name in layers and layers[name].dtype == jnp.uint8:
            layers[name] = _unpack_nibbles(layers[name], axis=-1)
    llama_p["layers"] = layers
    head = llama_p.get("lm_head")
    if head is not None and head.dtype == jnp.uint8:
        llama_p["lm_head"] = _unpack_nibbles(head, axis=-2)
    params["llama"] = llama_p
    return params


def _int8_matvec_kernel(x_ref, w_ref, s_ref, o_ref):
    # x (B, H) bf16; w (H, BF) int8; s (1, BF); o (B, BF)
    w = w_ref[...].astype(x_ref.dtype)
    y = jax.lax.dot_general(x_ref[...], w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[...] = y * s_ref[...].astype(jnp.float32)


def int8_matvec(x: jnp.ndarray, w: jnp.ndarray,
                scale: jnp.ndarray, block_f: int = 512) -> jnp.ndarray:
    """Pallas x @ dequant(w) for small-batch decode: streams int8 weight
    tiles HBM->VMEM (Mosaic double-buffers grid steps) and dequantizes in
    VMEM.  x: (B, H) bf16; w: (H, F) int8; scale: (1, F).  Returns fp32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h = x.shape
    f = w.shape[1]
    block_f = min(block_f, f)
    return pl.pallas_call(
        _int8_matvec_kernel,
        out_shape=jax.ShapeDtypeStruct((b, f), jnp.float32),
        grid=(pl.cdiv(f, block_f),),
        in_specs=[
            pl.BlockSpec((b, h), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, block_f), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_f), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, block_f), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * f,
            bytes_accessed=h * f + b * h * 2 + b * f * 4,
            transcendentals=0),
    )(x, w, scale)


def dequant_matmul(x: jnp.ndarray, w: jnp.ndarray,
                   scale: jnp.ndarray) -> jnp.ndarray:
    """x @ dequant(w): int8 weight path, bf16 accumulate-scale."""
    y = jax.lax.dot_general(
        x, w.astype(x.dtype),
        (((x.ndim - 1,), (w.ndim - 2,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (y * scale.reshape((1,) * (y.ndim - 1) + (-1,)).astype(
        jnp.float32)).astype(x.dtype)
