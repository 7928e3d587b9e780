"""Weight-only int8 quantization for serving.

Symmetric per-output-channel int8 on the decoder's large matmuls +
lm_head: halves the HBM bytes read per decoded token, which is the decode
roofline (single-stream decode reads every weight once per token).  The
dequant (int8 -> bf16 * scale) fuses into the matmul operand load under
XLA; activations and the KV cache stay bf16.

Usage: ``params = quantize_llama_params(params)`` before building the
Engine.  `llama._proj` / `logits_from_hidden` detect int8 weights via
dtype and apply the stored ``<name>_scale``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

QUANT_TARGETS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
                 "wqkv", "w_gateup")   # last two: fused serving layout


def _quantize_one(w: jnp.ndarray, contract_axis: int = -1):
    """Symmetric per-out-channel int8 over the contraction axis.

    Layer weights are stored (out, in) (see `llama.init_params`), so the
    contraction axis is -1 and the scale is (out,); the lm_head stays
    (in, out), contraction axis -2, scale (1, out)."""
    # bf16 math: int8 magnitudes are exactly representable, no fp32 copy
    amax = jnp.max(jnp.abs(w), axis=contract_axis,
                   keepdims=True).astype(jnp.float32)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(w.dtype)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    if contract_axis == -1:
        scale = scale[..., 0]            # (out,)
    return q, scale.astype(jnp.bfloat16)


@jax.jit
def _quantize_stacked(w: jnp.ndarray):
    """(L, out, in) quantized one layer at a time (lax.map) so the
    transient is one layer, not the whole 2.9-6 GB stack."""
    return jax.lax.map(_quantize_one, w)


def quantize_tensor(w: jnp.ndarray, contract_axis: int = -1):
    """Symmetric int8 over the contraction axis (default: (out, in)
    layout, scale (out,))."""
    if w.ndim == 3 and contract_axis == -1:
        return _quantize_stacked(w)
    return _quantize_one(w, contract_axis)


def quantize_llama_params(params, targets: Sequence[str] = QUANT_TARGETS,
                          quantize_lm_head: bool = True):
    """Quantize the decoder weights to int8.

    CONSUMES the input tree: original bf16 arrays are dropped tensor by
    tensor so peak device memory stays ~(full model + one layer) — a 7B
    bf16 tree plus a second fp32/bf16 copy would not fit a 16 GB chip.
    """
    llama_p = params["llama"]            # mutated in place, see docstring
    layers = llama_p["layers"]
    for name in targets:
        if name not in layers or layers[name].dtype == jnp.int8:
            continue
        q, scale = quantize_tensor(layers[name])
        jax.block_until_ready(q)
        layers[name] = q                 # drop the bf16 stack before the
        layers[name + "_scale"] = scale  # next tensor quantizes
    if quantize_lm_head and llama_p["lm_head"].dtype != jnp.int8:
        q, scale = quantize_tensor(llama_p["lm_head"], contract_axis=-2)
        jax.block_until_ready(q)
        llama_p["lm_head"] = q
        llama_p["lm_head_scale"] = scale
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
