"""Attention ops: XLA reference path + dispatch to Pallas TPU kernels.

The reference relies on torch/cuBLAS eager attention inside HF
`LlamaModel`/CLIP.  Here attention is a pure function over (B, S, H, D)
tensors with an additive fp32 bias; on TPU the prefill path dispatches to the
Pallas flash-attention kernel in `valley_tpu.ops.flash_attention` when shapes
permit, otherwise XLA's fused softmax(QK^T)V is already MXU-friendly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """(B, S, Hkv, D) -> (B, S, Hkv*n_rep, D) for grouped-query attention."""
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d)
                            ).reshape(b, s, h * n_rep, d)


def mha_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None,
                  *, causal: bool = False,
                  use_flash: Optional[bool] = None) -> jnp.ndarray:
    """Multi-head attention.

    q: (B, Sq, H, D); k, v: (B, Sk, Hkv, D); bias: broadcastable to
    (B, H, Sq, Sk), additive in fp32 (use -inf/-1e9 for masking).
    Returns (B, Sq, H, D) in q.dtype.  Softmax is computed in fp32.
    """
    n_rep = q.shape[2] // k.shape[2]
    k = _repeat_kv(k, n_rep)
    v = _repeat_kv(v, n_rep)

    if use_flash is None:
        # the kernel streams K in blocks and pads internally, so any
        # prefill length works; head_dim must still be lane-aligned
        use_flash = (
            jax.default_backend() == "tpu"
            and q.shape[1] == k.shape[1]
            and q.shape[1] >= 128
            and q.shape[3] % 128 == 0
        )
    if use_flash:
        from valley_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v, bias=bias, causal=causal)

    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        sq, sk = q.shape[1], k.shape[1]
        causal_mask = jnp.tril(jnp.ones((sq, sk), dtype=bool), k=sk - sq)
        logits = jnp.where(causal_mask[None, None], logits, -1e9)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _head_scale(s: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """(B, Smax, Hkv) slot scales -> (B, H, 1, Smax) fp32 logit factors."""
    s = jnp.swapaxes(s.astype(jnp.float32), 1, 2)       # (B, Hkv, Smax)
    if n_rep != 1:
        s = jnp.repeat(s, n_rep, axis=1)
    return s[:, :, None, :]


def decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                     v_cache: jnp.ndarray,
                     length_mask: jnp.ndarray,
                     k_scale: Optional[jnp.ndarray] = None,
                     v_scale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Single-token decode attention against a fixed-size KV cache.

    q: (B, 1, H, D); k_cache/v_cache: (B, Smax, Hkv, D);
    length_mask: (B, Smax) bool, True for valid cache slots.
    With an int8 cache, ``k_scale``/``v_scale`` (B, Smax, Hkv) dequantize
    on the cheap side of each contraction: K scales multiply the LOGITS
    and V scales multiply the PROBS — (B, H, 1, Smax)-sized products —
    instead of rescaling the (B, Smax, H, D) cache values elementwise.
    The whole op is one batched GEMV pair — XLA maps it well.
    """
    n_rep = q.shape[2] // k_cache.shape[2]
    k = _repeat_kv(k_cache.astype(q.dtype), n_rep)
    v = _repeat_kv(v_cache.astype(q.dtype), n_rep)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if k_scale is not None:
        logits = logits * _head_scale(k_scale, n_rep)
    logits = jnp.where(length_mask[:, None, None, :], logits, -1e9)
    probs = jax.nn.softmax(logits, axis=-1)
    if v_scale is not None:
        probs = probs * _head_scale(v_scale, n_rep)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
