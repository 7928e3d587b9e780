"""Pallas TPU fused attention (prefill).

Replaces the reference's eager torch attention (materializing the full
(S, S) probability matrix in HBM) with a fused kernel: for each query block
the logits live only in VMEM, softmax runs in fp32 on the VPU, and both
matmuls hit the MXU.  Valley's context is capped at 2048
(`valley_stage1.yaml:49`), so K/V for one (batch, head) fit comfortably in
VMEM (2048 x 128 x bf16 = 512 KiB each) and no streaming k-loop is needed —
this is the speed-of-light shape for this model family.

Differentiable via `jax.custom_vjp`: backward recomputes with the XLA path
(same cost profile as the reference's eager training attention).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, kvmask_ref, o_ref, *, causal: bool,
                 scale: float, block_q: int):
    # q_ref: (1, block_q, D); k_ref/v_ref: (1, S, D);
    # kvmask_ref: (1, 1, S) int32; o_ref: (1, block_q, D)
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (block_q, S)

    mask = kvmask_ref[0, 0, :][None, :] > 0  # (1, S)
    if causal:
        s = k_ref.shape[1]
        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, s), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (block_q, s), 1)
        mask = jnp.logical_and(mask, k_pos <= q_pos)
    logits = jnp.where(mask, logits, _NEG_INF)

    m = jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits - m)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    probs = unnorm / denom
    out = jax.lax.dot_general(
        probs, v_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _flash_fwd_impl(q, k, v, kv_mask, causal: bool, block_q: int):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = d ** -0.5
    block_q = min(block_q, sq)
    # Fold heads into the leading grid dim: (B, S, H, D) -> (B*H, S, D)
    # keeps block last-two-dims = (block_q, D), satisfying TPU tiling.
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    grid = (b * h, pl.cdiv(sq, block_q))

    kernel = functools.partial(_attn_kernel, causal=causal, scale=scale,
                               block_q=block_q)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d),
                         lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d),
                         lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d),
                         lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk),
                         lambda bh, qi: (bh // h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize * 2,
            transcendentals=b * h * sq * sk,
        ),
    )(qf, kf, vf, kv_mask)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def _xla_attention(q, k, v, kv_mask, causal):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    mask = kv_mask[:, None, None, :] > 0
    if causal:
        sq, sk = q.shape[1], k.shape[1]
        cm = jnp.tril(jnp.ones((sq, sk), dtype=bool), k=sk - sq)
        mask = jnp.logical_and(mask, cm[None, None])
    logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, kv_mask, causal, block_q):
    return _flash_fwd_impl(q, k, v, kv_mask, causal, block_q)


def _flash_fwd(q, k, v, kv_mask, causal, block_q):
    return _flash_fwd_impl(q, k, v, kv_mask, causal, block_q), (q, k, v,
                                                                kv_mask)


def _flash_bwd(causal, block_q, res, g):
    q, k, v, kv_mask = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, kv_mask,
                                                       causal), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None,
                    kv_mask: Optional[jnp.ndarray] = None,
                    *, causal: bool = False,
                    block_q: int = 256) -> jnp.ndarray:
    """Fused attention.  q/k/v: (B, S, H, D) with equal H (repeat GQA heads
    before calling).  ``kv_mask``: (B, Sk) validity mask (1 = attend).
    ``bias`` is accepted for API compatibility but only mask-style biases are
    supported (converted to a kv mask)."""
    b, _, _, _ = q.shape
    sk = k.shape[1]
    if kv_mask is None:
        if bias is not None:
            # Interpret a (B, 1, 1, Sk)-broadcastable additive bias as mask.
            neg = bias.reshape(b, -1, sk)[:, -1, :] < -1e8
            kv_mask = jnp.where(neg, 0, 1).astype(jnp.int32)
        else:
            kv_mask = jnp.ones((b, sk), dtype=jnp.int32)
    kv_mask = kv_mask.astype(jnp.int32).reshape(b, 1, sk)
    return _flash(q, k, v, kv_mask, causal, block_q)
