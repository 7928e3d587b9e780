"""Pallas TPU fused attention (prefill) with a fused backward pass.

Replaces the reference's eager torch attention (materializing the full
(S, S) probability matrix in HBM) with fused kernels: for each query block
the logits live only in VMEM, softmax runs in fp32 on the VPU, and every
matmul hits the MXU.  Valley's context is capped at 2048
(`valley_stage1.yaml:49`), so K/V for one (batch, head) fit comfortably in
VMEM (2048 x 128 x bf16 = 512 KiB each) and no streaming k-loop is needed.

Training: `jax.custom_vjp` with a flash-style backward *kernel* — the
forward saves the per-row logsumexp, the backward recomputes probabilities
block-by-block in VMEM (dV = P^T dO, dS = P∘(dP − Δ), dQ = dS·K,
dK = dS^T·Q with Δ = rowsum(dO∘O)) so the (S, S) matrix never touches HBM
in either direction.  `VALLEY_FLASH_XLA_BWD=1` falls back to an XLA
recompute backward (used as the oracle in tests).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, kvmask_ref, o_ref, lse_ref, *,
                causal: bool, scale: float, block_q: int):
    # q_ref: (1, block_q, D); k_ref/v_ref: (1, S, D);
    # kvmask_ref: (1, 1, S); o_ref: (1, block_q, D); lse_ref: (1, 1, block_q)
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
    lse_ref[0, 0, :] = (m + jnp.log(denom))[:, 0]


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

    kernel = functools.partial(_fwd_kernel, causal=causal, scale=scale,
                               block_q=block_q)
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
                   jax.ShapeDtypeStruct((b * h, 1, sq), jnp.float32)),
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
        out_specs=(
            pl.BlockSpec((1, block_q, d),
                         lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q),
                         lambda bh, qi: (bh, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize * 2,
            transcendentals=b * h * sq * sk,
        ),
    )(qf, kf, vf, kv_mask)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3), lse


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                kvmask_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                causal: bool, scale: float, block_q: int):
    # refs: q/k/v/do/dq/dk/dv (1, S, D); lse/delta/kvmask (1, 1, S);
    # scratch dk_acc/dv_acc (S, D) fp32.  One program per (batch, head).
    sq = q_ref.shape[1]
    sk = k_ref.shape[1]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    kvm = kvmask_ref[0, 0, :][None, :] > 0          # (1, S)

    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)

    def body(qi, _):
        qs = qi * block_q
        q_blk = q_ref[0, pl.ds(qs, block_q), :].astype(jnp.float32)
        do_blk = do_ref[0, pl.ds(qs, block_q), :].astype(jnp.float32)
        lse_blk = lse_ref[0, 0, pl.ds(qs, block_q)][:, None]
        delta_blk = delta_ref[0, 0, pl.ds(qs, block_q)][:, None]

        s = jax.lax.dot_general(
            q_blk, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (bq, S)
        mask = kvm
        if causal:
            q_pos = qs + jax.lax.broadcasted_iota(jnp.int32,
                                                  (block_q, sk), 0)
            k_pos = jax.lax.broadcasted_iota(jnp.int32, (block_q, sk), 1)
            mask = jnp.logical_and(mask, k_pos <= q_pos)
        p = jnp.where(mask, jnp.exp(s - lse_blk), 0.0)    # (bq, S)

        # dV += P^T dO
        dv_acc[...] += jax.lax.dot_general(
            p, do_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dP = dO V^T ; dS = P * (dP - delta) * scale
        dp = jax.lax.dot_general(
            do_blk, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta_blk) * scale                 # (bq, S)
        # dQ_blk = dS K
        dq_ref[0, pl.ds(qs, block_q), :] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        # dK += dS^T Q_blk
        dk_acc[...] += jax.lax.dot_general(
            ds, q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, pl.cdiv(sq, block_q), body, 0)
    dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
    dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, kv_mask, out, lse, g, causal: bool,
                    block_q: int):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = d ** -0.5
    block_q = min(block_q, sq)

    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    gf = g.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    of = out.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    # delta = rowsum(dO * O) — cheap elementwise reduce in XLA
    delta = jnp.sum(gf.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=-1).reshape(b * h, 1, sq)

    kernel = functools.partial(_bwd_kernel, causal=causal, scale=scale,
                               block_q=block_q)
    spec_sd = pl.BlockSpec((1, sq, d), lambda bh: (bh, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_skd = pl.BlockSpec((1, sk, d), lambda bh: (bh, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_row = pl.BlockSpec((1, 1, sq), lambda bh: (bh, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_mask = pl.BlockSpec((1, 1, sk), lambda bh: (bh // h, 0, 0),
                             memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
                   jax.ShapeDtypeStruct((b * h, sk, d), k.dtype),
                   jax.ShapeDtypeStruct((b * h, sk, d), v.dtype)),
        grid=(b * h,),
        in_specs=[spec_sd, spec_skd, spec_skd, spec_sd, spec_row, spec_row,
                  spec_mask],
        out_specs=(spec_sd, spec_skd, spec_skd),
        scratch_shapes=[pltpu.VMEM((sk, d), jnp.float32),
                        pltpu.VMEM((sk, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * sq * sk * d,
            bytes_accessed=(q.size + k.size + v.size + g.size)
            * q.dtype.itemsize * 2,
            transcendentals=b * h * sq * sk,
        ),
    )(qf, kf, vf, gf, lse, delta, kv_mask)

    def unfold(x, s):
        return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)

    return unfold(dq, sq), unfold(dk, sk), unfold(dv, sk)


# ---------------------------------------------------------------------------
# XLA reference path (oracle / fallback)
# ---------------------------------------------------------------------------

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


# ---------------------------------------------------------------------------
# custom_vjp plumbing
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, kv_mask, causal, block_q):
    out, _lse = _flash_fwd_impl(q, k, v, kv_mask, causal, block_q)
    return out


def _flash_fwd(q, k, v, kv_mask, causal, block_q):
    out, lse = _flash_fwd_impl(q, k, v, kv_mask, causal, block_q)
    return out, (q, k, v, kv_mask, out, lse)


def _flash_bwd(causal, block_q, res, g):
    q, k, v, kv_mask, out, lse = res
    if os.environ.get("VALLEY_FLASH_XLA_BWD"):
        _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(
            q_, k_, v_, kv_mask[:, 0, :], causal), q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None
    dq, dk, dv = _flash_bwd_impl(q, k, v, kv_mask, out, lse, g, causal,
                                 block_q)
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
