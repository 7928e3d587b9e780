"""Pallas TPU fused attention (prefill) with a fused backward pass.

Replaces the reference's eager torch attention (materializing the full
(S, S) probability matrix in HBM) with fused kernels: for each query block
the logits live only in VMEM, softmax runs in fp32 on the VPU, and every
matmul hits the MXU.

**Streaming K**: the forward iterates K/V in ``block_k`` tiles with the
classic flash running-max/denominator rescale, and the backward iterates
(k-block, q-block) tiles — so sequence length is bounded by HBM, not VMEM
(Valley's default context is 2048, `valley_stage1.yaml:49`, but longer
video contexts work).  Sequences are padded internally to block multiples
(padded K masked off, padded Q rows sliced away), so non-128-multiple
buckets are fine.

Training: `jax.custom_vjp` with a flash-style backward *kernel* — the
forward saves the per-row logsumexp, the backward recomputes probabilities
tile-by-tile in VMEM (dV += P^T dO, dS = P∘(dP − Δ), dQ += dS·K,
dK += dS^T·Q with Δ = rowsum(dO∘O)) so the (S, S) matrix never touches HBM
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

def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_axis(x, axis: int, to: int):
    if x.shape[axis] == to:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, to - x.shape[axis])
    return jnp.pad(x, pad)


def _fwd_kernel(q_ref, k_ref, v_ref, kvmask_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *,
                causal: bool, scale: float, block_q: int, block_k: int):
    # q_ref: (1, block_q, D); k_ref/v_ref: (1, block_k, D);
    # kvmask_ref: (1, 1, block_k); o_ref: (1, block_q, D);
    # lse_ref: (1, 1, block_q); scratch: m/l (block_q, 128) fp32,
    # acc (block_q, D) fp32.  Grid (B*H, n_q, n_k) — k fastest, running
    # max/denominator rescale across k blocks (streaming K).
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)
    qs = qi * block_q
    ks = ki * block_k

    @pl.when(ki == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def compute():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (bq, bk)

        mask = kvmask_ref[0, 0, :][None, :] > 0          # (1, bk)
        if causal:
            q_pos = qs + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_pos = ks + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            mask = jnp.logical_and(mask, k_pos <= q_pos)
        logits = jnp.where(mask, logits, _NEG_INF)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1,
                                            keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        l_scr[:, :1] = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1,
                                                      keepdims=True)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
            p, v_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:, :1] = m_new

    if causal:
        # k blocks fully above the diagonal contribute nothing — skip
        pl.when(qs + block_q > ks)(compute)
    else:
        compute()

    @pl.when(ki == n_k - 1)
    def _():
        denom = jnp.maximum(l_scr[:, :1], 1e-30)   # fully-masked rows
        o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)
        lse_ref[0, 0, :] = (m_scr[:, :1] + jnp.log(denom))[:, 0]


def _flash_fwd_impl(q, k, v, kv_mask, causal: bool, block_q: int,
                    block_k: int):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = d ** -0.5
    block_q = min(block_q, _round_up(sq, 8))
    block_k = min(block_k, _round_up(sk, 128))
    # pad sequences to block multiples: padded K slots are masked off,
    # padded Q rows are sliced away after the call
    sqp = _round_up(sq, block_q)
    skp = _round_up(sk, block_k)
    # Fold heads into the leading grid dim: (B, S, H, D) -> (B*H, S, D)
    # keeps block last-two-dims = (block, D), satisfying TPU tiling.
    qf = _pad_axis(q.transpose(0, 2, 1, 3).reshape(b * h, sq, d), 1, sqp)
    kf = _pad_axis(k.transpose(0, 2, 1, 3).reshape(b * h, sk, d), 1, skp)
    vf = _pad_axis(v.transpose(0, 2, 1, 3).reshape(b * h, sk, d), 1, skp)
    maskp = _pad_axis(kv_mask, 2, skp)
    grid = (b * h, sqp // block_q, skp // block_k)

    kernel = functools.partial(_fwd_kernel, causal=causal, scale=scale,
                               block_q=block_q, block_k=block_k)
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((b * h, sqp, d), q.dtype),
                   jax.ShapeDtypeStruct((b * h, 1, sqp), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d),
                         lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d),
                         lambda bh, qi, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d),
                         lambda bh, qi, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k),
                         lambda bh, qi, ki: (bh // h, 0, ki),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d),
                         lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q),
                         lambda bh, qi, ki: (bh, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize * 2,
            transcendentals=b * h * sq * sk,
        ),
    )(qf, kf, vf, maskp)
    out = out[:, :sq]
    lse = lse[:, :, :sq]
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3), lse


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                kvmask_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                causal: bool, scale: float, block_q: int, block_k: int):
    # Grid (B*H, n_k) — one K/V tile per step, inner fori over Q tiles.
    # refs: q/do/dq (1, Sq, D); k/v/dk/dv (1, block_k, D);
    # lse/delta (1, 1, Sq); kvmask (1, 1, block_k);
    # scratch dk_acc/dv_acc (block_k, D) fp32.  dq accumulates in fp32
    # across k blocks (dq_ref is fp32, revisited per ki).
    ki = pl.program_id(1)
    ks = ki * block_k
    sq = q_ref.shape[1]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    kvm = kvmask_ref[0, 0, :][None, :] > 0          # (1, block_k)

    @pl.when(ki == 0)
    def _():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)

    def body(qi, _):
        qs = qi * block_q

        def compute():
            q_blk = q_ref[0, pl.ds(qs, block_q), :].astype(jnp.float32)
            do_blk = do_ref[0, pl.ds(qs, block_q), :].astype(jnp.float32)
            lse_blk = lse_ref[0, 0, pl.ds(qs, block_q)][:, None]
            delta_blk = delta_ref[0, 0, pl.ds(qs, block_q)][:, None]

            s = jax.lax.dot_general(
                q_blk, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (bq, bk)
            mask = kvm
            if causal:
                q_pos = qs + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0)
                k_pos = ks + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1)
                mask = jnp.logical_and(mask, k_pos <= q_pos)
            p = jnp.where(mask, jnp.exp(s - lse_blk), 0.0)   # (bq, bk)

            # dV += P^T dO
            dv_acc[...] += jax.lax.dot_general(
                p, do_blk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # dP = dO V^T ; dS = P * (dP - delta) * scale
            dp = jax.lax.dot_general(
                do_blk, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - delta_blk) * scale                # (bq, bk)
            # dQ_blk += dS K_blk  (accumulated across k blocks)
            dq_ref[0, pl.ds(qs, block_q), :] += jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # dK += dS^T Q_blk
            dk_acc[...] += jax.lax.dot_general(
                ds, q_blk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        if causal:
            # q blocks entirely above this k block see nothing of it
            pl.when(qs + block_q > ks)(compute)
        else:
            compute()
        return 0

    jax.lax.fori_loop(0, pl.cdiv(sq, block_q), body, 0)
    dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
    dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, kv_mask, out, lse, g, causal: bool,
                    block_q: int, block_k: int):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = d ** -0.5
    block_q = min(block_q, _round_up(sq, 8))
    block_k = min(block_k, _round_up(sk, 128))
    sqp = _round_up(sq, block_q)
    skp = _round_up(sk, block_k)

    qf = _pad_axis(q.transpose(0, 2, 1, 3).reshape(b * h, sq, d), 1, sqp)
    kf = _pad_axis(k.transpose(0, 2, 1, 3).reshape(b * h, sk, d), 1, skp)
    vf = _pad_axis(v.transpose(0, 2, 1, 3).reshape(b * h, sk, d), 1, skp)
    gf = _pad_axis(g.transpose(0, 2, 1, 3).reshape(b * h, sq, d), 1, sqp)
    of = _pad_axis(out.transpose(0, 2, 1, 3).reshape(b * h, sq, d), 1, sqp)
    maskp = _pad_axis(kv_mask, 2, skp)
    # delta = rowsum(dO * O) — cheap elementwise reduce in XLA.  Padded q
    # rows have lse = 0 from padding; exp(s - 0) could be huge, so force
    # their probabilities to 0 by pushing their lse to +inf.
    delta = jnp.sum(gf.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=-1).reshape(b * h, 1, sqp)
    lsep = _pad_axis(lse, 2, sqp)
    if sqp != sq:
        rows = jnp.arange(sqp)[None, None, :]
        lsep = jnp.where(rows < sq, lsep, -_NEG_INF)

    kernel = functools.partial(_bwd_kernel, causal=causal, scale=scale,
                               block_q=block_q, block_k=block_k)
    spec_sd = pl.BlockSpec((1, sqp, d), lambda bh, ki: (bh, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_skd = pl.BlockSpec((1, block_k, d), lambda bh, ki: (bh, ki, 0),
                            memory_space=pltpu.VMEM)
    spec_row = pl.BlockSpec((1, 1, sqp), lambda bh, ki: (bh, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_mask = pl.BlockSpec((1, 1, block_k),
                             lambda bh, ki: (bh // h, 0, ki),
                             memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((b * h, sqp, d), jnp.float32),
                   jax.ShapeDtypeStruct((b * h, skp, d), k.dtype),
                   jax.ShapeDtypeStruct((b * h, skp, d), v.dtype)),
        grid=(b * h, skp // block_k),
        in_specs=[spec_sd, spec_skd, spec_skd, spec_sd, spec_row, spec_row,
                  spec_mask],
        out_specs=(spec_sd, spec_skd, spec_skd),
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * sq * sk * d,
            bytes_accessed=(q.size + k.size + v.size + g.size)
            * q.dtype.itemsize * 2,
            transcendentals=b * h * sq * sk,
        ),
    )(qf, kf, vf, gf, lsep, delta, maskp)

    def unfold(x, s):
        return x[:, :s].reshape(b, h, s, d).transpose(0, 2, 1, 3)

    return unfold(dq, sq).astype(q.dtype), unfold(dk, sk), unfold(dv, sk)


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

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, kv_mask, causal, block_q, block_k):
    out, _lse = _flash_fwd_impl(q, k, v, kv_mask, causal, block_q, block_k)
    return out


def _flash_fwd(q, k, v, kv_mask, causal, block_q, block_k):
    out, lse = _flash_fwd_impl(q, k, v, kv_mask, causal, block_q, block_k)
    return out, (q, k, v, kv_mask, out, lse)


def _flash_bwd(causal, block_q, block_k, res, g):
    q, k, v, kv_mask, out, lse = res
    if os.environ.get("VALLEY_FLASH_XLA_BWD"):
        _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(
            q_, k_, v_, kv_mask[:, 0, :], causal), q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None
    dq, dk, dv = _flash_bwd_impl(q, k, v, kv_mask, out, lse, g, causal,
                                 block_q, block_k)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None,
                    kv_mask: Optional[jnp.ndarray] = None,
                    *, causal: bool = False,
                    block_q: int = 256,
                    block_k: int = 512) -> jnp.ndarray:
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
    return _flash(q, k, v, kv_mask, causal, block_q, block_k)
