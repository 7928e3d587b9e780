"""Pallas TPU fused single-token decode attention over the stacked cache.

The XLA decode path (`ops/attention.py:decode_attention`) lowers to ~8
small kernels per layer (slice, convert, dot, scale, mask, softmax, scale,
dot) whose fixed launch costs add ~0.3 ms/token across a 32-layer scan —
measured against the pure KV-traffic floor with
`tools/exp_decode_unroll.py`.  This kernel fuses the whole op:

* reads K/V straight from the FULL stacked (L, B, Smax, Hkv, D) cache —
  the layer is picked with a scalar-prefetch index, so the decode layer
  scan never materializes a per-layer slice;
* int8 caches dequantize *in VMEM after the DMA* (per-slot-per-head
  scales fold into the fp32 logits/probs, mirroring the XLA path), so
  the HBM traffic stays at int8 bytes;
* softmax runs fp32 with the classic streaming running-max rescale over
  S-blocks, so Smax is bounded by HBM, not VMEM.

Replaces the per-token attention of the reference's manual decode loop
(`valley/serve/model_worker.py:371-423`, HF eager attention).  Numerics:
bf16 MXU logits with fp32 softmax/accumulation — same contraction dtypes
as the XLA path; the block rescale reorders float adds, so outputs agree
to bf16 tolerance (tested vs the XLA oracle).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9


def _split_s(s: int, slot_bytes: int) -> Optional[tuple[int, int]]:
    """(n_s, block_s) with block_s * n_s == s exactly — padding is not an
    option here, because padding the *stacked* cache would materialize a
    full-cache copy once per decode layer.  Single block while K+V fit
    ~6 MB of VMEM (grid=1 needs no double-buffering); else stream ~4 MB
    blocks (double-buffered).  None when s has no usable divisor."""
    cap_single = (6 << 20) // (2 * slot_bytes)
    if s <= cap_single:
        return 1, s
    cap_stream = max((4 << 20) // (2 * slot_bytes), 128)
    for n in range(2, 257):
        # streamed blocks must tile s exactly AND be lane-aligned (the
        # bias block's last dim is block_s)
        if s % n == 0 and s // n <= cap_stream and (s // n) % 128 == 0:
            return n, s // n
    return None


def supports_decode_kernel(s: int, hkv: int, d: int, itemsize: int,
                           h: Optional[int] = None) -> bool:
    """Whether decode_attention_stacked handles this cache geometry.
    ``h`` (query-head count, when known) must be <= 128: the m/l scratch
    buffers are laid out (h, 128) and sliced [:, :h], so more than 128
    query heads would index out of bounds."""
    if h is not None and h > 128:
        return False
    return (d % 128 == 0 and hkv % 8 == 0
            and _split_s(s, hkv * d * itemsize) is not None)


def _kernel(li_ref, qd_ref, k_ref, v_ref, ks_ref, vs_ref, b_ref, o_ref,
            m_scr, l_scr, acc_scr, *, bs: int, hkv: int, d: int,
            n_rep: int, scale: float, quant: bool):
    # qd_ref: (Hkv*D, H) bf16 — the query expanded block-diagonally over
    # kv heads OUTSIDE the kernel (qd[kv*D+j, h] = q[h, j] iff
    # kv == h // n_rep), so per-head logits come from ONE contiguous 2-D
    # MXU dot with no in-kernel reshapes (a per-head slice loop is
    # pathological — strided sublane gathers — and reshaping the
    # (bs*Hkv, H) all-pairs product to 3-D costs a full fp32 retiling);
    # k_ref/v_ref: (1, 1, bs, Hkv*D) s-major rows (merged OUTSIDE, an
    # XLA metadata no-op); ks/vs_ref: (1, 1, bs, Hkv) or dummies;
    # b_ref: (1, bs) fp32 additive mask; o_ref: (1, H, D).
    # Grid (B, n_s), s innermost: running-max rescale across s blocks.
    # The extra zero-block FLOPs are ~2 us/layer on an otherwise idle MXU.
    si = pl.program_id(1)
    n_s = pl.num_programs(1)
    h_q = qd_ref.shape[2]

    @pl.when(si == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    k_flat = k_ref[0, 0].astype(jnp.bfloat16)               # (bs, Hkv*D)
    logits = jax.lax.dot_general(
        k_flat, qd_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale         # (bs, H)
    if quant:
        ks = ks_ref[0, 0].astype(jnp.float32)               # (bs, Hkv)
        logits = logits * (ks if n_rep == 1
                           else jnp.repeat(ks, n_rep, axis=1))
    logits = logits + b_ref[0].astype(jnp.float32).reshape(bs, 1)

    m_old = m_scr[0:1, :h_q]                                # (1, H)
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=0, keepdims=True))
    alpha = jnp.exp(m_old - m_new)                          # (1, H)
    p = jnp.exp(logits - m_new)                             # (bs, H)
    l_new = alpha * l_scr[0:1, :h_q] + jnp.sum(p, axis=0, keepdims=True)
    if quant:
        vs = vs_ref[0, 0].astype(jnp.float32)               # (bs, Hkv)
        p = p * (vs if n_rep == 1 else jnp.repeat(vs, n_rep, axis=1))
    # match the XLA path's probs->bf16 cast before the PV contraction
    p16 = p.astype(jnp.bfloat16)                            # (bs, H)
    v_flat = v_ref[0, 0].astype(jnp.bfloat16)               # (bs, Hkv*D)
    pv_all = jax.lax.dot_general(
        p16, v_flat, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # (H, Hkv*D)
    # 3-D pair mask from 32-bit iotas (a minor-dim insertion on the bool
    # mask is unsupported by Mosaic for sub-32-bit types)
    kv3 = jax.lax.broadcasted_iota(jnp.int32, (h_q, hkv, 1), 1)
    q3 = jax.lax.broadcasted_iota(jnp.int32, (h_q, hkv, 1), 0)
    pv = jnp.sum(jnp.where(q3 // n_rep == kv3,
                           pv_all.reshape(h_q, hkv, d), 0.0),
                 axis=1)                                    # (H, D)
    acc_scr[...] = acc_scr[...] * alpha.reshape(h_q, 1) + pv
    m_scr[0:1, :h_q] = m_new
    l_scr[0:1, :h_q] = l_new

    @pl.when(si == n_s - 1)
    def _():
        o_ref[0] = (acc_scr[...]
                    / l_scr[0, :h_q].reshape(h_q, 1)).astype(o_ref.dtype)


def decode_attention_stacked(q: jnp.ndarray, k_all: jnp.ndarray,
                             v_all: jnp.ndarray, li,
                             length_mask: jnp.ndarray,
                             k_scale: Optional[jnp.ndarray] = None,
                             v_scale: Optional[jnp.ndarray] = None,
                             ) -> jnp.ndarray:
    """Fused decode attention for layer ``li`` of a stacked KV cache.

    q: (B, 1, H, D); k_all/v_all: (L, B, Smax, Hkv, D) bf16 or int8;
    k_scale/v_scale: (L, B, Smax, Hkv) for int8 caches;
    length_mask: (B, Smax) bool.  Returns (B, 1, H, D) in q.dtype.
    """
    b, _, h, d = q.shape
    ll, _, s, hkv, _ = k_all.shape
    n_rep = h // hkv
    quant = k_scale is not None

    if h > 128:
        # the m/l scratch is laid out (h, 128) and sliced [:, :h] — more
        # query heads than 128 would index out of bounds (enforced here,
        # not only in the advisory supports_decode_kernel gate)
        raise ValueError(f"decode kernel supports at most 128 query "
                         f"heads, got {h}")
    split = _split_s(s, hkv * d * k_all.dtype.itemsize)
    if split is None:
        raise ValueError(f"no block split for Smax={s}; gate with "
                         "supports_decode_kernel()")
    n_s, block_s = split

    bias = jnp.where(length_mask, 0.0, _NEG_INF).astype(jnp.float32)
    # dim merges OUTSIDE the kernel: XLA metadata no-ops on the stacked
    # cache; in-kernel sub-32-bit reshapes force physical retiling
    k_in = k_all.reshape(ll, b, s, hkv * d)
    v_in = v_all.reshape(ll, b, s, hkv * d)
    # block-diagonal query expansion (see _kernel docstring); built here
    # in XLA where it fuses, ~B*Hkv*D*H bf16 = small
    kv_ids = jax.lax.broadcasted_iota(jnp.int32, (1, hkv, 1, h), 1)
    q_ids = jax.lax.broadcasted_iota(jnp.int32, (1, hkv, 1, h), 3)
    q_t = jnp.swapaxes(q[:, 0], 1, 2)[:, None]            # (B, 1, D, H)
    qd = jnp.where(q_ids // n_rep == kv_ids, q_t,
                   0).reshape(b, hkv * d, h).astype(jnp.bfloat16)

    in_specs = [
        pl.BlockSpec((1, hkv * d, h), lambda bi, si, li: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_s, hkv * d),
                     lambda bi, si, li: (li[0], bi, si, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_s, hkv * d),
                     lambda bi, si, li: (li[0], bi, si, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qd, k_in, v_in]
    if quant:
        # scales stay in their storage layout (L, B, Smax, Hkv) — a
        # transposed copy per layer would re-stream the whole scale
        # array once per scan step; Mosaic masks the sub-128 lane dim
        in_specs += [
            pl.BlockSpec((1, 1, block_s, hkv),
                         lambda bi, si, li: (li[0], bi, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_s, hkv),
                         lambda bi, si, li: (li[0], bi, si, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [k_scale, v_scale]
    else:
        # dummy scalar stand-ins keep the kernel signature static
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY)]
        args += [jnp.zeros((1,), jnp.bfloat16), jnp.zeros((1,),
                                                          jnp.bfloat16)]
    in_specs.append(pl.BlockSpec((1, block_s),
                                 lambda bi, si, li: (bi, si),
                                 memory_space=pltpu.VMEM))
    args.append(bias)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_s),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, d), lambda bi, si, li: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
    )
    kernel = functools.partial(_kernel, bs=block_s, hkv=hkv, d=d,
                               n_rep=n_rep, scale=d ** -0.5, quant=quant)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
    )(jnp.asarray(li, jnp.int32).reshape(1), *args)
    return out[:, None]
